"""Multimodal columns: opaque binary payloads + typed metadata, with
REAL pure-numpy decode kernels for the uncompressed container formats
parseable without image/audio libraries:

- BMP  (24-bit uncompressed BI_RGB, bottom-up, BITMAPINFOHEADER)
- PPM  (binary P6, maxval 255)
- WAV  (RIFF PCM 16-bit)
- Y4M  (YUV4MPEG2, Cmono — per-frame raw luma planes; the video
        frame-sample path)

Compressed codecs (JPEG/PNG/MP3/H.264) genuinely need PIL/ffmpeg-class
libraries absent from this environment and raise NotImplementedError
with that reason — the decode DISPATCH, schema, actor-pool stage shape,
small-batch sizing and fixed-size feature layout are all real and
oracle-checked: synthetic_media writes a ground-truth table computed
from the raw sample arrays BEFORE encoding, and the pipeline must parse
the container bytes to reproduce (n_values, value_sum) exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

FEATURE_DIM = 16

# bump whenever _synthetic_items' generation or the default transform
# parameters change — versions the cached ground-truth parquet files so
# a stale /tmp cache can never be compared against new pipeline output
TRUTH_VERSION = 2


# ------------------------------------------------------------- containers
def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (BI_RGB). Rows are
    stored bottom-up, BGR, padded to 4-byte boundaries."""
    h, w, _ = pixels.shape
    row = w * 3
    pad = (-row) % 4
    img_size = (row + pad) * h
    header = b"BM" + (54 + img_size).to_bytes(4, "little") + b"\x00" * 4
    header += (54).to_bytes(4, "little")
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + img_size.to_bytes(4, "little")
        + b"\x00" * 16
    )
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    rows = np.zeros((h, row + pad), np.uint8)
    rows[:, :row] = bgr.reshape(h, row)
    return header + info + rows.tobytes()


def decode_bmp(b: bytes) -> tuple[np.ndarray, dict]:
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP is decodable without codec libs "
            f"(got bpp={bpp}, compression={comp})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(b, np.uint8, count=h * stride, offset=off).reshape(
        h, stride
    )
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = (bgr if top_down else bgr[::-1])[:, :, ::-1]
    return rgb.reshape(-1).astype(np.int64), {"width": w, "height": h}


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_ppm(b: bytes) -> tuple[np.ndarray, dict]:
    if b[:2] != b"P6":
        raise ValueError("not a binary PPM payload")
    # header: magic, whitespace-separated w h maxval, ONE whitespace byte
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(b):  # truncated header must raise, not spin
            raise ValueError("truncated PPM header")
        while b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment line
            pos = b.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if pos == len(b):
            raise ValueError("truncated PPM header")
        fields.append(int(b[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    vals = np.frombuffer(b, np.uint8, count=w * h * 3, offset=pos)
    return vals.astype(np.int64), {"width": w, "height": h}


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    data = samples.astype("<i2").tobytes()
    n = len(data)
    hdr = (
        b"RIFF" + (36 + n).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")   # PCM
        + (1).to_bytes(2, "little")   # mono
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
        + b"data" + n.to_bytes(4, "little")
    )
    return hdr + data


def decode_wav(b: bytes) -> tuple[np.ndarray, dict]:
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    while pos + 8 <= len(b):  # chunk walk
        cid = b[pos : pos + 4]
        sz = int.from_bytes(b[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            fmt = b[pos + 8 : pos + 8 + sz]
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt")
            audio_fmt = int.from_bytes(fmt[0:2], "little")
            channels = int.from_bytes(fmt[2:4], "little")
            rate = int.from_bytes(fmt[4:8], "little")
            bits = int.from_bytes(fmt[14:16], "little")
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only 16-bit PCM WAV is decodable without codec libs "
                    f"(got fmt={audio_fmt}, bits={bits})"
                )
            vals = np.frombuffer(b, "<i2", count=sz // 2, offset=pos + 8)
            return vals.astype(np.int64), {
                "rate": rate, "channels": channels,
            }
        pos += 8 + sz + (sz & 1)
    raise ValueError("WAV without data chunk")


def encode_y4m(frames: np.ndarray) -> bytes:
    """(f, h, w) uint8 luma frames -> YUV4MPEG2 Cmono stream."""
    f, h, w = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 Cmono\n".encode()]
    for i in range(f):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
    return b"".join(out)


def decode_y4m(b: bytes) -> tuple[np.ndarray, dict]:
    if not b.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = b.index(b"\n")
    params = b[9:nl].split()
    w = h = None
    colorspace = "C420"
    for p in params:
        if p[:1] == b"W":
            w = int(p[1:])
        elif p[:1] == b"H":
            h = int(p[1:])
        elif p[:1] == b"C":
            colorspace = p.decode()
    if colorspace != "Cmono":
        raise NotImplementedError(
            "only Cmono Y4M (raw luma planes) decodable without codec libs"
        )
    if w is None or h is None:
        raise ValueError("Y4M missing W/H")
    pos = nl + 1
    frames = []
    while pos < len(b):
        fnl = b.index(b"\n", pos)
        if b[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M frame marker missing")
        pos = fnl + 1
        frames.append(np.frombuffer(b, np.uint8, count=w * h, offset=pos))
        pos += w * h
    vals = (
        np.concatenate(frames) if frames else np.empty(0, np.uint8)
    )
    return vals.astype(np.int64), {
        "width": w, "height": h, "n_frames": len(frames),
    }


_MAGIC_DECODERS = (
    (b"BM", decode_bmp),
    (b"P6", decode_ppm),
    (b"RIFF", decode_wav),
    (b"YUV4MPEG2", decode_y4m),
)


def decode_payload(payload: bytes) -> tuple[np.ndarray, dict]:
    """Dispatch on container magic -> (flat int64 sample values, meta).
    Unknown/compressed containers raise NotImplementedError (JPEG, PNG,
    MP3, H.264 ... need codec libraries absent from this environment)."""
    for magic, dec in _MAGIC_DECODERS:
        if payload[: len(magic)] == magic:
            return dec(payload)
    raise NotImplementedError(
        "unrecognized media container (compressed codecs need PIL/ffmpeg "
        "— not in this env); supported: BMP/PPM/WAV(PCM16)/Y4M(Cmono)"
    )


def pooled_features(values: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Fixed-size pooled feature: mean of `dim` equal contiguous chunks
    (deterministic; the batched-inference stand-in)."""
    if len(values) == 0:
        return np.zeros(dim, np.float64)
    return np.array(
        [c.mean() if len(c) else 0.0
         for c in np.array_split(values.astype(np.float64), dim)]
    )


class MediaFeaturizer:
    """Actor-pool stage: binary payload -> decode stats + fixed-size
    feature vector. In production __init__ loads the decoder/model once
    per actor; here the decoders are the pure-numpy container parsers
    above. The (n_values, value_sum) columns are integer-exact and
    oracle-checked against synthetic_media's pre-encode ground truth —
    reproducing them REQUIRES actually parsing the payload bytes."""

    def __init__(self, strict: bool = True):
        # codec-init / model-load happens here, once per actor
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_values, value_sum, feats = [], [], []
        for payload in batch["payload"].to_pylist():
            vals, _meta = decode_payload(payload)
            n_values.append(len(vals))
            value_sum.append(int(vals.sum()))
            feats.append(pooled_features(vals).tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_values": pa.array(n_values, pa.int64()),
                "value_sum": pa.array(value_sum, pa.int64()),
                "features": pa.array(feats, pa.list_(pa.float64(), FEATURE_DIM)),
            }
        )


def featurize(ds: "rd.Dataset", concurrency: int = 2, batch_size: int = 64) -> "rd.Dataset":
    """Small batch_size on purpose: batches of large binary payloads
    must fit in the actor heap (batch_size x payload x concurrency)."""
    return ds.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        # autoscaling pool (min 1): a fixture-sized input with fewer
        # blocks than the max never strands reserved actors (or warns);
        # at scale the pool grows to the max with the block count
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def _synthetic_items(
    n: int, seed: int = 5
) -> list[tuple[str, bytes, np.ndarray, int, int]]:
    """Deterministic (kind, payload, raw, width, height) items; `raw`
    keeps its PRE-ENCODE shape ((h,w,3) image, (ns,) audio, (f,h,w)
    video frames) so both the decode truth and the transform truth are
    computed from the same arrays the containers encode. Kinds cycle
    BMP-image, PPM-image, WAV-audio, Y4M-video."""
    rng = np.random.default_rng(seed)
    items = []
    for i in range(n):
        variant = i % 4
        if variant in (0, 1):
            h = int(rng.integers(4, 17))
            w = int(rng.integers(4, 17))
            px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            enc = encode_bmp(px) if variant == 0 else encode_ppm(px)
            items.append(("image", enc, px, w, h))
        elif variant == 2:
            ns = int(rng.integers(64, 513))
            samples = rng.integers(-(1 << 15), 1 << 15, size=ns).astype(np.int16)
            items.append(("audio", encode_wav(samples), samples, ns, 1))
        else:
            f = int(rng.integers(2, 5))
            h = int(rng.integers(4, 13))
            w = int(rng.integers(4, 13))
            frames = rng.integers(0, 256, size=(f, h, w)).astype(np.uint8)
            items.append(("video", encode_y4m(frames), frames, w, h))
    return items


def synthetic_media(n: int, seed: int = 5) -> tuple[pa.Table, pa.Table]:
    """Deterministic media table in REAL containers + the ground-truth
    table (media_id, kind, n_values, value_sum) computed from the raw
    sample arrays BEFORE encoding — the decode oracle. Kinds cycle
    BMP-image, PPM-image, WAV-audio, Y4M-video."""
    payloads, kinds, widths, heights = [], [], [], []
    t_nv, t_sum = [], []
    for kind, enc, raw, w, h in _synthetic_items(n, seed):
        payloads.append(enc)
        kinds.append(kind)
        widths.append(w)
        heights.append(h)
        flat = raw.reshape(-1).astype(np.int64)
        t_nv.append(len(flat))
        t_sum.append(int(flat.sum()))
    media = pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.array(widths, np.int32)),
            "height": pa.array(np.array(heights, np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )
    truth = pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "n_values": pa.array(t_nv, pa.int64()),
            "value_sum": pa.array(t_sum, pa.int64()),
        }
    )
    return media, truth


def resize_nn(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w[, c]) array via floor index
    mapping (src_row = out_row * h // out_h) — integer-exact, so the
    oracle can reproduce it from the pre-encode pixels."""
    h, w = px.shape[0], px.shape[1]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return px[ri][:, ci]


def _transform_raw(
    kind: str, raw: np.ndarray, out_h: int, out_w: int,
    frame_stride: int, audio_stride: int,
) -> np.ndarray:
    """The per-kind transform semantics shared by the Ray stage and the
    truth generator: image -> nearest-neighbor resize to (out_h, out_w);
    video -> keep every frame_stride-th frame; audio -> keep every
    audio_stride-th sample."""
    if kind == "image":
        return resize_nn(raw, out_h, out_w)
    if kind == "audio":
        return raw[::audio_stride]
    return raw[::frame_stride]


class MediaTransformer:
    """Actor-pool resize / frame-sample stage — the multimodal
    transforms a training pipeline runs after decode: images are
    nearest-neighbor-resized to a model input size, videos
    frame-sampled, audio decimated. Payloads are parsed by the numpy
    container decoders and reshaped via the container's own metadata;
    (out_n, out_sum) are integer-exact against pre-encode ground truth
    (synthetic_transform_truth) — reproducing them requires the decode,
    the reshape, AND the transform to all be right."""

    def __init__(
        self, out_h: int = 8, out_w: int = 8,
        frame_stride: int = 2, audio_stride: int = 4,
    ):
        # in production: model/codec init, once per actor
        self.out_h, self.out_w = out_h, out_w
        self.frame_stride, self.audio_stride = frame_stride, audio_stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_n, out_sum = [], []
        for payload in batch["payload"].to_pylist():
            vals, meta = decode_payload(payload)
            if "n_frames" in meta:  # video: (f, h, w) luma frames
                kind = "video"
                raw = vals.reshape(meta["n_frames"], meta["height"], meta["width"])
            elif "width" in meta:  # image: (h, w, 3) RGB
                kind = "image"
                raw = vals.reshape(meta["height"], meta["width"], 3)
            else:  # audio: flat PCM samples
                kind = "audio"
                raw = vals
            out = _transform_raw(
                kind, raw, self.out_h, self.out_w,
                self.frame_stride, self.audio_stride,
            )
            out_n.append(int(out.size))
            out_sum.append(int(out.sum()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "out_n": pa.array(out_n, pa.int64()),
                "out_sum": pa.array(out_sum, pa.int64()),
            }
        )


def transform_media(
    ds: "rd.Dataset", concurrency: int = 2, batch_size: int = 64
) -> "rd.Dataset":
    """Resize / frame-sample as an actor-pool map_batches stage (small
    batch_size: binary payloads x batch x concurrency must fit the
    actor heap)."""
    return ds.map_batches(
        MediaTransformer,
        batch_format="pyarrow",
        batch_size=batch_size,
        # autoscaling pool (min 1) — see featurize
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def synthetic_transform_truth(
    n: int, seed: int = 5, out_h: int = 8, out_w: int = 8,
    frame_stride: int = 2, audio_stride: int = 4,
) -> pa.Table:
    """Ground truth for MediaTransformer over synthetic_media(n, seed):
    (media_id, kind, out_n, out_sum) computed from the pre-encode raw
    arrays with the same _transform_raw semantics."""
    kinds, t_n, t_sum = [], [], []
    for kind, _enc, raw, _w, _h in _synthetic_items(n, seed):
        out = _transform_raw(
            kind, raw.astype(np.int64), out_h, out_w, frame_stride, audio_stride
        )
        kinds.append(kind)
        t_n.append(int(out.size))
        t_sum.append(int(out.sum()))
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "out_n": pa.array(t_n, pa.int64()),
            "out_sum": pa.array(t_sum, pa.int64()),
        }
    )
