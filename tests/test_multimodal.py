"""Multimodal decode kernels: pure-numpy container parsers round-trip
exactly, dispatch rejects compressed codecs with a clear reason, and
the actor-pool featurize stage reproduces the pre-encode ground truth
(the decode oracle's property)."""

import numpy as np
import pytest

import ray.data as rd

from quickray.extras.multimodal import (
    FEATURE_DIM,
    decode_bmp,
    decode_payload,
    decode_ppm,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_ppm,
    encode_wav,
    encode_y4m,
    featurize,
    pooled_features,
    synthetic_media,
)


def test_bmp_roundtrip_padding():
    rng = np.random.default_rng(1)
    for w in (3, 4, 5, 6):  # cover every 4-byte row-padding case
        px = rng.integers(0, 256, size=(4, w, 3)).astype(np.uint8)
        vals, meta = decode_bmp(encode_bmp(px))
        assert meta == {"width": w, "height": 4}
        assert (vals == px.reshape(-1)).all()


def test_ppm_roundtrip_and_comment():
    px = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    vals, meta = decode_ppm(decode_and_comment_payload(px))
    assert meta == {"width": 4, "height": 3}
    assert (vals == px.reshape(-1)).all()


def decode_and_comment_payload(px):
    # a P6 header with a comment line — parsers must skip it
    h, w, _ = px.shape
    return f"P6\n# synthetic\n{w} {h}\n255\n".encode() + px.tobytes()


def test_wav_roundtrip_negative_samples():
    s = np.array([-32768, -1, 0, 1, 32767] * 11, dtype=np.int16)
    vals, meta = decode_wav(encode_wav(s, rate=16000))
    assert meta["rate"] == 16000
    assert (vals == s).all()
    assert vals.sum() == int(s.astype(np.int64).sum())


def test_y4m_roundtrip():
    fr = np.random.default_rng(2).integers(0, 256, (4, 5, 6)).astype(np.uint8)
    vals, meta = decode_y4m(encode_y4m(fr))
    assert meta == {"width": 6, "height": 5, "n_frames": 4}
    assert (vals == fr.reshape(-1)).all()


def test_unknown_and_compressed_rejected():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_payload(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError, match="BI_RGB"):
        # 32-bit BMP header
        b = bytearray(encode_bmp(np.zeros((2, 2, 3), np.uint8)))
        b[28] = 32
        decode_bmp(bytes(b))


def test_featurize_matches_ground_truth(ray_session):
    media, truth = synthetic_media(24, seed=11)
    out = featurize(rd.from_arrow(media)).to_pandas().sort_values("media_id")
    assert out["n_values"].tolist() == truth["n_values"].to_pylist()
    assert out["value_sum"].tolist() == truth["value_sum"].to_pylist()
    # fixed-size pooled features, deterministic
    f0 = np.array(out["features"].iloc[0])
    assert f0.shape == (FEATURE_DIM,)
    vals, _ = decode_payload(media["payload"][0].as_py())
    assert np.allclose(f0, pooled_features(vals))


def test_resize_nn_exact():
    from quickray.extras.multimodal import resize_nn

    px = np.arange(6 * 4 * 3, dtype=np.int64).reshape(6, 4, 3)
    out = resize_nn(px, 3, 2)
    # floor mapping: rows 0,2,4 and cols 0,2
    assert out.shape == (3, 2, 3)
    assert np.array_equal(out, px[[0, 2, 4]][:, [0, 2]])
    # upscale repeats source pixels, never interpolates
    up = resize_nn(px[:2, :2], 4, 4)
    assert set(np.unique(up)) <= set(np.unique(px[:2, :2]))


def test_transform_matches_ground_truth(ray_session):
    from quickray.extras.multimodal import (
        synthetic_transform_truth,
        transform_media,
    )

    n = 24
    media, _ = synthetic_media(n)
    got = (
        transform_media(rd.from_arrow(media))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    exp = synthetic_transform_truth(n).to_pandas()
    assert got["out_n"].tolist() == exp["out_n"].tolist()
    assert got["out_sum"].tolist() == exp["out_sum"].tolist()
    assert got["kind"].tolist() == exp["kind"].tolist()


def test_ppm_truncated_header_raises():
    """A truncated/malformed P6 header must raise, not spin forever."""
    from quickray.extras.multimodal import decode_ppm

    for bad in (b"P6", b"P6 ", b"P6 12", b"P6\n4 4", b"P6\n#comment"):
        with pytest.raises(ValueError):
            decode_ppm(bad)
