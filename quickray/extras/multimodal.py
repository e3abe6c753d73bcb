"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment — clearly marked below); everything Ray-side is real
and tested: schema, actor-pool stage shape, small-batch sizing for
large binary rows, fixed-size feature output layout.
"""

from __future__ import annotations

import hashlib

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


class MediaFeaturizer:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    In production __init__ loads the decoder/model once per actor and
    __call__ runs batched inference; here the decode is a deterministic
    fake (sha256-seeded) so the distributed plumbing stays testable.
    Use strict=True to get the honest NotImplementedError instead.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict
        # model-load / codec-init would happen here, once per actor

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "real image/audio decode needs PIL/torchaudio — not in this env"
            )
        # STUB: deterministic pseudo-pixels derived from the payload hash
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.random(256)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            px = self._decode(payload)
            # "feature extraction": fixed-size pooled projection
            feats.append(px.reshape(FEATURE_DIM, -1).mean(axis=1).tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
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
        concurrency=concurrency,
        num_cpus=1,
    )


def synthetic_media(n: int, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for tests/demos."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512))).astype(np.uint8).tobytes() for _ in range(n)]
    kinds = [("image", "audio", "video")[i % 3] for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([64] * n, pa.int32()),
            "height": pa.array([64] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
