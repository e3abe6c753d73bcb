"""Small shared helpers."""

from __future__ import annotations

import zlib

import numpy as np


def stable_hash_str(s: str) -> int:
    """Process-stable non-negative hash of a string (crc32) — the
    partitioning hash (farmhash analog, build_index.go:51). Any stable
    hash works; Python's builtin hash() is salted per process and must
    never be used as a shuffle key."""
    return zlib.crc32(s.encode())


def round_sql(x, d: int):
    """Round half away from zero — DuckDB's round(), NOT numpy's
    banker's rounding. Float columns compared against oracle SQL must go
    through this so the value-hash can't diverge on .5 boundaries."""
    x = np.asarray(x, dtype=np.float64)
    p = 10.0**d
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def topk_rounded(
    ids: np.ndarray, scores: np.ndarray, k: int, d: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic float top-k for oracle-compared outputs: order by
    (rounded score desc, id asc). Rounding first makes near-ties exactly
    equal, so the id tie-break decides identically here and in SQL."""
    r = round_sql(scores, d)
    order = np.lexsort((ids, -r))[:k]
    return ids[order], r[order]
