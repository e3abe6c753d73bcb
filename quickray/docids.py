"""Deterministic dense doc_id assignment (SURVEY.md §7.3).

Replaces the reference's per-worker atomic counter (indexer.go:82),
which makes DocIds depend on worker count and arrival order. Here
``doc_id`` is the dense rank of ``(repo, path)`` in lexicographic order:

1. ``ds.sort(["repo", "path"])`` — the one global sort we accept; it is
   a Ray Data range-partition shuffle and also the step that fixes the
   partitioning for everything downstream.
2. one metadata-only pass collects (first_key, row_count) per sorted
   block — a few bytes per block, folded to per-block offsets by a
   driver-side prefix sum;
3. a second vectorized pass stamps ``offset + arange(n)`` per block.

Deterministic at any parallelism ⇒ identical indexes (and therefore
rank-identical query results) at N and 4N workers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def assign_doc_ids(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    srt = ds.sort(["repo", "path"]).materialize()

    def block_meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"repo": pa.array([], pa.string()),
                             "path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table(
            {
                "repo": [t["repo"][0].as_py()],
                "path": [t["path"][0].as_py()],
                "n": [t.num_rows],
            }
        )

    meta = srt.map_batches(block_meta, batch_size=None, batch_format="pyarrow").take_all()
    meta.sort(key=lambda r: (r["repo"], r["path"]))
    offsets: dict[tuple[str, str], int] = {}
    acc = 0
    for r in meta:
        offsets[(r["repo"], r["path"])] = acc
        acc += r["n"]

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("doc_id", pa.array([], pa.int64()))
        off = offsets[(t["repo"][0].as_py(), t["path"][0].as_py())]
        ids = pa.array(off + np.arange(t.num_rows, dtype=np.int64))
        return t.append_column("doc_id", ids)

    return srt.map_batches(stamp, batch_size=None, batch_format="pyarrow")


def doc_ids_py(repos: list[str], paths: list[str]) -> np.ndarray:
    """Oracle-side equivalent: dense rank of (repo, path) rows."""
    order = sorted(range(len(repos)), key=lambda i: (repos[i], paths[i]))
    out = np.empty(len(repos), dtype=np.int64)
    for rank, i in enumerate(order):
        out[i] = rank
    return out
