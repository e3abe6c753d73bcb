"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k; the query matrix is broadcast
  once (ray.put), each batch does one numpy matmul, per-batch partial
  top-k shrinks the reduce (never ships full similarity columns).
- ivf_topk: IVF-style scale path — deterministic k-means-lite centroids
  from a driver-side sample, batches score only the nprobe closest
  cells' rows. Approximate by construction (recall < 1 possible).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _batch_mat(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=-1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _BruteScorer:
    """Actor-pool stage: the normalized query vector is fetched from the
    object store once per actor, each batch emits its local top-k."""

    def __init__(self, query_ref, k: int, ndigits: int | None):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k
        self.ndigits = ndigits

    def __call__(self, batch: pa.Table) -> pa.Table:
        from quickray.util import round_sql

        m = _normalize(_batch_mat(batch))
        sims = m @ self.q
        if self.ndigits is not None:
            sims = round_sql(sims, self.ndigits)
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        if len(ids) > self.k:
            part = np.argpartition(-sims, self.k - 1)[: self.k]
            ids, sims = ids[part], sims[part]
        return pa.table(
            {"vec_id": pa.array(ids), "cosine": pa.array(sims, pa.float64())}
        )


def brute_force_topk(
    ds: "rd.Dataset", query_vec, k: int = 10, ndigits: int | None = 4
) -> pa.Table:
    """Exact cosine top-k, deterministic tie-break (-cosine, vec_id)."""
    ref = ray.put(np.asarray(query_vec, dtype=np.float64))
    partials = ds.map_batches(
        _BruteScorer,
        fn_constructor_kwargs={"query_ref": ref, "k": k, "ndigits": ndigits},
        batch_format="pyarrow",
        concurrency=2,
    ).take_all()
    ids = np.array([r["vec_id"] for r in partials], dtype=np.int64)
    sims = np.array([r["cosine"] for r in partials], dtype=np.float64)
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {"vec_id": pa.array(ids[order]), "cosine": pa.array(sims[order])}
    )


def embedding_near_dup_pairs(
    ds: "rd.Dataset", threshold: float = 0.4, ndigits: int = 4
) -> pa.Table:
    """Embedding-cosine near-duplicate pairs: all (a, b), a < b, with
    cosine >= threshold. The full normalized matrix is broadcast once
    (ray.put); each batch computes a block x N matmul against it — the
    blocked form of the N^2 similarity join. Scale path: route batches
    through IVF/LSH cells first (ivf_topk's assignment) so only
    same-cell pairs are scored; the blocked matmul here is the exact
    small/medium-N baseline."""
    tbl = pa.Table.from_pylist(ds.take_all())
    all_ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    mat_ref = ray.put((_normalize(_batch_mat(tbl)), all_ids))

    def block_pairs(batch: pa.Table) -> pa.Table:
        from quickray.util import round_sql

        mat, ids_all = ray.get(mat_ref)
        m = _normalize(_batch_mat(batch))
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        sims = m @ mat.T
        ai, bi = np.nonzero(
            (sims >= threshold) & (ids[:, None] < ids_all[None, :])
        )
        return pa.table(
            {
                "a": pa.array(ids[ai]),
                "b": pa.array(ids_all[bi]),
                "cosine": pa.array(round_sql(sims[ai, bi], ndigits)),
            }
        )

    parts = ds.map_batches(block_pairs, batch_format="pyarrow").take_all()
    a = np.array([r["a"] for r in parts], dtype=np.int64)
    b = np.array([r["b"] for r in parts], dtype=np.int64)
    c = np.array([r["cosine"] for r in parts], dtype=np.float64)
    order = np.lexsort((b, a))
    return pa.table(
        {"a": pa.array(a[order]), "b": pa.array(b[order]),
         "cosine": pa.array(c[order])}
    )


def lsh_near_dup_pairs(
    ds: "rd.Dataset",
    threshold: float = 0.4,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 11,
    ndigits: int = 4,
) -> pa.Table:
    """Random-hyperplane LSH near-dup: sign-bit signatures -> banded
    bucket groupby -> exact cosine verify inside buckets only. The
    scale path for the N^2 similarity join: vectors meet exact scoring
    only when a band of their sign signature collides (collision
    probability (1 - theta/pi)^rows_per_band per band). Recall < 1 by
    construction; every emitted pair is exact-verified >= threshold."""
    rows_per_band = n_planes // bands
    tbl = pa.Table.from_pylist(ds.take_all())
    all_ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    mat = _normalize(_batch_mat(tbl))
    o = np.argsort(all_ids)  # searchsorted side must be sorted
    all_ids, mat = all_ids[o], mat[o]
    side_ref = ray.put((mat, all_ids))
    dim = mat.shape[1]
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    planes_ref = ray.put(planes)

    def bucket_rows(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        m = _normalize(_batch_mat(batch))
        bits = (m @ pl) > 0  # (n, n_planes)
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        out_id, out_band, out_key = [], [], []
        for b in range(bands):
            chunk = bits[:, b * rows_per_band : (b + 1) * rows_per_band]
            keys = chunk @ (1 << np.arange(rows_per_band))
            out_id.extend(ids.tolist())
            out_band.extend([b] * len(ids))
            out_key.extend(keys.tolist())
        return pa.table(
            {
                "vec_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int64()),
                "key": pa.array(out_key, pa.int64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        from quickray.util import round_sql

        ids = np.unique(np.asarray(group["vec_id"], dtype=np.int64))
        if len(ids) < 2:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        mat_all, ids_all = ray.get(side_ref)
        pos = np.searchsorted(ids_all, ids)
        sub = mat_all[pos]
        sims = sub @ sub.T
        ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
        return pa.table(
            {
                "a": pa.array(ids[ai]),
                "b": pa.array(ids[bi]),
                "cosine": pa.array(round_sql(sims[ai, bi], ndigits)),
            }
        )

    cand = (
        ds.map_batches(bucket_rows, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    parts = cand.take_all()
    if not parts:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
    a = np.array([r["a"] for r in parts], dtype=np.int64)
    b = np.array([r["b"] for r in parts], dtype=np.int64)
    c = np.array([r["cosine"] for r in parts], dtype=np.float64)
    uniq, idx = np.unique(a * (1 << 32) + b, return_index=True)  # band dedup
    order = idx[np.lexsort((b[idx], a[idx]))]
    return pa.table(
        {"a": pa.array(a[order]), "b": pa.array(b[order]),
         "cosine": pa.array(c[order])}
    )


def _kmeans_lite(sample: np.ndarray, nlist: int, iters: int = 5) -> np.ndarray:
    """Deterministic k-means on a sample: first-nlist init, Lloyd iters."""
    centroids = sample[:nlist].copy()
    for _ in range(iters):
        d = _normalize(sample) @ _normalize(centroids).T
        assign = np.argmax(d, axis=1)
        for c in range(nlist):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_topk(
    ds: "rd.Dataset",
    query_vec,
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    sample_rows: int = 512,
) -> pa.Table:
    """IVF-bucketed approximate top-k: rows whose nearest centroid is not
    among the query's nprobe cells are never scored."""
    sample = _batch_mat(
        pa.Table.from_pylist(ds.limit(sample_rows).take_all())
    )
    centroids = _kmeans_lite(sample, nlist)
    cn = _normalize(centroids)
    q = _normalize(np.asarray(query_vec, dtype=np.float64))
    probe = set(np.argsort(-(cn @ q))[:nprobe].tolist())
    cent_ref = ray.put(centroids)

    class CellScorer:
        def __init__(self):
            self.cn = _normalize(ray.get(cent_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_mat(batch))
            assign = np.argmax(m @ self.cn.T, axis=1)
            from quickray.util import round_sql

            keep = np.isin(assign, list(probe))
            ids = np.asarray(batch["vec_id"], dtype=np.int64)[keep]
            sims = m[keep] @ q
            return pa.table(
                {"vec_id": pa.array(ids), "cosine": pa.array(round_sql(sims, 4))}
            )

    partials = ds.map_batches(CellScorer, batch_format="pyarrow", concurrency=2).take_all()
    ids = np.array([r["vec_id"] for r in partials], dtype=np.int64)
    sims = np.array([r["cosine"] for r in partials], dtype=np.float64)
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {"vec_id": pa.array(ids[order]), "cosine": pa.array(sims[order])}
    )
