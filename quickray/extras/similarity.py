"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k; the query matrix is broadcast
  once (ray.put), each batch does one numpy matmul, per-batch partial
  top-k (keeping k-th-value ties) shrinks the reduce.
- embedding_near_dup_pairs: exact all-pairs similarity join, blocked —
  dataset blocks live in the OBJECT STORE (to_arrow_refs) and one Ray
  task scores each block pair. Quadratic in blocks by nature; the
  approximate scale path is lsh_near_dup_pairs.
- lsh_near_dup_pairs: random-hyperplane LSH — each bucket group
  carries ITS OWN vectors through the groupby, so in-bucket exact
  verification reads no global side table. Fully streaming.
- ivf_topk: IVF scale path — centroids trained on a deterministic
  corpus-wide strided sample, batches score only the nprobe closest
  cells' rows.

Nothing here materializes the full dataset on the driver; every
`take*` is bounded (top-k partials, samples, or the final pair set).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _batch_mat(batch: pa.Table) -> np.ndarray:
    """embedding column -> (n, d) float64 matrix, reshaped ZERO-COPY
    from the Arrow list values buffer. The previous to_pylist here
    allocated n x d PyFloat objects per batch in every similarity
    stage; the flat-values view costs one buffer wrap (+ one cast when
    the storage type isn't float64)."""
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), np.float64)
    if col.null_count:
        raise ValueError("embedding column contains null rows")
    flat = col.flatten()  # offset-safe values for exactly these n lists
    if len(flat) % n:
        raise ValueError("ragged embedding column (unequal list lengths)")
    d = len(flat) // n
    if not pa.types.is_fixed_size_list(col.type):
        import pyarrow.compute as pc

        lens = pc.list_value_length(col)
        if pc.min(lens).as_py() != d or pc.max(lens).as_py() != d:
            raise ValueError("ragged embedding column (unequal list lengths)")
    m = np.asarray(flat)  # zero-copy for numeric value buffers
    return m.reshape(n, d).astype(np.float64, copy=False)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=-1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _BruteScorer:
    """Actor-pool stage: the normalized query vector is fetched from the
    object store once per actor, each batch emits its local top-k.
    The partial keeps ALL rows tied with the k-th (rounded) value so a
    rounded tie straddling a batch boundary can never drop the smaller
    vec_id the (-score, vec_id) total order would keep."""

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
            kth = np.partition(sims, len(sims) - self.k)[len(sims) - self.k]
            keep = sims >= kth  # k-th value + all ties
            ids, sims = ids[keep], sims[keep]
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
    ).take_all()  # bounded: <= k + ties per input block
    ids = np.array([r["vec_id"] for r in partials], dtype=np.int64)
    sims = np.array([r["cosine"] for r in partials], dtype=np.float64)
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {"vec_id": pa.array(ids[order]), "cosine": pa.array(sims[order])}
    )


@ray.remote
def _block_pair_sims(
    t1: pa.Table, t2: pa.Table, threshold: float, ndigits: int,
    same_block: bool,
) -> pa.Table:
    """Score one block pair; emits each unordered hit once as
    (a=min(id), b=max(id), cosine >= threshold). Blocks arrive as
    object-store refs (zero-copy deref inside the task).

    Pair selection is POSITIONAL, never id-ordered: within one block
    the strict upper triangle, across blocks every hit (the two blocks'
    id sets are disjoint after repartition). An `ids1 < ids2` mask here
    silently dropped cross-block pairs whenever vec_ids were not
    globally sorted across blocks."""
    from quickray.util import round_sql

    if t1.num_rows == 0 or t2.num_rows == 0:  # repartition can emit empties
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
    m1, ids1 = _normalize(_batch_mat(t1)), np.asarray(t1["vec_id"], np.int64)
    m2, ids2 = _normalize(_batch_mat(t2)), np.asarray(t2["vec_id"], np.int64)
    sims = m1 @ m2.T
    hit = sims >= threshold
    if same_block:
        hit = np.triu(hit, k=1)
    ai, bi = np.nonzero(hit)
    a, b = ids1[ai], ids2[bi]
    swap = a > b
    a[swap], b[swap] = b[swap], a[swap].copy()
    return pa.table(
        {
            "a": pa.array(a),
            "b": pa.array(b),
            "cosine": pa.array(round_sql(sims[ai, bi], ndigits)),
        }
    )


class _BatchBruteScorer:
    """Actor-pool stage for BATCHED queries: the (m x d) query matrix
    is broadcast once (ray.put, fetched per actor); each data batch
    does ONE (n x d)@(d x m) matmul and emits per-query partial top-k
    with k-th-value ties kept."""

    def __init__(self, query_ref, k: int, ndigits: int | None):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64)).T  # (d, m)
        self.k = k
        self.ndigits = ndigits

    def __call__(self, batch: pa.Table) -> pa.Table:
        from quickray.util import round_sql

        m = _normalize(_batch_mat(batch))
        sims = m @ self.q  # (n, m)
        if self.ndigits is not None:
            sims = round_sql(sims, self.ndigits)
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            sel = np.arange(len(ids))
            if len(ids) > self.k:
                kth = np.partition(col, len(col) - self.k)[len(col) - self.k]
                sel = np.flatnonzero(col >= kth)
            out_q.append(np.full(len(sel), qi, np.int64))
            out_id.append(ids[sel])
            out_s.append(col[sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id)),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def brute_force_topk_batch(
    ds: "rd.Dataset", query_vecs, k: int = 10, ndigits: int | None = 4
) -> pa.Table:
    """Exact cosine top-k for a BATCH of query vectors in one dataset
    pass — the production shape for bulk ANN (one broadcast query
    matrix, one matmul per data batch). Returns (query_id, vec_id,
    cosine) with per-query deterministic (-cosine, vec_id) order."""
    qm = np.asarray(query_vecs, dtype=np.float64)
    ref = ray.put(qm)
    partials = ds.map_batches(
        _BatchBruteScorer,
        fn_constructor_kwargs={"query_ref": ref, "k": k, "ndigits": ndigits},
        batch_format="pyarrow",
        concurrency=2,
    ).take_all()  # bounded: <= n_queries * (k + ties) per input block
    qs = np.array([r["query_id"] for r in partials], dtype=np.int64)
    ids = np.array([r["vec_id"] for r in partials], dtype=np.int64)
    sims = np.array([r["cosine"] for r in partials], dtype=np.float64)
    out_q, out_id, out_s = [], [], []
    for qi in range(qm.shape[0]):
        sel = qs == qi
        order = np.lexsort((ids[sel], -sims[sel]))[:k]
        out_q.append(np.full(len(order), qi, np.int64))
        out_id.append(ids[sel][order])
        out_s.append(sims[sel][order])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_id)),
            "cosine": pa.array(np.concatenate(out_s)),
        }
    )


def embedding_near_dup_pairs(
    ds: "rd.Dataset", threshold: float = 0.4, ndigits: int = 4,
    target_blocks: int = 16,
) -> pa.Table:
    """Embedding-cosine near-duplicate pairs: all (a, b), a < b, with
    cosine >= threshold — the EXACT all-pairs join. Blocked execution:
    the dataset is materialized to the object store as ~target_blocks
    Arrow blocks and each of the B(B+1)/2 block pairs is scored by one
    Ray task holding only its two blocks. The driver touches block REFS
    and the (bounded) near-dup pair output, never the embedding matrix.
    O(N^2) work is inherent to the exact join; lsh_near_dup_pairs is
    the sub-quadratic scale path."""
    refs = [
        r
        for r in ds.repartition(target_blocks).to_arrow_refs()
    ]
    futures = [
        _block_pair_sims.remote(refs[i], refs[j], threshold, ndigits, i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    parts = [t for t in ray.get(futures) if t.num_rows]
    if not parts:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
    out = pa.concat_tables(parts)
    a = np.asarray(out["a"], np.int64)
    b = np.asarray(out["b"], np.int64)
    c = np.asarray(out["cosine"], np.float64)
    order = np.lexsort((b, a))
    return pa.table(
        {"a": pa.array(a[order]), "b": pa.array(b[order]),
         "cosine": pa.array(c[order])}
    )


def _embedding_dim(ds: "rd.Dataset") -> int:
    row = ds.take(1)[0]  # bounded
    return len(row["embedding"])


def lsh_near_dup_pairs(
    ds: "rd.Dataset",
    threshold: float = 0.4,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 11,
    ndigits: int = 4,
    bucket_cap: int = 512,
) -> "rd.Dataset":
    """Random-hyperplane LSH near-dup: sign-bit signatures -> banded
    bucket groupby -> exact cosine verify INSIDE each bucket. Each
    bucket row carries its vector through the groupby (bands x data
    shuffle volume), so in-bucket verification needs no global side
    table — the property that lets this run at 100 TB. Recall < 1 by
    construction (collision prob (1 - theta/pi)^rows_per_band per
    band); every emitted pair is exact-verified >= threshold. Raise
    `bands` toward n_planes for recall ~1 on bounded inputs.

    Buckets above ``bucket_cap`` members (degenerate content: many
    identical / near-identical / zero embeddings sharing a band key)
    must NOT build the m x m cosine matrix (a 100k-member bucket would
    be an 80 GB float64 allocation). They sub-group by the FULL
    n_planes sign-bit digest — the same defense as the MinHash path
    (dedup._pairs_from_ids): star candidate pairs within each
    identical-signature sub-group plus rep-to-rep pairs across
    sub-groups, each candidate then exact-cosine-verified, so pair
    count is O(m + reps^2) and memory stays bounded. Residual recall
    loss (a member whose star edge fails verify but that matches some
    non-rep member) is the documented tradeoff, logged by the helper."""
    rows_per_band = n_planes // bands
    dim = _embedding_dim(ds)
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    planes_ref = ray.put(planes)

    def bucket_rows(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        m = _normalize(_batch_mat(batch))
        bits = (m @ pl) > 0  # (n, n_planes)
        vec_id = batch["vec_id"]
        if isinstance(vec_id, pa.ChunkedArray):
            vec_id = vec_id.combine_chunks()
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        tabs = []
        for b in range(bands):
            chunk = bits[:, b * rows_per_band : (b + 1) * rows_per_band]
            keys = chunk @ (1 << np.arange(rows_per_band))
            tabs.append(
                pa.table(
                    {
                        "band": pa.array(np.full(len(keys), b, np.int64)),
                        "key": pa.array(keys.astype(np.int64)),
                        "vec_id": vec_id,
                        "embedding": emb,
                    }
                )
            )
        return pa.concat_tables(tabs)

    def _sig_digest(sub: np.ndarray) -> np.ndarray:
        """Full n_planes sign-bit digest per row, recomputed from the
        vectors ONLY for oversize buckets (rare degenerate case) — not
        shipped as a column through the corpus x bands shuffle (8
        bytes/row/band of always-on payload for a path that almost
        never runs). Signs of the normalized rows equal signs of the
        raw rows (norms are positive), so the digest is stable."""
        pl = ray.get(planes_ref)
        bits = (sub @ pl) > 0
        packed = np.packbits(bits, axis=1)
        sig = np.zeros(len(packed), np.uint64)
        mult = np.uint64(0x100000001B3)
        for col in packed.T:
            sig = sig * mult + col  # u64 wraparound: stable FNV combine
        return sig.view(np.int64)

    def bucket_pairs_block(t: pa.Table) -> pa.Table:
        """One SORTED block = whole buckets (Ray's sort never splits
        equal keys across blocks — the invariant map_groups itself
        relies on, ray/data/grouped_data.py:225-243). Boundary-detect
        buckets with one np.diff and run the exact-cosine verify only
        on multi-member buckets — no per-singleton-bucket Python UDF
        call (buckets are ~all singletons: corpus x bands groups)."""
        from quickray.util import round_sql

        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
        n = t.num_rows
        if n == 0:
            return empty
        from quickray.util import run_starts

        band = np.asarray(t["band"], dtype=np.int64)
        key = np.asarray(t["key"], dtype=np.int64)
        starts = np.append(run_starts(band, key), n)
        lens = np.diff(starts)
        multi = np.flatnonzero(lens >= 2)
        if not len(multi):
            return empty
        ids = np.asarray(t["vec_id"], dtype=np.int64)
        mat = _normalize(_batch_mat(t))  # whole block, one pass
        outs_a, outs_b, outs_c = [], [], []
        for gi in multi:
            lo, hi = starts[gi], starts[gi + 1]
            m = hi - lo
            if m <= bucket_cap:
                sims = mat[lo:hi] @ mat[lo:hi].T
                xi, yi = np.nonzero(np.triu(sims >= threshold, k=1))
                if not len(xi):
                    continue
                cos = sims[xi, yi]
            else:
                # oversize bucket: signature-digest sub-grouping (the
                # MinHash defense, dedup._pairs_from_ids), then exact
                # cosine on just the O(m + reps^2) candidate pairs —
                # never the m x m matrix. Pass the VEC IDS (not local
                # row indices) so star hubs are the per-sub-group min
                # id, identical in every band — the cross-band pair
                # dedup (first_rows) then collapses the copies.
                from quickray.extras.dedup import _pairs_from_ids

                gids_all = ids[lo:hi]
                a_id, b_id = _pairs_from_ids(
                    gids_all, _sig_digest(mat[lo:hi]), cap=bucket_cap
                )
                if not len(a_id):
                    continue
                order = np.argsort(gids_all)
                xi = order[np.searchsorted(gids_all[order], a_id)]
                yi = order[np.searchsorted(gids_all[order], b_id)]
                cos = np.einsum(
                    "ij,ij->i", mat[lo:hi][xi], mat[lo:hi][yi]
                )
                keep = cos >= threshold
                if not keep.any():
                    continue
                xi, yi, cos = xi[keep], yi[keep], cos[keep]
            gids = ids[lo:hi]
            a, b = gids[xi], gids[yi]
            swap = a > b
            a[swap], b[swap] = b[swap], a[swap].copy()
            outs_a.append(a)
            outs_b.append(b)
            outs_c.append(round_sql(cos, ndigits))
        if not outs_a:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(outs_a)),
                "b": pa.array(np.concatenate(outs_b)),
                "cosine": pa.array(np.concatenate(outs_c)),
            }
        )

    cand = (
        ds.map_batches(bucket_rows, batch_format="pyarrow")
        .sort(["band", "key"])
        .map_batches(
            bucket_pairs_block, batch_format="pyarrow", batch_size=None
        )
    )

    def first_rows(t: pa.Table) -> pa.Table:
        # same pair found in several bands -> keep one; rows arrive
        # (a, b)-sorted, duplicates are adjacent runs (the cosine is
        # the same exact value in every copy, so which row survives is
        # immaterial — but run-starts are deterministic anyway). This
        # replaces a per-PAIR map_groups lambda (one Python call per
        # candidate pair at corpus scale).
        from quickray.util import run_starts

        n = t.num_rows
        if n == 0:
            return t
        a = np.asarray(t["a"], dtype=np.int64)
        b = np.asarray(t["b"], dtype=np.int64)
        return t.take(pa.array(run_starts(a, b)))

    # distributed dedup, blockwise-vectorized over the sorted pair list
    return cand.sort(["a", "b"]).map_batches(
        first_rows, batch_format="pyarrow", batch_size=None
    )


def _kmeans_lite(sample: np.ndarray, nlist: int, iters: int = 12) -> np.ndarray:
    """Deterministic spherical k-means on a sample: farthest-point
    (k-means++-style, deterministic) init + Lloyd iterations."""
    sn = _normalize(sample)
    picks = [0]
    d_min = 1.0 - sn @ sn[0]  # cosine distance to nearest chosen centroid
    for _ in range(1, min(nlist, len(sn))):
        nxt = int(np.argmax(d_min))
        picks.append(nxt)
        d_min = np.minimum(d_min, 1.0 - sn @ sn[nxt])
    centroids = sample[picks].copy()
    for _ in range(iters):
        d = sn @ _normalize(centroids).T
        assign = np.argmax(d, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def strided_sample(ds: "rd.Dataset", sample_rows: int) -> np.ndarray:
    """Deterministic corpus-wide sample: every block contributes a
    per-batch stride slice (NOT the first blocks only), collected
    bounded by ~sample_rows total."""
    total = ds.count()  # parquet metadata — no data read
    mod = max(1, total // max(1, sample_rows))

    def stride(t: pa.Table) -> pa.Table:
        return t.take(np.arange(0, t.num_rows, mod))

    rows = ds.map_batches(stride, batch_format="pyarrow").take_all()  # bounded
    tbl = pa.Table.from_pylist(rows)
    order = np.argsort(np.asarray(tbl["vec_id"], np.int64))
    return _batch_mat(tbl)[order]


def ivf_build(
    ds: "rd.Dataset",
    index_dir: str,
    nlist: int = 8,
    sample_rows: int = 512,
    fingerprint: str = "",
) -> dict:
    """Build the PERSISTED IVF index once — the build half of the
    build/serve split (same shape as the BM25 side's build.py segments
    vs engine.Index):

      1. train: spherical k-means on a deterministic corpus-wide
         strided sample (one bounded collect);
      2. assign: one broadcast-centroid map_batches pass stamps every
         row's nearest cell;
      3. write: parquet hive-partitioned by cell under cells/ +
         centroids.npy + meta.json.

    Queries then read ONLY their probed cells' partitions (ivf_query)
    — ~nprobe/nlist of the corpus bytes — instead of re-training and
    re-scanning every row per query. A completed build with matching
    (nlist, sample_rows, fingerprint) is a no-op; anything else is
    wiped and rebuilt."""
    import json
    import os
    import shutil

    meta_path = os.path.join(index_dir, "meta.json")
    want = {
        "nlist": nlist,
        "sample_rows": sample_rows,
        "fingerprint": fingerprint,
    }
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if {k: meta.get(k) for k in want} == want:
            return meta
    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(os.path.join(index_dir, "cells"), exist_ok=True)

    sample = strided_sample(ds, sample_rows)
    centroids = _kmeans_lite(sample, nlist)
    np.save(os.path.join(index_dir, "centroids.npy"), centroids)
    cent_ref = ray.put(centroids)

    def assign_cells(batch: pa.Table) -> pa.Table:
        cn = _normalize(ray.get(cent_ref))
        m = _normalize(_batch_mat(batch))
        cell = np.argmax(m @ cn.T, axis=1).astype(np.int64)
        return batch.append_column("cell", pa.array(cell))

    ds.map_batches(assign_cells, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "cells"), partition_cols=["cell"]
    )
    meta = dict(want, n_rows=int(ds.count()))
    with open(meta_path + ".tmp", "w") as f:  # meta.json last = build marker
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)
    return meta


def _ivf_probe(index_dir: str, query_vec, nprobe: int):
    import os

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(query_vec, dtype=np.float64))
    probe = set(np.argsort(-(_normalize(centroids) @ q))[:nprobe].tolist())
    return q, probe


def ivf_probed_fraction(index_dir: str, query_vec, nprobe: int) -> float:
    """Fraction of the index's cell-partition BYTES a query at this
    nprobe actually reads (the partition-pruning evidence bench
    reports)."""
    import glob
    import os

    _, probe = _ivf_probe(index_dir, query_vec, nprobe)
    total = probed = 0
    for f in glob.glob(os.path.join(index_dir, "cells", "**", "*.parquet"),
                       recursive=True):
        sz = os.path.getsize(f)
        total += sz
        cell = int(f.split("cell=")[1].split(os.sep)[0])
        if cell in probe:
            probed += sz
    return probed / max(1, total)


def ivf_query(
    index_dir: str,
    query_vec,
    k: int = 10,
    nprobe: int = 2,
    ndigits: int | None = 4,
) -> pa.Table:
    """Serve one query from the persisted IVF index: pick the nprobe
    closest centroids (tiny sidecar read), then scan ONLY those cells'
    parquet partitions (PathPartitionFilter directory pruning — the
    unprobed ~ (nlist-nprobe)/nlist of the corpus is never listed, let
    alone read) with the brute-force scorer."""
    import os

    from ray.data.datasource.partitioning import PathPartitionFilter

    q, probe = _ivf_probe(index_dir, query_vec, nprobe)
    pf = PathPartitionFilter.of(
        lambda kv, probe=probe: int(kv["cell"]) in probe, style="hive"
    )
    cells = rd.read_parquet(
        os.path.join(index_dir, "cells"),
        columns=["vec_id", "embedding"],
        partition_filter=pf,
    )
    ref = ray.put(q)
    partials = cells.map_batches(
        _BruteScorer,
        fn_constructor_kwargs={"query_ref": ref, "k": k, "ndigits": ndigits},
        batch_format="pyarrow",
        concurrency=2,
    ).take_all()  # bounded: <= k + ties per probed block
    ids = np.array([r["vec_id"] for r in partials], dtype=np.int64)
    sims = np.array([r["cosine"] for r in partials], dtype=np.float64)
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {"vec_id": pa.array(ids[order]), "cosine": pa.array(sims[order])}
    )


class IVFEngine:
    """WARM IVF serving — the serve half of the ivf_build/ivf_query
    split, analog of engine.Index's warm posting cache: centroids are
    loaded once per process/actor, and each probed cell is decoded into
    a normalized (ids, matrix) pair on first touch then LRU-cached, so
    repeat queries never re-read parquet. As an actor-pool stage
    (``map_batches(IVFEngine, fn_constructor_kwargs=...)`` over a
    (query_id, embedding) table) each actor ends up caching only the
    cells its queries probe. cache_cells is the per-actor budget —
    at scale size it to the worker heap via n_rows/nlist * d * 8 bytes
    per cell. Results are identical to ivf_query (same rounding and
    (-cosine, vec_id) tie order)."""

    def __init__(
        self, index_dir: str, k: int = 10, nprobe: int = 2,
        ndigits: int | None = 4, cache_cells: int = 64,
    ):
        import json
        import os
        from collections import OrderedDict

        self.index_dir = index_dir
        self.k, self.nprobe, self.ndigits = k, nprobe, ndigits
        self.centroids = _normalize(
            np.load(os.path.join(index_dir, "centroids.npy"))
        )
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self._cells: "OrderedDict[int, tuple]" = OrderedDict()
        self._cap = cache_cells

    def _cell(self, c: int):
        if c in self._cells:
            self._cells.move_to_end(c)
            return self._cells[c]
        import glob
        import os

        import pyarrow.parquet as pq

        files = sorted(
            glob.glob(
                os.path.join(self.index_dir, "cells", f"cell={c}", "*.parquet")
            )
        )
        if files:
            t = pa.concat_tables(
                pq.read_table(f, columns=["vec_id", "embedding"]) for f in files
            )
            ids = np.asarray(t["vec_id"].combine_chunks(), dtype=np.int64)
            m = _normalize(_batch_mat(t))
        else:
            ids, m = np.empty(0, np.int64), np.empty((0, 0), np.float64)
        self._cells[c] = (ids, m)
        if len(self._cells) > self._cap:
            self._cells.popitem(last=False)
        return self._cells[c]

    def query(
        self, query_vec, k: int | None = None, nprobe: int | None = None
    ) -> pa.Table:
        from quickray.util import round_sql

        k = self.k if k is None else k
        nprobe = self.nprobe if nprobe is None else nprobe
        q = _normalize(np.asarray(query_vec, dtype=np.float64))
        probe = np.argsort(-(self.centroids @ q))[:nprobe]
        all_ids, all_sims = [], []
        for c in probe.tolist():
            ids, m = self._cell(int(c))
            if len(ids) == 0:
                continue
            sims = m @ q
            if self.ndigits is not None:
                sims = round_sql(sims, self.ndigits)
            all_ids.append(ids)
            all_sims.append(sims)
        if not all_ids:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        ids = np.concatenate(all_ids)
        sims = np.concatenate(all_sims)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {"vec_id": pa.array(ids[order]), "cosine": pa.array(sims[order])}
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Actor-pool batch form: (query_id, embedding) rows in, top-k
        (query_id, vec_id, cosine) rows out. The per-query loop is over
        QUERIES (each a cached-cell matmul), not corpus rows."""
        qm = _batch_mat(batch)
        qids = np.asarray(batch["query_id"], dtype=np.int64)
        parts = []
        for qid, vec in zip(qids.tolist(), qm):
            t = self.query(vec)
            parts.append(
                t.append_column(
                    "query_id", pa.array(np.full(len(t), qid, np.int64))
                )
            )
        if not parts:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64()),
                 "query_id": pa.array([], pa.int64())}
            )
        return pa.concat_tables(parts)


def ivf_topk(
    ds: "rd.Dataset",
    query_vec,
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    sample_rows: int = 512,
    index_dir: str | None = None,
    fingerprint: str = "",
) -> pa.Table:
    """Build-once-then-serve convenience: ensures the persisted IVF
    index exists at index_dir (a scratch dir if not given) and answers
    the query from its probed cells. Callers issuing many queries
    should call ivf_build once and ivf_query per query."""
    if index_dir is None:
        import tempfile

        index_dir = tempfile.mkdtemp(prefix="ivf_", dir="/tmp")
    ivf_build(ds, index_dir, nlist=nlist, sample_rows=sample_rows,
              fingerprint=fingerprint)
    return ivf_query(index_dir, query_vec, k=k, nprobe=nprobe)


def ivf_recall_at_k(
    ds: "rd.Dataset", query_vecs: list, k: int = 10,
    nlist: int = 8, nprobe: int = 3, index_dir: str | None = None,
) -> float:
    """Mean recall@k of the persisted-IVF query path vs
    brute_force_topk over query_vecs (the index is built ONCE)."""
    if index_dir is None:
        import tempfile

        index_dir = tempfile.mkdtemp(prefix="ivf_", dir="/tmp")
    ivf_build(ds, index_dir, nlist=nlist)
    hits = 0
    for qv in query_vecs:
        exact = set(np.asarray(brute_force_topk(ds, qv, k)["vec_id"]).tolist())
        approx = set(
            np.asarray(ivf_query(index_dir, qv, k, nprobe=nprobe)["vec_id"]).tolist()
        )
        hits += len(exact & approx) / max(1, len(exact))
    return hits / max(1, len(query_vecs))
