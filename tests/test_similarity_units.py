"""Unit tests for the similarity kernels: zero-copy batch matrix,
cross-block pair completeness (the r02 ADVICE repro), and probe guards."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from quickray.extras.similarity import (
    _batch_mat,
    _normalize,
    embedding_near_dup_pairs,
)


def _rand_emb_table(n: int, d: int, seed: int, perm: bool) -> pa.Table:
    rng = np.random.default_rng(seed)
    # a few clusters so the 0.4 threshold yields real pairs
    centers = rng.standard_normal((5, d))
    m = centers[rng.integers(0, 5, n)] + 0.3 * rng.standard_normal((n, d))
    ids = np.arange(n, dtype=np.int64)
    if perm:
        ids = rng.permutation(ids)
    return pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(m.astype(np.float32)), pa.list_(pa.float32())),
        }
    )


def _exact_pairs(tbl: pa.Table, threshold: float) -> set[tuple[int, int]]:
    m = _normalize(_batch_mat(tbl))
    ids = np.asarray(tbl["vec_id"], np.int64)
    sims = m @ m.T
    xi, yi = np.nonzero(np.triu(sims >= threshold, k=1))
    return {
        (min(ids[x], ids[y]), max(ids[x], ids[y])) for x, y in zip(xi, yi)
    }


def test_near_dup_pairs_complete_with_permuted_ids(ray_session):
    """The r02 ADVICE high finding: with vec_ids NOT sorted across
    blocks, cross-block pairs must still all be emitted (the old
    ids1 < ids2 mask dropped them)."""
    tbl = _rand_emb_table(120, 8, seed=3, perm=True)
    expect = _exact_pairs(tbl, 0.4)
    assert len(expect) > 10  # non-trivial fixture
    got = embedding_near_dup_pairs(
        rd.from_arrow(tbl), threshold=0.4, target_blocks=4
    )
    got_pairs = set(
        zip(np.asarray(got["a"], np.int64), np.asarray(got["b"], np.int64))
    )
    assert got_pairs == expect
    # canonical order + no duplicates
    a = np.asarray(got["a"], np.int64)
    b = np.asarray(got["b"], np.int64)
    assert (a < b).all()
    assert len(got_pairs) == len(a)


def test_lsh_pathological_identical_embeddings_bounded(ray_session):
    """One degenerate bucket of thousands of IDENTICAL embeddings (every
    band key collides) must NOT build the m x m cosine matrix: the
    signature-digest sub-grouping emits star pairs to the min vec_id —
    O(n) pairs, identical in every band so the cross-band dedup
    collapses them — and clustering still connects the whole family."""
    from quickray.extras.dedup import connected_components
    from quickray.extras.similarity import lsh_near_dup_pairs

    n = 6000
    v = np.array([0.3, -1.2, 0.7, 2.0], np.float32)
    emb = np.tile(v, (n, 1))
    # a few distinct vectors too: under-cap buckets keep the exact path
    rng = np.random.default_rng(5)
    extra = rng.standard_normal((20, 4)).astype(np.float32)
    mat = np.vstack([emb, extra])
    ids = np.arange(len(mat), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl).repartition(8)
    pairs = lsh_near_dup_pairs(
        ds, threshold=0.99, n_planes=16, bands=4, bucket_cap=512
    ).to_pandas()
    star = pairs[(pairs["a"] == 0) & (pairs["b"] < n)]
    # every identical-family member reaches the hub, each pair once
    assert len(star) == n - 1
    assert (star["cosine"] == 1.0).all()
    # bounded: no m^2 blowup (identical family contributes only stars)
    assert len(pairs) < n + 400
    clusters = connected_components(
        rd.from_arrow(
            pa.table(
                {
                    "a": pa.array(pairs["a"].to_numpy(np.int64)),
                    "b": pa.array(pairs["b"].to_numpy(np.int64)),
                }
            )
        )
    ).to_pandas()
    fam = clusters[clusters["doc_id"] < n]
    assert len(fam) == n
    assert (fam["cluster_id"] == 0).all()


def test_batch_mat_zero_copy_paths():
    m = np.arange(12, dtype=np.float64).reshape(4, 3)
    # variable-size list<double>
    t1 = pa.table(
        {"vec_id": pa.array(range(4)), "embedding": pa.array(list(m))}
    )
    np.testing.assert_array_equal(_batch_mat(t1), m)
    # sliced (non-zero offset) view must respect offsets
    np.testing.assert_array_equal(_batch_mat(t1.slice(1, 2)), m[1:3])
    # float32 storage upcasts
    t2 = pa.table(
        {"embedding": pa.array(list(m.astype(np.float32)), pa.list_(pa.float32()))}
    )
    np.testing.assert_array_equal(_batch_mat(t2), m)
    # fixed-size list
    t3 = pa.table(
        {"embedding": pa.array(list(m), pa.list_(pa.float64(), 3))}
    )
    np.testing.assert_array_equal(_batch_mat(t3), m)
    # ragged input rejected
    t4 = pa.table({"embedding": pa.array([[1.0, 2.0], [3.0]])})
    with pytest.raises(ValueError, match="ragged"):
        _batch_mat(t4)
    # null row rejected
    t5 = pa.table({"embedding": pa.array([[1.0, 2.0], None])})
    with pytest.raises(ValueError, match="null"):
        _batch_mat(t5)


def test_fixed_bytes_null_key_clear_error():
    from quickray.tokenize import _fixed_bytes

    arr = pa.array(["ok", None, "x"], pa.string())
    with pytest.raises(ValueError, match="null key"):
        _fixed_bytes(arr, 4)


def test_top_users_empty_events(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from quickray.pipelines import top_users_by_value

    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "value": pa.array([], pa.float64()),
            "props": pa.array([], pa.string()),
        }
    )
    pq.write_table(empty, str(tmp_path / "events.parquet"))
    out = top_users_by_value(str(tmp_path))
    assert out.num_rows == 0
    assert out.column_names == ["user_id", "n", "vsum"]


def test_ivf_persisted_index(tmp_path, ray_session):
    """Build/serve split: index built once (meta marker), queries read
    only probed cell partitions, rebuild with same params is a no-op,
    recall at full probe equals brute force."""
    import os
    import time

    from quickray.extras.similarity import (
        brute_force_topk,
        ivf_build,
        ivf_probed_fraction,
        ivf_query,
    )

    tbl = _rand_emb_table(400, 12, seed=9, perm=True)
    ds = rd.from_arrow(tbl)
    idx = str(tmp_path / "ivf")
    meta = ivf_build(ds, idx, nlist=8, sample_rows=256, fingerprint="t1")
    assert meta["n_rows"] == 400
    assert os.path.exists(os.path.join(idx, "centroids.npy"))
    # every row landed in exactly one cell partition
    import pyarrow.dataset as pads

    cells = pads.dataset(os.path.join(idx, "cells"), format="parquet",
                         partitioning="hive")
    assert cells.count_rows() == 400
    # rebuild with identical params: no-op (meta returned, no re-write)
    t0 = time.time()
    meta2 = ivf_build(ds, idx, nlist=8, sample_rows=256, fingerprint="t1")
    assert meta2 == meta and time.time() - t0 < 1.0
    # partition pruning is real: a low-nprobe query reads < half the bytes
    qv = _batch_mat(tbl)[3]
    frac = ivf_probed_fraction(idx, qv, nprobe=2)
    assert 0 < frac < 0.75
    # full probe == exact brute force (rank-identical)
    exact = brute_force_topk(ds, qv, k=10)
    full = ivf_query(idx, qv, k=10, nprobe=8)
    assert np.array_equal(
        np.asarray(full["vec_id"]), np.asarray(exact["vec_id"])
    )
    # approximate probe returns a subset-quality result: k rows, sorted
    approx = ivf_query(idx, qv, k=10, nprobe=2)
    assert approx.num_rows == 10
    sc = np.asarray(approx["cosine"])
    assert (np.diff(sc) <= 0).all()
    # changed fingerprint invalidates and rebuilds
    meta3 = ivf_build(ds, idx, nlist=8, sample_rows=256, fingerprint="t2")
    assert meta3["fingerprint"] == "t2"


def test_ivf_engine_warm_serving(tmp_path, ray_session):
    """IVFEngine answers identically to ivf_query at every nprobe, its
    batch __call__ form matches per-query results, and the LRU cell
    cache evicts without changing answers."""
    from quickray.extras.similarity import IVFEngine, ivf_build, ivf_query

    tbl = _rand_emb_table(200, 16, seed=11, perm=False)
    ds = rd.from_arrow(tbl).repartition(4)
    idx = str(tmp_path / "ivf")
    ivf_build(ds, idx, nlist=8, sample_rows=256, fingerprint="w1")

    eng = IVFEngine(idx, k=10, nprobe=2)
    qm = _batch_mat(tbl)
    for nprobe in (1, 2, 8):
        for qi in (0, 3, 7):
            cold = ivf_query(idx, qm[qi], k=10, nprobe=nprobe)
            warm = eng.query(qm[qi], nprobe=nprobe)
            assert np.array_equal(
                np.asarray(warm["vec_id"]), np.asarray(cold["vec_id"])
            ), (nprobe, qi)
            assert np.allclose(
                np.asarray(warm["cosine"]), np.asarray(cold["cosine"])
            )

    # batch form: one row per (query_id, embedding)
    qb = pa.table(
        {
            "query_id": pa.array([0, 3], pa.int64()),
            "embedding": tbl["embedding"].take([0, 3]),
        }
    )
    out = eng(qb)
    for qid in (0, 3):
        got = out.filter(
            pa.compute.equal(out["query_id"], pa.scalar(qid, pa.int64()))
        )
        exp = eng.query(qm[qid])
        assert np.array_equal(np.asarray(got["vec_id"]), np.asarray(exp["vec_id"]))

    # a cache of 1 cell forces constant eviction; answers are unchanged
    tiny = IVFEngine(idx, k=10, nprobe=8, cache_cells=1)
    full = tiny.query(qm[5])
    ref = ivf_query(idx, qm[5], k=10, nprobe=8)
    assert len(tiny._cells) == 1
    assert np.array_equal(np.asarray(full["vec_id"]), np.asarray(ref["vec_id"]))
