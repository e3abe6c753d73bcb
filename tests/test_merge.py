"""Property tests for the segmented codec helpers and the
partition-level run merges (quickray/merge.py) — the salted-merge
correctness requirement of SURVEY §7.8(c): no lost, duplicated or
misordered postings for any batch split / salt layout / arrival order.
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from quickray.codec import (
    segmented_cumsum,
    segmented_delta_encode,
    split_stream,
    varint_decode,
    varint_encode_sizes,
)
from quickray.merge import make_final_merge, make_level1_merge
from quickray.schema import RUN_SCHEMA
from quickray.tokenize import Tokenizer


# --------------------------------------------------------- codec helpers
@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 10**9), min_size=1, max_size=30, unique=True),
        min_size=1,
        max_size=12,
    )
)
def test_segmented_delta_roundtrip(segments):
    segments = [sorted(s) for s in segments]
    values = np.array([v for s in segments for v in s], dtype=np.int64)
    starts = np.cumsum([0] + [len(s) for s in segments[:-1]]).astype(np.int64)
    deltas = segmented_delta_encode(values, starts)
    assert np.array_equal(segmented_cumsum(deltas, starts), values)


def test_segmented_delta_rejects_dup_within_segment():
    with pytest.raises(ValueError):
        segmented_delta_encode(
            np.array([1, 5, 5], dtype=np.int64), np.array([0], dtype=np.int64)
        )
    # but a repeat at a segment boundary is fine (separate segments)
    segmented_delta_encode(
        np.array([1, 5, 5], dtype=np.int64), np.array([0, 2], dtype=np.int64)
    )


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 2**40), min_size=0, max_size=20),
        min_size=1,
        max_size=10,
    )
)
def test_split_stream_property(segments):
    values = np.array([v for s in segments for v in s], dtype=np.uint64)
    starts = np.cumsum([0] + [len(s) for s in segments[:-1]]).astype(np.int64)
    buf, nb = varint_encode_sizes(values)
    parts = split_stream(buf, nb, starts)
    assert len(parts) == len(segments)
    for part, seg in zip(parts, segments):
        assert varint_decode(part, np.uint64).tolist() == seg


# ----------------------------------------------------- end-to-end merges
def _naive_invert(doc_rows):
    """dict term -> sorted [(doc, tf)] — independent reference."""
    inv = {}
    for doc, terms in doc_rows:
        for t in set(terms):
            inv.setdefault(t, []).append((doc, terms.count(t)))
    return {t: sorted(v) for t, v in inv.items()}


@settings(max_examples=30, deadline=None)
@given(
    st.lists(  # docs: token list per doc
        st.lists(st.sampled_from("a b c d e hot".split()), min_size=1, max_size=8),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 4),  # batch size: how docs split into tokenizer batches
    st.integers(1, 3),  # num salts
    st.integers(0, 1),  # shuffle run arrival order?
)
def test_run_merge_matches_naive_inversion(docs, bs, salts, shuffle):
    n = len(docs)
    doc_rows = [(i, toks) for i, toks in enumerate(docs)]
    tok = Tokenizer(
        hot_ref={"hot"}, n_docs=n, num_salts=salts, emit_runs=True, num_parts=5
    )
    run_tables = []
    for s in range(0, n, bs):
        chunk = doc_rows[s : s + bs]
        batch = pa.table(
            {
                "doc_id": pa.array([d for d, _ in chunk], pa.int64()),
                "content": pa.array([" ".join(t) for _, t in chunk], pa.string()),
            }
        )
        run_tables.append(tok(batch))
    runs = pa.concat_tables(run_tables)
    if shuffle:  # arrival order must not matter
        idx = np.random.default_rng(0).permutation(runs.num_rows)
        runs = runs.take(idx)

    # level 1 per part, level 2 per mpart — exactly like the build
    l1 = make_level1_merge(num_shards=3)
    partials = []
    for p in np.unique(np.asarray(runs["part"])):
        grp = runs.filter(pa.compute.equal(runs["part"], int(p)))
        partials.append(l1(grp))
    partials_t = pa.concat_tables(partials)
    dl = np.array([len(t) for _, t in doc_rows], dtype=np.int64)
    import ray

    ref = ray.put((dl, np.zeros(n, dtype=np.int64)))
    l2 = make_final_merge(n_docs=n, avgdl=float(dl.mean()), block_size=4,
                          dl_bits_ref=ref)
    segs = []
    for mp in np.unique(np.asarray(partials_t["mpart"])):
        grp = partials_t.filter(pa.compute.equal(partials_t["mpart"], int(mp)))
        segs.append(l2(grp))
    seg = pa.concat_tables(segs)

    from quickray.codec import decode_postings

    got = {}
    for i in range(seg.num_rows):
        term = seg["term"][i].as_py()
        ids = decode_postings(seg["postings"][i].as_py())
        tfs = varint_decode(seg["tfs"][i].as_py())
        got[term] = list(zip(ids.tolist(), tfs.tolist()))
    assert got == _naive_invert(doc_rows)


def test_run_schema_stable():
    tok = Tokenizer(emit_runs=True, n_docs=4, num_parts=3)
    out = tok(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "content": pa.array(["x y x", "y z"], pa.string()),
            }
        )
    )
    assert out.schema == RUN_SCHEMA
    rows = {r["term"]: r for r in out.to_pylist()}
    assert rows["x"]["df"] == 1 and rows["y"]["df"] == 2
