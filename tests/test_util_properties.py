"""Property tests for the round-5 shared kernels: zero-object digest
slicing, sorted-run boundary detection, and the single-source field
posting-key derivation. These are the primitives every blockwise
reduction and both dedup hash paths sit on — drift here corrupts
results silently, so they get exhaustive randomized coverage against
naive references."""

import hashlib

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from quickray.util import digest_slices, run_starts


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=40)), max_size=50
    ),
    st.sampled_from(["md5", "sha256"]),
    st.sampled_from([8, 16, 32]),
)
def test_digest_slices_matches_hashlib(vals, algo, nbytes):
    nbytes = min(nbytes, 16 if algo == "md5" else 32)
    arr = pa.array(vals, pa.string())
    got = digest_slices(arr, algo, nbytes)
    assert len(got) == nbytes * len(vals)
    h = getattr(hashlib, algo)
    for i, v in enumerate(vals):
        want = h(("" if v is None else v).encode()).digest()[:nbytes]
        assert got[nbytes * i : nbytes * (i + 1)] == want


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.text(max_size=30), min_size=1, max_size=40),
    st.integers(min_value=0, max_value=20),
    st.integers(min_value=1, max_value=10),
)
def test_digest_slices_slice_offset_invariant(vals, off, ln):
    """A zero-copy slice (non-zero Arrow offset) must hash the same
    values as a fresh array — the offset-handling branch."""
    arr = pa.array(vals, pa.string())
    off = min(off, len(vals) - 1)
    ln = min(ln, len(vals) - off)
    sl = arr.slice(off, ln)
    fresh = pa.array(vals[off : off + ln], pa.string())
    assert digest_slices(sl, "md5", 8) == digest_slices(fresh, "md5", 8)


def _naive_run_starts(*cols):
    n = len(cols[0])
    out = [0]
    for i in range(1, n):
        if any(list(c)[i] != list(c)[i - 1] for c in cols):
            out.append(i)
    return out


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=-3, max_value=3), min_size=1, max_size=60)
)
def test_run_starts_matches_naive_int(keys):
    keys = sorted(keys)  # contract: key-sorted input
    a = np.array(keys, dtype=np.int64)
    assert run_starts(a).tolist() == _naive_run_starts(keys)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_run_starts_matches_naive_composite(pairs):
    """Composite keys: numpy ints + Arrow strings together, run breaks
    where ANY column changes."""
    pairs = sorted(pairs)
    ints = np.array([p[0] for p in pairs], dtype=np.int64)
    strs = pa.array([p[1] for p in pairs], pa.string())
    want = _naive_run_starts([p[0] for p in pairs], [p[1] for p in pairs])
    assert run_starts(ints, strs).tolist() == want


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(alphabet="aBc ", max_size=6)),
        min_size=1,
        max_size=40,
    )
)
def test_field_posting_keys_contract(vals):
    """Key = field\\x01lower(value); keep drops exactly the null/empty
    rows; keep is None iff every row survives."""
    from quickray.tokenize import field_posting_keys

    col = pa.array(vals, pa.string())
    keys, keep = field_posting_keys(col, "lang")
    assert len(keys) == len(vals)
    expect_keep = [bool(v) for v in vals]
    if keep is None:
        assert all(expect_keep)
        kept_keys = keys.to_pylist()
        kept_vals = [v for v in vals]
    else:
        assert keep.to_pylist() == expect_keep
        kept_keys = keys.filter(keep).to_pylist()
        kept_vals = [v for v in vals if v]
    assert kept_keys == [f"lang\x01{v.lower()}" for v in kept_vals]


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=500),
        min_size=1,
        max_size=6,
    ),
    st.sampled_from([1, 3, 128]),
    st.integers(min_value=0, max_value=2**31),
)
def test_merge_blockmax_matches_codec_reference(group_lens, block_size, seed):
    """merge.py computes block-max metadata inline (vectorized across
    groups); codec.block_max_metadata is the per-group reference. The
    two implementations of the per-block (last_doc_id, max_score)
    contract must agree on arbitrary group layouts — this differential
    pins them together so a semantics change to one cannot silently
    diverge the shipped index layout from the tested contract."""
    from quickray.codec import block_max_metadata

    rng = np.random.default_rng(seed)
    starts = np.concatenate(([0], np.cumsum(group_lens)))[:-1]
    total = int(np.sum(group_lens))
    # strictly increasing doc ids within each group
    docs = np.concatenate([
        np.cumsum(rng.integers(1, 50, size=ln)) for ln in group_lens
    ]).astype(np.int64)
    scores = rng.random(total)

    # the merge.py inline shape, lifted verbatim
    lens = np.asarray(group_lens, dtype=np.int64)
    ends = starts + lens
    nblocks = (lens + block_size - 1) // block_size
    block_off = np.concatenate(([0], np.cumsum(nblocks)))
    block_group = np.repeat(np.arange(len(lens)), nblocks)
    within = np.arange(len(block_group)) - block_off[block_group]
    bstart = starts[block_group] + within * block_size
    bend = np.minimum(bstart + block_size, ends[block_group])
    inline_last = docs[bend - 1]
    inline_max = (
        np.maximum.reduceat(scores, bstart)
        if len(bstart)
        else np.empty(0, np.float64)
    )

    for gi, (lo, hi) in enumerate(zip(starts, ends)):
        want_last, want_max = block_max_metadata(
            docs[lo:hi], scores[lo:hi], block_size
        )
        glo, ghi = block_off[gi], block_off[gi + 1]
        assert inline_last[glo:ghi].tolist() == want_last.tolist()
        assert np.array_equal(inline_max[glo:ghi], want_max)
