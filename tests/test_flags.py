"""Bit-feature filter conformance (skiplist_reverse_index.go:158-171,
SURVEY M3) — incl. the or_flags zero-entry skip rule."""

import numpy as np

from quickray.scoring import compute_bits, flags_mask


def test_on_off_flags():
    bits = np.array([0b0000, 0b0101, 0b0011, 0b1111], dtype=np.int64)
    assert flags_mask(bits, on_flag=0b0001).tolist() == [False, True, True, True]
    assert flags_mask(bits, on_flag=0b0101).tolist() == [False, True, False, True]
    assert flags_mask(bits, off_flag=0b0010).tolist() == [True, True, False, False]
    assert flags_mask(bits, on_flag=0b0001, off_flag=0b1000).tolist() == [
        False, True, True, False,
    ]


def test_or_flags_zero_skipped():
    bits = np.array([0b0001, 0b0010, 0b0100], dtype=np.int64)
    # a zero entry must be skipped entirely (reference rule), not treated
    # as "no bit can match"
    assert flags_mask(bits, or_flags=(0,)).tolist() == [True, True, True]
    assert flags_mask(bits, or_flags=(0, 0b0011)).tolist() == [True, True, False]
    assert flags_mask(bits, or_flags=(0b0001, 0b0110)).tolist() == [False, False, False]
    assert flags_mask(bits, or_flags=(0b0011, 0b0110)).tolist() == [False, True, False]


def test_no_flags_all_pass():
    bits = np.array([0, 1, 2], dtype=np.int64)
    assert flags_mask(bits).all()


def test_compute_bits_rules():
    bits = compute_bits(
        ["go", "py", "zz"],
        ["src/a.go", "test/b.py", "pkg/test_c.go"],
        np.array([5, 20, 10]),
        avgdl=10.0,
        langs=["go", "py"],
    )
    assert bits[0] == 1 << 0
    assert bits[1] == (1 << 1) | (1 << 8) | (1 << 9)  # test path + long doc
    assert bits[2] == 1 << 8  # unknown lang -> no lang bit; test_ basename


def test_bits_absence_latched_corruption_not(tmp_path, ray_session):
    """The dense flag path reads docmeta bits once per actor. A docmeta
    that provably LACKS the bits column (pre-bits build) latches
    _bits_absent so later flagged queries skip the parquet open; a
    CORRUPTED docmeta must NOT latch — it falls back per query (results
    identical: bits are replicated in postings) and warns (r04 ADVICE +
    r05 review: pyarrow raises ArrowInvalid for both cases)."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    from quickray.build import build_index
    from quickray.corpus import generate_corpus
    from quickray.engine import Index, LocalEngine
    from quickray.query import Or, Query, Term

    tbl = generate_corpus(300, seed=13)
    out = str(tmp_path / "idx")
    build_index(tbl, out, num_salts=2)

    ix0 = Index(out)
    # a dense-path flagged query: hot terms (df > N/16) + on_flag
    terms = ix0._seg["term"].to_pylist()
    dfs = ix0._seg["df"].to_pylist()
    hot = [t for t, d in sorted(zip(terms, dfs), key=lambda x: -x[1])
           if "\x01" not in t][:3]
    q = Query(tree=Or(tuple(Term(t) for t in hot)), on_flag=1, k=10)
    want_ids, want_sc = LocalEngine(ix0).search(q)
    assert len(want_ids) > 0

    # case 1: bits column genuinely absent -> latched after first query
    out1 = str(tmp_path / "idx_nobits")
    shutil.copytree(out, out1)
    for f in glob.glob(os.path.join(out1, "docmeta", "*.parquet")):
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["bits"]), f)
    ix1 = Index(out1)
    ids, sc = LocalEngine(ix1).search(q)
    assert list(ids) == list(want_ids)
    assert np.allclose(sc, want_sc)
    assert getattr(ix1, "_bits_absent", False) is True

    # case 2: corrupted docmeta file -> per-query fallback, NO latch
    out2 = str(tmp_path / "idx_corrupt")
    shutil.copytree(out, out2)
    f0 = sorted(glob.glob(os.path.join(out2, "docmeta", "*.parquet")))[0]
    with open(f0, "wb") as fh:
        fh.write(b"not a parquet file")
    ix2 = Index(out2, preload_top_df=0)
    ids, sc = LocalEngine(ix2).search(q)
    assert list(ids) == list(want_ids)
    assert np.allclose(sc, want_sc)
    assert getattr(ix2, "_bits_absent", False) is False
