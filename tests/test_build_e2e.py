"""End-to-end build conformance + rank identity (SURVEY §7.7 items 2,5,6,7)."""

import hashlib
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from quickray.engine import Index, LocalEngine
from quickray.queryset import make_query_set


@pytest.fixture(scope="module")
def engine(built_index):
    return LocalEngine(Index(built_index))


def test_posting_lists_match_oracle(engine, oracle):
    golden = oracle.posting_lists()
    assert engine.index.vocab_size == len(golden)
    for term, (ids, tfs) in golden.items():
        p = engine.index.posting(term)
        assert p is not None, term
        assert p.doc_ids.tolist() == ids, term
        assert p.tfs.tolist() == tfs, term
        assert p.df == len(ids)
        # postings must be strictly increasing (the one reference invariant)
        assert np.all(np.diff(p.doc_ids) > 0)


def test_docmeta_matches_oracle(built_index, oracle):
    dm = pq.read_table(os.path.join(built_index, "docmeta"))
    got_bits = dict(zip(dm["doc_id"].to_pylist(), dm["bits"].to_pylist()))
    got_len = dict(zip(dm["doc_id"].to_pylist(), dm["doc_len"].to_pylist()))
    assert got_bits == oracle.bits
    assert got_len == oracle.doc_len


def test_sha256_invariant(built_index, small_corpus):
    """Per-row content sha256 equality vs the input table (north rule)."""
    ids_tbl = pq.read_table(
        os.path.join(built_index, "docmeta"),
        columns=["repo", "path", "sha256"],
    )
    stored = {
        (r, p): s
        for r, p, s in zip(
            ids_tbl["repo"].to_pylist(),
            ids_tbl["path"].to_pylist(),
            ids_tbl["sha256"].to_pylist(),
        )
    }
    contents = {
        (r, p): c
        for r, p, c in zip(
            small_corpus["repo"].to_pylist(),
            small_corpus["path"].to_pylist(),
            small_corpus["content"].to_pylist(),
        )
    }
    assert len(stored) == small_corpus.num_rows
    for key, content in contents.items():
        assert stored[key] == hashlib.sha256(content.encode()).hexdigest()


def test_global_stats_match_oracle(engine, oracle):
    assert engine.index.n_docs == oracle.n_docs
    assert engine.index.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)
    assert engine.index.stats["total_tokens"] == oracle.total_tokens


def test_rank_identity_reference_query_set(engine, oracle):
    queries = make_query_set(oracle.df())
    assert len(queries) >= 30
    for q in queries:
        ids, scores = engine.search(q)
        expected = oracle.search(q)
        assert ids.tolist() == [d for d, _ in expected], q.to_json()
        assert np.allclose(
            scores, [s for _, s in expected], rtol=1e-9, atol=1e-12
        ), q.to_json()


def test_candidate_sets_match_oracle(engine, oracle):
    for q in make_query_set(oracle.df()):
        assert engine.candidates(q).tolist() == oracle.candidates(q), q.to_json()


def test_salting_invariance(small_corpus, built_index, tmp_path):
    """Same corpus built with no salting and different shuffle layout
    must produce byte-identical segment contents (determinism across
    physical plans — the N vs 4N cluster argument in miniature)."""
    from quickray.build import build_index

    out2 = str(tmp_path / "nosalt")
    build_index(small_corpus, out2, hot_df=300, num_salts=1, num_shards=7)
    a = pq.read_table(os.path.join(built_index, "segments")).sort_by("term")
    b = pq.read_table(os.path.join(out2, "segments")).sort_by("term")
    for col in ["term", "df", "postings", "tfs", "dls", "bitsv", "block_last", "block_max"]:
        assert a[col].to_pylist() == b[col].to_pylist(), col


def test_assign_doc_ids_fallback_matches_rank(ray_session):
    """The fully-distributed doc_id fallback (for key sets exceeding
    node memory) must assign exactly the ranks the broadcast path
    assigns, at any block count — and raise on duplicate keys instead
    of silently handing out duplicate ids (r05 review: the block-offset
    dict overwrote on shared first keys)."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from quickray.docids import assign_doc_ids, doc_ids_py

    n = 500
    repos = [f"r{i % 7}" for i in range(n)]
    paths = [f"p{(i * 31) % n:04d}" for i in range(n)]
    ds = rd.from_arrow(pa.table({
        "repo": pa.array(repos), "path": pa.array(paths),
        "payload": pa.array(list(range(n))),
    })).repartition(11)
    out = assign_doc_ids(ds).to_pandas().sort_values("payload")
    want = doc_ids_py(repos, paths)
    assert out["doc_id"].to_numpy().tolist() == want.tolist()

    dup = rd.from_arrow(pa.table({
        "repo": pa.array(["r"] * 400), "path": pa.array(["same"] * 400),
    })).repartition(4)
    # Ray wraps worker exceptions (RayTaskError); match the message
    with _pytest.raises(Exception, match="duplicate"):
        assign_doc_ids(dup).materialize()
