"""Set-algebra conformance — ports the reference's skiplist fixtures
(internal/reverse_index/test/skiplist_reverse_index_test.go:13-37, see
FIXTURES.md F5) plus randomized And/Or trees checked against the
brute-force oracle's set semantics."""

import numpy as np
import pyarrow as pa

from quickray.engine import LocalEngine, Posting
from quickray.oracle import Oracle
from quickray.query import And, Or, Query, Term


class FakeIndex:
    def __init__(self, postings: dict[str, list[int]], n_docs=100):
        self._p = postings
        self.n_docs = n_docs
        self.avgdl = 10.0

    def posting(self, term):
        ids = self._p.get(term)
        if ids is None:
            return None
        arr = np.array(ids, dtype=np.int64)
        ones = np.ones(len(arr), dtype=np.int64)
        return Posting(
            doc_ids=arr, tfs=ones, dls=ones * 10,
            bits=np.zeros(len(arr), np.int64), df=len(arr),
            block_last=np.array([arr[-1]] if len(arr) else [], np.int64),
            block_max=np.array([1.0] if len(arr) else [], np.float64),
        )


L1 = [1, 4, 5, 7, 9, 11]
L2 = [2, 4, 5, 8, 9]
L3 = [3, 5, 7, 9]
ENGINE = LocalEngine(FakeIndex({"l1": L1, "l2": L2, "l3": L3}))


def cands(tree):
    return ENGINE.candidates(Query(tree=tree)).tolist()


def test_reference_intersection_fixtures():
    assert cands(And((Term("l1"), Term("l2")))) == [4, 5, 9]
    assert cands(And((Term("l1"), Term("l2"), Term("l3")))) == [5, 9]
    assert cands(And((Term("l1"),))) == L1
    assert cands(And(())) == []


def test_reference_union_fixtures():
    assert cands(Or((Term("l1"), Term("l2")))) == [1, 2, 4, 5, 7, 8, 9, 11]
    assert cands(Or((Term("l1"), Term("l2"), Term("l3")))) == [1, 2, 3, 4, 5, 7, 8, 9, 11]
    assert cands(Or((Term("l1"),))) == L1
    assert cands(Or(())) == []


def test_absent_term_and_nesting():
    assert cands(Term("nope")) == []
    assert cands(And((Term("l1"), Term("nope")))) == []
    assert cands(Or((Term("nope"), Term("l3")))) == L3
    assert cands(Or((And((Term("l1"), Term("l2"))), And((Term("l3"), Term("nope")))))) == [4, 5, 9]
    assert cands(And((Or((Term("l1"), Term("l3"))), Term("l2")))) == [4, 5, 9]


def test_randomized_trees_vs_oracle():
    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(12)]
    n_docs = 60
    postings = {
        t: sorted(rng.choice(n_docs, size=rng.integers(0, 30), replace=False).tolist())
        for t in vocab
    }
    postings = {t: v for t, v in postings.items() if v}
    # matching corpus for the oracle: doc i's content = its terms
    docs_terms = [[] for _ in range(n_docs)]
    for t, ids in postings.items():
        for d in ids:
            docs_terms[d].append(t)
    tbl = pa.table(
        {
            "repo": ["r"] * n_docs,
            "path": [f"{i:04d}" for i in range(n_docs)],
            "commit": ["c"] * n_docs,
            "lang": ["go"] * n_docs,
            "content": [" ".join(sorted(ts)) for ts in docs_terms],
        }
    )
    oracle = Oracle(tbl)
    eng = LocalEngine(FakeIndex(postings, n_docs=n_docs))

    def random_tree(depth):
        if depth == 0 or rng.random() < 0.4:
            return Term(vocab[rng.integers(len(vocab))])
        kids = tuple(random_tree(depth - 1) for _ in range(rng.integers(2, 4)))
        return And(kids) if rng.random() < 0.5 else Or(kids)

    for _ in range(60):
        tree = random_tree(3)
        q = Query(tree=tree)
        assert eng.candidates(q).tolist() == oracle.candidates(q)
