"""Randomized query trees vs the brute-force oracle — property-level
confidence that boolean algebra + flag filters + BM25 + block-max
pruning are rank-identical on shapes beyond the fixed reference set."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from quickray.engine import Index, LocalEngine
from quickray.query import And, Or, Query, Term


@pytest.fixture(scope="module")
def eng(built_index):
    return LocalEngine(Index(built_index))


def _vocab(oracle):
    terms = sorted(oracle.postings)
    # df spectrum: hot, mid, rare + a term that doesn't exist
    return terms[:: max(1, len(terms) // 40)][:40] + ["zz_missing_zz"]


@st.composite
def trees(draw, terms, depth=0):
    if depth >= 2 or draw(st.booleans()):
        return Term(draw(st.sampled_from(terms)))
    op = And if draw(st.booleans()) else Or
    n = draw(st.integers(2, 3))
    return op(tuple(draw(trees(terms, depth + 1)) for _ in range(n)))


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_random_query_rank_identity(data, eng, oracle):
    terms = _vocab(oracle)
    tree = data.draw(trees(terms))
    q = Query(
        tree=tree,
        on_flag=data.draw(st.sampled_from([0, 1, 2, 1 << 9])),
        off_flag=data.draw(st.sampled_from([0, 4, 1 << 8])),
        or_flags=data.draw(
            st.sampled_from([(), (0,), (3,), (0, 1 << 9), (1, 2)])
        ),
        k=data.draw(st.sampled_from([1, 3, 10, 100])),
    )
    ids, sc = eng.search(q)
    expected = oracle.search(q)
    assert ids.tolist() == [d for d, _ in expected]
    assert np.allclose(
        sc, [s for _, s in expected], rtol=1e-9, atol=1e-12
    )
    assert eng.candidates(q).tolist() == oracle.candidates(q)
