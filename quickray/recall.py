"""Template-method search front-end (§2.10): pluggable recall +
filter stages around the core engine, mirroring the reference's
VideoSearcher (demo/job/search/searcher.go:16-98) — N recall strategies
produce candidate sets that are merged with exact dedup (searcher.go:
38-79, last-wins by id), then sequential filters prune the merged set.

Recallers here are batch functions over the engine (no goroutines —
candidate generation is already vectorized; at cluster scale each
recaller can be a shard-parallel pipeline, see engine.sharded_search).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np

from quickray.engine import LocalEngine
from quickray.query import Or, Query, Term

Recaller = Callable[[LocalEngine, "SearchContext"], np.ndarray]
Filter = Callable[[LocalEngine, "SearchContext", np.ndarray], np.ndarray]


class SearchContext:
    """Request state shared by recallers/filters (VideoSearchContext
    analog): keywords + flag predicate + arbitrary extras."""

    def __init__(
        self,
        keywords: Sequence[str],
        on_flag: int = 0,
        off_flag: int = 0,
        or_flags: tuple[int, ...] = (),
        **extras,
    ):
        # query-string cleaning exactly like demo/handler/search.go:21-30
        self.keywords = [k.strip().lower() for k in keywords if k.strip()]
        self.on_flag = on_flag
        self.off_flag = off_flag
        self.or_flags = or_flags
        self.extras = extras

    def query(self, tree) -> Query:
        return Query(
            tree=tree, on_flag=self.on_flag, off_flag=self.off_flag,
            or_flags=self.or_flags, k=10**9,
        )


def keyword_recaller(eng: LocalEngine, ctx: SearchContext) -> np.ndarray:
    """OR over the request keywords (recaller/keyword.go:16-48)."""
    if not ctx.keywords:
        return np.empty(0, np.int64)
    return eng.candidates(ctx.query(Or(tuple(Term(k) for k in ctx.keywords))))


def make_term_recaller(word: str, field: str = "") -> Recaller:
    """Single-term recall strategy. With ``field`` set this is the
    author-recaller port (keyword_author.go:16-54): recall by a
    dedicated field keyword whose posting key is field + "\\x01" +
    lower(word) (gen/document.go:5) — requires the index to have been
    built with that column in ``field_cols``. The word is cleaned
    exactly like the handler cleans user keywords (M4)."""

    def recall(eng: LocalEngine, ctx: SearchContext) -> np.ndarray:
        w = word.strip().lower()
        if not w:
            return np.empty(0, np.int64)
        return eng.candidates(ctx.query(Term(w, field=field)))

    return recall


def doc_len_filter(lo: int, hi: int | None = None) -> Filter:
    """Post-retrieval numeric range filter (M5; search.go:61-69 —
    hi None/<=0 means unbounded, exactly the handler's rule)."""

    def f(eng: LocalEngine, ctx: SearchContext, cand: np.ndarray) -> np.ndarray:
        if len(cand) == 0:
            return cand
        dl = eng.index.doc_lens(cand)
        m = dl >= lo
        if hi is not None and hi > 0:
            m &= dl <= hi
        return cand[m]

    return f


class Searcher:
    """Template method: union-of-recalls (exact dedup) -> filters ->
    BM25 rank over the surviving candidate set.

    EVERY surviving candidate is returned (up to k) — the reference's
    Search returns ctx.Result as-is after recall+filter
    (searcher.go:88-98); the BM25 ranking layered on top orders
    keyword-matching survivors first and the rest (e.g. docs recalled
    by a field strategy that contain none of the request keywords)
    after them with score 0, by ascending doc_id. Dropping zero-score
    survivors would break the author-recaller use case where the recall
    key is NOT a content keyword."""

    def __init__(self, recallers: Sequence[Recaller],
                 filters: Sequence[Filter] = ()):
        self.recallers = list(recallers)
        self.filters = list(filters)

    def search(self, eng: LocalEngine, ctx: SearchContext, k: int = 10):
        sets = [r(eng, ctx) for r in self.recallers]
        cand = (
            np.unique(np.concatenate(sets)) if sets else np.empty(0, np.int64)
        )
        for f in self.filters:
            cand = f(eng, ctx, cand)
        q = ctx.query(Or(tuple(Term(t) for t in ctx.keywords)))
        ids, sc = eng.score(q, cand)  # keyword-matching survivors only
        if len(ids) < len(cand):
            missing = np.setdiff1d(cand, ids, assume_unique=True)
            ids = np.concatenate([ids, missing])
            sc = np.concatenate([sc, np.zeros(len(missing), np.float64)])
        order = np.lexsort((ids, -sc))[:k]
        return ids[order], sc[order]
