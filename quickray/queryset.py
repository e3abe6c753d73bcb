"""Reference query set (FIXTURES.md F3) — deterministic, ~50 queries.

Shapes mirror the reference tests: single terms across the df spectrum,
pure AND chains (IntersectionOfSkipList), pure OR (Union), and the
compound (q1∧q2)∨(q3∧q4∧q5) from indexer_test.go:119-132, with and
without on/off/or flag filters. Term choice is a pure function of the
df table, so the same set is generated for engine and oracle.
"""

from __future__ import annotations

from quickray.query import And, Or, Query, Term

ABSENT = "zz_absent_term_zz"


def _spectrum(df) -> dict[str, list[str]]:
    """Term pools across the df spectrum. Accepts a term->df dict (the
    oracle path) or a (term, df) Arrow table (engine.Index.df_table —
    sorted with Arrow kernels so no whole-vocabulary Python dict is
    ever materialized; only the bounded pools become Python strings).
    Both paths order by (-df, term), so identical df contents give
    identical pools. Field-scoped keys (field\\x01word, present when an
    index was built with field_cols) are EXCLUDED: the reference query
    set is a pure function of the content-term df spectrum, so an
    engine-side df table with extra field postings must yield the same
    queries as the oracle's content-only df."""
    import pyarrow as pa

    if isinstance(df, pa.Table):
        import numpy as np
        import pyarrow.compute as pc

        if df.num_rows:
            df = df.filter(
                pc.invert(pc.match_substring(df["term"], "\x01"))
            )
        n = df.num_rows
        order = np.asarray(
            pc.sort_indices(
                df,
                sort_keys=[("df", "descending"), ("term", "ascending")],
            ),
            dtype=np.int64,
        )
        terms = df["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        dfs = np.asarray(df["df"], dtype=np.int64)[order]

        def take(posns) -> list[str]:  # bounded pool materialization
            return [terms[int(order[int(p)])].as_py() for p in posns]

        hot = take(range(min(n, max(3, n // 100))))
        mid = take(range(n // 3, min(n, n // 3 + max(6, n // 50))))
        rare_pos = np.flatnonzero(dfs <= 2)[:12]
        rare = (
            take(rare_pos) if len(rare_pos) else take(range(max(0, n - 12), n))
        )
        return {"hot": hot, "mid": mid, "rare": rare}
    by_hot = sorted(
        (t for t in df if "\x01" not in t), key=lambda t: (-df[t], t)
    )
    n = len(by_hot)
    hot = by_hot[: max(3, n // 100)]
    mid = by_hot[n // 3 : n // 3 + max(6, n // 50)]
    rare = [t for t in by_hot if df[t] <= 2][:12] or by_hot[-12:]
    return {"hot": hot, "mid": mid, "rare": rare}


def make_query_set(df, langs: list[str] | None = None) -> list[Query]:
    """df: term->df dict OR (term, df) Arrow table (see _spectrum)."""
    s = _spectrum(df)
    hot, mid, rare = s["hot"], s["mid"], s["rare"]

    def pick(pool: list[str], i: int) -> str:
        return pool[i % len(pool)]

    queries: list[Query] = []

    def add(tree, **kw):
        q = Query(tree=tree, **kw)
        q.id = f"q{len(queries):03d}"
        queries.append(q)

    # single terms across the df spectrum
    for i in range(3):
        add(Term(pick(hot, i)))
        add(Term(pick(mid, i)), k=20)
        add(Term(pick(rare, i)))
    add(Term(ABSENT))

    # pure AND chains, arity 2-4
    add(And((Term(pick(hot, 0)), Term(pick(mid, 0)))))
    add(And((Term(pick(mid, 1)), Term(pick(mid, 2)))), k=25)
    add(And((Term(pick(hot, 1)), Term(pick(mid, 3)), Term(pick(mid, 4)))))
    add(And((Term(pick(hot, 0)), Term(pick(hot, 1)), Term(pick(mid, 5)), Term(pick(rare, 0)))))
    add(And((Term(pick(mid, 0)), Term(ABSENT))))

    # pure OR, arity 2-4 (block-max path)
    add(Or((Term(pick(mid, 0)), Term(pick(mid, 1)))))
    add(Or((Term(pick(rare, 1)), Term(pick(rare, 2)), Term(pick(rare, 3)))), k=30)
    add(Or((Term(pick(hot, 0)), Term(pick(mid, 2)), Term(pick(rare, 4)))), k=15)
    add(Or((Term(pick(hot, 1)), Term(pick(hot, 2)))), k=5)
    add(Or((Term(ABSENT), Term(pick(mid, 3)))))

    # compound (q1∧q2)∨(q3∧q4∧q5) — indexer_test.go:119-132 shape
    compound = Or(
        (
            And((Term(pick(hot, 0)), Term(pick(mid, 0)))),
            And((Term(pick(mid, 1)), Term(pick(mid, 2)), Term(pick(rare, 5)))),
        )
    )
    add(compound, k=20)
    add(And((Or((Term(pick(mid, 0)), Term(pick(mid, 1)))),
             Or((Term(pick(hot, 0)), Term(pick(rare, 6)))))))

    # flag-filtered variants (langs bit 0/1, test-path bit 8, long-doc bit 9)
    n_l = len(langs) if langs else 2
    add(Term(pick(hot, 0)), on_flag=1 << 0)
    add(Term(pick(hot, 1)), on_flag=1 << min(1, n_l - 1), k=15)
    add(Term(pick(hot, 2)), off_flag=1 << 0)
    add(Term(pick(mid, 0)), on_flag=1 << 9)
    add(Term(pick(mid, 1)), off_flag=(1 << 8) | (1 << 9))
    add(Or((Term(pick(mid, 2)), Term(pick(mid, 3)))), or_flags=(1 << 0 | 1 << min(1, n_l - 1),))
    add(Or((Term(pick(hot, 0)), Term(pick(mid, 4)))),
        or_flags=(0, 1 << 9), k=25)  # zero entry must be skipped (M3 rule)
    add(compound, on_flag=1 << 9, off_flag=1 << 8, or_flags=(0, (1 << n_l) - 1), k=15)
    add(And((Term(pick(hot, 0)), Term(pick(hot, 1)))), on_flag=(1 << 0) | (1 << 9))

    # k variations on one mid term
    for k in (1, 5, 50):
        add(Term(pick(mid, 6)), k=k)

    # big OR over the hot set (worst-case union / WAND stress)
    add(Or(tuple(Term(t) for t in hot[:8])), k=10)
    add(Or(tuple(Term(pick(mid, i)) for i in range(8))), k=20)
    return queries


def sharded_field_queries() -> list[Query]:
    """Fixed field-scoped arm for the term-sharded scatter path: a flat
    OR mixing a field keyword ('lang\\x01en' posting, reference
    Keyword{Field,Word} — gen/document.go:3-9) with a content term, so
    the contrib scatter exercises BOTH key kinds across shard groups.
    Kept out of make_query_set (the reference query set stays
    content-only); ids are prefixed to never collide with the q### set."""
    return [
        Query(tree=Or((Term("en", field="lang"), Term("data"))),
              k=10, id="qfield000"),
        Query(tree=Term("fr", field="lang"), k=5, id="qfield001"),
    ]
