"""Tokenization — Arrow-native, zero Python loops in the hot path.

The reference does NO tokenization (callers supply pre-split Keywords,
demo/job/build_index.go:85-91 merely lowercases + splits a CSV column).
Our corpus is raw source text, so tokenization is a real stage: an
actor-pool `map_batches` class whose per-batch body is pure
pyarrow.compute (RE2 split + list flatten + hash groupby), i.e. C++
kernels over zero-copy Arrow batches.

The token definition (lowercase; maximal runs of [a-z0-9_]) is shared
verbatim by: this Arrow kernel, the Python oracle (oracle.py) and the
DuckDB oracle SQL — all three must agree for the correctness gate.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from quickray.schema import TOKEN_SPLIT_RE


def flatten_tokens(content: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, pa.Array]:
    """content column -> (flat token array, parent row index per token)."""
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    low = pc.utf8_lower(content)
    lists = pc.split_pattern_regex(low, TOKEN_SPLIT_RE)
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    mask = pc.and_(pc.not_equal(flat, ""), pc.is_valid(flat))
    return flat.filter(mask), parents.filter(mask)


def doc_lengths(content: pa.ChunkedArray | pa.Array, num_rows: int) -> np.ndarray:
    """Token count per row (BM25 |d|), vectorized."""
    _, parents = flatten_tokens(content)
    counts = np.zeros(num_rows, dtype=np.int64)
    np.add.at(counts, np.asarray(parents), 1)
    return counts


class Tokenizer:
    """Stateful actor-pool stage: corpus batch -> (term, doc_id, tf, dl,
    bits, salt).

    Used as ``ds.map_batches(Tokenizer, fn_constructor_kwargs={...},
    batch_format="pyarrow", concurrency=N)`` — the class form makes Ray
    run it as an actor pool (SURVEY §2.3 ST1 mapping). Per-actor state
    paid once in __init__: the broadcast hot-term set is fetched with a
    single ray.get of an ObjectRef (plasma-local on every node — the
    broadcast-small-side pattern, never re-shipped per batch).

    tf is computed *within the batch* by an Arrow hash groupby — this is
    the partial/combiner step that shrinks the (term, doc) stream before
    the global shuffle (a doc never spans batches, so per-batch tf is
    exact). Hot terms get a contiguous-range salt
    ``doc_id * S // n_docs`` so the merge phase can concatenate salted
    runs in salt order without re-sorting (SURVEY §7.4).
    """

    def __init__(
        self,
        hot_ref=None,
        n_docs: int = 1,
        num_salts: int = 1,
        avgdl: float = 1.0,
        langs: list[str] | None = None,
        emit_runs: bool = False,
        num_parts: int = 64,
    ) -> None:
        import ray

        self._re = re.compile(TOKEN_SPLIT_RE)
        if hot_ref is None:
            self.hot: frozenset[str] = frozenset()
        elif isinstance(hot_ref, (frozenset, set)):
            self.hot = frozenset(hot_ref)
        else:
            self.hot = frozenset(ray.get(hot_ref))
        self.n_docs = max(1, n_docs)
        self.num_salts = max(1, num_salts)
        self.avgdl = avgdl
        self.langs = langs or []
        self.emit_runs = emit_runs
        self.num_parts = max(1, num_parts)

    def _grouped(self, batch: pa.Table):
        """(term, doc_id) -> tf within the batch + per-posting dl/bits."""
        from quickray.scoring import compute_bits

        flat, parents = flatten_tokens(batch["content"])
        doc_ids = pc.take(batch["doc_id"], parents)
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        grouped = (
            pa.table({"term": flat, "doc_id": doc_ids})
            .group_by(["term", "doc_id"])
            .aggregate([([], "count_all")])
        )
        # attach dl + bits by positional lookup of doc_id within the batch
        base = np.asarray(batch["doc_id"], dtype=np.int64)
        order = np.argsort(base, kind="stable")
        gdoc = np.asarray(grouped["doc_id"], dtype=np.int64)
        pos = order[np.searchsorted(base[order], gdoc)]
        batch_bits = compute_bits(
            batch["lang"].to_pylist(),
            batch["path"].to_pylist(),
            np.asarray(batch["doc_len"], dtype=np.int64),
            self.avgdl,
            self.langs,
        )
        dl = np.asarray(batch["doc_len"], dtype=np.int64)[pos]
        bits = batch_bits[pos]
        return grouped, gdoc, dl, bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        grouped, gdoc, dl, bits = self._grouped(batch)
        if self.emit_runs:
            return self._encode_runs(grouped, gdoc, dl, bits)
        terms = grouped["term"].to_pylist()
        is_hot = np.fromiter(
            (t in self.hot for t in terms), dtype=bool, count=len(terms)
        )
        salt = np.where(
            is_hot, gdoc * self.num_salts // self.n_docs, 0
        ).astype(np.int64)
        return pa.table(
            {
                "term": grouped["term"],
                "doc_id": grouped["doc_id"],
                "tf": grouped["count_all"],
                "dl": pa.array(dl),
                "bits": pa.array(bits),
                "salt": pa.array(salt),
            }
        )

    def _encode_runs(self, grouped, gdoc, dl, bits) -> pa.Table:
        """One compressed posting run per term present in the batch
        (RUN_SCHEMA) — the shuffle-volume combiner (SURVEY §7.4)."""
        from quickray.codec import (
            segmented_delta_encode,
            split_stream,
            varint_encode_sizes,
        )
        from quickray.schema import RUN_SCHEMA
        from quickray.util import stable_hash_str

        if grouped.num_rows == 0:
            return RUN_SCHEMA.empty_table()
        tcol = grouped["term"]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        dic = tcol.dictionary_encode()
        codes = np.asarray(dic.indices, dtype=np.int64)
        vocab = dic.dictionary.to_pylist()
        tf = np.asarray(grouped["count_all"], dtype=np.int64)

        order = np.lexsort((gdoc, codes))
        codes_s, doc_s = codes[order], gdoc[order]
        tf_s, dl_s, bits_s = tf[order], dl[order], bits[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(codes_s)) + 1)
        ).astype(np.int64)
        run_terms = [vocab[c] for c in codes_s[starts]]
        df_run = np.diff(np.append(starts, len(doc_s)))
        min_doc = doc_s[starts]
        n_runs = len(starts)

        is_hot = np.fromiter(
            (t in self.hot for t in run_terms), dtype=bool, count=n_runs
        )
        salt = np.where(
            is_hot, min_doc * self.num_salts // self.n_docs, 0
        ).astype(np.int64)
        th = np.fromiter(
            (stable_hash_str(t) for t in run_terms), dtype=np.int64, count=n_runs
        )
        part = (th + salt * np.int64(0x9E3779B1)) % self.num_parts

        pbuf, pnb = varint_encode_sizes(segmented_delta_encode(doc_s, starts))
        tbuf, tnb = varint_encode_sizes(tf_s)
        dbuf, dnb = varint_encode_sizes(dl_s)
        bbuf, bnb = varint_encode_sizes(bits_s)
        return pa.table(
            {
                "term": pa.array(run_terms, pa.string()),
                "salt": pa.array(salt),
                "part": pa.array(part),
                "min_doc": pa.array(min_doc),
                "df": pa.array(df_run),
                "postings": pa.array(split_stream(pbuf, pnb, starts), pa.binary()),
                "tfs": pa.array(split_stream(tbuf, tnb, starts), pa.binary()),
                "dls": pa.array(split_stream(dbuf, dnb, starts), pa.binary()),
                "bitsv": pa.array(split_stream(bbuf, bnb, starts), pa.binary()),
            },
            schema=RUN_SCHEMA,
        )


def tokenize_py(text: str) -> list[str]:
    """Reference tokenizer for the brute-force oracle (must equal the
    Arrow kernel's output exactly)."""
    return [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]
