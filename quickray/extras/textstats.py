"""Text-analysis operators over a documents table (doc_id, text).

All per-batch bodies are vectorized Arrow/numpy; language-ID is a
stateful actor-pool stage (profiles built once per actor).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from quickray.tokenize import flatten_tokens

STOPWORDS = ("the", "a", "of", "and", "to")

# tiny deterministic stopword profiles for the heuristic language-ID
# (n-gram/stopword overlap — a real system would load fastText here;
# the actor-pool plumbing is identical)
LANG_PROFILES = {
    "en": {"the", "and", "of", "a", "to", "in", "is"},
    "de": {"der", "die", "das", "und", "ist", "ein"},
    "es": {"el", "la", "de", "los", "es", "una"},
    "fr": {"le", "la", "les", "des", "est", "une"},
    "zh": {"de", "shi", "le", "zai", "he", "you"},
}


def _tok_table(batch: pa.Table) -> pa.Table:
    flat, parents = flatten_tokens(batch["text"])
    doc = pc.take(batch["doc_id"], parents)
    if isinstance(doc, pa.ChunkedArray):
        doc = doc.combine_chunks()
    return pa.table({"doc_id": doc, "term": flat})


def token_stats(ds: "rd.Dataset") -> "rd.Dataset":
    """doc_id -> (n_tokens, n_distinct). Per-batch exact (docs never
    span batches), no global shuffle needed."""

    def per_batch(batch: pa.Table) -> pa.Table:
        # fully columnar: totals = token count per row position
        # (bincount over parents); distinct = unique (row, term-code)
        # pairs via one np.unique over a packed int64 key — no per-row
        # Python dicts/lists (the measured GC-pressure anti-pattern)
        flat, parents = flatten_tokens(batch["text"])
        n = batch.num_rows
        par = np.asarray(parents, dtype=np.int64)
        if len(par):
            totals = np.bincount(par, minlength=n)
            codes = np.asarray(
                flat.dictionary_encode().indices, dtype=np.int64
            )
            v = int(codes.max()) + 1
            uniq = np.unique(par * v + codes)
            distinct = np.bincount(uniq // v, minlength=n)
        else:
            totals = np.zeros(n, np.int64)
            distinct = np.zeros(n, np.int64)
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "doc_id": ids.cast(pa.int64()),
                "n_tokens": pa.array(totals.astype(np.int64)),
                "n_distinct": pa.array(distinct.astype(np.int64)),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


def quality_counts_batch(
    batch: pa.Table, stop_arr: pa.Array
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """THE per-batch quality-count kernel: (n_tokens, n_stopwords,
    token_len_sum) per row — shared by quality_scores (ratios) and
    pipelines.quality_pipeline (integer-exact oracle form) so the
    tokenizer/membership definition cannot silently fork. Vectorized
    membership + segment sums (pc.is_in + bincount): per-token Python
    set probes and np.add.at (~100 ns/element) are hot-path
    anti-patterns at corpus scale; bincount float64 weights of small
    ints are exact (< 2^53)."""
    flat, parents = flatten_tokens(batch["text"])
    par = np.asarray(parents)
    n = batch.num_rows
    is_stop = np.asarray(pc.is_in(flat, value_set=stop_arr)).astype(np.float64)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    n_tok = np.bincount(par, minlength=n).astype(np.int64)
    n_stop = np.bincount(par, weights=is_stop, minlength=n).astype(np.int64)
    len_sum = np.bincount(
        par, weights=tok_len.astype(np.float64), minlength=n
    ).astype(np.int64)
    return n_tok, n_stop, len_sum


def quality_scores(ds: "rd.Dataset", stopwords=STOPWORDS, ndigits: int = 4) -> "rd.Dataset":
    """Per-doc quality features: token count, stopword ratio, mean token
    length — the cheap heuristics a pretraining pipeline filters on."""
    stop_arr = pa.array(sorted(set(stopwords)), pa.string())

    def per_batch(batch: pa.Table) -> pa.Table:
        n_tok, n_stop, len_sum = quality_counts_batch(batch, stop_arr)
        denom = np.maximum(1, n_tok).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok),
                "stop_ratio": pa.array(np.round(n_stop / denom, ndigits)),
                "mean_tok_len": pa.array(np.round(len_sum / denom, ndigits)),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


def content_hashes(ds: "rd.Dataset") -> "rd.Dataset":
    """doc_id -> sha256(text) — the exact-dup / invariant fingerprint.
    Zero-object hashing via buffer slices (util.digest_slices)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        from quickray.util import digest_slices

        hexall = digest_slices(batch["text"], "sha256", 32).hex()
        hs = [hexall[64 * i : 64 * (i + 1)] for i in range(batch.num_rows)]
        return pa.table({"doc_id": batch["doc_id"], "sha256": pa.array(hs, pa.string())})

    return ds.map_batches(per_batch, batch_format="pyarrow")


class LangId:
    """Actor-pool language-ID stage: profiles compiled once per actor
    (ST1 pattern). Heuristic: argmax DISTINCT-token overlap with each
    profile set; ties break to the alphabetically first language,
    no-overlap -> 'und'. Columnar body: one dictionary encode, one
    (doc, token)-dedup, one pc.index_in per profile, bincount counts —
    no per-token Python loop."""

    def __init__(self, profiles: dict[str, set[str]] | None = None):
        profs = {k: frozenset(v) for k, v in (profiles or LANG_PROFILES).items()}
        self.order = sorted(profs)
        self.prof_arrays = [
            pa.array(sorted(profs[lang]), pa.string()) for lang in self.order
        ]
        self.out_langs = np.array(self.order + ["und"], dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        flat, parents = flatten_tokens(batch["text"])
        counts = np.zeros((n, len(self.order)), dtype=np.int64)
        if len(flat):
            dic = flat.dictionary_encode()
            codes = np.asarray(dic.indices, dtype=np.int64)
            par = np.asarray(parents, dtype=np.int64)
            # distinct (doc, token) pairs — overlap is set-based
            keys = par * len(dic.dictionary) + codes
            _, first = np.unique(keys, return_index=True)
            upar, ucode = par[first], codes[first]
            for li, prof in enumerate(self.prof_arrays):
                # vocab positions belonging to this profile (C++ hash probe)
                hit = pc.index_in(dic.dictionary, value_set=prof)
                member_codes = np.flatnonzero(
                    np.asarray(hit.is_valid(), dtype=bool)
                )
                if len(member_codes):
                    sel = np.isin(ucode, member_codes)
                    counts[:, li] = np.bincount(upar[sel], minlength=n)
        best_n = counts.max(axis=1)
        best_i = np.where(best_n > 0, counts.argmax(axis=1), len(self.order))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(self.out_langs[best_i], pa.string()),
            }
        )


import re as _re

# BPE-ish pre-tokenization classes (letters / digits / punctuation runs
# on lowercased text) — the shape of a GPT-2-style pre-tokenizer,
# shared with the DuckDB oracle regex. The whitespace class is spelled
# out as RE2's \s ([\t\n\f\r ] — NO \v, and no Unicode spaces, unlike
# Python's \s even under re.ASCII) so both sides count identically.
_RE2_WS = " \t\n\f\r"
BPE_RE = _re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\f\r]+")
_WS_RE = _re.compile(f"[{_RE2_WS}]+")


def token_counts(ds: "rd.Dataset") -> "rd.Dataset":
    """Per-doc token counts under two tokenizations a training-data
    pipeline actually budgets with: whitespace split and a BPE-ish
    regex (subword pre-tokenizer classes)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ws = [
            len([t for t in _WS_RE.split(s.strip(_RE2_WS)) if t]) if s else 0
            for s in texts
        ]
        bpe = [len(BPE_RE.findall(s.lower())) if s else 0 for s in texts]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_ws_tokens": pa.array(ws, pa.int64()),
                "n_bpe_tokens": pa.array(bpe, pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


FP_P = (1 << 31) - 1  # Mersenne31: products fit int64, SQL HUGEINT-safe
FP_B = 1000003


def rolling_fingerprints(ds: "rd.Dataset", window: int = 8) -> "rd.Dataset":
    """Rabin-style rolling hash over the token stream: per doc, the min
    of `window`-token polynomial hashes — a cheap shift-robust
    fingerprint. Hash: sum_j th[i+j] * B^j mod (2^31 - 1) with
    th = md5_number_upper(token) mod (2^31 - 1) — small modulus chosen
    so every product fits int64 (vectorizable) and DuckDB can mirror it
    exactly (__ray_entry__ doc_fingerprint oracle). A doc with fewer
    than `window` tokens hashes one window over all its tokens; an
    empty doc fingerprints to 0. Vectorized: per-UNIQUE-token md5, one
    accumulation pass per window offset, per-doc minimum.reduceat —
    no per-doc Python loop (only docs shorter than the window, rare,
    take a scalar path)."""
    coeff = np.empty(window, np.int64)
    coeff[0] = 1
    for j in range(1, window):
        coeff[j] = coeff[j - 1] * FP_B % FP_P

    def per_batch(batch: pa.Table) -> pa.Table:
        from quickray.extras.dedup import _token_hash_u64

        flat, parents = flatten_tokens(batch["text"])
        n = batch.num_rows
        fps = np.zeros(n, dtype=np.int64)
        par = np.asarray(parents, dtype=np.int64)
        th = (_token_hash_u64(flat) % np.uint64(FP_P)).astype(np.int64)
        m = len(th)
        ntok = np.bincount(par, minlength=n) if m else np.zeros(n, np.int64)
        if m >= window:
            acc = np.zeros(m - window + 1, np.int64)
            for j in range(window):
                acc = (acc + th[j : m - window + 1 + j] * coeff[j]) % FP_P
            valid = par[: m - window + 1] == par[window - 1 :]
            if valid.any():
                win_doc = par[: m - window + 1][valid]
                win_hash = acc[valid]
                starts = np.concatenate(
                    ([0], np.flatnonzero(np.diff(win_doc)) + 1)
                )
                fps[win_doc[starts]] = np.minimum.reduceat(win_hash, starts)
        doc_start = np.concatenate(([0], np.cumsum(ntok)))[:-1]
        for d in np.flatnonzero((ntok > 0) & (ntok < window)):
            acc1 = 0
            for j in range(ntok[d]):
                acc1 = (acc1 + int(th[doc_start[d] + j]) * int(coeff[j])) % FP_P
            fps[d] = acc1
        return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fps)})

    return ds.map_batches(per_batch, batch_format="pyarrow", batch_size=1024)
