"""Deduplication operators over a documents table (doc_id, text).

- exact: content-hash partition -> per-group min doc_id (the reference's
  only dedup is exact by business id, searcher.go:38-79; content-hash
  dedup is its corpus-scale analog).
- MinHash + LSH: shingle -> minhash signature -> banded bucket groupby
  -> candidate pairs -> exact-Jaccard verify. The groupby on
  (band, band_hash) is the scale path: only colliding docs ever meet.
- SimHash: 64-bit signed projection of token counts.
- n-gram Jaccard: exact all-pairs on a bounded subset (oracle-checkable).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

from quickray.tokenize import tokenize_py

_MERSENNE = (1 << 61) - 1


def _hash64(tokens: list[str]) -> np.ndarray:
    return np.array(
        [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little") >> 3
         for t in tokens],
        dtype=np.int64,
    )


def _shingle_hashes(tokens: list[str], k: int) -> np.ndarray:
    if len(tokens) < k:
        joined = ["\x01".join(tokens)] if tokens else []
    else:
        joined = ["\x01".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    return np.unique(_hash64(joined))


def exact_duplicates(ds: "rd.Dataset") -> "rd.Dataset":
    """Hash-partitioned exact dedup: (keep_doc_id = min, group_size).
    Equivalent SQL: SELECT min(doc_id), count(*) FROM t GROUP BY text."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(s.encode()).hexdigest() for s in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "h": pa.array(hs, pa.string())})

    def keep_first(group: pa.Table) -> pa.Table:
        ids = np.asarray(group["doc_id"], dtype=np.int64)
        return pa.table(
            {
                "keep_doc_id": pa.array([int(ids.min())], pa.int64()),
                "group_size": pa.array([len(ids)], pa.int64()),
            }
        )

    return (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("h")
        .map_groups(keep_first, batch_format="pyarrow")
    )


class MinHasher:
    """Actor-pool stage: doc -> (band, band_hash, doc_id) rows.
    Permutation coefficients are generated once per actor from a fixed
    seed (identical across actors — required for bucketing to work)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 13):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k

    def signature(self, tokens: list[str]) -> np.ndarray | None:
        sh = _shingle_hashes(tokens, self.k)
        if len(sh) == 0:
            return None
        # (num_perm, n_shingles) universal hashing over a Mersenne prime
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs, bands, bhashes = [], [], []
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_pylist()
        for i, text in zip(ids, texts):
            sig = self.signature(tokenize_py(text))
            if sig is None:
                continue
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                h = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                docs.append(i)
                bands.append(b)
                bhashes.append(h)
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "band": pa.array(bands, pa.int64()),
                "band_hash": pa.array(bhashes, pa.string()),
            }
        )


def minhash_candidate_pairs(
    ds: "rd.Dataset", num_perm: int = 64, bands: int = 16, shingle_k: int = 3
) -> "rd.Dataset":
    """LSH bucket groupby -> unordered candidate pairs (a < b)."""

    def pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(np.asarray(group["doc_id"], dtype=np.int64).tolist()))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=2,
    )
    cand = sigs.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pyarrow")
    # same pair can collide in several bands -> distinct
    return cand.groupby(["a", "b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def verify_jaccard_pairs(
    pairs: list[tuple[int, int]],
    docs_ds: "rd.Dataset",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> pa.Table:
    """Exact-Jaccard verification of candidate pairs.

    The candidate doc set is tiny relative to the corpus (that is LSH's
    whole point), so shingle sets for *candidate docs only* are computed
    distributed and the pairwise check happens on the driver. At 10^12
    scale this step becomes a bucketed self-join on pair ids."""
    need = sorted({d for p in pairs for d in p})
    need_set = set(need)

    def shingles(batch: pa.Table) -> pa.Table:
        out_id, out_sh = [], []
        for i, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if i in need_set:
                out_id.append(i)
                out_sh.append(_shingle_hashes(tokenize_py(text), shingle_k).tolist())
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()),
             "sh": pa.array(out_sh, pa.list_(pa.int64()))}
        )

    got = {}
    for b in docs_ds.map_batches(shingles, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for i, sh in zip(b["doc_id"].to_pylist(), b["sh"].to_pylist()):
            got[i] = set(sh)
    a_out, b_out, j_out = [], [], []
    for a, b2 in sorted(pairs):
        sa, sb = got.get(a, set()), got.get(b2, set())
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            from quickray.util import round_sql

            a_out.append(a)
            b_out.append(b2)
            j_out.append(float(round_sql(j, 4)))
    return pa.table(
        {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64()),
         "jaccard": pa.array(j_out, pa.float64())}
    )


def minhash_near_duplicates(
    ds: "rd.Dataset", threshold: float = 0.5, num_perm: int = 64,
    bands: int = 16, shingle_k: int = 3,
) -> pa.Table:
    """Full MinHash-LSH near-dup pipeline: bucket -> candidates -> verify."""
    cand = [
        (r["a"], r["b"])
        for r in minhash_candidate_pairs(ds, num_perm, bands, shingle_k).take_all()
    ]
    return verify_jaccard_pairs(cand, ds, shingle_k, threshold)


def simhash_signatures(ds: "rd.Dataset") -> "rd.Dataset":
    """64-bit SimHash over token multisets (vectorized bit-count)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch["text"].to_pylist():
            toks = tokenize_py(text)
            if not toks:
                out.append(0)
                continue
            h = _hash64(toks).astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for k in np.flatnonzero(v > 0):
                sig |= np.uint64(1) << np.uint64(k)
            out.append(int(sig.astype(np.int64)))
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.int64())})

    return ds.map_batches(per_batch, batch_format="pyarrow")


def ngram_jaccard_pairs(
    ds: "rd.Dataset", max_doc_id: int, shingle_k: int = 3, threshold: float = 0.2
) -> pa.Table:
    """Exact all-pairs token-set Jaccard on docs with doc_id < max_doc_id
    (bounded, so it stays oracle-checkable in SQL)."""
    import pyarrow.compute as pc

    sub = ds.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], max_doc_id)),
        batch_format="pyarrow",
    )
    pairs = [
        (a, b)
        for a in range(max_doc_id)
        for b in range(a + 1, max_doc_id)
    ]
    return verify_jaccard_pairs(pairs, sub, shingle_k=shingle_k, threshold=threshold)
