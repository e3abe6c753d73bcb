"""The Ray Data index-build pipeline (SURVEY.md §7.2/§7.4).

Phases (each a checkpointed Dataset pipeline, see checkpoint.Manifest):

  corpus_ids  read corpus -> deterministic doc_id -> +sha256 +doc_len
  stats       N / total_tokens / avgdl (aggregate) + hot-term detection
              (per-batch partial df -> groupby sum -> threshold)
  postings    actor-pool tokenizer -> (term, doc_id, tf, dl, bits, salt)
              -> groupby((term, salt)) -> sorted delta+varint partials
  merge       groupby(term) over partials -> ordered concat of salted
              runs -> block-max metadata -> final posting segments
  docmeta     forward-index analog (doc_id, repo, path, commit, lang,
              sha256, doc_len, bits)

Skew: hot terms (df > hot_df) are salted with contiguous doc_id-range
salts (salt = doc_id * S // N), capping the largest shuffle partition at
~1/S of the hottest term; the merge phase concatenates the runs in salt
order — already globally sorted, no re-sort (SURVEY §7.4).

Scale notes: every stage is a streaming map_batches / groupby over
Arrow; nothing materializes the corpus on the driver. The corpus_ids
checkpoint re-writes content once (storage x2) to make every later
phase resumable without re-running the doc_id sort; at 10^12-file scale
that is the intended durability/compute tradeoff.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from quickray.checkpoint import Manifest
from quickray.codec import block_max_metadata, encode_postings, varint_encode
from quickray.docids import assign_doc_ids
from quickray.schema import BLOCK_SIZE, LANGS, PARTIAL_SCHEMA, SEGMENT_SCHEMA
from quickray.scoring import bm25_contrib
from quickray.tokenize import Tokenizer, flatten_tokens


def _sha256_col(t: pa.Table) -> pa.Table:
    digests = [hashlib.sha256(s.encode()).hexdigest() for s in t["content"].to_pylist()]
    return t.append_column("sha256", pa.array(digests, pa.string()))


def _doc_len_col(t: pa.Table) -> pa.Table:
    from quickray.tokenize import doc_lengths

    return t.append_column("doc_len", pa.array(doc_lengths(t["content"], t.num_rows)))


def _partial_df(t: pa.Table) -> pa.Table:
    """Per-batch partial document frequencies. Docs never span batches,
    so summing partials over batches gives exact df (the pre-aggregation
    that keeps the stats shuffle small)."""
    flat, parents = flatten_tokens(t["content"])
    pairs = pa.table({"term": flat, "d": parents}).group_by(["term", "d"]).aggregate([])
    out = pairs.group_by("term").aggregate([([], "count_all")])
    return pa.table({"term": out["term"], "partial_df": out["count_all"]})


def _encode_partial(group: pa.Table) -> pa.Table:
    """One (term, salt) group -> one encoded partial-posting row."""
    if group.num_rows == 0:
        return PARTIAL_SCHEMA.empty_table()
    doc = np.asarray(group["doc_id"], dtype=np.int64)
    order = np.argsort(doc, kind="stable")
    doc = doc[order]
    tf = np.asarray(group["tf"], dtype=np.int64)[order]
    dl = np.asarray(group["dl"], dtype=np.int64)[order]
    bits = np.asarray(group["bits"], dtype=np.int64)[order]
    return pa.table(
        {
            "term": [group["term"][0].as_py()],
            "salt": [group["salt"][0].as_py()],
            "df": [len(doc)],
            "postings": [encode_postings(doc)],
            "tfs": [varint_encode(tf)],
            "dls": [varint_encode(dl)],
            "bitsv": [varint_encode(bits)],
        },
        schema=PARTIAL_SCHEMA,
    )


def _make_merge_fn(n_docs: int, avgdl: float, block_size: int, num_shards: int):
    """groupby(term) finalizer: ordered concat of salted runs + block-max."""

    def merge_term(group: pa.Table) -> pa.Table:
        from quickray.codec import decode_postings, varint_decode

        if group.num_rows == 0:
            return SEGMENT_SCHEMA.empty_table()
        term = group["term"][0].as_py()
        salts = np.asarray(group["salt"], dtype=np.int64)
        order = np.argsort(salts, kind="stable")
        docs, tfs, dls, bits = [], [], [], []
        for i in order:
            docs.append(decode_postings(group["postings"][i].as_py()))
            tfs.append(varint_decode(group["tfs"][i].as_py()))
            dls.append(varint_decode(group["dls"][i].as_py()))
            bits.append(varint_decode(group["bitsv"][i].as_py()))
        doc = np.concatenate(docs)
        tf = np.concatenate(tfs)
        dl = np.concatenate(dls)
        bt = np.concatenate(bits)
        if len(doc) > 1 and np.any(np.diff(doc) <= 0):
            raise AssertionError(f"salted merge produced unsorted postings for {term!r}")
        df = len(doc)
        scores = bm25_contrib(tf, dl, df, n_docs, avgdl)
        last, bmax = block_max_metadata(doc, scores, block_size)
        shard = int.from_bytes(
            hashlib.md5(term.encode()).digest()[:8], "little"
        ) % num_shards
        return pa.table(
            {
                "term": [term],
                "df": [df],
                "postings": [encode_postings(doc)],
                "tfs": [varint_encode(tf)],
                "dls": [varint_encode(dl)],
                "bitsv": [varint_encode(bt)],
                "block_last": [last],
                "block_max": [bmax],
                "shard": [shard],
            },
            schema=SEGMENT_SCHEMA,
        )

    return merge_term


@dataclass
class BuildResult:
    out_dir: str
    stats: dict[str, Any] = field(default_factory=dict)
    phase_times: dict[str, float] = field(default_factory=dict)

    @property
    def segments_dir(self) -> str:
        return os.path.join(self.out_dir, "segments")

    @property
    def docmeta_dir(self) -> str:
        return os.path.join(self.out_dir, "docmeta")


def _load_source(source) -> tuple["rd.Dataset", str]:
    if isinstance(source, str):
        return rd.read_parquet(source), f"path:{source}"
    if isinstance(source, pa.Table):
        fp = f"table:rows={source.num_rows}:schema={source.schema.names}"
        return rd.from_arrow(source), fp
    return source, f"dataset:{source.schema().names}"


def build_index(
    source,
    out_dir: str,
    *,
    id_col: str | None = None,
    langs: list[str] | None = None,
    hot_df: int | None = None,
    num_salts: int = 8,
    num_shards: int = 32,
    tokenizer_concurrency: int | None = None,
    block_size: int = BLOCK_SIZE,
) -> BuildResult:
    """Run (or resume) the full index build. Ray must be initialised by
    the caller (never calls ray.init itself)."""
    langs = langs or LANGS
    ds, fingerprint = _load_source(source)
    man = Manifest(out_dir, fingerprint)
    result = BuildResult(out_dir=out_dir)
    cpus = int(ray.cluster_resources().get("CPU", 8))

    # ---------------------------------------------------- phase corpus_ids
    t0 = time.time()
    ids_dir = os.path.join(out_dir, "corpus_ids")
    if not man.phase_done("corpus_ids"):
        d = man.phase_dir("corpus_ids")
        if id_col is None:
            with_ids = assign_doc_ids(ds)
        else:
            with_ids = ds
            if id_col != "doc_id":
                with_ids = with_ids.rename_columns({id_col: "doc_id"})
        with_ids = with_ids.map_batches(
            _sha256_col, batch_format="pyarrow"
        ).map_batches(_doc_len_col, batch_format="pyarrow")
        with_ids.write_parquet(d)
        man.mark_done("corpus_ids", elapsed=time.time() - t0,
                      counters={"id_mode": id_col or "rank(repo,path)"})
    result.phase_times["corpus_ids"] = time.time() - t0

    # --------------------------------------------------------- phase stats
    t0 = time.time()
    stats_path = os.path.join(out_dir, "stats", "stats.json")
    if not man.phase_done("stats"):
        d = man.phase_dir("stats")
        lens = rd.read_parquet(ids_dir, columns=["doc_id", "doc_len"])
        agg = lens.aggregate(
            Count(), Sum("doc_len", alias_name="total_tokens"),
            Min("doc_id", alias_name="min_id"), Max("doc_id", alias_name="max_id"),
        )
        n_docs = int(agg["count()"])
        total_tokens = int(agg["total_tokens"])
        if not (agg["min_id"] == 0 and agg["max_id"] == n_docs - 1):
            raise ValueError(
                f"doc_ids must be dense 0..N-1 (got min={agg['min_id']} "
                f"max={agg['max_id']} n={n_docs}); pass id_col=None to rank-assign"
            )
        avgdl = total_tokens / max(1, n_docs)
        threshold = hot_df if hot_df is not None else max(256, n_docs // 8)
        dfs = (
            rd.read_parquet(ids_dir, columns=["content"])
            .map_batches(_partial_df, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("partial_df", alias_name="df"))
        )
        vocab_size = dfs.count()
        hot_rows = dfs.map_batches(
            lambda t: t.filter(np.asarray(t["df"]) > threshold),
            batch_format="pyarrow",
        ).take_all()
        hot_terms = sorted(r["term"] for r in hot_rows)
        stats = {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": avgdl,
            "vocab_size": int(vocab_size),
            "hot_df_threshold": int(threshold),
            "hot_terms": hot_terms,
            "num_salts": num_salts,
            "block_size": block_size,
            "langs": langs,
        }
        with open(os.path.join(d, "stats.json"), "w") as f:
            json.dump(stats, f)
        man.mark_done("stats", with_files=False, elapsed=time.time() - t0,
                      counters={k: v for k, v in stats.items() if k != "hot_terms"})
    with open(stats_path) as f:
        stats = json.load(f)
    result.stats = stats
    result.phase_times["stats"] = time.time() - t0

    # ------------------------------------------------------ phase postings
    t0 = time.time()
    partials_dir = os.path.join(out_dir, "postings")
    if not man.phase_done("postings"):
        d = man.phase_dir("postings")
        hot_ref = ray.put(frozenset(stats["hot_terms"]))
        conc = tokenizer_concurrency or max(2, min(16, cpus - 2))
        toks = rd.read_parquet(
            ids_dir, columns=["doc_id", "lang", "path", "content", "doc_len"]
        ).map_batches(
            Tokenizer,
            fn_constructor_kwargs={
                "hot_ref": hot_ref,
                "n_docs": stats["n_docs"],
                "num_salts": num_salts,
                "avgdl": stats["avgdl"],
                "langs": langs,
            },
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=conc,
            num_cpus=1,
        )
        toks.groupby(["term", "salt"]).map_groups(
            _encode_partial, batch_format="pyarrow"
        ).write_parquet(d)
        man.mark_done("postings", elapsed=time.time() - t0)
    result.phase_times["postings"] = time.time() - t0

    # ------------------------------------------------ phase merge/segments
    t0 = time.time()
    if not man.phase_done("segments"):
        d = man.phase_dir("segments")
        (
            rd.read_parquet(partials_dir)
            .groupby("term")
            .map_groups(
                _make_merge_fn(stats["n_docs"], stats["avgdl"], block_size, num_shards),
                batch_format="pyarrow",
            )
            .write_parquet(d)
        )
        man.mark_done("segments", elapsed=time.time() - t0)
    result.phase_times["merge"] = time.time() - t0

    # ------------------------------------------------------- phase docmeta
    t0 = time.time()
    if not man.phase_done("docmeta"):
        d = man.phase_dir("docmeta")
        avgdl = stats["avgdl"]

        def add_bits(t: pa.Table) -> pa.Table:
            from quickray.scoring import compute_bits

            bits = compute_bits(
                t["lang"].to_pylist(), t["path"].to_pylist(),
                np.asarray(t["doc_len"]), avgdl, langs,
            )
            return t.append_column("bits", pa.array(bits))

        rd.read_parquet(
            ids_dir,
            columns=["doc_id", "repo", "path", "commit", "lang", "sha256", "doc_len"],
        ).map_batches(add_bits, batch_format="pyarrow").write_parquet(d)
        man.mark_done("docmeta", elapsed=time.time() - t0)
    result.phase_times["docmeta"] = time.time() - t0
    return result
