"""The Ray Data index-build pipeline (SURVEY.md §7.2/§7.4).

Phases (each a checkpointed Dataset pipeline, see checkpoint.Manifest):

  corpus_ids  read corpus -> deterministic doc_id -> +sha256 +doc_len
  stats       N / total_tokens / avgdl (aggregate) + hot-term detection
              (sampled per-batch partial df -> groupby sum -> threshold)
  postings    actor-pool tokenizer -> compressed per-batch posting RUNS
              (one row per term per batch, delta+varint streams)
              -> groupby(part = hash(term, salt) % num_parts)
              -> vectorized partition merge -> (term, salt) partials
  merge       groupby(mpart = hash(term) % num_shards) over partials ->
              vectorized partition merge + BM25 block-max metadata ->
              final posting segments
  docmeta     forward-index analog (doc_id, repo, path, commit, lang,
              sha256, doc_len, bits)

Skew: hot terms (df > hot_df) are salted with contiguous doc_id-range
salts (salt = run_min_doc * S // N), spreading a hot term's runs over S
level-1 partitions so the largest shuffle partition stays bounded; the
merge phases re-sort decoded values by (group, doc_id), so correctness
never depends on run arrival order (SURVEY §7.4; merge.py).

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
from quickray.docids import assign_doc_ids
from quickray.merge import make_final_merge, make_level1_merge
from quickray.schema import BLOCK_SIZE, LANGS
from quickray.tokenize import Tokenizer, flatten_tokens


def _segment_row_count(seg_dir: str) -> int:
    """Vocab size from parquet footers only (no data read)."""
    import glob

    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(seg_dir, "*.parquet"))
    )


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
    num_parts: int = 64,
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
        # Hot-term detection runs on a deterministic 1/16 doc sample once
        # the corpus is big enough — the hot set only steers level-1
        # partitioning (salting), never final index content, so sampling
        # cannot change the output. Saves a full tokenize pass at scale.
        sample_mod = 1 if n_docs <= 20_000 else 16
        src = rd.read_parquet(ids_dir, columns=["doc_id", "content"])
        if sample_mod > 1:
            import pyarrow.compute as _pc

            src = src.map_batches(
                lambda t: t.filter(
                    _pc.equal(_pc.bit_wise_and(t["doc_id"], sample_mod - 1), 0)
                ),
                batch_format="pyarrow",
            )
        hot_rows = (
            src.map_batches(_partial_df, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("partial_df", alias_name="df"))
            .map_batches(
                lambda t: t.filter(
                    np.asarray(t["df"]) > threshold // sample_mod
                ),
                batch_format="pyarrow",
            )
            .take_all()
        )
        hot_terms = sorted(r["term"] for r in hot_rows)
        stats = {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": avgdl,
            "hot_df_threshold": int(threshold),
            "hot_sample_mod": sample_mod,
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
    # Tokenizer actors emit compressed per-batch posting runs; the
    # level-1 shuffle groups them by part = hash(term, salt) % num_parts
    # and each map_groups call merges a whole partition vectorized
    # (merge.py). Shuffle payload = varint runs, ~10x smaller than the
    # exploded (term, doc, tf) stream.
    t0 = time.time()
    partials_dir = os.path.join(out_dir, "postings")
    if not man.phase_done("postings"):
        d = man.phase_dir("postings")
        hot_ref = ray.put(frozenset(stats["hot_terms"]))
        conc = tokenizer_concurrency or max(2, min(16, cpus - 2))
        runs = rd.read_parquet(
            ids_dir, columns=["doc_id", "lang", "path", "content", "doc_len"]
        ).map_batches(
            Tokenizer,
            fn_constructor_kwargs={
                "hot_ref": hot_ref,
                "n_docs": stats["n_docs"],
                "num_salts": num_salts,
                "avgdl": stats["avgdl"],
                "langs": langs,
                "emit_runs": True,
                "num_parts": num_parts,
            },
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=conc,
            num_cpus=1,
        )
        runs.groupby("part").map_groups(
            make_level1_merge(num_shards), batch_format="pyarrow"
        ).write_parquet(d)
        man.mark_done("postings", elapsed=time.time() - t0)
    result.phase_times["postings"] = time.time() - t0

    # ------------------------------------------------ phase merge/segments
    # Level-2: one row per (term, salt) in, one final segment row per
    # term out; partition key mpart = hash(term) % num_shards doubles as
    # the segment layout key.
    t0 = time.time()
    if not man.phase_done("segments"):
        d = man.phase_dir("segments")
        (
            rd.read_parquet(partials_dir)
            .groupby("mpart")
            .map_groups(
                make_final_merge(stats["n_docs"], stats["avgdl"], block_size),
                batch_format="pyarrow",
            )
            .write_parquet(d)
        )
        man.mark_done("segments", elapsed=time.time() - t0)
    result.phase_times["merge"] = time.time() - t0
    stats["vocab_size"] = _segment_row_count(os.path.join(out_dir, "segments"))
    with open(stats_path, "w") as f:
        json.dump(stats, f)

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
