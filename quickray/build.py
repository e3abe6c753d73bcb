"""The Ray Data index-build pipeline (SURVEY.md §7.2/§7.4).

Phases (each a checkpointed Dataset pipeline, see checkpoint.Manifest):

  docids    KEY columns only (pruned read) -> rank-ordered key array
            (docids.rank_keys) -> small parquet artifact; broadcast via
            ray.put so every later stage stamps doc_id with a local C++
            hash probe. Content never shuffles for id assignment.
  docbase   one content pass: doc_id + sha256(content) + doc_len ->
            (doc_id, repo, path, commit, lang, sha256, doc_len) table.
            The corpus itself is NOT rewritten (no storage x2, no
            content re-read for later metadata phases).
  stats     n_docs / total_tokens / avgdl from docbase columns (tiny
            columnar agg) + hot-term detection over a deterministic row
            sample of the corpus (the hot set only steers level-1
            partitioning, never output).
  docmeta   docbase + bits(lang, path, doc_len > avgdl) — the forward
            index (J1 analog); no content involved.
  postings  content pass two: actor-pool tokenizer emits compressed
            per-batch posting RUNS (term, salt, part, min_doc, df,
            delta+varint doc_ids, varint tfs) -> groupby(part =
            hash(term, salt) % num_parts) -> vectorized partition merge
            -> one partial posting per (term, salt).
  segments  groupby(mpart = hash(term) % num_shards) over partials ->
            vectorized partition merge; per-posting dl/bits looked up
            from a broadcast doc_id-indexed array (never shuffled);
            BM25 block-max metadata -> final posting segments.

Skew: hot terms (df > hot_df) are salted with contiguous doc_id-range
salts (salt = run_min_doc * S // N), spreading a hot term's runs over S
level-1 partitions so the largest shuffle partition stays bounded; the
merge phases re-sort decoded values by (group, doc_id), so correctness
never depends on run arrival order (SURVEY §7.4; merge.py).

Scale notes: the only all-to-all exchanges are the two run shuffles,
both over varint-compressed payloads pre-aggregated per batch; reads
prune columns; small sides (hot set, rank table, dl/bits) are ray.put
broadcasts. The rank table bounds one build partition to ~10^8 docs
(docids.py); a 10^12-file corpus runs as many independent key-range
build partitions with doc_id offsets from a driver-side prefix sum.
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
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from quickray.checkpoint import Manifest
from quickray.merge import make_final_merge, make_level1_merge
from quickray.schema import BLOCK_SIZE, LANGS
from quickray.tokenize import Tokenizer, flatten_tokens, rank_lookup



def _write_parquet_retry(ds: "rd.Dataset", dest: str, attempts: int = 4) -> None:
    """write_parquet with a retry on the fsspec concurrent-import race:
    Ray's path resolution does `from fsspec.implementations.http import
    HTTPFileSystem` on every call; with aiohttp absent that import
    fails, and when two driver threads hit it simultaneously one can
    observe a partially-initialized module and get a plain ImportError
    Ray doesn't catch (it handles only ModuleNotFoundError). The error
    fires during PRE-EXECUTION path resolution, so retrying is safe —
    nothing has been written."""
    for attempt in range(attempts):
        try:
            ds.write_parquet(dest)
            return
        except ImportError as e:
            if "fsspec" not in str(e) or attempt == attempts - 1:
                raise
            time.sleep(0.2 * (attempt + 1))


def _segment_row_count(seg_dir: str) -> int:
    """Vocab size from parquet footers only (no data read)."""
    import glob

    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(seg_dir, "**", "*.parquet"), recursive=True)
    )


def _chunk_bounds(n: int, chunks: int) -> list[tuple[int, int]]:
    """Split range(n) into ≤chunks contiguous [lo, hi) spans."""
    chunks = max(1, min(chunks, n))
    step = (n + chunks - 1) // chunks
    return [(lo, min(lo + step, n)) for lo in range(0, n, step)]


def _partial_df(t: pa.Table) -> pa.Table:
    """Per-batch partial document frequencies. Docs never span batches,
    so summing partials over batches gives exact df (the pre-aggregation
    that keeps the stats shuffle small)."""
    flat, parents = flatten_tokens(t["content"])
    pairs = pa.table({"term": flat, "d": parents}).group_by(["term", "d"]).aggregate([])
    out = pairs.group_by("term").aggregate([([], "count_all")])
    return pa.table({"term": out["term"], "partial_df": out["count_all"]})


# per-worker cache of the rank table's binary-search view, keyed by
# the broadcast ObjectRef (unique per build) — same pattern as
# _WORKER_TOKENIZERS; avoids rebuilding a million-entry probe per batch
_WORKER_RANK_NP: dict[str, "np.ndarray"] = {}


def _make_docbase_fn(rank_ref, id_col_present: bool):
    def to_docbase(t: pa.Table) -> pa.Table:
        from quickray.tokenize import doc_lengths, rank_probe_np

        if id_col_present:
            doc_id = t["doc_id"]
            if isinstance(doc_id, pa.ChunkedArray):
                doc_id = doc_id.combine_chunks()
        else:
            key = rank_ref.hex()
            ranked_np = _WORKER_RANK_NP.get(key)
            if ranked_np is None:
                if len(_WORKER_RANK_NP) > 4:
                    _WORKER_RANK_NP.clear()
                ranked_np = rank_probe_np(ray.get(rank_ref))
                _WORKER_RANK_NP[key] = ranked_np
            doc_id = rank_lookup(t, None, ranked_np)
        digests = [
            hashlib.sha256(s.encode()).hexdigest()
            for s in t["content"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": doc_id,
                "repo": t["repo"],
                "path": t["path"],
                "commit": t["commit"],
                "lang": t["lang"],
                "sha256": pa.array(digests, pa.string()),
                "doc_len": pa.array(doc_lengths(t["content"], t.num_rows)),
            }
        )

    return to_docbase


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


class _Source:
    """Uniform column-pruned reader over the three accepted source
    forms (parquet path, pyarrow Table, ray Dataset)."""

    def __init__(self, source):
        self.raw = source
        if isinstance(source, str):
            # content-sensitive from parquet footers: compressed sizes +
            # column statistics change on practically any rewrite (a
            # crafted same-size same-stats edit can still slip past —
            # delta flows that need certainty use data_signature())
            sig = hashlib.sha256()
            try:
                dset = pads.dataset(source, format="parquet")
                for frag in sorted(dset.get_fragments(), key=lambda f: f.path):
                    md = frag.metadata
                    sig.update(
                        f"{os.path.basename(frag.path)}:{md.num_rows}:"
                        f"{md.serialized_size}".encode()
                    )
                    for i in range(md.num_row_groups):
                        rg = md.row_group(i)
                        for c in range(rg.num_columns):
                            col = rg.column(c)
                            st = col.statistics
                            sig.update(
                                f"{col.total_compressed_size}:"
                                f"{st.min if st and st.has_min_max else ''}:"
                                f"{st.max if st and st.has_min_max else ''}".encode()
                            )
                self.fingerprint = f"path:{source}:sig={sig.hexdigest()[:16]}"
            except (OSError, pa.ArrowInvalid):
                self.fingerprint = f"path:{source}"
        elif isinstance(source, pa.Table):
            # content-sensitive: same-shape different-content tables must
            # not resume into each other's build dir
            h = hashlib.sha256()
            n = source.num_rows
            step = max(1, n // 64)
            sample = source.take(np.arange(0, n, step, dtype=np.int64))
            for col in ("repo", "path", "content"):
                if col in source.column_names:
                    for v in sample[col].to_pylist():
                        h.update((v or "").encode())
            self.fingerprint = (
                f"table:rows={n}:schema={source.schema.names}"
                f":sha={h.hexdigest()[:16]}"
            )
        else:
            self.fingerprint = f"dataset:{source.schema().names}"

    def read(self, cols: list[str]) -> "rd.Dataset":
        if isinstance(self.raw, str):
            return rd.read_parquet(self.raw, columns=cols)
        if isinstance(self.raw, pa.Table):
            return rd.from_arrow(self.raw.select(cols))
        return self.raw.select_columns(cols)

    def keys_table(self) -> pa.Table:
        """Driver-side (repo, path) key table — pruned read, ~1-2% of
        corpus bytes."""
        if isinstance(self.raw, str):
            return pads.dataset(self.raw, format="parquet").to_table(
                columns=["repo", "path"]
            )
        if isinstance(self.raw, pa.Table):
            return self.raw.select(["repo", "path"])
        refs = self.raw.select_columns(["repo", "path"]).to_arrow_refs()
        return pa.concat_tables(ray.get(refs))

    def data_signature(self) -> str:
        """Order-independent full-content signature — one streaming
        columnar pass over any source form. Collision-resistant
        construction (this gates delta rebuilds — a spurious match
        would serve a stale partition): per-row sha256(repo, path,
        content), accumulated as two independent mod-2^62 sums over
        disjoint 8-byte digest windows (~124 bits of accumulator;
        modular sums of cryptographic digests stay collision-resistant
        for non-adversarial and adversarial-rewrite cases alike,
        unlike the crc32 sum this replaces) plus the exact row count."""

        def sigb(t: pa.Table) -> pa.Table:
            s1 = s2 = 0
            for r, p, c in zip(
                t["repo"].to_pylist(), t["path"].to_pylist(),
                t["content"].to_pylist(),
            ):
                d = hashlib.sha256(f"{r}\x01{p}\x01{c or ''}".encode()).digest()
                s1 += int.from_bytes(d[:8], "little")
                s2 += int.from_bytes(d[8:16], "little")
            return pa.table(
                {
                    "s1": pa.array([s1 % (1 << 62)], pa.int64()),
                    "s2": pa.array([s2 % (1 << 62)], pa.int64()),
                    "n": pa.array([t.num_rows], pa.int64()),
                }
            )

        from ray.data.aggregate import Sum

        agg = (
            self.read(["repo", "path", "content"])
            .map_batches(sigb, batch_format="pyarrow")
            .aggregate(
                Sum("s1", alias_name="s1"),
                Sum("s2", alias_name="s2"),
                Sum("n", alias_name="n"),
            )
        )
        s1 = int(agg["s1"] or 0) % (1 << 62)
        s2 = int(agg["s2"] or 0) % (1 << 62)
        return f"datasig:{s1}:{s2}:{int(agg['n'] or 0)}"

    def sample_content(self, mod: int) -> tuple["rd.Dataset", float]:
        """~1/mod deterministic sample of the content column and the
        actual inverse sampling fraction. For multi-file parquet sources
        the sample is file-stride (only 1/mod of files is even READ —
        the prune-at-the-read version of row sampling); otherwise
        row-stride within batches."""
        if mod <= 1:
            return self.read(["content"]), 1.0
        if isinstance(self.raw, str):
            import glob

            pat = (
                os.path.join(self.raw, "*.parquet")
                if os.path.isdir(self.raw)
                else self.raw
            )
            files = sorted(glob.glob(pat))
            if len(files) >= 2 * mod:
                picked = files[::mod]
                return (
                    rd.read_parquet(picked, columns=["content"]),
                    len(files) / len(picked),
                )
        ds = self.read(["content"]).map_batches(
            lambda t: t.take(np.arange(0, t.num_rows, mod)),
            batch_format="pyarrow",
        )
        return ds, float(mod)


def build_partitioned(
    source,
    out_root: str,
    n_partitions: int,
    **build_kwargs,
) -> list[str]:
    """10^12-scale orchestration unit: split the corpus into contiguous
    (repo, path) key ranges, repartition the corpus storage once (hive
    by range id — one streaming pass, no shuffle of content beyond the
    write), then run one INDEPENDENT build_index per range. Each
    partition is separately resumable/retryable; doc_ids are dense per
    partition, and engine.PartitionedEngine serves the union with
    corpus-global statistics, provably equal to one global build
    (tests/test_partitioned.py). Cut keys come from exact driver-side
    key quantiles here; at extreme scale use a distributed sort sample.
    """
    src = _Source(source)
    # partition boundaries are persisted on first build and reused on
    # every rerun — stable key ranges are what make a rerun on an
    # updated corpus a DELTA build: only partitions whose bytes changed
    # re-index (build_index's content-sensitive fingerprint skips the
    # rest), the batch analog of the reference's AddDoc/DeleteDoc upsert
    os.makedirs(out_root, exist_ok=True)
    spec_path = os.path.join(out_root, "partition_spec.json")
    if os.path.exists(spec_path):
        with open(spec_path) as f:
            spec = json.load(f)
        cuts = spec["cuts"]
        n_partitions = spec["n_partitions"]
    else:
        from quickray.docids import rank_keys

        srt = rank_keys(src.keys_table())  # sorted keys + duplicate guard
        n = len(srt)
        n_partitions = max(1, min(n_partitions, n))
        cuts = [
            srt[(i * n) // n_partitions].as_py()
            for i in range(1, n_partitions)
        ]
        with open(spec_path + ".tmp", "w") as f:
            json.dump({"cuts": cuts, "n_partitions": n_partitions}, f)
        os.replace(spec_path + ".tmp", spec_path)
    cuts_arr = np.array(cuts, dtype=object)

    def add_kpart(t: pa.Table) -> pa.Table:
        from quickray.tokenize import row_keys

        k = np.asarray(row_keys(t), dtype=object)
        kp = np.searchsorted(cuts_arr, k, side="right")
        return t.append_column("kpart", pa.array(kp, pa.int64()))

    # corpus repartition runs per source version, gated by the FULL data
    # signature (footer/sample fingerprints miss same-size edits and
    # can't see ray Dataset contents at all)
    corpus_root = os.path.join(out_root, "corpus_parts")
    ver_path = os.path.join(corpus_root, "_VERSION")
    src_sig = src.data_signature()
    prev = open(ver_path).read() if os.path.exists(ver_path) else None
    if prev != src_sig:
        import shutil as _sh

        _sh.rmtree(corpus_root, ignore_errors=True)
        src.read(
            ["repo", "path", "commit", "lang", "content"]
        ).map_batches(add_kpart, batch_format="pyarrow").write_parquet(
            corpus_root, partition_cols=["kpart"]
        )
        with open(ver_path, "w") as f:
            f.write(src_sig)
    import glob as _glob

    dirs = []
    for i in range(n_partitions):
        part_src = os.path.join(corpus_root, f"kpart={i}")
        out = os.path.join(out_root, f"part_{i:05d}")
        if not _glob.glob(os.path.join(part_src, "*.parquet")):
            # a key range emptied by deletes: no hive dir is written;
            # served corpus simply omits this partition
            continue
        # data-based signature (order-independent row crc sum), not
        # file-based: a corpus rewrite with identical rows must NOT
        # re-index the partition — this is what turns a rerun into a
        # delta build touching only changed key ranges
        build_index(
            part_src, out,
            fingerprint=_Source(part_src).data_signature(),
            **build_kwargs,
        )
        dirs.append(out)
    return dirs


def build_index(
    source,
    out_dir: str,
    *,
    id_col: str | None = None,
    langs: list[str] | None = None,
    hot_df: int | None = None,
    num_salts: int = 8,
    # 256 merge groups balance the final merge far better than 64 (the
    # hot-term mparts stop being 4x stragglers: measured segments phase
    # 26s -> 16s at 1M docs / 16 cpus); size these to ~8-16x the worker
    # count at cluster scale
    num_shards: int = 256,
    num_parts: int = 256,
    durable_shuffle: bool = False,
    shuffle_chunks: int = 4,
    tokenizer_concurrency: int | None = None,
    tokenizer_batch_size: int = 4096,
    block_size: int = BLOCK_SIZE,
    fingerprint: str | None = None,
) -> BuildResult:
    """Run (or resume) the full index build. Ray must be initialised by
    the caller (never calls ray.init itself). ``fingerprint`` overrides
    the source identity (callers that know a stronger content signature,
    e.g. build_partitioned's per-partition data signature)."""
    langs = langs or LANGS
    src = _Source(source)
    if fingerprint is not None:
        src.fingerprint = fingerprint
    # layout-critical params join the fingerprint: resuming a build dir
    # with a different shuffle/segment layout must invalidate, never
    # silently mix chunk bounds (the partials/segments on disk encode
    # num_parts/num_shards/num_salts/block_size)
    layout = (
        f"|layout:parts={num_parts},shards={num_shards},salts={num_salts},"
        f"chunks={shuffle_chunks if durable_shuffle else 0},bs={block_size}"
    )
    man = Manifest(out_dir, src.fingerprint + layout)
    result = BuildResult(out_dir=out_dir)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    use_rank = id_col is None

    # ------------------------------------------------------- phase docids
    t0 = time.time()
    keys_path = os.path.join(out_dir, "docids", "keys.parquet")
    rank_ref = None
    if use_rank:
        if not man.phase_done("docids"):
            d = man.phase_dir("docids")
            from quickray.docids import rank_keys

            ranked = rank_keys(src.keys_table())
            pq.write_table(pa.table({"key": ranked}), keys_path)
            man.mark_done("docids", elapsed=time.time() - t0,
                          counters={"n_docs": len(ranked)})
        ranked = pq.read_table(keys_path)["key"].combine_chunks()
        if len(ranked) == 0:
            raise ValueError(
                "empty corpus: the source has 0 rows — nothing to index"
            )
        rank_ref = ray.put(ranked)
        n_docs_expected = len(ranked)
    else:
        if not man.phase_done("docids"):
            man.phase_dir("docids")
            man.mark_done("docids", with_files=False, elapsed=time.time() - t0,
                          counters={"id_mode": f"column:{id_col}"})
        n_docs_expected = None
    result.phase_times["docids"] = time.time() - t0

    # ------------------------------------------------------ phase docbase
    t0 = time.time()
    docbase_dir = os.path.join(out_dir, "docbase")
    base_cols = ["repo", "path", "commit", "lang", "content"]
    if not use_rank:
        base_cols = [id_col] + base_cols
    if not man.phase_done("docbase"):
        d = man.phase_dir("docbase")
        ds = src.read(base_cols)
        if not use_rank and id_col != "doc_id":
            ds = ds.rename_columns({id_col: "doc_id"})
        ds.map_batches(
            _make_docbase_fn(rank_ref, not use_rank), batch_format="pyarrow"
        ).write_parquet(d)
        man.mark_done("docbase", elapsed=time.time() - t0,
                      counters={"id_mode": id_col or "rank(repo,path)"})
    result.phase_times["docbase"] = time.time() - t0

    # --------------------------------------------------------- phase stats
    t0 = time.time()
    stats_path = os.path.join(out_dir, "stats", "stats.json")
    if not man.phase_done("stats"):
        d = man.phase_dir("stats")
        if pads.dataset(docbase_dir, format="parquet").count_rows() == 0:
            # id_col path can't know emptiness before the docbase pass
            raise ValueError(
                "empty corpus: the source produced 0 docbase rows — "
                "nothing to index (check the source path/table)"
            )
        lens = rd.read_parquet(docbase_dir, columns=["doc_id", "doc_len"])
        agg = lens.aggregate(
            Count(), Sum("doc_len", alias_name="total_tokens"),
            Min("doc_id", alias_name="min_id"), Max("doc_id", alias_name="max_id"),
        )
        if agg is None or not agg.get("count()"):
            raise ValueError(
                "empty corpus: the source produced 0 docbase rows — "
                "nothing to index (check the source path/table)"
            )
        n_docs = int(agg["count()"])
        total_tokens = int(agg["total_tokens"])
        if not (agg["min_id"] == 0 and agg["max_id"] == n_docs - 1):
            raise ValueError(
                f"doc_ids must be dense 0..N-1 (got min={agg['min_id']} "
                f"max={agg['max_id']} n={n_docs}); pass id_col=None to rank-assign"
            )
        if n_docs_expected is not None and n_docs != n_docs_expected:
            raise ValueError(
                f"docbase rows ({n_docs}) != rank table size ({n_docs_expected})"
            )
        avgdl = total_tokens / max(1, n_docs)
        threshold = hot_df if hot_df is not None else max(256, n_docs // 8)
        # Hot-term detection on a deterministic 1-in-16 row sample once
        # the corpus is big enough — the hot set only steers level-1
        # partitioning (salting), never final index content, so sampling
        # cannot change the output. Saves a full tokenize pass at scale.
        sample_mod = 1 if n_docs <= 20_000 else 16
        sample, inv_frac = src.sample_content(sample_mod)
        sampled_threshold = int(threshold / inv_frac)
        hot_rows = (
            sample.map_batches(_partial_df, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("partial_df", alias_name="df"))
            .map_batches(
                lambda t: t.filter(
                    np.asarray(t["df"]) > sampled_threshold
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
            "num_shards": num_shards,
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

    # ------------------------------------------------------- phase docmeta
    t0 = time.time()
    docmeta_dir = os.path.join(out_dir, "docmeta")
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

        rd.read_parquet(docbase_dir).map_batches(
            add_bits, batch_format="pyarrow"
        ).write_parquet(d)
        man.mark_done("docmeta", elapsed=time.time() - t0)
    result.phase_times["docmeta"] = time.time() - t0

    # -------------------------------------------------------- the shuffle
    # Tokenizer emits compressed per-batch posting runs (one row per
    # term per batch, delta+varint streams — ~10x smaller than the
    # exploded (term, doc, tf) rows).
    #
    # Two execution modes:
    #  - streaming (default): tokenize -> groupby(part) -> level-1 merge
    #    as ONE pipeline; Ray lineage re-executes failed tasks, resume
    #    granularity is the phase. Fastest.
    #  - durable_shuffle=True: the map side of the exchange is
    #    checkpointed to runs/ hive-partitioned by part, and both merge
    #    levels run as shuffle_chunks independently-manifested chunks
    #    over part/mpart ranges — a DRIVER/cluster restart resumes
    #    mid-shuffle, never re-tokenizing and never redoing a finished
    #    chunk. Costs one extra write+read of the compressed runs; the
    #    right default for multi-hour 10^12-file builds.
    hot_ref = ray.put(frozenset(stats["hot_terms"]))
    tok_kwargs = {
        "hot_ref": hot_ref,
        "n_docs": stats["n_docs"],
        "num_salts": num_salts,
        "emit_runs": True,
        "num_parts": num_parts,
        "rank_ref": rank_ref,
    }

    def _runs_ds() -> "rd.Dataset":
        tok_cols = ["content"] + ([id_col] if not use_rank else ["repo", "path"])
        ds = src.read(tok_cols)
        if not use_rank and id_col != "doc_id":
            ds = ds.rename_columns({id_col: "doc_id"})
        if tokenizer_concurrency:
            # actor-pool form (state in __init__); reserves its CPUs for
            # the phase — prefer task mode unless actors are required
            return ds.map_batches(
                Tokenizer,
                fn_constructor_kwargs=tok_kwargs,
                batch_format="pyarrow",
                batch_size=tokenizer_batch_size,
                concurrency=tokenizer_concurrency,
                num_cpus=1,
            )
        # task mode: per-worker cached state, dynamic scheduling shares
        # all CPUs with the overlapping shuffle/merge tasks
        from quickray.tokenize import make_run_tokenizer

        return ds.map_batches(
            make_run_tokenizer(out_dir, **tok_kwargs),
            batch_format="pyarrow",
            # larger batches -> fewer, longer runs per term -> fewer
            # shuffle rows (measured 2x on the postings phase); bound by
            # batch_size x doc size per task heap — lower it for corpora
            # of very large files
            batch_size=tokenizer_batch_size,
        )

    def _dl_bits_ref():
        dm = pq.read_table(docmeta_dir, columns=["doc_id", "doc_len", "bits"])
        order = np.asarray(dm["doc_id"])
        dl_arr = np.zeros(stats["n_docs"], dtype=np.int64)
        bits_arr = np.zeros(stats["n_docs"], dtype=np.int64)
        dl_arr[order] = np.asarray(dm["doc_len"])
        bits_arr[order] = np.asarray(dm["bits"])
        return ray.put((dl_arr, bits_arr))

    partials_dir = os.path.join(out_dir, "postings")
    if not durable_shuffle:
        # ---------------------------------- streaming postings + segments
        t0 = time.time()
        if not man.phase_done("postings"):
            d = man.phase_dir("postings")
            _runs_ds().groupby("part").map_groups(
                make_level1_merge(num_shards), batch_format="pyarrow"
            ).write_parquet(d)
            man.mark_done("postings", elapsed=time.time() - t0)
        result.phase_times["postings"] = time.time() - t0

        t0 = time.time()
        if not man.phase_done("segments"):
            d = man.phase_dir("segments")
            (
                rd.read_parquet(partials_dir)
                .groupby("mpart")
                .map_groups(
                    make_final_merge(
                        stats["n_docs"], stats["avgdl"], block_size,
                        _dl_bits_ref(),
                    ),
                    batch_format="pyarrow",
                )
                .write_parquet(d)
            )
            man.mark_done("segments", elapsed=time.time() - t0)
        result.phase_times["segments"] = time.time() - t0
    else:
        # ------------------------- durable runs + chunked merge levels
        t0 = time.time()
        runs_dir = os.path.join(out_dir, "runs")
        if not man.phase_done("runs"):
            d = man.phase_dir("runs")
            _runs_ds().write_parquet(d, partition_cols=["part"])
            man.mark_done("runs", elapsed=time.time() - t0)
        result.phase_times["runs"] = time.time() - t0

        # chunked merges run CONCURRENTLY from driver threads (each
        # chunk is its own Dataset pipeline; Ray interleaves their
        # tasks) — resume granularity stays per chunk, but the phase
        # barriers between chunks no longer serialize the wall clock
        # (sequential chunks measured ~2.5x streaming; concurrent close
        # the gap). Manifest writes are lock-serialized (checkpoint.py).
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.time()

        def _make_postings_chunk(ci: int, lo: int, hi: int):
            """Plan one chunk SEQUENTIALLY (read_parquet path resolution
            imports optional fs modules — racy from threads); only the
            execution (write) runs in the pool."""
            pname = f"postings:{ci}"
            d = man.phase_dir(pname, subdir=os.path.join("postings", f"chunk_{ci}"))
            from ray.data.datasource.partitioning import PathPartitionFilter

            pf = PathPartitionFilter.of(
                lambda kv, lo=lo, hi=hi: lo <= int(kv["part"]) < hi,
                style="hive",
            )
            ds = (
                # partition_filter = true directory pruning: only this
                # chunk's part= dirs are even listed
                rd.read_parquet(runs_dir, partition_filter=pf)
                .groupby("part")
                .map_groups(make_level1_merge(num_shards), batch_format="pyarrow")
            )

            def run() -> None:
                _write_parquet_retry(ds, d)
                man.mark_done(pname, elapsed=time.time() - t0,
                              counters={"part_lo": lo, "part_hi": hi})

            return run

        p_runs = [
            _make_postings_chunk(ci, lo, hi)
            for ci, (lo, hi) in enumerate(_chunk_bounds(num_parts, shuffle_chunks))
            if not man.phase_done(f"postings:{ci}")
        ]
        if p_runs:
            with ThreadPoolExecutor(max_workers=len(p_runs)) as ex:
                list(ex.map(lambda r: r(), p_runs))
        result.phase_times["postings"] = time.time() - t0

        t0 = time.time()
        seg_chunks = _chunk_bounds(num_shards, shuffle_chunks)
        todo = [ci for ci in range(len(seg_chunks))
                if not man.phase_done(f"segments:{ci}")]
        if todo:
            dl_bits = _dl_bits_ref()

            def _make_segments_chunk(ci: int):
                lo, hi = seg_chunks[ci]
                pname = f"segments:{ci}"
                d = man.phase_dir(
                    pname, subdir=os.path.join("segments", f"chunk_{ci}")
                )
                ds = (
                    rd.read_parquet(
                        partials_dir,
                        filter=(pads.field("mpart") >= lo)
                        & (pads.field("mpart") < hi),
                    )
                    .groupby("mpart")
                    .map_groups(
                        make_final_merge(
                            stats["n_docs"], stats["avgdl"], block_size, dl_bits
                        ),
                        batch_format="pyarrow",
                    )
                )

                def run() -> None:
                    _write_parquet_retry(ds, d)
                    man.mark_done(pname, elapsed=time.time() - t0,
                                  counters={"mpart_lo": lo, "mpart_hi": hi})

                return run

            s_runs = [_make_segments_chunk(ci) for ci in todo]
            with ThreadPoolExecutor(max_workers=len(s_runs)) as ex:
                list(ex.map(lambda r: r(), s_runs))
        result.phase_times["segments"] = time.time() - t0
    stats["vocab_size"] = _segment_row_count(os.path.join(out_dir, "segments"))
    with open(stats_path, "w") as f:
        json.dump(stats, f)
    return result
