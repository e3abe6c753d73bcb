"""quickray — a Ray-Data-native full-text index build + BM25 query engine.

A from-scratch reimplementation of the *capabilities* of hjrbill/quicker
(see /root/reference, SURVEY.md) as a batch Ray Data pipeline over Arrow:

- build: Parquet code corpus -> deterministic doc_ids -> actor-pool
  tokenization -> (term, doc_id, tf) -> salted groupby-on-term shuffle ->
  sorted delta+varint posting lists with per-block max-score metadata ->
  checkpointed posting segments + manifest.
- query: boolean And/Or set algebra bit-identical to quicker's
  skiplist_reverse_index.go semantics, plus BM25 top-k with block-max
  pruning and a bounded min-heap equivalent (deterministic tie-break).

Nothing here is a port: the reference is an online Go skip-list engine;
this is a columnar batch engine designed for Ray Data's streaming executor.
"""

from quickray.schema import BM25_B, BM25_K1, BLOCK_SIZE, LANGS

__all__ = ["BM25_B", "BM25_K1", "BLOCK_SIZE", "LANGS"]
__version__ = "0.1.0"
