"""Block-max pruned top-k for flat OR / single-term queries.

A vectorized variant of Block-Max WAND (Ding & Suel, SIGIR 2011):
instead of a doc-at-a-time pointer walk (pointless in Python — the
interpreter loop would cost more than it prunes), we use the per-block
(last_doc_id, max_score) metadata written at merge time to build a
piecewise-constant upper-bound function over the doc_id axis, drop
every doc-range whose summed block maxima cannot reach a lower bound
theta of the k-th best score, and then score the surviving postings
exactly. Provably rank-identical to exhaustive evaluation:

- theta = the k-th largest *single-term* exact contribution within some
  term's posting list — k docs exist whose final score >= theta, so the
  true k-th best final score >= theta;
- a doc in a range with UB < theta has score <= UB < theta and can
  neither enter the top-k nor tie into it (ties need score == theta);
- pruning uses a 1e-9-relative safety margin so float-cumsum noise in
  the UB can only under-prune, never over-prune.
"""

from __future__ import annotations

import numpy as np

from quickray.query import Query
from quickray.scoring import bm25_contrib, flags_mask

EXHAUSTIVE_CUTOFF = 4096  # below this many total postings, just score


def block_max_topk(engine, terms: list[str], q: Query):
    from quickray.engine import _accumulate_topk

    index = engine.index
    has_flags = q.on_flag != 0 or q.off_flag != 0 or any(q.or_flags)
    infos = []
    for t in sorted(set(terms)):  # fixed summation order (oracle-identical)
        p = index.posting(t)
        if p is None:
            continue
        if has_flags:
            m = flags_mask(p.bits, q.on_flag, q.off_flag, q.or_flags)
            docs, tf, dl = p.doc_ids[m], p.tfs[m], p.dls[m]
        else:
            docs, tf, dl = p.doc_ids, p.tfs, p.dls
        contrib = bm25_contrib(tf, dl, p.df, index.n_docs, index.avgdl)
        infos.append((docs, contrib, p))
    if not infos:
        return np.empty(0, np.int64), np.empty(0, np.float64)

    k = q.k
    total = sum(len(d) for d, _, _ in infos)
    theta = -np.inf
    for _, contrib, _ in infos:
        if len(contrib) >= k:
            theta = max(theta, np.partition(contrib, -k)[-k])
    if not np.isfinite(theta) or total <= EXHAUSTIVE_CUTOFF:
        return _accumulate_topk([d for d, _, _ in infos], [c for _, c, _ in infos], k, index.n_docs)

    # upper-bound step function over doc_id from block metadata
    pos_parts, delta_parts = [], []
    for _, _, p in infos:
        if len(p.block_last) == 0:
            continue
        starts = np.empty(len(p.block_last), np.int64)
        starts[0] = p.doc_ids[0]
        starts[1:] = p.block_last[:-1] + 1
        pos_parts += [starts, p.block_last + 1]
        delta_parts += [p.block_max, -p.block_max]
    pos = np.concatenate(pos_parts)
    delta = np.concatenate(delta_parts)
    order = np.argsort(pos, kind="stable")
    pos = pos[order]
    ub = np.cumsum(delta[order])
    last_of = np.flatnonzero(np.r_[pos[1:] != pos[:-1], True])
    pos = pos[last_of]
    ub = ub[last_of]
    margin = 1e-9 * max(1.0, abs(theta))
    keep = ub >= theta - margin
    if keep.all():
        return _accumulate_topk([d for d, _, _ in infos], [c for _, c, _ in infos], k, index.n_docs)
    starts_k = pos[keep]
    nxt = np.r_[pos[1:], np.iinfo(np.int64).max]
    ends_k = nxt[keep]  # exclusive

    docs_f, contribs_f = [], []
    for docs, contrib, _ in infos:
        idx = np.searchsorted(starts_k, docs, side="right") - 1
        ok = (idx >= 0) & (docs < ends_k[np.maximum(idx, 0)])
        docs_f.append(docs[ok])
        contribs_f.append(contrib[ok])
    return _accumulate_topk(docs_f, contribs_f, k, index.n_docs)
