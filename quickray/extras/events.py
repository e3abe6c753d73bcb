"""Event-stream batch operators over the `events` table (training-data
pipeline extras; the reference has no streaming semantics — SURVEY
§2.9 — these are the windowed/sessionized aggregates a large-scale
pipeline needs, built Ray-Data-first).

Scale pattern: tumbling windows pre-aggregate per batch (combiner)
before the groupby — the shuffle moves one row per (window, type) per
batch, not one per event. Sessionization co-locates each user's events
by sorting on user_id ALONE (the sort key must be exactly the group
key — see quickray.util.run_starts), orders within users via in-block
lexsort, and reduces sorted blocks vectorized (no per-user Python);
user_id is the partition key an event pipeline would reuse end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_UNIT_DIV = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}


def _epoch_sec(col) -> np.ndarray:
    """ts column (timestamp[any unit] or integer epoch) -> int64 epoch
    seconds (floor)."""
    return _epoch_us(col) // 10**6


def _epoch_us(col) -> np.ndarray:
    """ts column -> int64 epoch microseconds (full precision)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        raw = np.asarray(col.cast(pa.int64()))
        d = _UNIT_DIV[col.type.unit]
        return raw * (10**6 // d) if d <= 10**6 else raw // (d // 10**6)
    return np.asarray(col, dtype=np.int64) * 10**6


def window_aggregate(ds, window_sec: int = 3600):
    """Tumbling-window aggregate: (window, event_type) -> count + exact
    min/max of value. Min/max are order-independent (unlike float sums),
    so results hash-match any oracle exactly."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        w = _epoch_sec(t["ts"]) // window_sec
        g = (
            pa.table(
                {
                    "window": pa.array(w),
                    "event_type": t["event_type"],
                    "value": t["value"],
                }
            )
            .group_by(["window", "event_type"])
            .aggregate([([], "count_all"), ("value", "min"), ("value", "max")])
        )
        return pa.table(
            {
                "window": g["window"],
                "event_type": g["event_type"],
                "pn": g["count_all"],
                "pmin": g["value_min"],
                "pmax": g["value_max"],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window", "event_type"])
        .aggregate(
            Sum("pn", alias_name="n"),
            Min("pmin", alias_name="vmin"),
            Max("pmax", alias_name="vmax"),
        )
    )


def sessionize(ds, gap_sec: int = 1800):
    """Per-user session counts: a session break is a gap > gap_sec
    between consecutive events (ordered by (ts, event_id) so ties are
    deterministic). Returns (user_id, n_events, n_sessions).

    Fully vectorized over sorted blocks: sorting on user_id ALONE
    co-locates each user's events in one block (equal SORT keys never
    split across blocks — the invariant Ray's map_groups itself relies
    on, ray/data/grouped_data.py:225-243; adding ts to the sort key
    would break it: range boundaries on the full tuple can cut
    mid-user), an in-block lexsort orders rows by (user, ts, event_id),
    then one np.diff finds user runs and a cumsum boundary-difference
    counts each run's gap breaks — no per-user Python call (the user
    count is corpus-scale at target size)."""
    gap_us = gap_sec * 10**6

    def per_block(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                }
            )
        from quickray.util import run_starts

        u = np.asarray(t["user_id"], dtype=np.int64)
        ts = _epoch_us(t["ts"])  # full precision: ordering + gaps
        eid = np.asarray(t["event_id"], dtype=np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        starts = run_starts(u)
        ends = np.append(starts[1:], n)
        # break mask between consecutive rows of the SAME user; per-run
        # break counts via cumsum difference (reduceat over many tiny
        # segments is measurably slower)
        if n > 1:
            brk = (np.diff(ts) > gap_us) & (u[1:] == u[:-1])
            c = np.concatenate(([0], np.cumsum(brk)))
            breaks = c[ends - 1] - c[starts]
        else:
            breaks = np.zeros(1, np.int64)
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "n_events": pa.array(ends - starts),
                "n_sessions": pa.array(1 + breaks),
            }
        )

    return ds.sort("user_id").map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )
