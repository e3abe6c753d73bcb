"""Event-stream batch operators over the `events` table (training-data
pipeline extras; the reference has no streaming semantics — SURVEY
§2.9 — these are the windowed/sessionized aggregates a large-scale
pipeline needs, built Ray-Data-first).

Scale pattern: tumbling windows pre-aggregate per batch (combiner)
before the groupby — the shuffle moves one row per (window, type) per
batch, not one per event. Sessionization co-locates each user's events
with groupby(user_id).map_groups and runs vectorized inside the group;
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
    deterministic). Returns (user_id, n_events, n_sessions)."""

    def per_user(t: pa.Table) -> pa.Table:
        ts = _epoch_us(t["ts"])  # full precision: ordering + gaps
        eid = np.asarray(t["event_id"], dtype=np.int64)
        order = np.lexsort((eid, ts))
        ts = ts[order]
        gap_us = gap_sec * 10**6
        breaks = int((np.diff(ts) > gap_us).sum()) if len(ts) > 1 else 0
        return pa.table(
            {
                "user_id": pa.array([t["user_id"][0].as_py()], pa.int64()),
                "n_events": pa.array([len(ts)], pa.int64()),
                "n_sessions": pa.array([1 + breaks], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
