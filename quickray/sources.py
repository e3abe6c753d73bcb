"""CSV corpus source — reference-parity port of the demo ingest parser
(S1 in SURVEY §2.1; demo/job/build_index.go:23-102), Ray-Data-first.

Field semantics replicated exactly, including the reference's quirks:

- rows with fewer than 10 columns are skipped (build_index.go:48-50)
- worker sharding keeps rows where hash(col0) % total == worker_index
  (build_index.go:51 uses farmhash32; we use the repo-standard stable
  crc32 — shard *assignment* need not match the reference, only the
  property that shards partition the file disjointly)
- col0: ``strings.TrimLeft(id, "https://www.bilibili.com/video/")``
  (build_index.go:55) is a CUTSET trim, not a prefix strip — it removes
  ALL leading characters belonging to the set {h,t,p,s,:,/,w,.,b,i,l,
  c,o,m,v,d,e} — faithfully reproduced (Python ``str.lstrip`` has the
  same cutset semantics)
- col2: parsed with Go layout "2006/1/2 15:4" (non-padded fields
  accepted) in Asia/Shanghai (fixed UTC+8) -> unix epoch; only
  attempted when len > 4; parse failure -> 0 (build_index.go:61-68)
- cols 4-8 (view/like/coin/favorite/share): ``strconv.ParseInt``
  with errors ignored -> 0, truncated to int32 (build_index.go:70-83)
- col9: split on ",", trim, drop empties, lowercase
  (build_index.go:85-91)
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

from quickray.util import stable_hash_str

_CUTSET = set("https://www.bilibili.com/video/")
_TZ = _dt.timezone(_dt.timedelta(hours=8))  # Asia/Shanghai, no DST
_COUNTERS = ["view", "like", "coin", "favorite", "share"]


def _trim_cutset(s: str) -> str:
    return s.lstrip("".join(_CUTSET))


def _parse_go_time(s: str) -> int:
    """Go layout "2006/1/2 15:4" in UTC+8 -> unix epoch; 0 on failure."""
    if len(s) <= 4:
        return 0
    try:
        date, clock = s.split(" ")
        ys, ms, ds_ = date.split("/")
        if len(ys) != 4:  # Go's "2006" layout is strictly 4 digits
            return 0
        y, mo, d = int(ys), int(ms), int(ds_)
        h, mi = (int(x) for x in clock.split(":"))
        return int(_dt.datetime(y, mo, d, h, mi, tzinfo=_TZ).timestamp())
    except (ValueError, OverflowError):
        return 0


def _parse_int32(s: str) -> int:
    """Go ``strconv.ParseInt(s, 10, 32)`` with the error ignored:
    syntax error -> 0; range error -> clamped limit value (Go returns
    the clamped value alongside ErrRange, and the demo keeps it);
    no whitespace tolerance."""
    if not s or not s.isascii() or not (
        s.isdigit() or (s[0] in "+-" and s[1:].isdigit())
    ):
        return 0  # (str.isdigit alone admits Unicode digits; Go is ASCII-only)
    v = int(s)
    return max(-(2**31), min(2**31 - 1, v))


def parse_video_row(record: list[str]) -> dict | None:
    """Reference row parser (test oracle; 1:1 with build_index.go)."""
    if len(record) < 10:
        return None
    out = {
        "id": _trim_cutset(record[0]),
        "title": record[1],
        "author": record[3],
        "post_time": _parse_go_time(record[2]),
    }
    for i, name in enumerate(_COUNTERS):
        out[name] = _parse_int32(record[4 + i])
    out["keywords"] = [
        kw.strip().lower() for kw in record[9].split(",") if kw.strip()
    ]
    return out


def _parse_batch(batch: pa.Table) -> pa.Table:
    """Vectorized batch form of parse_video_row over raw CSV columns
    f0..f9 (string). Scalar quirks (cutset trim, Go time layout,
    int32 truncation) run per value in C-backed Python; everything
    whole-column."""
    # only the columns whose quirk parsing needs Python values are
    # materialized; title (f1) and author (f3) — the largest string
    # columns — pass through as Arrow untouched
    def _pl(i: int) -> list:
        return batch[f"f{i}"].to_pylist()

    n = batch.num_rows
    ids = [_trim_cutset(s or "") for s in _pl(0)]
    post = [_parse_go_time(s or "") for s in _pl(2)]
    counters = {
        name: np.fromiter(
            (_parse_int32(s or "") for s in _pl(4 + i)), np.int32, count=n
        )
        for i, name in enumerate(_COUNTERS)
    }
    kws = [
        [k.strip().lower() for k in (s or "").split(",") if k.strip()]
        for s in _pl(9)
    ]
    return pa.table(
        {
            "id": pa.array(ids, pa.string()),
            "title": batch["f1"],
            "author": batch["f3"],
            "post_time": pa.array(post, pa.int64()),
            **{k: pa.array(v) for k, v in counters.items()},
            "keywords": pa.array(kws, pa.list_(pa.string())),
        }
    )


def ensure_video_csv_fixture(out_dir: str) -> str:
    """Deterministic CSV fixture exercising every reference parse quirk:
    URL prefixes (cutset trim), short rows (skipped), padded and
    non-padded Go-layout timestamps, unparsable dates/ints, int32
    clamping, messy keyword lists."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "video_fixture.csv")
    if os.path.exists(path):
        return path
    rows = [
        # id, title, date, author, view, like, coin, fav, share, keywords
        '"https://www.bilibili.com/video/BV1xx411c7mD","Go tutorial","2021/3/5 12:30","alice","1000","50","7","3","1","Go, Web,  DEV ,"',
        '"BV2yy","short row skipped"',
        '"https://www.bilibili.com/video/BV9zz","padded date","2021/03/05 09:04","bob","notanum","-5","2147483648","-2147483649","12","single"',
        '"plainid123","no url prefix","bad date","carol","42","0","","","","A,,b ,  ,C"',
        '"BV4aa","empty keywords","2020/12/31 23:59","dave","7","8","9","10","11",""',
        '"https://www.bilibili.com/video/av1700001","av-prefix id","21/1/2 3:4","erin","1","2","3","4","5","x"',
    ]
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")
    return path


def read_video_csv(
    path: str, total: int = 0, worker_index: int = 0
) -> "pa.Table":
    """Parse a video CSV the way the reference ingest does, returning
    an Arrow table. ``total``/``worker_index`` replicate the reference's
    shard-by-hash row filter (build_index.go:51).

    Scale path: wrap with ``ray.data.read_csv(...).map_batches(...)``;
    this direct form exists because the reference's CSV has ragged rows
    (< 10 cols are SKIPPED, not errors), which Arrow's strict CSV
    reader rejects — so rows are split leniently like encoding/csv."""
    import csv as _csv

    rows = []
    with open(path, newline="") as f:
        for record in _csv.reader(f):
            if len(record) < 10:
                continue
            if total > 0 and stable_hash_str(record[0]) % total != worker_index:
                continue
            rows.append(record[:10])
    if not rows:
        return _parse_batch(
            pa.table({f"f{i}": pa.array([], pa.string()) for i in range(10)})
        )
    arrs = {
        f"f{i}": pa.array([r[i] for r in rows], pa.string()) for i in range(10)
    }
    return _parse_batch(pa.table(arrs))
