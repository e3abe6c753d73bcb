"""S1 CSV-ingest parity (demo/job/build_index.go:23-102): every parse
quirk of the reference ingest, asserted value-by-value."""

import pyarrow as pa

from quickray.sources import (
    _parse_go_time,
    _parse_int32,
    _trim_cutset,
    ensure_video_csv_fixture,
    parse_video_row,
    read_video_csv,
)


def test_trim_is_cutset_not_prefix():
    # strings.TrimLeft(s, "https://www.bilibili.com/video/") removes all
    # leading chars from the SET {h,t,p,s,:,/,w,.,b,i,l,c,o,m,v,d,e}
    assert _trim_cutset("https://www.bilibili.com/video/BV1x") == "BV1x"
    assert _trim_cutset("plainid123") == "ainid123"  # p, l stripped!
    assert _trim_cutset("BV2yy") == "BV2yy"  # uppercase untouched
    assert _trim_cutset("av170") == "av170"  # 'a' not in the cutset


def test_go_time_layout():
    # "2006/1/2 15:4" in fixed UTC+8; non-padded accepted, 4-digit year
    # strict, failure -> 0
    assert _parse_go_time("2021/3/5 12:30") == 1614918600
    assert _parse_go_time("2021/03/05 09:04") == 1614906240  # padded ok
    assert _parse_go_time("21/1/2 3:4") == 0  # 2-digit year rejected
    assert _parse_go_time("bad date") == 0
    assert _parse_go_time("x") == 0  # len <= 4 guard


def test_parse_int32_go_semantics():
    assert _parse_int32("42") == 42
    assert _parse_int32("-5") == -5
    assert _parse_int32("notanum") == 0
    assert _parse_int32("") == 0
    assert _parse_int32(" 12") == 0  # Go ParseInt: no whitespace
    assert _parse_int32("2147483648") == 2147483647  # ErrRange clamp
    assert _parse_int32("-2147483649") == -(2**31)


def test_row_parser_and_keywords():
    row = ["BVx", "t", "2021/3/5 12:30", "a", "1", "2", "3", "4", "5",
           "Go, Web,  DEV ,"]
    out = parse_video_row(row)
    assert out["keywords"] == ["go", "web", "dev"]
    assert parse_video_row(["short", "row"]) is None


def test_fixture_end_to_end(tmp_path):
    path = ensure_video_csv_fixture(str(tmp_path))
    t = read_video_csv(path)
    assert isinstance(t, pa.Table)
    rows = {r["id"]: r for r in t.to_pylist()}
    assert len(rows) == 5  # short row skipped
    assert "BV1xx411c7mD" in rows
    assert rows["BV1xx411c7mD"]["keywords"] == ["go", "web", "dev"]
    assert rows["BV9zz"]["view"] == 0  # notanum
    assert rows["BV9zz"]["coin"] == 2147483647  # clamped
    assert rows["BV9zz"]["favorite"] == -(2**31)
    assert rows["ainid123"]["post_time"] == 0  # bad date + cutset trim
    assert rows["av1700001"]["post_time"] == 0  # 2-digit year
    assert rows["BV4aa"]["keywords"] == []

    # vectorized batch form == pure-python reference parser, field by field
    import csv

    with open(path, newline="") as f:
        expected = [
            parse_video_row(r) for r in csv.reader(f) if len(r) >= 10
        ]
    assert t.to_pylist() == expected


def test_shard_filter_partitions_disjointly(tmp_path):
    path = ensure_video_csv_fixture(str(tmp_path))
    full = read_video_csv(path)
    shards = [read_video_csv(path, total=3, worker_index=i) for i in range(3)]
    ids = sorted(i for s in shards for i in s["id"].to_pylist())
    assert ids == sorted(full["id"].to_pylist())
