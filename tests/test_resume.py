"""Checkpoint/resume (SURVEY §7.6): killed-after-phase builds resume to
an identical index; unchanged inputs are a fast no-op; changed inputs
invalidate."""

import json
import os
import shutil
import time

import pyarrow.parquet as pq

from quickray.build import build_index
from quickray.corpus import generate_corpus


def _segments_fingerprint(out):
    t = pq.read_table(os.path.join(out, "segments")).sort_by("term")
    return [t[c].to_pylist() for c in ["term", "postings", "tfs", "block_max"]]


def test_resume_noop_and_kill_resume(tmp_path):
    tbl = generate_corpus(250, seed=3)
    out = str(tmp_path / "b")
    r1 = build_index(tbl, out, hot_df=100, num_salts=2)
    fresh = _segments_fingerprint(out)

    # no-op resume: all phases skipped, fast
    t0 = time.time()
    build_index(tbl, out, hot_df=100, num_salts=2)
    assert time.time() - t0 < 5.0

    # simulate a crash between postings and merge
    man_path = os.path.join(out, "manifest.json")
    man = json.load(open(man_path))
    del man["phases"]["segments"]
    del man["phases"]["docmeta"]
    json.dump(man, open(man_path, "w"))
    shutil.rmtree(os.path.join(out, "segments"))
    shutil.rmtree(os.path.join(out, "docmeta"))
    r2 = build_index(tbl, out, hot_df=100, num_salts=2)
    assert _segments_fingerprint(out) == fresh
    assert r2.stats == r1.stats

    # manifest records lineage: files + rows per phase
    man = json.load(open(man_path))
    for phase in ["docbase", "docmeta", "postings", "segments"]:
        assert man["phases"][phase]["status"] == "done"
        assert man["phases"][phase]["rows"] > 0
        assert len(man["phases"][phase]["files"]) >= 1
        for f in man["phases"][phase]["files"]:
            assert f["rows"] >= 0 and f["bytes"] > 0


def test_fingerprint_change_invalidates(tmp_path):
    out = str(tmp_path / "b")
    build_index(generate_corpus(120, seed=1), out, hot_df=60)
    r = build_index(generate_corpus(150, seed=1), out, hot_df=60)
    assert r.stats["n_docs"] == 150
