"""The driver parses bench.py's stdout as one JSON line and smoke-runs the
__spark_entry__ contract — lock both shapes down."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_single_json_line_quickly():
    """Run bench.py against the smoke SF with a trimmed headline list via
    env override is not supported — instead just validate the contract on
    sf0.001 (fast enough end-to-end)."""
    detail = "/tmp/bench_detail_test.json"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="4", SPARK_GRAFT_BENCH_DETAIL=detail)
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.splitlines() if l.startswith('{"metric"')]
    assert len(json_lines) == 1
    # the driver records only a ~2KB stdout tail: the whole line must fit
    assert len(json_lines[0]) < 1900, f"bench line too long: {len(json_lines[0])}B"
    d = json.loads(json_lines[0])
    assert d["unit"] == "sec" and d["value"] > 0
    assert d["sf"] == 0.001
    assert 1 <= len(d["queries"]) <= 15 and d["n_queries"] >= 100
    assert all(isinstance(v, float) for v in d["queries"].values())
    with open(detail) as fh:
        det = json.load(fh)
    assert det["n_queries"] == d["n_queries"]
    assert len(det["queries"]) == det["n_queries"]
    assert set(d["queries"]) <= set(det["queries"])


def test_queries_rotation_prefers_unchecked():
    """queries() must order never-driver-checked queries before ones that
    already have a CORRECTNESS_r*.json row, so the driver's bounded checked
    window rotates across rounds."""
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    checked: set[str] = set()
    import glob

    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        with open(path) as fh:
            checked |= set(json.load(fh))
    names = list(e.queries())
    if not checked or checked >= set(names):
        return  # nothing to rotate (round 1, or everything already checked)
    n_unchecked = len([n for n in names if n not in checked])
    assert all(n not in checked for n in names[:n_unchecked])
    assert set(e.oracle_sql()) <= set(names)


def test_entry_contract_shape():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 50 and len(os_) >= 45
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in os_.values())
