"""Definition-level brute-force references for the oracle-shaped window
families (VERDICT r08 item 4): the DuckDB oracles for gaps-and-islands
(user_activity_islands, error_burst_detection) and the SCD2 interval
builder (scd2_user_state) share their window formulation with the Spark
plans, so cross-engine agreement could mirror a conceptual bug. These
tests replay the DEFINITIONS in plain Python on seeded random event
streams (dense ties, singleton runs, touching intervals) — the pattern
established for the exact-substring family in r08 (commit af77acf)."""

from __future__ import annotations

import random
from collections import defaultdict
from datetime import datetime, timedelta

from kafka_streams_example_spark import registry

# slow tier (r12): definition-level brute-force/property replays —
# the builder's pre-commit gate (SPARK_GRAFT_SLOW=1) runs them; the
# driver's bounded default window keeps the oracle/streaming gates.
import pytest

pytestmark = pytest.mark.slow


_BASE = datetime(2024, 3, 1, 0, 0, 0)


def _seeded_events(spark, tmp_path, seed, n_users=6, max_events=40):
    """Random (user_id, ts, event_id, event_type) stream with duplicate
    timestamps (tie-break coverage), error runs (boosted probability),
    and single-event users; written as the events table."""
    rng = random.Random(seed)
    rows = []
    eid = 0
    for u in range(n_users):
        for _ in range(rng.randint(1, max_events)):
            ts = _BASE + timedelta(seconds=rng.randrange(0, 3600) * 10)
            et = rng.choice(
                ["click", "view", "error", "error", "purchase", "error"]
            )
            rows.append((eid, ts, u, et, rng.random(), "{}"))
            eid += 1
    sf_dir = tmp_path / f"ev{seed}"
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(str(sf_dir / "events.parquet"))
    return str(sf_dir), rows


def test_user_activity_islands_matches_bruteforce(spark, tmp_path):
    """Definition: each event opens [epoch(ts), epoch(ts)+300); intervals
    per user sorted by (start, end) merge while start <= running max end
    (touching merges); report island count, total merged seconds, longest
    island."""
    from kafka_streams_example_spark.queries.events import _ISL_GAP

    for seed in (5, 23):
        sf_dir, rows = _seeded_events(spark, tmp_path, seed)
        per_user = defaultdict(list)
        for eid, ts, u, et, v, p in rows:
            s = int(ts.timestamp())
            per_user[u].append((s, s + _ISL_GAP))
        want = {}
        for u, ivs in per_user.items():
            islands = []
            for s, e in sorted(ivs):
                if islands and s <= islands[-1][1]:
                    islands[-1][1] = max(islands[-1][1], e)
                else:
                    islands.append([s, e])
            lens = [e - s for s, e in islands]
            want[u] = (len(islands), sum(lens), max(lens))
        got = {
            r.user_id: (r.n_islands, r.total_active_secs, r.max_island_secs)
            for r in registry.QUERIES["user_activity_islands"](
                spark, sf_dir
            ).collect()
        }
        assert got == want, seed


def test_error_burst_detection_matches_bruteforce(spark, tmp_path):
    """Definition: per user ordered by (ts, event_id), maximal runs of
    CONSECUTIVE 'error' events (any other type breaks the run), kept when
    the run has >= 2 errors and spans <= 180 minutes."""
    from kafka_streams_example_spark.queries.timeseries import (
        _BURST_MIN,
        _BURST_SPAN_MIN,
    )

    for seed in (5, 23):
        sf_dir, rows = _seeded_events(spark, tmp_path, seed)
        per_user = defaultdict(list)
        for eid, ts, u, et, v, p in rows:
            per_user[u].append((ts, eid, et))
        want = set()
        for u, evs in per_user.items():
            run = []
            for ts, eid, et in sorted(evs) + [(None, None, "sentinel")]:
                if et == "error":
                    run.append(ts)
                else:
                    if (
                        len(run) >= _BURST_MIN
                        and (run[-1] - run[0]).total_seconds()
                        <= _BURST_SPAN_MIN * 60
                    ):
                        want.add((u, run[0], run[-1], len(run)))
                    run = []
        got = {
            (r.user_id, r.burst_start, r.burst_end, r.n_errors)
            for r in registry.QUERIES["error_burst_detection"](
                spark, sf_dir
            ).collect()
        }
        assert got == want, (seed, got ^ want)


def test_scd2_user_state_matches_bruteforce(spark, tmp_path):
    """Definition: per user ordered by (ts, event_id), consecutive equal
    event_types collapse into one versioned row (versions count state
    CHANGES, first row = version 1) with [valid_from, valid_to) ranges,
    valid_to = the next version's valid_from (NULL for the open row) and
    the run's event count."""
    for seed in (5, 23):
        sf_dir, rows = _seeded_events(spark, tmp_path, seed)
        per_user = defaultdict(list)
        for eid, ts, u, et, v, p in rows:
            per_user[u].append((ts, eid, et))
        want = set()
        for u, evs in per_user.items():
            runs = []  # (state, valid_from, n_events)
            for ts, eid, et in sorted(evs):
                if runs and runs[-1][0] == et:
                    runs[-1][2] += 1
                else:
                    runs.append([et, ts, 1])
            for i, (state, vf, n) in enumerate(runs):
                vt = runs[i + 1][1] if i + 1 < len(runs) else None
                want.add((u, i + 1, state, vf, vt, n))
        got = {
            (r.user_id, r.version, r.state, r.valid_from, r.valid_to, r.n_events)
            for r in registry.QUERIES["scd2_user_state"](spark, sf_dir).collect()
        }
        assert got == want, (seed, got ^ want)
