"""Third tranche of definition-level brute-force references: the
event-funnel family (last-touch attribution, time-bounded conversion,
weekly cohort retention). Each oracle shares its window/join formulation
with the Spark plan, so cross-engine agreement could mirror a conceptual
bug; these replay the business definitions in plain Python on seeded
random event streams with boundary cases planted (exact lookback edge,
purchase exactly at the funnel bound, duplicate timestamps, year-crossing
cohorts)."""

from __future__ import annotations

import random
from collections import defaultdict
from datetime import datetime, timedelta, timezone

from kafka_streams_example_spark import registry

# slow tier (r12): definition-level brute-force/property replays —
# the builder's pre-commit gate (SPARK_GRAFT_SLOW=1) runs them; the
# driver's bounded default window keeps the oracle/streaming gates.
import pytest

pytestmark = pytest.mark.slow


_EV_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
    " value DOUBLE, props STRING"
)
_BASE = 1_700_000_000  # epoch seconds anchor


def _utc(sec: int) -> datetime:
    return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)


def _write(spark, tmp_path, name, rows):
    sf = tmp_path / name
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(sf / "events.parquet")
    )
    return str(sf)


def test_sessionized_attribution_matches_bruteforce(spark, tmp_path):
    """Definition: a purchase credits the most recent non-purchase event
    by the same user (ordered by ts then event_id) when it happened
    <= 1800 s before, else 'direct'; revenue folds as half-up cents."""
    from kafka_streams_example_spark.queries.events import _ATTR_WINDOW_S

    for seed in (13, 41):
        rng = random.Random(seed)
        rows, eid = [], 0
        for u in range(8):
            t = _BASE + rng.randrange(0, 3600)
            for _ in range(rng.randint(2, 30)):
                t += rng.choice([0, 1, 5, 60, 600, _ATTR_WINDOW_S, _ATTR_WINDOW_S + 1])
                et = rng.choice(["click", "view", "error", "purchase", "purchase"])
                rows.append(
                    (eid, _utc(t), u, et, round(rng.uniform(0, 50), 2), "{}")
                )
                eid += 1
        # planted boundary: non-purchase EXACTLY 1800 s before a purchase
        rows.append((eid, _utc(_BASE), 90, "view", 1.0, "{}")); eid += 1
        rows.append(
            (eid, _utc(_BASE + _ATTR_WINDOW_S), 90, "purchase", 10.0, "{}")
        ); eid += 1
        # purchase with NO prior event at all
        rows.append((eid, _utc(_BASE), 91, "purchase", 3.0, "{}")); eid += 1

        sf = _write(spark, tmp_path, f"attr{seed}", rows)
        per_user = defaultdict(list)
        for r in rows:
            sec = int(r[1].replace(tzinfo=timezone.utc).timestamp())
            per_user[r[2]].append((sec, r[0], r[3], r[4]))
        want = defaultdict(lambda: [0, 0])
        for u, evs in per_user.items():
            evs.sort()  # (sec, event_id) — the window's tie-break order
            for i, (sec, _eid, et, val) in enumerate(evs):
                if et != "purchase":
                    continue
                prev = next(
                    (
                        (s, e)
                        for s, _id, e, _v in reversed(evs[:i])
                        if e != "purchase"
                    ),
                    None,
                )
                ch = (
                    prev[1]
                    if prev is not None and sec - prev[0] <= _ATTR_WINDOW_S
                    else "direct"
                )
                want[ch][0] += 1
                want[ch][1] += int(val * 100.0 + 0.5)
        got = {
            r.channel: (r.n_purchases, r.revenue_cents)
            for r in registry.QUERIES["sessionized_attribution"](
                spark, sf
            ).collect()
        }
        assert got == {c: tuple(v) for c, v in want.items()}, seed
        assert "direct" in got and len(got) > 1, seed


def test_funnel_time_bounded_matches_bruteforce(spark, tmp_path):
    """Definition: first signup per user; converted when ANY purchase
    lands in [signup, signup + 7 days] (inclusive bound planted); the
    delta that averages is to the FIRST in-window purchase."""
    from kafka_streams_example_spark.queries.events import _FUNNEL_DAYS

    bound_s = _FUNNEL_DAYS * 86400
    for seed in (19, 37):
        rng = random.Random(seed)
        rows, eid = [], 0
        for u in range(30):
            s0 = _BASE + rng.randrange(0, 5 * 86400)
            rows.append((eid, _utc(s0), u, "signup", 1.0, "{}")); eid += 1
            if rng.random() < 0.3:  # second, LATER signup must not matter
                rows.append(
                    (eid, _utc(s0 + rng.randrange(1, 86400)), u, "signup", 1.0, "{}")
                ); eid += 1
            r = rng.random()
            if r < 0.1:
                p0 = s0 + bound_s  # exactly at the bound: converts
            elif r < 0.2:
                p0 = s0 + bound_s + 1  # one past: does not
            elif r < 0.3:
                p0 = s0 - 60  # before signup: does not
            elif r < 0.7:
                p0 = s0 + rng.randrange(0, bound_s)
            else:
                p0 = None
            if p0 is not None:
                rows.append((eid, _utc(p0), u, "purchase", 5.0, "{}")); eid += 1

        sf = _write(spark, tmp_path, f"fun{seed}", rows)
        signups, purchases = {}, defaultdict(list)
        for r in rows:
            sec = int(r[1].replace(tzinfo=timezone.utc).timestamp())
            if r[3] == "signup":
                signups[r[2]] = min(signups.get(r[2], sec), sec)
            elif r[3] == "purchase":
                purchases[r[2]].append(sec)
        deltas = []
        for u, s0 in signups.items():
            inwin = [p for p in purchases[u] if s0 <= p <= s0 + bound_s]
            if inwin:
                deltas.append(min(inwin) - s0)
        row = registry.QUERIES["funnel_time_bounded"](spark, sf).collect()[0]
        assert row.n_signup_users == len(signups), seed
        assert row.n_converted == len(deltas), seed
        assert abs(row.conv_rate - len(deltas) / len(signups)) <= 1e-6, seed
        want_hours = sum(deltas) / len(deltas) / 3600.0
        assert abs(row.avg_hours_to_convert - want_hours) <= 1e-5, seed
        assert deltas and len(deltas) < len(signups), seed


def test_cohort_retention_matches_bruteforce(spark, tmp_path):
    """Definition: cohort = Monday-start week of a user's first event;
    cell (cohort_week, k) counts users with ANY event k weeks later;
    retention = cell / week-0 cell. Stream spans a year boundary."""
    for seed in (23, 47):
        rng = random.Random(seed)
        rows, eid = [], 0
        # anchor near New Year to cross the ISO week/year boundary
        start = int(
            datetime(2023, 12, 18, tzinfo=timezone.utc).timestamp()
        )
        for u in range(25):
            t0 = start + rng.randrange(0, 21) * 86400 + rng.randrange(0, 86400)
            rows.append((eid, _utc(t0), u, "click", 0.1, "{}")); eid += 1
            for _ in range(rng.randint(0, 6)):
                t = t0 + rng.randrange(0, 8 * 7 * 86400)
                rows.append((eid, _utc(t), u, "view", 0.1, "{}")); eid += 1

        sf = _write(spark, tmp_path, f"coh{seed}", rows)

        def monday(sec: int) -> str:
            d = datetime.fromtimestamp(sec, tz=timezone.utc).date()
            m = d - timedelta(days=d.weekday())
            return m.isoformat()

        weeks_by_user = defaultdict(set)
        for r in rows:
            sec = int(r[1].replace(tzinfo=timezone.utc).timestamp())
            weeks_by_user[r[2]].add(monday(sec))
        cells = defaultdict(int)
        for u, wks in weeks_by_user.items():
            cw = min(wks)
            cw_d = datetime.fromisoformat(cw).date()
            for w in wks:
                off = (datetime.fromisoformat(w).date() - cw_d).days // 7
                cells[(cw, off)] += 1
        got = {
            (r.cohort_week.date().isoformat(), r.week_offset): (
                r.n_active,
                r.retention,
            )
            for r in registry.QUERIES["cohort_retention"](spark, sf).collect()
        }
        assert set(got) == set(cells), seed
        for (cw, off), n in cells.items():
            gn, gr = got[(cw, off)]
            assert gn == n, (seed, cw, off)
            assert abs(gr - n / cells[(cw, 0)]) <= 1e-6, (seed, cw, off)
        # the corpus crosses the year boundary and has multi-week offsets
        assert len({cw for cw, _ in cells}) >= 3, seed
        assert max(off for _, off in cells) >= 2, seed
