"""Second tranche of definition-level brute-force references (continuing
VERDICT r08 item 4 / the r08 exact-substring pattern, commit af77acf):
winnowing fingerprint selection, the CUSUM max(0, ·) recursion identity,
and the Kaplan-Meier product-limit table. Each DuckDB oracle shares its
formulation with the Spark plan (position-wise gram hashes, the
run - min(0, min run) rewrite, the ordered log-sum window), so
cross-engine agreement could mirror a conceptual bug; these replay the
TEXTBOOK definitions in plain Python on seeded/planted inputs."""

from __future__ import annotations

import hashlib
import math
import random
from collections import defaultdict
from datetime import datetime, timezone

from kafka_streams_example_spark import registry

# slow tier (r12): definition-level brute-force/property replays —
# the builder's pre-commit gate (SPARK_GRAFT_SLOW=1) runs them; the
# driver's bounded default window keeps the oracle/streaming gates.
import pytest

pytestmark = pytest.mark.slow


_DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
_EV_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
    " value DOUBLE, props STRING"
)


def _utc(sec: int) -> datetime:
    # naive UTC timestamps: Spark session TZ is UTC in tests, and the
    # queries cast ts -> epoch seconds immediately
    return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)


# --------------------------------------------------------------------------
# winnowing_fingerprints — Schleimer/Wilkerson/Aiken window-min selection
# --------------------------------------------------------------------------


def _winnow_reference(text: str):
    """Straight transcription of the MOSS definition: k-gram polynomial
    Rabin hashes mod P over the whitespace-normalized text, minimum of
    every w-gram window, distinct + sorted."""
    from kafka_streams_example_spark.queries.dedup import (
        _WIN_K,
        _WIN_P,
        _WIN_POWS,
        _WIN_W,
    )

    s = " ".join(text.lower().split())
    grams = [
        sum(ord(s[i + j]) * _WIN_POWS[j] for j in range(_WIN_K)) % _WIN_P
        for i in range(max(len(s) - _WIN_K + 1, 0))
    ]
    mins = [
        min(grams[i : i + _WIN_W])
        for i in range(max(len(grams) - _WIN_W + 1, 0))
    ]
    fps = sorted(set(mins))
    digest = hashlib.md5(",".join(str(v) for v in fps).encode()).hexdigest()
    return len(grams), len(fps), digest


def test_winnowing_matches_bruteforce(spark, tmp_path):
    from kafka_streams_example_spark.queries.dedup import _WIN_K, _WIN_W

    rng = random.Random(11)
    words = ["key", "agg", "row", "scan", "slow", "fast", "table", "value"]
    shared_run = " the shared verbatim license header run "
    texts = []
    # random docs, half carrying a planted >= 11-char verbatim run
    for i in range(20):
        body = " ".join(rng.choice(words) for _ in range(rng.randint(3, 40)))
        texts.append(body + (shared_run if i % 2 else " ") + body[::-1])
    # boundary shapes: shorter than k (no grams), exactly k (one gram),
    # exactly k+w-1 chars (one window), all-identical grams
    texts += ["ab", "x" * _WIN_K, "abcdefgh"[: _WIN_K + _WIN_W - 1], "z" * 40]
    rows = [
        (i, t, "en", "src0", len(t)) for i, t in enumerate(texts)
    ]
    sf = tmp_path / "win"
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(sf / "documents.parquet")
    )
    got = {
        r.doc_id: (r.n_grams, r.n_fps, r.fp_digest)
        for r in registry.QUERIES["winnowing_fingerprints"](
            spark, str(sf)
        ).collect()
    }
    want = {i: _winnow_reference(t) for i, t in enumerate(texts)}
    assert got == want
    # the planted run must make fingerprint sets overlap: docs sharing the
    # verbatim header share at least one selected fingerprint
    def fps_of(text):
        from kafka_streams_example_spark.queries.dedup import (
            _WIN_K,
            _WIN_P,
            _WIN_POWS,
            _WIN_W,
        )

        s = " ".join(text.lower().split())
        grams = [
            sum(ord(s[i + j]) * _WIN_POWS[j] for j in range(_WIN_K)) % _WIN_P
            for i in range(max(len(s) - _WIN_K + 1, 0))
        ]
        return {
            min(grams[i : i + _WIN_W])
            for i in range(max(len(grams) - _WIN_W + 1, 0))
        }

    carriers = [t for i, t in enumerate(texts[:20]) if i % 2]
    common = set.intersection(*(fps_of(t) for t in carriers))
    assert common, "planted shared run selected no common fingerprint"


# --------------------------------------------------------------------------
# cusum_changepoint — textbook one-sided CUSUM recursion
# --------------------------------------------------------------------------


def test_cusum_matches_textbook_recursion(spark, tmp_path):
    """The query computes s_t via the window identity
    run_t - min(0, min_{i<=t} run_i); this replays Page's recursion
    s_t = max(0, s_{t-1} + dev_t) directly, including a planted level
    shift that must raise the alarm."""
    for seed in (3, 17):
        rng = random.Random(seed)
        # 30 quiet days then a level shift — counts per day
        counts = [rng.randint(40, 60) for _ in range(30)]
        counts += [rng.randint(90, 110) for _ in range(10)]
        rows, eid = [], 0
        for d, c in enumerate(counts):
            for _ in range(c):
                sec = d * 86400 + rng.randrange(0, 86400)
                rows.append((eid, _utc(sec), eid % 7, "click", 0.5, "{}"))
                eid += 1
        sf = tmp_path / f"cusum{seed}"
        spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
            str(sf / "events.parquet")
        )

        xs = [float(c) for c in counts]
        n = len(xs)
        mu = sum(xs) / n
        sigma = math.sqrt(sum((x - mu) ** 2 for x in xs) / n)
        s_pos, want = 0.0, {}
        for d, x in enumerate(xs):
            s_pos = max(0.0, s_pos + (x - mu - 0.5 * sigma))
            margin = abs(round(s_pos - 4.0 * sigma, 6))
            assert margin == 0.0 or margin > 1e-4, "seed puts alarm on boundary"
            want[d] = (int(x), round(s_pos, 6), round(s_pos - 4.0 * sigma, 6) > 0)
        got = {
            r.day: (r.x, r.cusum_pos, r.alarm)
            for r in registry.QUERIES["cusum_changepoint"](spark, str(sf)).collect()
        }
        assert set(got) == set(want), seed
        for d in want:
            assert got[d][0] == want[d][0], (seed, d)
            assert abs(got[d][1] - want[d][1]) <= 1e-6, (seed, d)
            assert got[d][2] == want[d][2], (seed, d)
        # the shift must actually fire
        assert any(a for _, _, a in want.values()), seed


# --------------------------------------------------------------------------
# kaplan_meier_conversion — product-limit estimator
# --------------------------------------------------------------------------


def test_kaplan_meier_matches_bruteforce(spark, tmp_path):
    """Definition replay: entry at first signup, event at first LATER
    purchase, right-censoring at the corpus max timestamp; day-grain
    S(t) = prod_{u<=t, d_u>0} (1 - d_u/n_u). Seeds cover same-second
    signup+purchase (excluded by the strict >), purchase-before-signup,
    day-0 conversions, and heavy censoring."""
    for seed in (7, 29):
        rng = random.Random(seed)
        rows, eid = [], 0
        horizon_guard = 50 * 86400
        for u in range(40):
            s0 = rng.randrange(0, 10 * 86400)
            rows.append((eid, _utc(s0), u, "signup", 1.0, "{}")); eid += 1
            r = rng.random()
            if r < 0.15:
                # same-second purchase: must NOT count (strict >)
                rows.append((eid, _utc(s0), u, "purchase", 1.0, "{}")); eid += 1
            elif r < 0.25:
                # purchase BEFORE signup: must not count either
                rows.append(
                    (eid, _utc(max(s0 - 86400, 0)), u, "purchase", 1.0, "{}")
                ); eid += 1
            elif r < 0.75:
                p0 = s0 + rng.randrange(1, 30 * 86400)
                rows.append((eid, _utc(p0), u, "purchase", 1.0, "{}")); eid += 1
            # else: censored
            if rng.random() < 0.5:
                rows.append(
                    (eid, _utc(rng.randrange(0, horizon_guard)), u, "click", 0.1, "{}")
                ); eid += 1
        # a guaranteed late event pins the horizon after every purchase
        rows.append((eid, _utc(horizon_guard), 999, "click", 0.1, "{}"))
        sf = tmp_path / f"km{seed}"
        spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
            str(sf / "events.parquet")
        )

        signups, purchases, horizon = {}, defaultdict(list), 0
        for _eid, ts, u, et, _v, _p in rows:
            sec = int(ts.replace(tzinfo=timezone.utc).timestamp())
            horizon = max(horizon, sec)
            if et == "signup":
                signups[u] = min(signups.get(u, sec), sec)
        for _eid, ts, u, et, _v, _p in rows:
            sec = int(ts.replace(tzinfo=timezone.utc).timestamp())
            if et == "purchase" and u in signups and sec > signups[u]:
                purchases[u].append(sec)
        durs = []
        for u, s0 in signups.items():
            if purchases[u]:
                durs.append(((min(purchases[u]) - s0) // 86400, 1))
            else:
                durs.append(((horizon - s0) // 86400, 0))
        byday = defaultdict(lambda: [0, 0])
        for day, ev in durs:
            byday[day][ev] += 1  # [censored, events]
        n_risk, surv, want = len(durs), 1.0, {}
        for day in sorted(byday):
            cens, evs = byday[day]
            if evs >= n_risk:
                s_out = 0.0
            else:
                if evs > 0:
                    surv *= 1.0 - evs / n_risk
                s_out = surv
            want[day] = (n_risk, evs, cens, s_out)
            n_risk -= evs + cens
        got = {
            r.day: (r.n_risk, r.n_events, r.n_censored, r.survival)
            for r in registry.QUERIES["kaplan_meier_conversion"](
                spark, str(sf)
            ).collect()
        }
        assert set(got) == set(want), seed
        for day, (nr, ne, nc, s) in want.items():
            gnr, gne, gnc, gs = got[day]
            assert (gnr, gne, gnc) == (nr, ne, nc), (seed, day)
            assert abs(gs - s) <= 1e-6, (seed, day, gs, s)
        assert any(ev for _, ev in durs), seed  # events present
        assert any(not ev for _, ev in durs), seed  # censoring present
