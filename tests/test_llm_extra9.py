"""Semantic tests for the tenth tranche (llm_extra9) — oracle parity is
covered by test_oracle_parity; these pin operator semantics on
hand-checkable fixtures."""

from __future__ import annotations

import datetime

import pytest

_EV_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
    " value DOUBLE, props STRING"
)
_ORD_SCHEMA = (
    "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING,"
    " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"
)


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_error_bursts_require_consecutive_and_in_span(spark, tmp_path):
    from kafka_streams_example_spark.queries.timeseries import error_burst_detection

    rows = [
        # user 1: err, err within minutes -> burst of 2
        (1, _ts("2024-01-01T10:00:00"), 1, "error", 1.0, None),
        (2, _ts("2024-01-01T10:05:00"), 1, "error", 1.0, None),
        # user 2: errors INTERRUPTED by a click -> runs of 1, no burst
        (3, _ts("2024-01-01T10:00:00"), 2, "error", 1.0, None),
        (4, _ts("2024-01-01T10:01:00"), 2, "click", 1.0, None),
        (5, _ts("2024-01-01T10:02:00"), 2, "error", 1.0, None),
        # user 3: consecutive errors but 4 hours apart -> outside span
        (6, _ts("2024-01-01T10:00:00"), 3, "error", 1.0, None),
        (7, _ts("2024-01-01T14:30:00"), 3, "error", 1.0, None),
        # user 4: three consecutive errors -> one burst of 3
        (8, _ts("2024-01-01T10:00:00"), 4, "error", 1.0, None),
        (9, _ts("2024-01-01T10:10:00"), 4, "error", 1.0, None),
        (10, _ts("2024-01-01T10:20:00"), 4, "error", 1.0, None),
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r.user_id: r for r in error_burst_detection(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 4}
    assert out[1].n_errors == 2
    assert out[4].n_errors == 3
    assert out[4].burst_start.minute == 0 and out[4].burst_end.minute == 20


def test_wow_pct_first_week_null_then_ratio(spark, tmp_path):
    from kafka_streams_example_spark.queries.timeseries import weekly_revenue_wow

    rows = [
        (1, 1, "O", 100.0, _ts("2024-01-01T00:00:00"), "LOW"),  # week 1
        (2, 1, "O", 150.0, _ts("2024-01-08T00:00:00"), "LOW"),  # week 2: +50%
        (3, 1, "O", 75.0, _ts("2024-01-15T00:00:00"), "LOW"),   # week 3: -50%
    ]
    spark.createDataFrame(rows, _ORD_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    out = sorted(weekly_revenue_wow(spark, str(tmp_path)).collect(), key=lambda r: r.week)
    assert out[0].wow_pct is None
    assert out[1].wow_pct == 0.5
    assert out[2].wow_pct == -0.5
    assert [r.n_orders for r in out] == [1, 1, 1]


def test_ab_assignment_deterministic_and_z_matches_reference(spark, tmp_path):
    import math

    from kafka_streams_example_spark.queries.stats import ab_test_analysis

    # 40 users x 5 events each; values depend only on user id so the
    # reference can recompute per-variant stats from the same hash split
    rows = []
    for u in range(40):
        for i in range(5):
            rows.append((u * 10 + i, _ts("2024-01-01T00:00:00"), u, "view",
                         float(u % 7) + i * 0.25, None))
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    (r,) = ab_test_analysis(spark, str(tmp_path)).collect()
    assert r.n_a + r.n_b == 200

    # recompute with the same salted-md5 assignment in pure Python
    import hashlib

    def variant(u):
        h = int(hashlib.md5(f"{u}:ab".encode()).hexdigest()[:15], 16)
        return "A" if h % 2 == 0 else "B"

    vals = {"A": [], "B": []}
    for u in range(40):
        for i in range(5):
            vals[variant(u)].append(float(u % 7) + i * 0.25)
    ma = round(sum(vals["A"]) / len(vals["A"]), 6)
    mb = round(sum(vals["B"]) / len(vals["B"]), 6)
    va = round(sum((x - sum(vals["A"]) / len(vals["A"])) ** 2 for x in vals["A"])
               / len(vals["A"]), 6)
    vb = round(sum((x - sum(vals["B"]) / len(vals["B"])) ** 2 for x in vals["B"])
               / len(vals["B"]), 6)
    assert r.n_a == len(vals["A"]) and r.n_b == len(vals["B"])
    assert r.mean_a == pytest.approx(ma, abs=1e-9)
    assert r.mean_b == pytest.approx(mb, abs=1e-9)
    z = (ma - mb) / math.sqrt(va / len(vals["A"]) + vb / len(vals["B"]))
    assert r.z_stat == pytest.approx(round(z, 6), abs=2e-6)
    # identical result after a rewrite with different layout
    spark.read.parquet(str(tmp_path / "events.parquet")).repartition(9).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    (r2,) = ab_test_analysis(spark, str(tmp_path)).collect()
    assert (r2.n_a, r2.n_b, r2.mean_a, r2.mean_b) == (r.n_a, r.n_b, r.mean_a, r.mean_b)
