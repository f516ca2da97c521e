"""Semantic tests for the ninth tranche (llm_extra8) — oracle parity is
covered by test_oracle_parity; these pin operator semantics on
hand-checkable fixtures."""

from __future__ import annotations

import datetime

_EV_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
    " value DOUBLE, props STRING"
)
_ORD_SCHEMA = (
    "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING,"
    " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"
)
_LI_SCHEMA = (
    "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber LONG,"
    " l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE,"
    " l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, l_shipdate TIMESTAMP"
)


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_session_paths_split_on_gap_and_truncate_to_three(spark, tmp_path):
    from kafka_streams_example_spark.queries.events import top_session_paths

    rows = []
    # 6 users, each: 4 quick events, then a 31-min gap, then 1 more —
    # two sessions: path 'a>b>c' (4th event truncated) and 'd'
    for u in range(6):
        base = datetime.datetime(2024, 1, 1, 8, 0, 0)
        for i, et in enumerate(["a", "b", "c", "x"]):
            rows.append((u * 10 + i, base + datetime.timedelta(minutes=i), u, et, 1.0, None))
        rows.append((u * 10 + 9, base + datetime.timedelta(minutes=3 + 32), u, "d", 1.0, None))
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r.path: r.n_sessions for r in top_session_paths(spark, str(tmp_path)).collect()}
    assert out == {"a>b>c": 6, "d": 6}  # 'x' truncated; min-support 5 met


def test_bounded_funnel_excludes_late_and_pre_signup_purchases(spark, tmp_path):
    from kafka_streams_example_spark.queries.events import funnel_time_bounded

    rows = [
        # user 1: converts after exactly 36 hours
        (1, _ts("2024-01-01T00:00:00"), 1, "signup", 1.0, None),
        (2, _ts("2024-01-02T12:00:00"), 1, "purchase", 1.0, None),
        # user 2: purchase 8 days later -> outside the 7-day window
        (3, _ts("2024-01-01T00:00:00"), 2, "signup", 1.0, None),
        (4, _ts("2024-01-09T00:00:00"), 2, "purchase", 1.0, None),
        # user 3: purchase BEFORE signup only -> not converted
        (5, _ts("2024-01-02T00:00:00"), 3, "purchase", 1.0, None),
        (6, _ts("2024-01-03T00:00:00"), 3, "signup", 1.0, None),
        # user 4: signs up, never purchases
        (7, _ts("2024-01-01T00:00:00"), 4, "signup", 1.0, None),
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    (r,) = funnel_time_bounded(spark, str(tmp_path)).collect()
    assert r.n_signup_users == 4 and r.n_converted == 1
    assert r.conv_rate == 0.25
    assert r.avg_hours_to_convert == 36.0


def test_pareto_concentration_monotone_and_sums_to_one(spark, tmp_path):
    from kafka_streams_example_spark.queries.events import pareto_revenue_concentration

    # customer c spends 2^c: the top decile dominates
    rows = [
        (k, c, "O", float(2 ** c), _ts("2024-01-01T00:00:00"), "LOW")
        for k, c in enumerate(range(20))
    ]
    spark.createDataFrame(rows, _ORD_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    out = sorted(pareto_revenue_concentration(spark, str(tmp_path)).collect(),
                 key=lambda r: r.decile)
    assert [r.decile for r in out] == list(range(1, 11))
    assert all(r.n_customers == 2 for r in out)
    shares = [r.cum_share for r in out]
    assert shares == sorted(shares) and shares[-1] == 1.0
    # top decile = customers 19,18 -> (2^19+2^18)/(2^20-1) ~ 0.75
    assert shares[0] > 0.74
    assert sum(r.decile_revenue for r in out) == 2 ** 20 - 1


def test_basket_lift_high_for_copurchased_parts(spark, tmp_path):
    from kafka_streams_example_spark.queries.events import basket_part_pairs_lift

    rows = []
    k = 0
    # parts 1 & 2 always together (5 orders of 10); part 3 in every order
    for o in range(10):
        parts = [3] + ([1, 2] if o < 5 else [4])
        for ln, p in enumerate(parts):
            rows.append((o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         _ts("2024-01-01T00:00:00")))
            k += 1
    spark.createDataFrame(rows, _LI_SCHEMA).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {(r.part_a, r.part_b): r for r in
           basket_part_pairs_lift(spark, str(tmp_path)).collect()}
    # P(1,2)=0.5, P(1)=P(2)=0.5 -> lift 2; (1,3): P=0.5, P(3)=1 -> lift 1
    assert out[(1, 2)].pair_n == 5 and out[(1, 2)].lift == 2.0
    assert out[(1, 3)].lift == 1.0 and out[(2, 3)].lift == 1.0
    assert out[(3, 4)].lift == 1.0  # co-occurs but independent
