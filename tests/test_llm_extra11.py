"""Semantic tests for the twelfth tranche (llm_extra11)."""

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


def test_latency_uses_first_shipment_per_order(spark, tmp_path):
    from kafka_streams_example_spark.queries.events import order_to_ship_latency

    orders = [
        (1, 1, "O", 1.0, _ts("2024-01-01T00:00:00"), "1-URGENT"),
        (2, 1, "O", 1.0, _ts("2024-01-01T00:00:00"), "5-LOW"),
    ]
    lines = [
        # order 1: two shipments, first at +2d (the +9d must not count)
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _ts("2024-01-03T00:00:00")),
        (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", _ts("2024-01-10T00:00:00")),
        # order 2: ships at +7d
        (2, 3, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _ts("2024-01-08T00:00:00")),
    ]
    spark.createDataFrame(orders, _ORD_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(lines, _LI_SCHEMA).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {r.o_orderpriority: r for r in
           order_to_ship_latency(spark, str(tmp_path)).collect()}
    assert out["1-URGENT"].min_days == 2 and out["1-URGENT"].max_days == 2
    assert out["1-URGENT"].p50_days == 2.0 and out["1-URGENT"].n_orders == 1
    assert out["5-LOW"].mean_days == 7.0


def test_heatmap_shares_sum_to_one(spark, tmp_path):
    from kafka_streams_example_spark.queries.events import hourly_activity_heatmap

    rows = [
        (1, _ts("2024-01-01T09:00:00"), 1, "a", 1.0, None),  # Mon 9
        (2, _ts("2024-01-01T09:30:00"), 2, "a", 1.0, None),  # Mon 9
        (3, _ts("2024-01-01T09:45:00"), 1, "a", 1.0, None),  # Mon 9 (dup user)
        (4, _ts("2024-01-07T22:00:00"), 3, "a", 1.0, None),  # Sun 22
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = {(r.dow, r.hod): r for r in
           hourly_activity_heatmap(spark, str(tmp_path)).collect()}
    assert out[(1, 9)].n_events == 3 and out[(1, 9)].n_users == 2
    assert out[(1, 9)].share == 0.75
    assert out[(7, 22)].n_events == 1
    assert abs(sum(r.share for r in out.values()) - 1.0) < 1e-9


def test_purchase_gaps_only_between_consecutive_purchases(spark, tmp_path):
    from kafka_streams_example_spark.queries.events import repeat_purchase_interval

    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, "purchase", 1.0, None),
        (2, _ts("2024-01-02T00:00:00"), 1, "view", 1.0, None),      # ignored
        (3, _ts("2024-01-05T00:00:00"), 1, "purchase", 1.0, None),  # gap 4d
        (4, _ts("2024-01-11T00:00:00"), 1, "purchase", 1.0, None),  # gap 6d
        (5, _ts("2024-01-01T00:00:00"), 2, "purchase", 1.0, None),  # single: no gap
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    (r,) = repeat_purchase_interval(spark, str(tmp_path)).collect()
    assert r.n_gaps == 2
    assert r.p50_gap_days == 5.0  # midpoint of 4 and 6
    assert r.mean_gap_days == 5.0 and r.max_gap_days == 6.0
