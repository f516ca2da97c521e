"""Semantic tests for the eighth tranche (llm_extra7) — oracle parity is
covered by test_oracle_parity; these pin operator semantics on
hand-checkable fixtures."""

from __future__ import annotations

import datetime

_DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
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


def test_levenshtein_pairs_cross_band_and_filters(spark, tmp_path):
    from kafka_streams_example_spark.queries.dedup import neardup_levenshtein_pairs

    base = "the quick brown fox jumps over the dog"  # 38 chars -> band 4
    rows = [
        (1, base, "en", "w", 0),
        (2, base + " now", "en", "w", 0),   # 42 chars -> band 5 (adjacent), dist 4
        (3, base.replace("quick", "quack"), "en", "w", 0),  # same band, dist 1
        (4, "a completely different sentence here okay", "en", "w", 0),
        (5, base, "de", "w", 0),            # other lang block -> excluded
    ]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {(r.id_a, r.id_b): r.edit_dist
           for r in neardup_levenshtein_pairs(spark, str(tmp_path)).collect()}
    # cross-band pair (1,2) must be found exactly once; (1,3) same band
    assert out[(1, 2)] == 4
    assert out[(1, 3)] == 1
    assert out[(2, 3)] == 5
    assert set(out) == {(1, 2), (1, 3), (2, 3)}


def test_transition_matrix_rows_sum_to_one(spark, tmp_path):
    from kafka_streams_example_spark.queries.events import event_transition_matrix

    seq = ["a", "b", "a", "b", "c"]  # transitions: a>b x2, b>a, b>c
    rows = [
        (i, _ts(f"2024-01-01T00:0{i}:00"), 1, s, 1.0, None)
        for i, s in enumerate(seq)
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = {(r.cur, r.nxt): r for r in event_transition_matrix(spark, str(tmp_path)).collect()}
    assert out[("a", "b")].n == 2 and out[("a", "b")].p == 1.0
    assert out[("b", "a")].p == 0.5 and out[("b", "c")].p == 0.5
    assert ("c", None) not in out  # terminal event emits no transition
    assert len(out) == 3


def test_seasonal_anomaly_is_slot_relative(spark, tmp_path):
    from kafka_streams_example_spark.queries.timeseries import (
        seasonal_residual_anomalies,
    )

    # Monday baseline ~1.0; one Monday event at 100.0 is anomalous;
    # 100.0 on Tuesday (where it's the norm) is NOT. 12 clean points
    # keep sigma small enough that the spike breaches 3σ even though it
    # inflates sigma itself (mu≈8.6, σ≈26.4, dev≈91 > 3σ≈79).
    rows = [
        (i, _ts("2024-01-01T03:00:00"), 1, "a", 1.0, None) for i in range(12)
    ]
    rows += [(99, _ts("2024-01-01T12:00:00"), 1, "a", 100.0, None)]
    rows += [
        (10 + i, _ts("2024-01-02T15:00:00"), 1, "a", 100.0 + i, None)
        for i in range(4)
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = seasonal_residual_anomalies(spark, str(tmp_path)).collect()
    assert [r.event_id for r in out] == [99]
    (r,) = out
    assert r.dow == 1  # ISO Monday
    assert r.z > 3.0


def test_rolling_wau_counts_trailing_window(spark, tmp_path):
    from kafka_streams_example_spark.queries.timeseries import rolling_active_users

    rows = [
        (1, _ts("2024-01-01T10:00:00"), 1, "a", 1.0, None),
        (2, _ts("2024-01-01T11:00:00"), 2, "a", 1.0, None),
        (3, _ts("2024-01-05T10:00:00"), 1, "a", 1.0, None),   # within 7d of Jan 1
        (4, _ts("2024-01-20T10:00:00"), 3, "a", 1.0, None),   # isolated
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r.day.date().isoformat(): r for r in
           rolling_active_users(spark, str(tmp_path)).collect()}
    assert out["2024-01-01"].dau == 2 and out["2024-01-01"].wau == 2
    # Jan 5: user 1 active today; users 1,2 within the trailing 7 days
    assert out["2024-01-05"].dau == 1 and out["2024-01-05"].wau == 2
    assert out["2024-01-05"].stickiness == 0.5
    assert out["2024-01-20"].dau == 1 and out["2024-01-20"].wau == 1
    assert len(out) == 3  # only observed days appear


def test_rfm_quartiles_deterministic_and_monotone(spark, tmp_path):
    from kafka_streams_example_spark.queries.events import orders_rfm_segmentation

    rows = []
    k = 0
    for cust in range(8):
        for j in range(cust + 1):  # cust c has c+1 orders
            rows.append(
                (k, cust, "O", 100.0 * (cust + 1),
                 _ts(f"2024-01-{cust + 1:02d}T00:00:00"), "LOW")
            )
            k += 1
    spark.createDataFrame(rows, _ORD_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {r.custkey: r for r in orders_rfm_segmentation(spark, str(tmp_path)).collect()}
    # customer 7: most recent, most frequent, biggest spender -> all 4s
    assert (out[7].r_quartile, out[7].f_quartile, out[7].m_quartile) == (4, 4, 4)
    assert (out[0].r_quartile, out[0].f_quartile, out[0].m_quartile) == (1, 1, 1)
    # 8 customers into quartiles of 2
    for q in ("r_quartile", "f_quartile", "m_quartile"):
        counts = {}
        for r in out.values():
            counts[getattr(r, q)] = counts.get(getattr(r, q), 0) + 1
        assert counts == {1: 2, 2: 2, 3: 2, 4: 2}
    assert out[3].monetary == 4 * 400.0
