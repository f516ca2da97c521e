"""Semantic tests for the fifth tranche (llm_extra4) — oracle parity is
covered by test_oracle_parity; these pin the operator semantics on
hand-checkable fixtures."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

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


def test_inverted_index_caps_postings_but_counts_everything(spark, tmp_path):
    from kafka_streams_example_spark.queries.retrieval import inverted_index_postings

    rows = [(i, "common filler", "en", "w", 10) for i in range(12)]
    rows.append((100, "rare rare filler", "en", "w", 10))
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r.tok: r for r in inverted_index_postings(spark, str(tmp_path)).collect()}
    # 'common' appears once in 12 docs; postings capped to the 8 smallest ids
    assert out["common"].doc_freq == 12 and out["common"].total_tf == 12
    assert out["common"].postings_csv == ",".join(str(i) for i in range(8))
    # 'filler' is in all 13 docs; 'rare' only in one doc -> filtered (df < 2)
    assert out["filler"].doc_freq == 13
    assert "rare" not in out


def test_token_pmi_positive_for_collocated_negative_for_independent(spark, tmp_path):
    from kafka_streams_example_spark.queries.text import token_pmi_pairs

    # 'aa bb' always co-occur (10 docs); 'cc' co-occurs with 'aa' in only
    # 5 of 20 docs where independence would predict 10/20·15/20·20 = 7.5.
    rows = [(i, "aa bb cc", "en", "w", 8) for i in range(5)]
    rows += [(i, "aa bb", "en", "w", 5) for i in range(5, 10)]
    rows += [(i, "cc dd", "en", "w", 5) for i in range(10, 20)]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {(r.tok_a, r.tok_b): r for r in token_pmi_pairs(spark, str(tmp_path)).collect()}
    ab = out[("aa", "bb")]
    assert ab.pair_docs == 10
    assert ab.pmi == round(math.log(10 * 20 / (10 * 10)), 6)  # ln 2 > 0
    ac = out[("aa", "cc")]
    assert ac.pair_docs == 5
    assert ac.pmi == round(math.log(5 * 20 / (10 * 15)), 6)  # < 0
    assert out[("cc", "dd")].pair_docs == 10
    # bb-cc co-occur in exactly the 5 'aa bb cc' docs — right at the
    # min-support fence, so it must be kept (support is >=, not >)
    assert out[("bb", "cc")].pair_docs == 5


def test_cohort_retention_triangle(spark, tmp_path):
    from kafka_streams_example_spark.queries.events import cohort_retention

    # Two users join week of 2024-01-01 (Mon); one returns the next week.
    rows = [
        (1, _ts("2024-01-02T10:00:00"), 1, "view", 1.0, None),
        (2, _ts("2024-01-03T10:00:00"), 2, "view", 1.0, None),
        (3, _ts("2024-01-09T10:00:00"), 1, "view", 1.0, None),  # week +1
        (4, _ts("2024-01-16T10:00:00"), 3, "view", 1.0, None),  # new cohort
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        (r.cohort_week.date().isoformat(), r.week_offset): r
        for r in cohort_retention(spark, str(tmp_path)).collect()
    }
    assert out[("2024-01-01", 0)].n_active == 2
    assert out[("2024-01-01", 1)].n_active == 1
    assert out[("2024-01-01", 1)].retention == 0.5
    assert out[("2024-01-15", 0)].retention == 1.0
    assert len(out) == 3


def test_median_mad_flags_only_the_planted_outlier(spark, tmp_path):
    from kafka_streams_example_spark.queries.stats import median_mad_outliers

    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0]
    rows = [
        (i, _ts("2024-01-01T00:00:00"), 1, "a", v, None) for i, v in enumerate(vals)
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    (r,) = median_mad_outliers(spark, str(tmp_path)).collect()
    # median of [10..14, 1000] = 12.5; adevs = [2.5, 1.5, .5, .5, 1.5, 987.5]
    # MAD = median(adev) = 1.5; fence = 3·1.4826·1.5 ≈ 6.67 -> only 1000 out
    assert r.med == 12.5 and r.mad == 1.5
    assert r.n == 6 and r.n_outliers == 1
    # a mean/stddev z-score would be dragged by the outlier itself: the
    # robust fence still catches it
    assert r.outlier_rate == round(1 / 6, 6)


def test_scd2_collapses_runs_with_half_open_ranges(spark, tmp_path):
    from kafka_streams_example_spark.queries.operational import scd2_user_state

    rows = [
        (1, _ts("2024-01-01T00:00:00"), 7, "on", 1.0, None),
        (2, _ts("2024-01-01T01:00:00"), 7, "on", 1.0, None),
        (3, _ts("2024-01-01T02:00:00"), 7, "off", 1.0, None),
        (4, _ts("2024-01-01T03:00:00"), 7, "on", 1.0, None),
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = sorted(scd2_user_state(spark, str(tmp_path)).collect(), key=lambda r: r.version)
    assert [r.state for r in out] == ["on", "off", "on"]
    assert [r.n_events for r in out] == [2, 1, 1]
    assert out[0].valid_to == out[1].valid_from
    assert out[1].valid_to == out[2].valid_from
    assert out[2].valid_to is None  # open current version
    assert [r.version for r in out] == [1, 2, 3]


def test_winsorized_mean_resists_planted_giant(spark, tmp_path):
    from kafka_streams_example_spark.queries.stats import winsorized_chars_by_source

    rows = [(i, "t", "en", "web", 100 + i) for i in range(20)]
    rows.append((99, "t", "en", "web", 1_000_000))  # the 500MB crawl artifact
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    (r,) = winsorized_chars_by_source(spark, str(tmp_path)).collect()
    assert r.n_docs == 21 and r.n_clipped >= 2
    assert r.mean_raw > 47000  # dragged by the artifact
    assert r.mean_winsorized < 200  # clipped to the p95 fence
    assert r.p05 <= 101 and r.p95 < 1_000_000


def test_group_sample_is_layout_invariant_and_bounded(spark, tmp_path):
    from kafka_streams_example_spark.queries.operational import (
        deterministic_group_sample,
    )

    rows = [(i, "t", "en" if i % 3 else "de", "w", 5) for i in range(200)]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    a = {(r.lang, r.rank, r.doc_id) for r in
         deterministic_group_sample(spark, str(tmp_path)).collect()}
    assert len(a) == 10  # 5 per lang, 2 langs
    # rewrite with a different physical layout -> identical sample
    spark.read.parquet(str(tmp_path / "documents.parquet")).repartition(
        13
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    b = {(r.lang, r.rank, r.doc_id) for r in
         deterministic_group_sample(spark, str(tmp_path)).collect()}
    assert a == b


def test_order_window_overlaps_counts_only_true_overlaps(spark, tmp_path):
    from kafka_streams_example_spark.queries.events import order_window_overlaps

    rows = [
        (1, 7, "O", 1.0, _ts("2024-01-01T00:00:00"), "1-URGENT"),
        (2, 7, "O", 1.0, _ts("2024-01-20T00:00:00"), "1-URGENT"),  # overlaps 1
        (3, 7, "O", 1.0, _ts("2024-03-01T00:00:00"), "1-URGENT"),  # overlaps none
        (4, 8, "O", 1.0, _ts("2024-01-25T00:00:00"), "1-URGENT"),  # other cust
    ]
    spark.createDataFrame(rows, _ORD_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {r.custkey: r for r in order_window_overlaps(spark, str(tmp_path)).collect()}
    assert set(out) == {7}
    # [Jan01,Jan30] ∩ [Jan20,Feb18] = Jan20..Jan30 = 11 days
    assert out[7].n_overlapping_pairs == 1
    assert out[7].max_overlap_days == 11


def test_column_profile_counts_nulls_and_distincts(spark, tmp_path):
    from kafka_streams_example_spark.queries.operational import orders_column_profile

    rows = [
        (1, 10, "O", 5.0, _ts("2024-01-01T00:00:00"), "HIGH"),
        (2, 10, None, 6.0, _ts("2024-01-02T00:00:00"), "LOW"),
        (3, 11, "F", None, _ts("2024-01-01T00:00:00"), "LOW"),
    ]
    spark.createDataFrame(rows, _ORD_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {r.column_name: r for r in orders_column_profile(spark, str(tmp_path)).collect()}
    assert out["o_orderkey"].n_nulls == 0 and out["o_orderkey"].n_distinct == 3
    assert out["o_orderstatus"].n_nulls == 1 and out["o_orderstatus"].n_distinct == 2
    assert out["o_totalprice"].n_nulls == 1
    assert out["o_orderdate"].n_distinct == 2
    assert all(r.n_rows == 3 for r in out.values())


def test_lateral_matches_window_rank_equivalent(spark, tmp_path):
    from pyspark.sql import Window

    from kafka_streams_example_spark.queries.events import (
        lateral_top_orders_per_segment,
    )
    from kafka_streams_example_spark.sources.files import load_table

    cust = [(i, f"c{i}", 0, 0.0, "SEG_A" if i % 2 else "SEG_B") for i in range(10)]
    spark.createDataFrame(
        cust, "c_custkey LONG, c_name STRING, c_nationkey LONG, c_acctbal DOUBLE,"
        " c_mktsegment STRING"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    orders = [
        (k, k % 10, "O", float(100 - k), _ts("2024-01-01T00:00:00"), "LOW")
        for k in range(30)
    ]
    spark.createDataFrame(orders, _ORD_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    got = {
        (r.c_mktsegment, r.o_orderkey)
        for r in lateral_top_orders_per_segment(spark, str(tmp_path)).collect()
    }
    o = load_table(spark, str(tmp_path), "orders")
    c = load_table(spark, str(tmp_path), "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    want = {
        (r.c_mktsegment, r.o_orderkey)
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .collect()
    }
    assert got == want and len(got) == 6
