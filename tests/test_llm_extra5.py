"""Semantic tests for the sixth tranche (llm_extra5) — oracle parity is
covered by test_oracle_parity; these pin operator semantics on
hand-checkable fixtures."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

_DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
_EV_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
    " value DOUBLE, props STRING"
)

_TS = datetime.datetime(2024, 1, 1)


def test_bigram_probs_smoothed_and_conditional(spark, tmp_path):
    from kafka_streams_example_spark.queries.text import bigram_lm_probs

    # 'a b' x6, 'a c' x2 -> V = {a,b,c}; c(a·)=8
    rows = [(i, "a b", "en", "w", 3) for i in range(6)]
    rows += [(i + 6, "a c", "en", "w", 3) for i in range(2)]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {(r.tok_a, r.tok_b): r for r in bigram_lm_probs(spark, str(tmp_path)).collect()}
    ab = out[("a", "b")]
    assert ab.n_ab == 6 and ab.n_a == 8
    assert ab.prob == round((6 + 0.5) / (8 + 0.5 * 3), 6)
    assert ("a", "c") not in out  # below min support of 5


def test_triangles_enumerated_once_with_weakest_edge(spark, tmp_path):
    from kafka_streams_example_spark.queries.text import cooccurrence_triangles

    # 'x y z' in 12 docs -> edges xy,xz,yz all support 12 -> one triangle;
    # 'x y' in 3 more docs raises xy to 15 but adds no new edge.
    rows = [(i, "x y z", "en", "w", 5) for i in range(12)]
    rows += [(100 + i, "x y", "en", "w", 3) for i in range(3)]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = cooccurrence_triangles(spark, str(tmp_path)).collect()
    assert len(out) == 1
    (tri,) = out
    assert (tri.tok_a, tri.tok_b, tri.tok_c) == ("x", "y", "z")
    assert tri.min_support == 12  # weakest edge, not the boosted xy=15


def test_weighted_sample_prefers_heavy_docs_and_is_layout_stable(spark, tmp_path):
    from kafka_streams_example_spark.queries.operational import weighted_domain_sample

    # 30 tiny docs (w=1) vs 10 huge docs (w=10_000): the top-20 sample
    # must include every huge doc with near-certainty (u^(1/10000) ~ 1).
    rows = [(i, "t", "en", "small", 1) for i in range(30)]
    rows += [(100 + i, "t", "en", "large", 10_000) for i in range(10)]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    sample = weighted_domain_sample(spark, str(tmp_path)).collect()
    assert len(sample) == 20
    large = [r for r in sample if r.source == "large"]
    assert len(large) == 10  # all heavy docs sampled
    ids = {r.doc_id for r in sample}
    # different physical layout -> identical membership
    spark.read.parquet(str(tmp_path / "documents.parquet")).repartition(
        7
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    ids2 = {r.doc_id for r in weighted_domain_sample(spark, str(tmp_path)).collect()}
    assert ids == ids2


def test_key_skew_report_shares_and_hottest_cell(spark, tmp_path):
    from kafka_streams_example_spark.queries.operational import key_skew_report

    rows = [(i, _TS, 1, "hot", 1.0, None) for i in range(6)]       # user 1 x6
    rows += [(10 + i, _TS, 2, "hot", 1.0, None) for i in range(2)]  # user 2 x2
    rows += [(20 + i, _TS, 3, "cold", 1.0, None) for i in range(2)]
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r.event_type: r for r in key_skew_report(spark, str(tmp_path)).collect()}
    hot = out["hot"]
    assert hot.n_events == 8 and hot.n_subkeys == 2
    assert hot.share == 0.8
    assert hot.hottest_user == 1 and hot.hottest_user_events == 6
    assert hot.hot_share == 0.75
    assert out["cold"].share == round(0.2, 6)


def test_robust_scaler_zero_spread_yields_null_not_inf(spark, tmp_path):
    from kafka_streams_example_spark.queries.stats import robust_scaler_features

    # 'flat' lang: all lengths equal -> sigma = iqr = 0 -> NULL features.
    rows = [(i, "t", "flat", "w", 50) for i in range(4)]
    rows += [(10 + i, "t", "spread", "w", 10 * (i + 1)) for i in range(4)]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = robust_scaler_features(spark, str(tmp_path)).collect()
    flat = [r for r in out if r.lang == "flat"]
    assert all(r.z_chars is None and r.robust_chars is None for r in flat)
    spread = {r.doc_id: r for r in out if r.lang == "spread"}
    # lengths 10,20,30,40: mu=25, sigma_pop=sqrt(125), p50=25, iqr=15
    import math

    sigma = round(math.sqrt(125.0), 6)
    assert spread[10].z_chars == round((10 - 25) / sigma, 6)
    assert spread[13].robust_chars == round((40 - 25) / 15.0, 6)
