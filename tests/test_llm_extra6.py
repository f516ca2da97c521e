"""Semantic tests for the seventh tranche (llm_extra6) — oracle parity is
covered by test_oracle_parity; these pin operator semantics on
hand-checkable fixtures."""

from __future__ import annotations

import datetime

_DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
_EV_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
    " value DOUBLE, props STRING"
)


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_resample_fills_gaps_with_last_observation(spark, tmp_path):
    from kafka_streams_example_spark.queries.timeseries import resample_fill_forward

    rows = [
        (1, _ts("2024-01-01T08:00:00"), 7, "a", 1.0, None),
        (2, _ts("2024-01-01T20:00:00"), 7, "a", 2.0, None),  # day's LAST obs
        # Jan 2-3: gap
        (3, _ts("2024-01-04T12:00:00"), 7, "a", 9.0, None),
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r.day.date().isoformat(): r for r in
           resample_fill_forward(spark, str(tmp_path)).collect()}
    assert sorted(out) == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    assert out["2024-01-01"].value_filled == 2.0 and out["2024-01-01"].n_obs == 2
    assert out["2024-01-02"].value_filled == 2.0 and out["2024-01-02"].n_obs == 0
    assert out["2024-01-03"].value_filled == 2.0
    assert out["2024-01-04"].value_filled == 9.0 and out["2024-01-04"].n_obs == 1


def test_mixture_resample_flattens_toward_small_sources(spark, tmp_path):
    from kafka_streams_example_spark.queries.operational import dataset_mixture_resample

    # 160 docs from 'big', 10 from 'small': sqrt temper -> small keeps all
    # (rate 1.0), big is downsampled.
    rows = [(i, "t", "en", "big", 10) for i in range(160)]
    rows += [(1000 + i, "t", "en", "small", 10) for i in range(10)]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r.source: r for r in dataset_mixture_resample(spark, str(tmp_path)).collect()}
    # target shares: sqrt(160):sqrt(10) ~ 0.8:0.2 of 170 docs
    assert out["small"].keep_rate == 1.0
    assert out["small"].n_kept == 10
    assert 0 < out["big"].keep_rate < 1
    assert 0 < out["big"].n_kept < 160
    # keep rate math: (sqrt(160)/(sqrt(160)+sqrt(10))) * 170 / 160
    import math

    s = math.sqrt(160) + math.sqrt(10)
    assert out["big"].keep_rate == round(math.sqrt(160) / s * 170 / 160, 6)
    assert out["big"].kept_chars == 10 * out["big"].n_kept


def test_novelty_curve_is_one_for_first_batch_and_drops(spark, tmp_path):
    from kafka_streams_example_spark.queries.text import ngram_novelty_curve

    # batch 0 (doc_id < 50): introduces 'a b c'; batch 1 repeats it and
    # adds one new gram ('x y z').
    rows = [(1, "a b c", "en", "w", 5), (2, "a b c", "en", "w", 5)]
    rows += [(60, "a b c", "en", "w", 5), (61, "x y z", "en", "w", 5)]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r.batch: r for r in ngram_novelty_curve(spark, str(tmp_path)).collect()}
    assert out[0].n_distinct == 1 and out[0].n_novel == 1 and out[0].novelty == 1.0
    assert out[1].n_distinct == 2 and out[1].n_novel == 1 and out[1].novelty == 0.5
