"""Semantic tests for the fifteenth tranche (real-codec roundtrips,
hybrid retrieval, split drift). Oracle parity runs via test_oracle_parity;
these pin the properties the hash alone doesn't explain."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_streams_example_spark import registry
from tests.conftest import SF_SMOKE


def test_multimodal_decode_real_roundtrips_every_doc(spark):
    rows = registry.QUERIES["multimodal_decode_real"](spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == docs
    for r in rows:
        assert r.roundtrip_ok, r
        assert r.width == 16 + r.doc_id % 17
        assert r.height == 16 + r.doc_id % 13
        assert r.n_pixels == r.width * r.height
        assert (r.bit_depth, r.color_type) == (8, 0)
        # gray8 pixel sum is bounded by 255 * n_pixels
        assert 0 <= r.pixel_sum <= 255 * r.n_pixels


def test_multimodal_wav_roundtrips_every_doc(spark):
    rows = registry.QUERIES["multimodal_wav_roundtrip"](spark, SF_SMOKE).collect()
    for r in rows:
        assert r.roundtrip_ok, r
        assert r.n_samples == 64 + r.doc_id % 64
        assert r.duration_us == r.n_samples * 1_000_000 // 16000
        assert (r.n_channels, r.sample_rate, r.bits_per_sample) == (1, 16000, 16)


def test_rrf_fuses_both_arms(spark):
    """RRF output: 10 rows, scores consistent with the rank formula,
    ordered by fused score; rank vectors are permutation-distinct (both
    arms contribute — had one arm been a copy of the other, rank_lex
    would equal rank_sem everywhere)."""
    rows = registry.QUERIES["rrf_hybrid_retrieval"](spark, SF_SMOKE).collect()
    assert len(rows) == 10
    prev = None
    for r in rows:
        expect = round(1.0 / (60 + r.rank_lex) + 1.0 / (60 + r.rank_sem), 6)
        assert abs(r.rrf_score - expect) < 1e-9
        if prev is not None:
            assert r.rrf_score <= prev + 1e-12
        prev = r.rrf_score
    assert any(r.rank_lex != r.rank_sem for r in rows)


def test_split_token_kl_properties(spark):
    """KL ≥ 0 in both directions for every language, and the per-lang
    token totals reconcile with a direct count."""
    rows = registry.QUERIES["split_token_kl"](spark, SF_SMOKE).collect()
    assert rows
    from kafka_streams_example_spark.queries.eval import split_col
    from kafka_streams_example_spark.operators import text as tx

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    totals = {
        r.lang: (r.n_tr or 0, r.n_ev or 0)
        for r in docs.select(
            "lang",
            F.when(split_col(F.col("doc_id")) == "train", "train")
            .otherwise("eval")
            .alias("split"),
            F.size(tx.tokens(F.lower(F.col("text")))).alias("n"),
        )
        .groupBy("lang")
        .agg(
            F.sum(F.when(F.col("split") == "train", F.col("n"))).alias("n_tr"),
            F.sum(F.when(F.col("split") == "eval", F.col("n"))).alias("n_ev"),
        )
        .collect()
    }
    for r in rows:
        assert r.kl_train_eval >= 0.0, r
        assert r.kl_eval_train >= 0.0, r
        assert r.vocab > 0
        assert (r.n_train_tokens, r.n_eval_tokens) == totals[r.lang], r.lang


def test_split_token_kl_zero_for_identical_distributions(spark, tmp_path):
    """KL is exactly 0 when train and eval token distributions match:
    build docs where every split sees the same token multiset."""
    rows = [(i, "alpha beta beta gamma", "xx", 21) for i in range(40)]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = registry.QUERIES["split_token_kl"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # identical per-doc text => the only divergence left is the add-1
    # smoothing bias (train has ~8x the tokens of eval, so +1 shifts the
    # smaller split's probabilities slightly): ~2e-3 here, vs ~0.2+ for
    # genuinely different distributions
    assert r.vocab == 3
    assert abs(r.kl_train_eval) < 1e-2 and abs(r.kl_eval_train) < 1e-2
