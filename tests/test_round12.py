"""Round-12 optimization invariants: session-cache size guards must not
change results, and the shared vocab/bigram tables must actually be
shared (plan-equality cache hits across their registered consumers)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from kafka_streams_example_spark import operators as ops
from kafka_streams_example_spark import registry
from tests.conftest import SF_SMOKE


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return pdf


def test_cache_bounded_respects_budget(spark):
    df = spark.range(10)
    cached = ops.cache_bounded(df, 100)  # tiny estimate -> session cache
    assert cached.storageLevel.useMemory
    cached.unpersist()
    # above budget (and unknown size) -> per-invocation lazy checkpoint,
    # never a session cache entry
    over = ops.cache_bounded(spark.range(10), ops._CACHE_MAX_BYTES + 1)
    unknown = ops.cache_bounded(spark.range(10), -1)
    for d in (over, unknown):
        assert not d.storageLevel.useMemory or d.rdd.is_checkpointed is not None
        # the decisive check: the SQL cache manager holds no entry for it
        assert not spark._jsparkSession.sharedState().cacheManager().lookupCachedData(
            d._jdf
        ).isDefined()


@pytest.mark.parametrize(
    "name",
    [
        "doc_perplexity_proxy",
        "neardup_ngram_pairs",
        "dedup_clusters",
        "kneser_ney_bigram",
        "bigram_lm_probs",
        "bigram_crossentropy_eval",
        "neardup_minhash_pairs",
    ],
)
def test_forced_cache_fallback_is_result_identical(spark, name, monkeypatch):
    """With the per-frame cache budget forced to zero every guarded site
    takes the checkpoint_reused fallback — results must be identical to
    the cached path (r11 VERDICT #6 'Done' condition)."""
    spark.catalog.clearCache()
    base = _norm(registry.QUERIES[name](spark, SF_SMOKE).toPandas())
    spark.catalog.clearCache()
    monkeypatch.setattr(ops, "_CACHE_MAX_BYTES", 0)
    forced = _norm(registry.QUERIES[name](spark, SF_SMOKE).toPandas())
    spark.catalog.clearCache()
    pd.testing.assert_frame_equal(base, forced, check_dtype=True)


def test_unigram_freq_shared_across_consumers(spark):
    """token_frequencies / ccnet / the doc_perplexity family must read ONE
    cached vocabulary table: after any consumer materializes, the others'
    plans scan the InMemoryRelation instead of re-tokenizing the corpus."""
    spark.catalog.clearCache()
    registry.QUERIES["doc_perplexity_proxy"](spark, SF_SMOKE).collect()
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        registry.QUERIES["token_frequencies"](spark, SF_SMOKE).explain()
    assert "InMemoryTableScan" in buf.getvalue()
    # ccnet roots at a lazy localCheckpoint (Scan ExistingRDD), which
    # hides the subtree from explain — assert the sharing at the source:
    # the helper's plan IS the one the cache manager holds an entry for.
    from kafka_streams_example_spark.queries.text import _unigram_freq

    freq = _unigram_freq(spark, SF_SMOKE)
    assert spark._jsparkSession.sharedState().cacheManager().lookupCachedData(
        freq._jdf
    ).isDefined()
    spark.catalog.clearCache()


def test_bigram_master_shared_across_lm_consumers(spark):
    """kneser_ney_bigram / bigram_lm_probs / bigram_crossentropy_eval share
    the split/lang bigram master: after one materializes, the others scan
    cached data."""
    spark.catalog.clearCache()
    registry.QUERIES["bigram_crossentropy_eval"](spark, SF_SMOKE).collect()
    import contextlib
    import io

    for other in ("kneser_ney_bigram", "bigram_lm_probs"):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            registry.QUERIES[other](spark, SF_SMOKE).explain()
        assert "InMemoryTableScan" in buf.getvalue(), other
    spark.catalog.clearCache()


def test_sql_text_similarity_builders_match_column_forms(spark):
    """The r12 SQL-text expression builders (dot/norm/cosine/sqdist) must
    produce bit-identical values to the Column/lambda forms they
    replaced."""
    from kafka_streams_example_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(200)
    two = emb.select(
        F.col("embedding").alias("a"), F.reverse("embedding").alias("b")
    )
    checks = two.select(
        (sim.dot("a", "b", 64) == sim.dot(F.col("a"), F.col("b"), 64)).alias("d"),
        (sim.norm("a", 64) == sim.norm(F.col("a"), 64)).alias("n"),
        (
            sim.cosine("a", "b", 64).eqNullSafe(
                sim.cosine(F.col("a"), F.col("b"), 64)
            )
        ).alias("c"),
        (sim.sqdist("a", "b", 64) == sim.sqdist(F.col("a"), F.col("b"), 64)).alias(
            "s"
        ),
    )
    agg = checks.agg(
        *[F.sum(F.when(F.col(c), 0).otherwise(1)).alias(c) for c in "dncs"]
    ).first()
    assert all(agg[c] == 0 for c in "dncs"), agg
