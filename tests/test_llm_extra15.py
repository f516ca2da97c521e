"""Semantic tests for the sixteenth tranche (Bloom probe join, JL
distortion, logistic quality scoring). Oracle parity runs via
test_oracle_parity; these pin the properties the hash alone doesn't
explain — no-false-negative structure, distortion concentration,
threshold consistency, and the plan shapes that matter at scale."""

from __future__ import annotations

import pyspark.sql.functions as F

from kafka_streams_example_spark import registry
from kafka_streams_example_spark.queries.sketches import _BF_K, _BF_M, _JL_K
from tests.conftest import SF_SMOKE


def test_bloom_probe_has_no_false_negatives(spark):
    """The defining Bloom contract: a member is ALWAYS contained — the
    (contained=False, is_member=True) confusion cell must not exist, and
    every member lands in the contained=True side."""
    rows = registry.QUERIES["bloom_filter_probe_join"](spark, SF_SMOKE).collect()
    cells = {(r.contained, r.is_member): r.n_keys for r in rows}
    assert (False, True) not in cells, cells
    assert cells.get((True, True), 0) > 0

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    n_members_probed = (
        orders.filter(F.col("o_orderstatus") == "F")
        .join(cust, orders["o_custkey"] == cust["c_custkey"], "semi")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert cells.get((True, True), 0) == n_members_probed
    assert sum(cells.values()) == cust.count()


def test_bloom_false_positive_rate_is_bounded(spark):
    """Observed FPR must sit under ~3x the analytic (1-e^{-kn/m})^k bound
    (slack for the small probe set)."""
    import math

    rows = registry.QUERIES["bloom_filter_probe_join"](spark, SF_SMOKE).collect()
    cells = {(r.contained, r.is_member): r.n_keys for r in rows}
    fp = cells.get((True, False), 0)
    tn = cells.get((False, False), 0)
    n_members = cells.get((True, True), 0)
    if fp + tn == 0:
        return
    observed = fp / (fp + tn)
    analytic = (1.0 - math.exp(-_BF_K * n_members / _BF_M)) ** _BF_K
    assert observed <= max(3 * analytic, 0.02), (observed, analytic)


def test_bloom_bitmap_side_is_broadcast(spark):
    """The m/64-row bitmap must reach the probe scan as a broadcast —
    a shuffled join here would defeat the entire pruning design."""
    df = registry.QUERIES["bloom_filter_probe_join"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_jl_distortion_concentrates_near_one(spark):
    """JL lemma sanity: every pair's distance ratio is within loose
    k=16 bounds, and the median sits near 1."""
    rows = registry.QUERIES["jl_projection_distortion"](spark, SF_SMOKE).collect()
    assert rows
    ratios = sorted(r.distortion for r in rows if r.distortion is not None)
    assert all(0.15 < x < 6.0 for x in ratios), (ratios[0], ratios[-1])
    median = ratios[len(ratios) // 2]
    assert 0.6 < median < 1.6, median
    # pairs are consecutive ids starting from an even id
    for r in rows:
        assert r.id_b == r.id_a + 1 and r.id_a % 2 == 0


def test_jl_sign_matrix_is_deterministic_constant():
    from kafka_streams_example_spark.queries.sketches import _JL, _jl_signs

    again = _jl_signs()
    assert again == _JL
    scale = 1.0 / (_JL_K**0.5)
    assert all(abs(x) == scale for row in _JL for x in row)


def test_quality_logreg_threshold_consistency(spark):
    """kept must equal (quality_prob >= 0.5) on the ROUNDED probability,
    probabilities live in (0,1), and both kept classes are populated."""
    rows = registry.QUERIES["quality_logreg_score"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.quality_prob < 1.0, r
        assert r.kept == (r.quality_prob >= 0.5), r
    kept_vals = {r.kept for r in rows}
    assert kept_vals == {True, False}, kept_vals


def test_quality_logreg_is_map_only(spark):
    """The classifier is a single codegen'd scan: no key shuffle (hash or
    range partitioning) and no Python stage. The only allowed Exchange is
    _load_parallel's round-robin parallelism floor on the single-split
    local fixture."""
    df = registry.QUERIES["quality_logreg_score"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan, (
        plan[:500]
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmv_sketch_estimate_and_bound(spark):
    """The KMV estimate is deterministic (same md5 inputs = same
    estimate), the sketch saw exactly k hashes, and the audited error
    bound holds."""
    rows = registry.QUERIES["kmv_distinct_sketch"](spark, SF_SMOKE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.k == 64
    assert r.within_bound, (r.kmv_estimate, r.n_exact, r.rel_err)
    again = registry.QUERIES["kmv_distinct_sketch"](spark, SF_SMOKE).collect()[0]
    assert again.kmv_estimate == r.kmv_estimate


def test_kmv_topk_plan_avoids_global_sort(spark):
    """The k smallest hashes must come from TakeOrderedAndProject (local
    top-k + k-sized merge), never a full Sort over the distinct set."""
    df = registry.QUERIES["kmv_distinct_sketch"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:800]


def test_shard_manifest_checksum_is_order_independent(spark, tmp_path):
    """Re-partitioning / reordering the corpus must not change any
    shard's checksum, and editing one document must change exactly its
    shard's checksum."""
    import shutil

    from kafka_streams_example_spark.sources.files import load_table

    base = {
        (r.shard): (r.n_docs, r.total_chars, r.content_checksum)
        for r in registry.QUERIES["shard_manifest"](spark, SF_SMOKE).collect()
    }
    assert sum(n for n, _, _ in base.values()) == spark.read.parquet(
        f"{SF_SMOKE}/documents.parquet"
    ).count()

    # shuffled copy: same rows, radically different physical order
    alt = str(tmp_path / "alt")
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.repartition(7).sortWithinPartitions("lang").write.parquet(
        f"{alt}/documents.parquet"
    )
    shuffled = {
        (r.shard): (r.n_docs, r.total_chars, r.content_checksum)
        for r in registry.QUERIES["shard_manifest"](spark, alt).collect()
    }
    assert shuffled == base

    # tamper with one doc: only its shard's checksum moves
    import pyspark.sql.functions as FF

    tam = str(tmp_path / "tam")
    docs.withColumn(
        "text",
        FF.when(FF.col("doc_id") == 7, FF.concat(FF.col("text"), FF.lit(" x")))
        .otherwise(FF.col("text")),
    ).write.parquet(f"{tam}/documents.parquet")
    tampered = {
        (r.shard): (r.n_docs, r.total_chars, r.content_checksum)
        for r in registry.QUERIES["shard_manifest"](spark, tam).collect()
    }
    changed = [s for s in base if tampered[s][2] != base[s][2]]
    assert len(changed) == 1, changed
    same_counts = all(tampered[s][0] == base[s][0] for s in base)
    assert same_counts
