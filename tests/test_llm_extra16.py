"""Semantic tests for the seventeenth tranche (Count-Min, theta set ops,
Benford, ACF, CUSUM, feature hashing, calibration bins). Oracle parity
runs via test_oracle_parity; these pin the properties the hash alone
doesn't explain — sketch guarantees, series-math identities, and the
plan shapes that matter at scale."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from kafka_streams_example_spark import registry
from kafka_streams_example_spark.queries.sketches import (
    _CM_D,
    _CM_TOPK,
    _CM_W,
    _FH_DIM,
    _TH_K,
)
from kafka_streams_example_spark.queries.stats import _BENFORD_P
from tests.conftest import SF_SMOKE


def test_countmin_never_undercounts_and_matches_exact_for_unique_cells(spark):
    """The defining CM guarantee: min-of-counters >= true count for every
    probe, and the probe set is exactly the top-k by (count, token)."""
    rows = registry.QUERIES["countmin_heavy_hitters"](spark, SF_SMOKE).collect()
    assert len(rows) == _CM_TOPK
    for r in rows:
        assert r.never_undercounts, r
        assert r.cm_estimate >= r.exact_count
        assert r.overcount == r.cm_estimate - r.exact_count

    from kafka_streams_example_spark.operators import text as tx

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    exact = (
        docs.select(F.explode(tx.tokens(F.lower(F.col("text")))).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "t")
        .limit(_CM_TOPK)
        .collect()
    )
    assert {(r.token, r.exact_count) for r in rows} == {
        (r.t, r.c) for r in exact
    }


def test_countmin_overcount_is_bounded_by_colliding_mass(spark):
    """With d rows the estimate can only exceed truth by collision mass:
    every overcount stays under the total token mass / w (loose union
    bound across the min of d rows)."""
    rows = registry.QUERIES["countmin_heavy_hitters"](spark, SF_SMOKE).collect()
    from kafka_streams_example_spark.operators import text as tx

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    total = docs.select(
        F.explode(tx.tokens(F.lower(F.col("text")))).alias("t")
    ).count()
    for r in rows:
        assert r.overcount <= total / _CM_W * 3, (r, total)


def test_countmin_sketch_is_fixed_width(spark):
    """The cell table the estimate reads from can never exceed d*w rows —
    the property that makes the sketch mergeable state, not data."""
    assert _CM_D * _CM_W == 256


def test_theta_sketch_set_ops_identities(spark):
    """est/exact columns obey the theta-sketch structure: k_seen <= k,
    intersection estimate <= union estimate, exact_inter <= exact_union,
    and the small-regime fallback is exact."""
    r = registry.QUERIES["theta_sketch_set_ops"](spark, SF_SMOKE).collect()[0]
    assert r.k == _TH_K
    assert 1 <= r.k_seen <= _TH_K
    assert r.exact_inter <= r.exact_union
    assert r.est_inter <= r.est_union + 1e-9
    assert r.union_within_bound, (r.est_union, r.exact_union, r.union_rel_err)
    if r.k_seen < _TH_K:
        # sketch held the whole union: both estimates are exact
        assert r.est_union == float(r.exact_union)
        assert r.est_inter == float(r.exact_inter)


def test_theta_sketch_plan_avoids_global_sort(spark):
    """The k smallest hashes must come from TakeOrderedAndProject, and
    the membership flags must join broadcast — never a wide shuffle of
    the hash sets against the 32-row sketch."""
    df = registry.QUERIES["theta_sketch_set_ops"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:800]


def test_benford_shares_and_chi2(spark):
    """Digits cover 1..9 exactly, observed shares sum to 1, expected
    shares are the Benford constants, chi2 terms are non-negative."""
    rows = registry.QUERIES["benford_first_digit"](spark, SF_SMOKE).collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.benford_share - round(_BENFORD_P[r.digit], 6)) < 1e-9
        assert r.chi2_term >= 0.0
    n = sum(r.n_orders for r in rows)
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    assert n == orders.count()


def test_acf_lag_zero_would_be_one_and_bounds(spark):
    """Sample ACF values are within [-1, 1] (full-series denominator
    dominates any partial-sum numerator) and pair counts shrink by one
    per extra lag over the contiguous daily series."""
    rows = registry.QUERIES["acf_daily_events"](spark, SF_SMOKE).collect()
    assert sorted(r.lag for r in rows) == list(range(1, 8))
    by_lag = {r.lag: r for r in rows}
    for r in rows:
        assert -1.0 <= r.acf <= 1.0, r
    n1 = by_lag[1].n_pairs
    for k in range(2, 8):
        assert by_lag[k].n_pairs == n1 - (k - 1)


def test_acf_events_scan_happens_once(spark):
    """The only pass over the events table is the daily collapse: every
    appearance of the events scan in the executed plan must be a read of
    the cached daily series (InMemoryTableScan embeds the source path in
    its relation description), never a second raw file scan."""
    df = registry.QUERIES["acf_daily_events"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    leaves = plan.collectLeaves()
    kinds = [
        leaves.apply(i).getClass().getSimpleName() for i in range(leaves.size())
    ]
    assert "InMemoryTableScanExec" in kinds, kinds
    assert "FileSourceScanExec" not in kinds, kinds


def test_cusum_matches_reference_recursion(spark):
    """The window-function form (run - min(0, running-min run)) must equal
    the textbook recursion s_t = max(0, s_{t-1} + dev_t) replayed in
    Python over the same series."""
    rows = sorted(
        registry.QUERIES["cusum_changepoint"](spark, SF_SMOKE).collect(),
        key=lambda r: r.day,
    )
    xs = [r.x for r in rows]
    n = len(xs)
    mu = sum(xs) / n
    sigma = math.sqrt(sum((x - mu) ** 2 for x in xs) / n)
    s = 0.0
    for r, x in zip(rows, xs):
        s = max(0.0, s + (x - mu - 0.5 * sigma))
        assert abs(r.cusum_pos - s) < 1e-6, (r.day, r.cusum_pos, s)
        assert r.alarm == (round(s - 4.0 * sigma, 6) > 0.0) or abs(
            s - 4.0 * sigma
        ) < 1e-6


def test_cusum_is_nonnegative_and_resets(spark):
    rows = registry.QUERIES["cusum_changepoint"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.cusum_pos >= 0.0


def test_feature_hashing_dims_and_mass(spark):
    """Dims stay in [0, 16); total |weight| mass never exceeds the token
    count; weights reconstruct per-doc from an independent Python replay
    for a sample doc."""
    df = registry.QUERIES["feature_hashing_sparse"](spark, SF_SMOKE)
    rows = df.collect()
    assert rows
    assert all(0 <= r.dim < _FH_DIM for r in rows)

    from kafka_streams_example_spark.operators import text as tx

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    total_tokens = docs.select(
        F.explode(tx.tokens(F.lower(F.col("text")))).alias("t")
    ).count()
    assert sum(abs(r.weight) for r in rows) <= total_tokens

    # replay one doc in Python
    import hashlib

    doc = docs.orderBy("doc_id").first()
    toks = [t for t in __import__("re").split(
        "[ \t\n\x0b\f\r]+", doc.text.lower().strip()) if t]
    expect: dict[int, int] = {}
    for t in toks:
        d = int(hashlib.md5(f"fh:{t}".encode()).hexdigest()[:15], 16) % _FH_DIM
        sgn = 1 if int(
            hashlib.md5(f"fs:{t}".encode()).hexdigest()[:15], 16) % 2 == 0 else -1
        expect[d] = expect.get(d, 0) + sgn
    got = {r.dim: r.weight for r in rows if r.doc_id == doc.doc_id}
    assert got == expect


def test_feature_hashing_shuffle_carries_no_tokens(spark):
    """Bucket/sign computation must be map-side: the exchange input
    carries (doc_id, dim, sign), never token strings."""
    df = registry.QUERIES["feature_hashing_sparse"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    ex = plan.find("Exchange hashpartitioning")
    assert ex != -1
    assert "token" not in plan[ex : ex + 300], plan[ex : ex + 300]


def test_calibration_bins_partition_docs(spark):
    """Bins tile [0,1] deciles, doc counts sum to the corpus, and each
    bin's mean prediction lies inside its decile bounds."""
    rows = registry.QUERIES["score_calibration_bins"](spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r.bin <= 9
        lo, hi = r.bin / 10.0, (r.bin + 1) / 10.0 if r.bin < 9 else 1.0
        assert lo - 1e-9 <= r.mean_prob <= hi + 1e-9, (r.bin, r.mean_prob)
        assert 0.0 <= r.frac_en <= 1.0
        assert abs(r.calibration_gap - round(r.mean_prob - r.frac_en, 6)) < 2e-6


def test_calibration_oracle_inlines_scorer_oracle():
    """The calibration oracle must textually contain the registered
    scorer oracle — the no-drift composition guarantee."""
    assert (
        registry.ORACLES["quality_logreg_score"].strip()
        in registry.ORACLES["score_calibration_bins"]
    )
