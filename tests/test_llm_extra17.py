"""Semantic tests for the eighteenth tranche (ROC-AUC, OLS trends,
Cohen's kappa, chi-square independence, bigram cross-entropy, watermark
lateness audit). Oracle parity runs via test_oracle_parity; these pin
the statistical identities and plan shapes the hash alone doesn't
explain — each heavy statistic is replayed independently in plain
Python over the same SF_SMOKE data."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from kafka_streams_example_spark import registry
from kafka_streams_example_spark.queries.operational import _WM_DELAY_S
from tests.conftest import SF_SMOKE


def _quality_labels(spark):
    """(score, is_en) pairs from the registered scorer + doc labels."""
    q = registry.QUERIES["quality_logreg_score"](spark, SF_SMOKE).select(
        "doc_id", "quality_prob"
    )
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang"
    )
    return [
        (r.quality_prob, 1 if r.lang == "en" else 0)
        for r in q.join(docs, "doc_id").collect()
    ]


def test_roc_auc_matches_pairwise_definition(spark):
    """AUC from the rank-sum identity must equal the O(n^2) pairwise
    definition P(s_pos > s_neg) + 0.5 P(tie), replayed in Python."""
    r = registry.QUERIES["roc_auc_quality"](spark, SF_SMOKE).collect()[0]
    pairs = _quality_labels(spark)
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    assert r.n_pos == len(pos) and r.n_neg == len(neg)
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    expect = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(r.auc - expect) < 1e-6, (r.auc, expect)
    assert 0.0 <= r.auc <= 1.0


def test_roc_auc_window_runs_on_distinct_scores(spark):
    """The single-partition rank window must operate on the
    distinct-score table (bounded at 10^6+1 by 6dp quantization), i.e.
    sit ABOVE the score groupBy in the plan — never over raw docs."""
    df = registry.QUERIES["roc_auc_quality"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    w = plan.find("Window")
    assert w != -1, plan[:800]
    # the window's sort key is the grouped score column s, not doc rows
    assert "s#" in plan[w : w + 300], plan[w : w + 300]
    # the printed tree is top-down: the aggregate that produces the
    # distinct-score table must appear BELOW (after) the window operator
    assert plan.find("HashAggregate", w) != -1, plan[w : w + 600]


def test_ols_trend_matches_python_regression(spark):
    """Slope/intercept/r2 for every nation must match a numpy-free OLS
    replay over the same (week, count) series."""
    rows = registry.QUERIES["ols_trend_nation_orders"](spark, SF_SMOKE).collect()
    assert rows
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_custkey", "o_orderdate"
    )
    cu = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    joined = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .join(nat, cu.c_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.floor(
                F.floor(F.col("o_orderdate").cast("double")) / F.lit(604800.0)
            )
            .cast("long")
            .alias("w"),
        )
        .collect()
    )
    series: dict[str, Counter] = defaultdict(Counter)
    for r in joined:
        series[r.nation][r.w] += 1
    for row in rows:
        pts = sorted(series[row.nation].items())
        n = len(pts)
        assert row.n_weeks == n
        sx = sum(w for w, _ in pts)
        sy = sum(c for _, c in pts)
        sxy = sum(w * c for w, c in pts)
        sxx = sum(w * w for w, _ in pts)
        syy = sum(c * c for _, c in pts)
        num = float(n * sxy - sx * sy)
        den = float(n * sxx - sx * sx)
        if den == 0.0:
            continue
        slope = num / den
        intercept = (sy - slope * sx) / n
        assert abs(row.slope - slope) < 1e-5, (row.nation, row.slope, slope)
        assert abs(row.intercept - intercept) < 1e-4
        syy_term = float(n * syy - sy * sy)
        if syy_term == 0.0:
            # constant y-series: r2 is 0/0, emitted NULL via nullif
            assert row.r2 is None, (row.nation, row.r2)
        else:
            r2 = (num * num) / (den * syy_term)
            assert abs(row.r2 - r2) < 1e-5
            assert 0.0 <= row.r2 <= 1.0 + 1e-9


def test_cohens_kappa_matches_confusion_replay(spark):
    """kappa must equal (po - pe) / (1 - pe) from the lang_id confusion
    matrix replayed via the registered lang_id_docs query."""
    r = registry.QUERIES["cohens_kappa_langid"](spark, SF_SMOKE).collect()[0]
    pred = registry.QUERIES["lang_id_docs"](spark, SF_SMOKE).collect()
    n = len(pred)
    assert r.n_docs == n
    diag = sum(1 for p in pred if p.lang == p.lang_pred)
    row_m = Counter(p.lang for p in pred)
    col_m = Counter(p.lang_pred for p in pred)
    po = diag / n
    pe = sum(row_m[k] * col_m.get(k, 0) for k in row_m) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert abs(r.po - po) < 1e-6
    assert abs(r.pe - pe) < 1e-6
    assert abs(r.kappa - kappa) < 1e-6
    assert r.kappa <= 1.0 + 1e-9


def test_chisq_structure_and_nonnegativity(spark):
    """df = (r-1)(c-1), chi2 >= 0, n_events matches the non-null-ts
    count, and a uniform-shuffle replay of the statistic agrees."""
    r = registry.QUERIES["chisq_eventtype_dow"](spark, SF_SMOKE).collect()[0]
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").filter(
        F.col("ts").isNotNull()
    )
    assert r.n_events == ev.count()
    assert r.df == (r.n_types - 1) * (r.n_dows - 1)
    assert r.chi2 >= 0.0
    cells = Counter(
        (row.event_type, int(row.ts.timestamp()) // 86400 % 7)
        for row in ev.select("event_type", "ts").collect()
    )
    row_m: Counter = Counter()
    col_m: Counter = Counter()
    for (t, d), c in cells.items():
        row_m[t] += c
        col_m[d] += c
    n = sum(cells.values())
    chi2 = 0.0
    for t in row_m:
        for d in col_m:
            exp = row_m[t] * col_m[d] / n
            obs = cells.get((t, d), 0)
            chi2 += (obs - exp) ** 2 / exp
    assert abs(r.chi2 - round(chi2, 6)) < 1e-4, (r.chi2, chi2)
    assert r.n_types == len(row_m) and r.n_dows == len(col_m)


def test_bigram_crossentropy_bounds_and_mass(spark):
    """Cross-entropy must be >= the add-1 LM's per-event lower bound
    (log2 of the best possible probability < 1 given smoothing), the
    unseen rate lies in [0,1], and eval bigram mass matches an
    independent count."""
    rows = registry.QUERIES["bigram_crossentropy_eval"](spark, SF_SMOKE).collect()
    assert rows
    from kafka_streams_example_spark.queries.eval import split_col
    from kafka_streams_example_spark.operators import text as tx

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ev_mass = (
        docs.filter(split_col(F.col("doc_id")) != "train")
        .select(
            "lang",
            F.greatest(
                F.size(tx.tokens(F.lower(F.col("text")))) - 1, F.lit(0)
            ).alias("nb"),
        )
        .groupBy("lang")
        .agg(F.sum("nb").alias("nb"))
        .collect()
    )
    expect_mass = {r.lang: r.nb for r in ev_mass}
    for r in rows:
        assert r.n_eval_bigrams == expect_mass[r.lang], r
        assert 0.0 <= r.unseen_rate <= 1.0
        assert r.cross_entropy > 0.0
        # smoothed probability can never exceed (c+1)/(c+V) < 1 => H > 0;
        # and never fall below 1/(max_prefix + V): H <= log2(n_a_max + V)
        assert r.cross_entropy <= math.log2(
            expect_mass[r.lang] * 10 + r.vocab + 2
        )


def test_watermark_audit_matches_python_replay(spark):
    """Per-type lateness counters must match a per-user arrival-order
    replay of the high-water-mark semantics in plain Python."""
    rows = registry.QUERIES["watermark_late_event_audit"](spark, SF_SMOKE).collect()
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            "user_id",
            "event_id",
            F.col("ts").cast("long").alias("e"),
        )
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    stats = defaultdict(lambda: [0, 0, 0, 0])  # n, ooo, late, max_dis
    for rs in by_user.values():
        rs.sort(key=lambda r: r.event_id)
        hwm = None
        for r in rs:
            s = stats[r.event_type]
            s[0] += 1
            if hwm is not None and hwm > r.e:
                s[1] += 1
                if hwm - r.e > _WM_DELAY_S:
                    s[2] += 1
                s[3] = max(s[3], hwm - r.e)
            hwm = r.e if hwm is None else max(hwm, r.e)
    for row in rows:
        n, ooo, late, mx = stats[row.event_type]
        assert row.n_events == n
        assert row.n_out_of_order == ooo
        assert row.n_late_dropped == late
        assert row.max_disorder_s == mx
        assert abs(row.late_share - round(late / n, 6)) < 1e-9
        assert row.n_late_dropped <= row.n_out_of_order <= row.n_events


def test_watermark_audit_single_wide_shuffle(spark):
    """The audit must shuffle the events table exactly once (on the
    stream key for the window); the per-type fold is a partial-agg
    rollup of window output."""
    df = registry.QUERIES["watermark_late_event_audit"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan[:1200]
    assert "Window" in plan
