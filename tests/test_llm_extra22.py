"""Semantic tests for the twenty-third tranche (Theil-Sen, Holt
smoothing, mixture budgeting, ER survivorship). Oracle parity runs via
test_oracle_parity; these replay each algorithm in plain Python over
the same SF_SMOKE data."""

from __future__ import annotations

import math
import re
import statistics
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from kafka_streams_example_spark import registry
from kafka_streams_example_spark.queries.dedup import _PH_TYPO_MOD
from kafka_streams_example_spark.queries.operational import _MB_BUDGET_SHARE
from kafka_streams_example_spark.queries.timeseries import _HW_ALPHA, _HW_BETA
from tests.conftest import SF_SMOKE


def _byday(spark):
    from kafka_streams_example_spark.sources.files import load_table

    rows = load_table(spark, SF_SMOKE, "events").select(
        (F.col("ts").cast("long") / 86400).cast("long").alias("day")
    ).collect()
    c = Counter(r.day for r in rows)
    return sorted(c.items())


# --------------------------------------------------------------------------
# theil_sen_trend
# --------------------------------------------------------------------------


def test_theil_sen_matches_python_replay(spark):
    series = _byday(spark)
    slopes = [
        (cb - ca) / (db - da)
        for i, (da, ca) in enumerate(series)
        for db, cb in series[i + 1 :]
    ]
    r = registry.QUERIES["theil_sen_trend"](spark, SF_SMOKE).collect()[0]
    assert r.n_days == len(series)
    assert r.n_pairs == len(slopes) == len(series) * (len(series) - 1) // 2
    assert abs(r.theil_sen_slope - statistics.median(slopes)) < 1e-6
    n = len(series)
    sx = sum(d for d, _ in series)
    sy = sum(c for _, c in series)
    sxy = sum(d * c for d, c in series)
    sxx = sum(d * d for d, _ in series)
    ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(r.ols_slope - ols) < 1e-6


# --------------------------------------------------------------------------
# holt_linear_trace
# --------------------------------------------------------------------------


def test_holt_trace_matches_python_recurrence_exactly(spark):
    """Dyadic coefficients + integer inputs => the trace must match the
    Python recurrence EXACTLY (==, not approx)."""
    series = _byday(spark)
    assert len(series) >= 3
    level = float(series[0][1])
    trend = float(series[1][1] - series[0][1])
    expect = {1: (series[0][0], series[0][1], level, trend)}
    for rn, (day, cnt) in enumerate(series[1:], start=2):
        new_level = _HW_ALPHA * cnt + (1 - _HW_ALPHA) * (level + trend)
        trend = _HW_BETA * (new_level - level) + (1 - _HW_BETA) * trend
        level = new_level
        expect[rn] = (day, cnt, level, trend)
    got = {
        r.rn: (r.day, r.cnt, r.level, r.trend)
        for r in registry.QUERIES["holt_linear_trace"](spark, SF_SMOKE).collect()
    }
    assert got == expect  # bit-exact


def test_holt_trace_smooths_variance(spark):
    """The level series must vary less than the raw series (that's what
    smoothing is for)."""
    out = sorted(
        registry.QUERIES["holt_linear_trace"](spark, SF_SMOKE).collect(),
        key=lambda r: r.rn,
    )
    raw = [r.cnt for r in out]
    lvl = [r.level for r in out]
    d_raw = [abs(b - a) for a, b in zip(raw, raw[1:])]
    d_lvl = [abs(b - a) for a, b in zip(lvl, lvl[1:])]
    assert sum(d_lvl) < sum(d_raw)


# --------------------------------------------------------------------------
# mixture_budget_allocation
# --------------------------------------------------------------------------


def test_mixture_allocation_fills_budget_greedily(spark):
    out = registry.QUERIES["mixture_budget_allocation"](spark, SF_SMOKE).collect()
    total = sum(r.tokens_available for r in out)
    budget = total // _MB_BUDGET_SHARE
    allocated = sum(r.allocated_tokens for r in out)
    assert allocated == budget  # budget binds on the fixture
    for r in out:
        assert 0 <= r.allocated_tokens <= r.tokens_available
        assert r.truncated == (r.allocated_tokens < r.tokens_available)
    # greedy order: every fully-funded source outranks every starved one
    order = sorted(out, key=lambda r: (-r.en_share, r.source))
    seen_partial = False
    for r in order:
        if r.allocated_tokens < r.tokens_available:
            seen_partial = True
        elif seen_partial:
            raise AssertionError(
                f"fully-funded {r.source} ranked after a starved source"
            )


# --------------------------------------------------------------------------
# er_merge_survivorship
# --------------------------------------------------------------------------


def _typo_py(name: str) -> str:
    return " ".join(w[0] + re.sub("[aeiou]", "", w[1:]) for w in name.split(" "))


def test_survivorship_matches_python_replay(spark):
    from tests.test_llm_extra20 import _phonetic_py

    parts = spark.read.parquet(f"{SF_SMOKE}/part.parquet").select(
        "p_partkey", "p_name"
    ).collect()
    names = [r.p_name for r in parts] + [
        _typo_py(r.p_name) for r in parts if r.p_partkey % _PH_TYPO_MOD == 0
    ]
    counts = Counter()
    for name in names:
        w = name.split(" ")
        if len(w) >= 2:
            counts[(_phonetic_py(w[0]) + "-" + _phonetic_py(w[1]), name)] += 1
    by_sig = defaultdict(dict)
    for (sig, name), n in counts.items():
        by_sig[sig][name] = n
    out = {r.signature: r for r in registry.QUERIES["er_merge_survivorship"](spark, SF_SMOKE).collect()}
    assert set(out) == set(by_sig)
    for sig, names_n in by_sig.items():
        surv = sorted(names_n.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        r = out[sig]
        assert r.survivor_name == surv[0]
        assert r.n_records == sum(names_n.values())
        assert r.n_names == len(names_n)
        assert r.merged_records == r.n_records - surv[1]
        assert r.max_edit_distance >= 0
        if r.n_names == 1:
            assert r.merged_records == 0 and r.max_edit_distance == 0


def test_survivorship_merge_radius_is_bounded_by_vowel_drops(spark):
    """For this fixture the only surface variation is vowel dropping, so
    the merge radius can never exceed the vowel count of the longest
    name — a loose but meaningful QA bound."""
    out = registry.QUERIES["er_merge_survivorship"](spark, SF_SMOKE).collect()
    parts = spark.read.parquet(f"{SF_SMOKE}/part.parquet").select("p_name").collect()
    max_vowels = max(len(re.findall("[aeiou]", r.p_name)) for r in parts)
    assert all(r.max_edit_distance <= max_vowels for r in out)
