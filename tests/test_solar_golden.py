"""Golden micro-fixture for the solar pipeline — hand-computed expected
values pinning SURVEY.md §2.1 semantics:

(1) squares_sum uses the ROUNDED panel mean,
(2) population variance,
(3) deviance==0 edge cases: diff>0 → anomalous (Inf z), diff==0 → not (NaN z),
(4) single-module panels are never anomalous,
(6) stats are over module *sums*, not records (unequal record counts),
plus HALF_UP rounding on a representable tie (1.25 → 1.3).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_example_spark.plans import solar

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def fixture_df(spark):
    rows = []

    def add(panel, name, sec, power):
        rows.append((f"2024-01-01 00:00:{sec:02d}", panel, name, float(power)))

    # panel A, window [0,30): unequal record counts per module (§2.1(6))
    for s, p in [(1, 10.0), (5, 12.0), (11, 14.0)]:
        add("A", "m1", s, p)  # sum 36
    for s, p in [(2, 30.0), (7, 31.0)]:
        add("A", "m2", s, p)  # sum 61
    add("A", "m3", 3, 99.5)  # sum 99.5
    # panel B, window [0,30): all module sums equal → deviance 0, diff 0 → NaN
    add("B", "m1", 4, 5.0)
    add("B", "m1", 8, 5.0)  # sum 10
    add("B", "m2", 6, 10.0)  # sum 10
    # panel C: single module (§2.1(4))
    add("C", "only", 9, 42.0)
    # panel D: deviance ROUNDS to 0 but sums differ → Inf z → anomaly (§2.1(3))
    add("D", "m1", 10, 5.02)
    add("D", "m1", 12, 5.02)  # sum 10.04
    add("D", "m2", 13, 10.0)  # sum 10.00
    # panel E: HALF_UP tie — avg 2.5/2 = 1.25 (exactly representable) → 1.3
    add("E", "m1", 14, 1.0)
    add("E", "m1", 15, 1.5)
    add("E", "m2", 16, 2.5)
    df = spark.createDataFrame(
        rows, "ts STRING, panel STRING, name STRING, power DOUBLE"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_module_agg_golden(spark, fixture_df):
    mod = solar.module_aggregates(fixture_df)
    got = {
        (r.panel, r.module): (r.cnt, r.sum_power, r.avg_power)
        for r in mod.collect()
    }
    assert got[("A", "m1")] == (3, 36.0, 12.0)
    assert got[("A", "m2")] == (2, 61.0, 30.5)
    assert got[("A", "m3")] == (1, 99.5, 99.5)
    # HALF_UP on the representable tie 1.25 → 1.3 (not banker's 1.2)
    assert got[("E", "m1")] == (2, 2.5, 1.3)


def test_panel_stats_golden(spark, fixture_df):
    stats = solar.panel_statistics(solar.module_aggregates(fixture_df))
    got = {
        r.panel: (r.panel_cnt, r.panel_sum, r.panel_avg, r.squares_sum, r.deviance)
        for r in stats.collect()
    }
    # panel A: sums 36, 61, 99.5 → avg 65.5 (rounded), squares vs ROUNDED avg
    assert got["A"][0] == 3
    assert got["A"][1] == pytest.approx(196.5)
    assert got["A"][2] == 65.5
    assert got["A"][3] == pytest.approx(870.25 + 20.25 + 1156.0)  # 2046.5
    assert got["A"][4] == pytest.approx(26.1)  # round(sqrt(682.1667), 1)
    # panel B: equal sums → everything zero
    assert got["B"][3] == pytest.approx(0.0) and got["B"][4] == 0.0
    # panel D: deviance rounds to 0 while sums differ
    assert got["D"][4] == 0.0 and got["D"][3] > 0


def test_anomalies_golden(spark, fixture_df):
    out = solar.anomalies(fixture_df)
    got = {(r.panel, r.module) for r in out.collect()}
    assert got == {
        ("A", "m1"),  # |36 − 65.5| = 29.5 > 26.1
        ("A", "m3"),  # |99.5 − 65.5| = 34 > 26.1
        ("D", "m1"),  # |10.04 − 10.0| = 0.04 > 0 (Inf z-score case)
        ("D", "m2"),  # |10.00 − 10.0| = 0.04 > 0 — wait, diff is 0.0; see below
    } - {("D", "m2")}
    # explicit negative assertions
    assert ("A", "m2") not in got          # within 1σ
    assert ("B", "m1") not in got and ("B", "m2") not in got  # NaN z case
    assert ("C", "only") not in got        # single-module panel
    # D/m2: sum 10.00 vs panel_avg 10.0 → diff 0 → NaN z → not anomalous
    assert ("D", "m2") not in got


def test_reference_division_semantics_equivalence(spark, fixture_df):
    """The shipped predicate |diff| > z·deviance must equal the REFERENCE's
    |diff|/deviance > z under Java double semantics (Inf/NaN included) —
    computed here with numpy, which follows IEEE-754 like Java.

    Note Spark itself CANNOT express the reference predicate as a division:
    Spark SQL returns NULL for x/0 with ANSI off and raises with ANSI on —
    either way the Inf-case anomalies (deviance rounds to 0, sums differ,
    SolarConsumer.java:198-201) would be silently lost. The algebraic
    rewrite is therefore the only faithful Spark expression."""
    import numpy as np

    mod = solar.module_aggregates(fixture_df)
    stats = solar.panel_statistics(mod)
    joined = mod.join(stats, ["w", "panel"])
    shipped = {
        (r.panel, r.module)
        for r in joined.filter(
            F.abs(F.col("sum_power") - F.col("panel_avg")) > 1.0 * F.col("deviance")
        ).collect()
    }
    with np.errstate(divide="ignore", invalid="ignore"):
        reference = {
            (r.panel, r.module)
            for r in joined.collect()
            if np.float64(abs(r.sum_power - r.panel_avg)) / np.float64(r.deviance) > 1.0
        }
    assert shipped == reference
