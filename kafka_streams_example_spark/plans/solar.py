"""The reference's entire topology, Spark-first.

Reference (thingsboard/kafka-streams-example, SolarConsumer.java:97-188):
  Kafka source → rekey (panel,module) → 30s tumbling window agg per module
  (A1) → rekey to panel → window agg per panel (A2) → windowed self-join
  (J1) → variance/stddev re-agg (A3) → join module aggs back (J2) →
  anomaly filter (F1, |moduleSum − panelAvg| / deviance > Z) → Kafka sink.

Spark-first redesign (SURVEY.md §2 row A3, §4.1): A2+J1+A3 collapse into a
single ``groupBy(window, panel).agg(...)`` — the reference needed three
stateful stages + two repartition topics only because the Kafka Streams DSL
has no multi-column aggregation. Here the whole pipeline is TWO aggregations
and ONE join:

  module_aggregates  -> groupBy(window, panel, module).agg(count, sum)
  panel_statistics   -> groupBy(window, panel).agg(count, sum, avg, squares)
  anomalies          -> module ⋈ panel-stats on (window, panel), filter

Semantic fine print faithfully kept (SURVEY.md §2.1):
 1. ``avg_power``/``panel_avg`` round HALF_UP to 1 decimal
    (reference: SolarModuleAggregator.java:38-39, SolarPanelAggregator.java:40-41)
    and ``squares_sum`` is computed against the ROUNDED panel mean
    (reference: SolarPanelAggregator.java:52), so plain ``var_pop`` is NOT
    equivalent — we keep the explicit sum-of-squares form.
 2. Population variance: squares_sum / count
    (reference: SolarPanelAggregator.java:54).
 3. The anomaly predicate is |moduleSum − panelAvg| / deviance > Z with Java
    double semantics (reference: SolarConsumer.java:198-201): deviance==0 &
    diff>0 → Inf > Z → anomalous; deviance==0 & diff==0 → NaN > Z → not.
    For any Z > 0 this is algebraically |moduleSum − panelAvg| > Z*deviance
    (deviance ≥ 0 always), which we use so the predicate is portable to
    engines whose x/0 is NULL rather than Inf (the DuckDB oracle).

Shuffle budget at scale: exchange on (window, panel, module) for A1 with
map-side partial aggregation, then (window, panel) for the stats agg — a
strict sub-key, so AQE can often satisfy it with a local re-shuffle. The
panel-stats side of the final join is tiny (panels × windows, not records)
→ broadcast it. The reference instead crossed a Kafka broker round-trip at
every one of its 4 repartition/changelog boundaries (SURVEY.md §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW_DURATION = "30 seconds"  # reference: SolarConsumer.java:53-55
Z = 1.0                         # reference: SolarConsumer.java:87-88


def module_aggregates(
    df: DataFrame,
    ts_col: str = "ts",
    panel_col: str = "panel",
    module_col: str = "name",
    power_col: str = "power",
    window: str = WINDOW_DURATION,
) -> DataFrame:
    """A1 — per-module tumbling-window aggregation.

    Reference: SolarConsumer.java:107-115 + SolarModuleAggregator.java:32-41.
    Output: one row per (window, panel, module) with count / sum / rounded avg.
    """
    return (
        df.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(panel_col).alias("panel"),
            F.col(module_col).alias("module"),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col(power_col)).alias("sum_power"),
        )
        .withColumn("avg_power", F.round(F.col("sum_power") / F.col("cnt"), 1))
    )


def panel_statistics(mod: DataFrame) -> DataFrame:
    """A2+J1+A3 collapsed — per-panel stats over module window sums.

    Reference: SolarConsumer.java:122-157 + SolarPanelAggregator.java:35-59.
    ``squares_sum`` uses the ROUNDED panel mean (§2.1 note 1), so this is a
    two-pass agg: first the mean, then the deviations — expressed as one
    groupBy over the module aggregates joined to its own mean. Because both
    aggs share the (w, panel) grouping, Catalyst reuses the exchange.
    """
    base = mod.groupBy("w", "panel").agg(
        F.count("*").alias("panel_cnt"),
        F.sum("sum_power").alias("panel_sum"),
        F.round(F.avg("sum_power"), 1).alias("panel_avg"),
    )
    # Second pass for deviations against the rounded mean. The joined input
    # is (modules × windows) — already aggregated, tiny relative to raw.
    return (
        mod.join(base, ["w", "panel"])
        .groupBy("w", "panel", "panel_cnt", "panel_sum", "panel_avg")
        .agg(
            F.sum(F.pow(F.col("sum_power") - F.col("panel_avg"), F.lit(2.0))).alias(
                "squares_sum"
            )
        )
        .withColumn("variance", F.col("squares_sum") / F.col("panel_cnt"))
        .withColumn("deviance", F.round(F.sqrt(F.col("variance")), 1))
    )


def anomalies(
    df: DataFrame,
    z: float = Z,
    ts_col: str = "ts",
    panel_col: str = "panel",
    module_col: str = "name",
    power_col: str = "power",
    window: str = WINDOW_DURATION,
) -> DataFrame:
    """Full pipeline: J2 + F1 — modules whose window sum deviates > z·σ.

    Reference: SolarConsumer.java:165-188 (join) + :198-201 (predicate).
    The panel-stats side has |panels|×|windows| rows — broadcast it.
    """
    mod = module_aggregates(df, ts_col, panel_col, module_col, power_col, window)
    stats = panel_statistics(mod)
    joined = mod.join(F.broadcast(stats), ["w", "panel"])
    # |sum − avg| > z·deviance ≡ |sum − avg|/deviance > z incl. 0-deviance
    # edge cases (§2.1 note 3); portable double arithmetic, no Inf/NaN.
    return joined.filter(
        F.abs(F.col("sum_power") - F.col("panel_avg")) > F.lit(z) * F.col("deviance")
    )


def with_window_epoch(df: DataFrame) -> DataFrame:
    """Replace the window struct with its start/end as epoch seconds —
    engine-portable output shape (struct columns hash differently across
    engines; epoch seconds are exact integers)."""
    return df.withColumn("w_start", F.col("w.start").cast("long")).withColumn(
        "w_end", F.col("w.end").cast("long")
    ).drop("w")


def events_as_solar(events: DataFrame) -> DataFrame:
    """Map the driver's events table onto the solar input schema
    (repo: FIXTURES.md §3): user_id→panel, event_type→module, value→power."""
    return events.select(
        F.col("ts"),
        F.col("user_id").cast("string").alias("panel"),
        F.col("event_type").alias("name"),
        F.col("value").alias("power"),
    )
