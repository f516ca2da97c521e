"""The reference's entire topology, Spark-first.

Reference (thingsboard/kafka-streams-example, SolarConsumer.java:97-188):
  Kafka source → rekey (panel,module) → 30s tumbling window agg per module
  (A1) → rekey to panel → window agg per panel (A2) → windowed self-join
  (J1) → variance/stddev re-agg (A3) → join module aggs back (J2) →
  anomaly filter (F1, |moduleSum − panelAvg| / deviance > Z) → Kafka sink.

Spark-first redesign (SURVEY.md §2 row A3, §4.1): A2+J1+A3 collapse into
window functions over the module aggregates — the reference needed three
stateful stages + two repartition topics only because the Kafka Streams DSL
has no multi-column aggregation. Here the whole pipeline is ONE aggregation
and ONE window pass (1 scan, 2 exchanges, 0 joins):

  module_aggregates            -> groupBy(window, panel, module).agg(count, sum)
  enrich_with_panel_statistics -> panel count/sum/avg/squares as stacked
                                  Window ops over (window, panel)
  anomalies                    -> filter on the enriched rows (J2 is free)

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


def enrich_with_panel_statistics(mod: DataFrame) -> DataFrame:
    """A2+J1+A3 collapsed — panel stats computed as WINDOW FUNCTIONS over
    the module aggregates, attached to every module row.

    Reference: SolarConsumer.java:122-157 + SolarPanelAggregator.java:35-59.
    ``squares_sum`` uses the ROUNDED panel mean (§2.1 note 1), so plain
    ``var_pop`` is not equivalent; the two passes (mean, then deviations
    against it) stack as two Window operators over the SAME partitioning —
    Catalyst plans them with one exchange and no sort beyond the partition
    keys.

    Scale rationale: the naive formulation (groupBy → join back → groupBy)
    re-reads the module-agg subtree three times, which Spark physically
    executes as THREE scans of the raw input. Window functions over
    (w, panel) keep it to ONE scan and two exchanges total for the whole
    pipeline, and the downstream anomaly filter needs the per-module rows
    joined with panel stats anyway — this produces exactly that shape with
    zero joins.
    """
    from pyspark.sql import Window

    by_panel = Window.partitionBy("w", "panel")
    enriched = (
        mod.withColumn("panel_cnt", F.count("*").over(by_panel))
        .withColumn("panel_sum", F.sum("sum_power").over(by_panel))
        .withColumn("panel_avg", F.round(F.avg("sum_power").over(by_panel), 1))
        .withColumn(
            "squares_sum",
            F.sum(F.pow(F.col("sum_power") - F.col("panel_avg"), F.lit(2.0))).over(
                by_panel
            ),
        )
        .withColumn("variance", F.col("squares_sum") / F.col("panel_cnt"))
        .withColumn("deviance", F.round(F.sqrt(F.col("variance")), 1))
    )
    return enriched


def panel_statistics(mod: DataFrame) -> DataFrame:
    """Per-panel stats rows (one per window × panel) — the enriched module
    rows reduced to the panel grain. All rows of a (w, panel) group carry
    identical stats, so keeping any one is deterministic."""
    return enrich_with_panel_statistics(mod).select(
        "w",
        "panel",
        "panel_cnt",
        "panel_sum",
        "panel_avg",
        "squares_sum",
        "variance",
        "deviance",
    ).dropDuplicates(["w", "panel"])


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
    The reference's J2 join materializes as the window-function enrichment
    (every module row already carries its panel stats) — no join at all.
    """
    mod = module_aggregates(df, ts_col, panel_col, module_col, power_col, window)
    return anomalies_from_modules(mod, z)


def anomalies_from_modules(mod: DataFrame, z: float = Z) -> DataFrame:
    """J2 + F1 over an already-built module-aggregate table — the entry
    point batch queries use so they can share ONE materialized A1 stage
    (queries/solar.py:_module_agg_cached) across the whole solar family."""
    enriched = enrich_with_panel_statistics(mod)
    # |sum − avg| > z·deviance ≡ |sum − avg|/deviance > z incl. 0-deviance
    # edge cases (§2.1 note 3); portable double arithmetic, no Inf/NaN.
    return enriched.filter(
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


def anomalies_wire_format(out: DataFrame) -> DataFrame:
    """Kafka-sink value in the REFERENCE's exact JSON layout: the
    SolarModuleAggregatorJoiner object — module aggregate fields plus the
    panel aggregate embedded as ``solarPanelAggregator``
    (reference: SolarModuleAggregatorJoiner.java:21-22 — the joiner
    *extends* SolarModuleAggregator, which Jackson flattens — and
    SolarConsumer.java:184-188; field names from
    SolarModuleAggregator.java:26-30, SolarPanelAggregator.java:26-33).
    Kafka key = panel name (SolarConsumer.java:187)."""
    return out.select(
        F.col("panel").alias("key"),
        F.to_json(
            F.struct(
                F.col("module").alias("moduleName"),
                F.col("panel").alias("panelName"),
                F.col("cnt").alias("count"),
                F.col("sum_power").alias("sumPower"),
                F.col("avg_power").alias("avgPower"),
                F.struct(
                    F.col("panel").alias("panelName"),
                    F.col("panel_cnt").alias("count"),
                    F.col("panel_sum").alias("sumPower"),
                    F.col("panel_avg").alias("avgPower"),
                    F.col("squares_sum").alias("squaresSum"),
                    F.col("variance").alias("variance"),
                    F.col("deviance").alias("deviance"),
                ).alias("solarPanelAggregator"),
            )
        ).alias("value"),
    )
