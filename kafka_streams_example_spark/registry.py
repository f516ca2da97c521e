"""Query registry — the engine's public query surface.

``QUERIES`` maps a query name to a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLES`` maps the same name to an ANSI-SQL string DuckDB can run against
the same parquet tables. The driver hash-compares the two (order-insensitive,
columns sorted by name), so:

- every computed column is aliased IDENTICALLY on both sides;
- double-valued aggregates are rounded (4-6 decimals) on BOTH sides — float
  summation order differs between engines, rounding collapses the ULP noise;
- tumbling windows are emitted as epoch-second BIGINTs (portable across
  engines; struct columns are not);
- predicates avoid Inf/NaN (Spark follows Java doubles, DuckDB yields NULL
  on x/0) — see plans/solar.py for the algebraic rewrite.

Queries without an oracle entry (streaming, approximate ops) get the
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_example_spark.plans import solar
from kafka_streams_example_spark.sources.files import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Solar pipeline (the reference's own topology) mapped onto `events`
# (repo: FIXTURES.md §3 — user_id→panel, event_type→module, value→power).
# --------------------------------------------------------------------------

# Shared oracle CTEs replicating SURVEY.md §2.1 math in DuckDB.
_SOLAR_CTE = """
WITH raw AS (
    SELECT CAST(floor(epoch(ts) / 30) * 30 AS BIGINT) AS w_start,
           CAST(user_id AS VARCHAR) AS panel,
           event_type AS module,
           value AS power
    FROM events
),
mod AS (
    SELECT w_start, panel, module,
           count(*) AS cnt,
           sum(power) AS sum_power
    FROM raw GROUP BY 1, 2, 3
),
base AS (
    SELECT w_start, panel,
           count(*) AS panel_cnt,
           sum(sum_power) AS panel_sum,
           round(avg(sum_power), 1) AS panel_avg
    FROM mod GROUP BY 1, 2
),
stats AS (
    SELECT m.w_start, m.panel, b.panel_cnt, b.panel_sum, b.panel_avg,
           sum(pow(m.sum_power - b.panel_avg, 2)) AS squares_sum
    FROM mod m JOIN base b USING (w_start, panel)
    GROUP BY 1, 2, 3, 4, 5
)
"""


@register(
    "solar_module_agg",
    _SOLAR_CTE
    + """
SELECT w_start, w_start + 30 AS w_end, panel, module, cnt,
       round(sum_power, 4) AS sum_power,
       round(sum_power / cnt, 1) AS avg_power
FROM mod
""",
)
def solar_module_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-module 30s tumbling window aggregation
    (reference: SolarConsumer.java:107-115)."""
    df = solar.events_as_solar(load_table(spark, sf_dir, "events"))
    mod = solar.module_aggregates(df)
    return solar.with_window_epoch(mod).select(
        "w_start",
        "w_end",
        "panel",
        "module",
        "cnt",
        F.round("sum_power", 4).alias("sum_power"),
        "avg_power",
    )


@register(
    "solar_panel_stats",
    _SOLAR_CTE
    + """
SELECT w_start, w_start + 30 AS w_end, panel, panel_cnt,
       round(panel_sum, 4) AS panel_sum,
       panel_avg,
       round(squares_sum, 4) AS squares_sum,
       round(squares_sum / panel_cnt, 6) AS variance,
       round(sqrt(squares_sum / panel_cnt), 1) AS deviance
FROM stats
""",
)
def solar_panel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+J1+A3 collapsed: per-panel window stats incl. population stddev of
    module sums (reference: SolarConsumer.java:122-157,
    SolarPanelAggregator.java:45-59)."""
    df = solar.events_as_solar(load_table(spark, sf_dir, "events"))
    stats = solar.panel_statistics(solar.module_aggregates(df))
    return solar.with_window_epoch(stats).select(
        "w_start",
        "w_end",
        "panel",
        "panel_cnt",
        F.round("panel_sum", 4).alias("panel_sum"),
        "panel_avg",
        F.round("squares_sum", 4).alias("squares_sum"),
        F.round("variance", 6).alias("variance"),
        "deviance",
    )


@register(
    "solar_anomalies",
    _SOLAR_CTE
    + """
SELECT m.w_start, m.w_start + 30 AS w_end, m.panel, m.module, m.cnt,
       round(m.sum_power, 4) AS sum_power,
       round(m.sum_power / m.cnt, 1) AS avg_power,
       s.panel_cnt,
       round(s.panel_sum, 4) AS panel_sum,
       s.panel_avg,
       round(s.squares_sum, 4) AS squares_sum,
       round(s.squares_sum / s.panel_cnt, 6) AS variance,
       round(sqrt(s.squares_sum / s.panel_cnt), 1) AS deviance
FROM mod m JOIN stats s USING (w_start, panel)
WHERE abs(m.sum_power - s.panel_avg) > 1.0 * round(sqrt(s.squares_sum / s.panel_cnt), 1)
""",
)
def solar_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference pipeline: flag modules whose window power sum deviates
    more than Z=1 stddev from the panel mean
    (reference: SolarConsumer.java:165-201)."""
    df = solar.events_as_solar(load_table(spark, sf_dir, "events"))
    out = solar.anomalies(df)
    return solar.with_window_epoch(out).select(
        "w_start",
        "w_end",
        "panel",
        "module",
        "cnt",
        F.round("sum_power", 4).alias("sum_power"),
        "avg_power",
        "panel_cnt",
        F.round("panel_sum", 4).alias("panel_sum"),
        "panel_avg",
        F.round("squares_sum", 4).alias("squares_sum"),
        F.round("variance", 6).alias("variance"),
        "deviance",
    )
