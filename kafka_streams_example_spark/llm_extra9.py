"""Tenth tranche: sequence-pattern detection, period-over-period trends
and experiment analysis (round 3, part 7).

- error_burst_detection:   runs of >= 2 consecutive error events within
                           a 3-hour span per user — the
                           MATCH_RECOGNIZE-style sequence pattern
                           (incident detection) via gaps-and-islands.
- weekly_revenue_wow:      weekly revenue with week-over-week percentage
                           change — the period-over-period trend report.
- ab_test_analysis:        deterministic hash-based A/B assignment with
                           per-variant mean value, uplift and the Welch
                           z statistic — the experiment readout,
                           reproducible because assignment is a pure
                           function of the user id.

Scale notes (100 TB shapes):
- burst detection shuffles once on user_id; the island id
  (row_number difference trick) and the burst aggregate reuse that
  partitioning, and burst groups are bounded by run length;
- the weekly trend aggregates to week-cardinality rows before its lag
  window (money rounded before the ratio);
- A/B analysis is a map-only variant assignment + a 2-row aggregate;
  means/variances are rounded before the z math and sqrt is
  IEEE-correctly-rounded, so both engines produce the identical double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.functions.hashing import stable_long
from kafka_streams_example_spark.registry import _load_parallel, register

# --------------------------------------------------------------------------
# error_burst_detection — consecutive-error runs (gaps-and-islands)
# --------------------------------------------------------------------------

_BURST_MIN = 2
_BURST_SPAN_MIN = 180


@register(
    "error_burst_detection",
    f"""
WITH ordered AS (
    SELECT user_id, ts, event_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn_all,
           CASE WHEN event_type = 'error'
                THEN row_number() OVER (PARTITION BY user_id, event_type = 'error'
                                        ORDER BY ts, event_id)
           END AS rn_err
    FROM events
),
bursts AS (
    SELECT user_id, rn_all - rn_err AS grp,
           count(*) AS n_errors,
           min(ts) AS burst_start,
           max(ts) AS burst_end
    FROM ordered WHERE event_type = 'error'
    GROUP BY 1, 2
)
SELECT user_id, burst_start, burst_end,
       CAST(n_errors AS BIGINT) AS n_errors
FROM bursts
WHERE n_errors >= {_BURST_MIN}
  AND burst_end - burst_start <= INTERVAL {_BURST_SPAN_MIN} MINUTE
""",
)
def error_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incident detection: per user, maximal runs of consecutive 'error'
    events (no other event type in between) with at least 2 errors
    inside a 3-hour span — the MATCH_RECOGNIZE-style sequence
    pattern, expressed with the row_number-difference islands trick.

    100 TB shape: one shuffle on user_id; both row_numbers, the island
    grouping and the burst aggregate run inside user partitions
    (exchange reuse), and each island is bounded by its run length."""
    ev = _load_parallel(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_err = F.col("event_type") == "error"
    w_err = Window.partitionBy("user_id", is_err).orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.row_number().over(w_all).alias("rn_all"),
        F.when(is_err, F.row_number().over(w_err)).alias("rn_err"),
    )
    bursts = (
        ordered.filter(F.col("event_type") == "error")
        .groupBy("user_id", (F.col("rn_all") - F.col("rn_err")).alias("grp"))
        .agg(
            F.count("*").alias("n_errors"),
            F.min("ts").alias("burst_start"),
            F.max("ts").alias("burst_end"),
        )
    )
    span_us = F.unix_micros("burst_end") - F.unix_micros("burst_start")
    return bursts.filter(
        (F.col("n_errors") >= _BURST_MIN)
        & (span_us <= _BURST_SPAN_MIN * 60 * 1_000_000)
    ).select(
        "user_id",
        "burst_start",
        "burst_end",
        F.col("n_errors").cast("bigint").alias("n_errors"),
    )


# --------------------------------------------------------------------------
# weekly_revenue_wow — period-over-period trend
# --------------------------------------------------------------------------


@register(
    "weekly_revenue_wow",
    """
WITH weekly AS (
    SELECT date_trunc('week', o_orderdate) AS week,
           round(sum(o_totalprice), 4) AS revenue,
           count(*) AS n_orders
    FROM orders GROUP BY 1
)
SELECT week, revenue, CAST(n_orders AS BIGINT) AS n_orders,
       round((revenue - lag(revenue) OVER (ORDER BY week))
             / nullif(lag(revenue) OVER (ORDER BY week), 0.0), 6) AS wow_pct
FROM weekly
""",
)
def weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly revenue and order volume with week-over-week percentage
    change (NULL for the first week and after zero-revenue weeks) — the
    period-over-period trend report.

    100 TB shape: one shuffle into the week-cardinality aggregate
    (money rounded before the ratio so both engines divide identical
    doubles); the lag window orders a handful of week rows."""
    o = _load_parallel(spark, sf_dir, "orders")
    weekly = o.groupBy(F.date_trunc("week", F.col("o_orderdate")).alias("week")).agg(
        F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    w = Window.orderBy("week")
    prev = F.lag("revenue").over(w)
    return weekly.select(
        "week",
        "revenue",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round((F.col("revenue") - prev) / F.nullif(prev, F.lit(0.0)), 6).alias(
            "wow_pct"
        ),
    )


# --------------------------------------------------------------------------
# ab_test_analysis — deterministic experiment readout
# --------------------------------------------------------------------------

_AB_SALT = ":ab"


@register(
    "ab_test_analysis",
    f"""
WITH assigned AS (
    SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '{_AB_SALT}'),
                                          1, 15)) AS BIGINT) % 2 = 0
                THEN 'A' ELSE 'B' END AS variant,
           value
    FROM events WHERE value IS NOT NULL
),
v AS (
    SELECT variant, count(*) AS n,
           round(avg(value), 6) AS mean_v,
           round(var_pop(value), 6) AS var_v
    FROM assigned GROUP BY 1
),
wide AS (
    SELECT max(CASE WHEN variant = 'A' THEN n END) AS na,
           max(CASE WHEN variant = 'A' THEN mean_v END) AS ma,
           max(CASE WHEN variant = 'A' THEN var_v END) AS va,
           max(CASE WHEN variant = 'B' THEN n END) AS nb,
           max(CASE WHEN variant = 'B' THEN mean_v END) AS mb,
           max(CASE WHEN variant = 'B' THEN var_v END) AS vb
    FROM v
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       ma AS mean_a, mb AS mean_b,
       round(ma - mb, 6) AS uplift,
       round((ma - mb) / nullif(sqrt(va / na + vb / nb), 0.0), 6) AS z_stat
FROM wide
""",
)
def ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: events deterministically assigned to variants
    A/B by a salted hash of the user id (reproducible across engines,
    retries and re-ingestion — rand() assignment is not); reports the
    per-variant mean event value, the uplift and the Welch z statistic.

    100 TB shape: map-only assignment folded into a 2-row aggregate.
    Means and variances are rounded to 6 decimals BEFORE the z math so
    float summation order can't leak into the statistic; the only
    irrational step is an IEEE-correctly-rounded sqrt, and a zero
    standard error yields NULL (nullif) on both engines."""
    ev = _load_parallel(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bucket = (
        stable_long(F.concat(F.col("user_id").cast("string"), F.lit(_AB_SALT))) % 2
    )
    variant = F.when(bucket == 0, "A").otherwise("B")
    v = ev.groupBy(variant.alias("variant")).agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("mean_v"),
        F.round(F.var_pop("value"), 6).alias("var_v"),
    )
    wide = v.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("mean_v"))).alias("ma"),
        F.max(F.when(F.col("variant") == "A", F.col("var_v"))).alias("va"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("mean_v"))).alias("mb"),
        F.max(F.when(F.col("variant") == "B", F.col("var_v"))).alias("vb"),
    )
    se = F.sqrt(F.col("va") / F.col("na") + F.col("vb") / F.col("nb"))
    return wide.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("ma").alias("mean_a"),
        F.col("mb").alias("mean_b"),
        F.round(F.col("ma") - F.col("mb"), 6).alias("uplift"),
        F.round(
            (F.col("ma") - F.col("mb")) / F.nullif(se, F.lit(0.0)), 6
        ).alias("z_stat"),
    )
