"""Twelfth tranche: operational-latency, activity-rhythm and
repeat-behavior analytics (round 3, part 9).

- order_to_ship_latency:   order→first-shipment latency distribution per
                           order priority — the fulfillment SLA report
                           (exact percentiles over a fact⋈fact equi-join).
- hourly_activity_heatmap: (ISO weekday x hour) event volume heatmap
                           with global share — the activity-rhythm view
                           behind load planning and anomaly baselines.
- repeat_purchase_interval: distribution of days between a user's
                           consecutive purchases — the repeat-behavior
                           metric (median inter-purchase gap) behind
                           retention forecasting.

Scale notes (100 TB shapes):
- the latency join is orders⋈lineitem on the natural key (both sides
  shuffle once on l_orderkey/o_orderkey — the join every TPC-H query
  pays); per-order first-shipment is a map-side-combined min BEFORE the
  join, so line items never multiply the join output;
- the heatmap is one scan into a 7x24-cell aggregate; the share window
  runs on those cells;
- purchase gaps shuffle once on user_id (lag inside user partitions),
  then aggregate to one row of distribution stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.registry import _load_parallel, register

# --------------------------------------------------------------------------
# order_to_ship_latency — fulfillment SLA distribution
# --------------------------------------------------------------------------


@register(
    "order_to_ship_latency",
    """
WITH first_ship AS (
    SELECT l_orderkey, min(l_shipdate) AS first_ship
    FROM lineitem GROUP BY 1
),
lat AS (
    SELECT o.o_orderpriority,
           date_diff('day', o.o_orderdate, f.first_ship) AS days
    FROM orders o JOIN first_ship f ON f.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(days) AS BIGINT) AS min_days,
       round(quantile_cont(CAST(days AS DOUBLE), 0.5), 6) AS p50_days,
       round(quantile_cont(CAST(days AS DOUBLE), 0.95), 6) AS p95_days,
       CAST(max(days) AS BIGINT) AS max_days,
       round(avg(CAST(days AS DOUBLE)), 6) AS mean_days
FROM lat
GROUP BY 1
""",
)
def order_to_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment latency: days from order date to FIRST line-item
    shipment, distributed (min/p50/p95/max/mean) per order priority —
    the SLA report that shows whether urgent orders actually ship
    faster.

    100 TB shape: per-order first-shipment is a map-side-combined min
    over lineitem BEFORE the join (one row per order joins, line items
    never multiply); the orders⋈first_ship equi-join is the natural
    orderkey shuffle; exact percentiles aggregate per 5-value priority."""
    li = _load_parallel(spark, sf_dir, "lineitem")
    o = _load_parallel(spark, sf_dir, "orders")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    days = F.datediff("first_ship", "o_orderdate").cast("double")
    lat = o.join(first_ship, o.o_orderkey == first_ship.l_orderkey).select(
        "o_orderpriority", days.alias("days")
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.min("days").cast("bigint").alias("min_days"),
        F.round(F.percentile("days", F.lit(0.5)), 6).alias("p50_days"),
        F.round(F.percentile("days", F.lit(0.95)), 6).alias("p95_days"),
        F.max("days").cast("bigint").alias("max_days"),
        F.round(F.avg("days"), 6).alias("mean_days"),
    )


# --------------------------------------------------------------------------
# hourly_activity_heatmap — weekday x hour rhythm
# --------------------------------------------------------------------------


@register(
    "hourly_activity_heatmap",
    """
WITH cells AS (
    SELECT CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(extract(hour FROM ts) AS BIGINT) AS hod,
           count(*) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1, 2
)
SELECT dow, hod, CAST(n_events AS BIGINT) AS n_events, n_users,
       round(n_events * 1.0 / sum(n_events) OVER (), 6) AS share
FROM cells
""",
)
def hourly_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-rhythm heatmap: event volume and distinct users per
    (ISO weekday, hour-of-day) cell with each cell's share of total
    traffic — the load-planning view and the denominator behind
    time-aware anomaly baselines.

    100 TB shape: one scan into at most 7x24 cells (map-side combined);
    the share window runs over those cells."""
    ev = _load_parallel(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.expr("CAST(((dayofweek(ts) + 5) % 7) + 1 AS BIGINT)").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    w = Window.partitionBy()
    return cells.select(
        "dow",
        "hod",
        F.col("n_events").cast("bigint").alias("n_events"),
        "n_users",
        F.round(F.col("n_events") * 1.0 / F.sum("n_events").over(w), 6).alias(
            "share"
        ),
    )


# --------------------------------------------------------------------------
# repeat_purchase_interval — inter-purchase gap distribution
# --------------------------------------------------------------------------


@register(
    "repeat_purchase_interval",
    """
WITH p AS (
    SELECT user_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events WHERE event_type = 'purchase'
),
gaps AS (
    SELECT (epoch_us(ts) - epoch_us(prev_ts)) / 86400000000.0 AS gap_days
    FROM p WHERE prev_ts IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n_gaps,
       round(quantile_cont(gap_days, 0.5), 6) AS p50_gap_days,
       round(quantile_cont(gap_days, 0.9), 6) AS p90_gap_days,
       round(avg(gap_days), 6) AS mean_gap_days,
       round(max(gap_days), 6) AS max_gap_days
FROM gaps
""",
)
def repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase behavior: the distribution (median/p90/mean/max)
    of days between a user's consecutive purchases — the inter-purchase
    gap that retention forecasting and churn definitions are built on.

    100 TB shape: the purchase filter pushes to the scan; one shuffle
    on user_id (lag inside user partitions); gaps aggregate to a single
    distribution row. Gap values divide exact integer microseconds by a
    constant, so both engines aggregate identical doubles."""
    ev = _load_parallel(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", "ts", F.lag("ts").over(w).alias("prev_ts"))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            (
                (F.unix_micros("ts") - F.unix_micros("prev_ts")) / 86400000000.0
            ).alias("gap_days")
        )
    )
    return gaps.agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.round(F.percentile("gap_days", F.lit(0.5)), 6).alias("p50_gap_days"),
        F.round(F.percentile("gap_days", F.lit(0.9)), 6).alias("p90_gap_days"),
        F.round(F.avg("gap_days"), 6).alias("mean_gap_days"),
        F.round(F.max("gap_days"), 6).alias("max_gap_days"),
    )
