"""Ninth tranche: session path mining, bounded-window funnels, revenue
concentration and market-basket affinity (round 3, part 6).

- top_session_paths:       most common 3-step event paths per 30-minute
                           session — the navigation-mining query behind
                           UX funnels and behavioral cohorts.
- funnel_time_bounded:     signup→purchase conversion within a 7-day
                           window — the time-bounded funnel (the
                           existing funnel_signup_purchase is any-time).
- pareto_revenue_concentration: Lorenz/Pareto curve by customer decile —
                           "which 10% of customers carry 80% of
                           revenue".
- basket_part_pairs_lift:  market-basket affinity (lift) between parts
                           co-occurring in an order — the co-purchase
                           recommender signal.

Scale notes (100 TB shapes):
- session paths: ONE shuffle on user_id; sessionization (gap flag +
  running sum), the per-session ordered collect (bounded by session
  length, sliced to 3 before it leaves the aggregate) and the path
  count all reuse/derive from that partitioning;
- the bounded funnel joins a user-cardinality first-signup table back
  on user_id (no windowed fact x fact join) and aggregates exact
  integer microsecond deltas, dividing once at the end;
- the Pareto curve ranks the customer-cardinality revenue aggregate
  (money rounded before ranking); the cumulative window runs over
  customers, never line items;
- basket pairs are generated per order from the sorted distinct-part
  array (JVM higher-order functions, bounded by order width — never an
  order-key self-join); part frequencies broadcast back for the lift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.registry import _load_parallel, register

# --------------------------------------------------------------------------
# top_session_paths — 3-step session path mining
# --------------------------------------------------------------------------

_SESSION_GAP_MIN = 30
_PATH_MIN_SESSIONS = 5


@register(
    "top_session_paths",
    f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL {_SESSION_GAP_MIN} MINUTE
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
    SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
),
paths AS (
    SELECT user_id, session_id,
           array_to_string(list(event_type ORDER BY ts, event_id)[1:3], '>')
               AS path
    FROM sessioned GROUP BY 1, 2
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY 1
HAVING count(*) >= {_PATH_MIN_SESSIONS}
""",
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step event paths: events sessionize on a 30-minute
    inactivity gap (gaps-and-islands), each session contributes its
    first three event types as a '>'-joined path, and paths seen in at
    least 5 sessions are reported — the navigation-mining building
    block for UX funnels.

    100 TB shape: ONE shuffle on user_id; the gap flag, running
    session id and per-session ordered collect all run inside user
    partitions, and the path is sliced to 3 entries inside the
    aggregate, so session length never inflates executor state. The
    final path count is a map-side-combined aggregate over short
    strings."""
    ev = _load_parallel(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = _SESSION_GAP_MIN * 60 * 1_000_000
    prev = F.lag(F.unix_micros("ts")).over(w)
    new_session = F.when(
        prev.isNull() | (F.unix_micros("ts") - prev > gap_us), 1
    ).otherwise(0)
    sessioned = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    paths = sessioned.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                1,
                3,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .filter(F.col("n_sessions") >= _PATH_MIN_SESSIONS)
    )


# --------------------------------------------------------------------------
# funnel_time_bounded — signup→purchase within 7 days
# --------------------------------------------------------------------------

_FUNNEL_DAYS = 7


@register(
    "funnel_time_bounded",
    f"""
WITH s AS (
    SELECT user_id, min(ts) AS signup_ts
    FROM events WHERE event_type = 'signup' GROUP BY 1
),
conv AS (
    SELECT s.user_id, s.signup_ts, min(e.ts) AS purchase_ts
    FROM s JOIN events e
      ON e.user_id = s.user_id
     AND e.event_type = 'purchase'
     AND e.ts >= s.signup_ts
     AND e.ts <= s.signup_ts + INTERVAL {_FUNNEL_DAYS} DAY
    GROUP BY 1, 2
)
SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup_users,
       CAST(count(*) AS BIGINT) AS n_converted,
       round(count(*) * 1.0 / (SELECT count(*) FROM s), 6) AS conv_rate,
       round(CAST(sum(epoch_us(purchase_ts) - epoch_us(signup_ts)) AS DOUBLE)
             / count(*) / 3600000000.0, 6) AS avg_hours_to_convert
FROM conv
""",
)
def funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded conversion funnel: users whose first 'signup' is
    followed by a 'purchase' within 7 days, with the conversion rate
    and mean hours-to-convert — the windowed funnel that product teams
    actually report (the any-time variant over-counts).

    100 TB shape: first-signup is a user-cardinality aggregate that
    joins the fact table back on user_id (equi-join; the 7-day bound is
    a residual predicate inside bounded per-user groups). Time deltas
    aggregate as exact integer microseconds, divided once at the end —
    so both engines average bit-identical sums."""
    ev = _load_parallel(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    bound = F.col("signup_ts") + F.expr(f"INTERVAL {_FUNNEL_DAYS} DAYS")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter((F.col("ts") >= F.col("signup_ts")) & (F.col("ts") <= bound))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    n_signups = s.agg(F.count("*").alias("n_signup_users"))
    delta_us = F.unix_micros("purchase_ts") - F.unix_micros("signup_ts")
    agg = conv.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.sum(delta_us).alias("sum_us"),
    )
    return agg.join(F.broadcast(n_signups)).select(
        F.col("n_signup_users").cast("bigint").alias("n_signup_users"),
        "n_converted",
        F.round(F.col("n_converted") * 1.0 / F.col("n_signup_users"), 6).alias(
            "conv_rate"
        ),
        F.round(
            F.col("sum_us").cast("double") / F.col("n_converted") / 3.6e9, 6
        ).alias("avg_hours_to_convert"),
    )


# --------------------------------------------------------------------------
# pareto_revenue_concentration — Lorenz curve by customer decile
# --------------------------------------------------------------------------


@register(
    "pareto_revenue_concentration",
    """
WITH rev AS (
    SELECT o_custkey, round(sum(o_totalprice), 4) AS revenue
    FROM orders GROUP BY 1
),
ranked AS (
    SELECT o_custkey, revenue,
           ntile(10) OVER (ORDER BY revenue DESC, o_custkey) AS decile,
           sum(revenue) OVER (ORDER BY revenue DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum_rev,
           sum(revenue) OVER () AS total_rev
    FROM rev
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(revenue), 4) AS decile_revenue,
       round(max(cum_rev) / max(total_rev), 6) AS cum_share
FROM ranked
GROUP BY 1
""",
)
def pareto_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Lorenz/Pareto): customers ranked by total
    spend, split into deciles, with each decile's revenue and the
    cumulative revenue share through that decile — the "top 10% of
    customers carry X% of revenue" curve.

    100 TB shape: one shuffle into the customer-cardinality revenue
    aggregate (money rounded before ranking so summation order can't
    flip a decile boundary); ranking and cumulative windows run over
    customers, never over line items."""
    o = _load_parallel(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 4).alias("revenue")
    )
    order = Window.orderBy(F.desc("revenue"), F.asc("o_custkey"))
    ranked = rev.select(
        "revenue",
        F.ntile(10).over(order).alias("decile"),
        F.sum("revenue")
        .over(order.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_rev"),
        F.sum("revenue").over(Window.partitionBy()).alias("total_rev"),
    )
    return ranked.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.round(F.sum("revenue"), 4).alias("decile_revenue"),
        F.round(F.max("cum_rev") / F.max("total_rev"), 6).alias("cum_share"),
    ).select(
        F.col("decile").cast("bigint").alias("decile"),
        "n_customers",
        "decile_revenue",
        "cum_share",
    )


# --------------------------------------------------------------------------
# basket_part_pairs_lift — market-basket affinity
# --------------------------------------------------------------------------

_BASKET_MIN_PAIRS = 3


@register(
    "basket_part_pairs_lift",
    f"""
WITH op AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
f AS (SELECT l_partkey, count(*) AS n_f FROM op GROUP BY 1),
pc AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS pair_n
    FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= {_BASKET_MIN_PAIRS}
)
SELECT part_a, part_b, CAST(pair_n AS BIGINT) AS pair_n,
       round(CAST(pair_n * n_orders AS DOUBLE)
             / CAST(fa.n_f * fb.n_f AS DOUBLE), 6) AS lift
FROM pc
CROSS JOIN n
JOIN f fa ON fa.l_partkey = pc.part_a
JOIN f fb ON fb.l_partkey = pc.part_b
""",
)
def basket_part_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: for part pairs co-occurring in at least 3
    orders, the lift P(a,b)/(P(a)·P(b)) over order baskets — the
    co-purchase signal behind "customers also bought".

    100 TB shape: baskets reduce to distinct (order, part) FIRST; pairs
    are generated per order from the sorted part array with JVM
    higher-order functions (bounded by order width squared — never an
    order-key self-join at the row level); part frequencies and the
    order count broadcast back onto the vocabulary-sized pair table.
    Integer products stay < 2^53 so the lift division is exact on both
    engines."""
    li = _load_parallel(spark, sf_dir, "lineitem")
    # consumed by the order-count, part-frequency AND basket branches;
    # two longs per row (far smaller than the lineitem it replaces), so
    # caching is scale-safe — same policy as ngram_jaccard_pairs' hash set
    op = li.select("l_orderkey", "l_partkey").distinct().cache()
    n = op.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    f = op.groupBy("l_partkey").agg(F.count("*").alias("n_f"))
    baskets = op.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_partkey")).alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) ->"
                " transform(slice(parts, i + 2, size(parts)),"
                " y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    pc = (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("pair_n"))
        .filter(F.col("pair_n") >= _BASKET_MIN_PAIRS)
    )
    fa = F.broadcast(
        f.select(F.col("l_partkey").alias("part_a"), F.col("n_f").alias("f_a"))
    )
    fb = F.broadcast(
        f.select(F.col("l_partkey").alias("part_b"), F.col("n_f").alias("f_b"))
    )
    return (
        pc.join(fa, "part_a")
        .join(fb, "part_b")
        .join(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("pair_n").cast("bigint").alias("pair_n"),
            F.round(
                (F.col("pair_n") * F.col("n_orders")).cast("double")
                / (F.col("f_a") * F.col("f_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
