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


def _dec(c: str, prec: str = "18,4"):
    """Exact-decimal view of a 2-decimal money/rate double column. Sums of
    these are bit-identical across engines (float sums are order-dependent;
    decimal sums are exact) — final outputs cast back to double."""
    return F.col(c).cast(f"decimal({prec})")


def _sum_dbl(expr) -> F.Column:
    """round(·,6) before the double cast: identity for ≤6-true-decimal sums,
    and it keeps the decimal mantissa < 2^53 so BOTH engines' decimal→double
    conversion is exact (DuckDB's is not correctly rounded above 2^53)."""
    return F.round(F.sum(expr), 6).cast("double")



def _load_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """load_table + parallelism floor: local testdata arrives as one parquet
    row-group, which would pin scan-side work (hashing, regex, window
    bucketing over 1M rows) to a single core. No-op on real multi-split
    inputs — see operators.ensure_min_partitions."""
    from kafka_streams_example_spark.operators import ensure_min_partitions

    return ensure_min_partitions(load_table(spark, sf_dir, name))


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
    df = solar.events_as_solar(_load_parallel(spark, sf_dir, "events"))
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
    df = solar.events_as_solar(_load_parallel(spark, sf_dir, "events"))
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
    df = solar.events_as_solar(_load_parallel(spark, sf_dir, "events"))
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


# --------------------------------------------------------------------------
# Relational operator breadth over the TPC-H-ish tables (SURVEY.md §2 —
# "operators the reference does NOT have", exposed per the north star).
# Money math runs in exact decimal and casts to double at the end, so both
# engines emit bit-identical values regardless of summation order.
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 6) AS DOUBLE) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 6) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 6) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4)) * CAST(1 + l_tax AS DECIMAL(8,4))), 6) AS DOUBLE) AS sum_charge,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 6) AS DOUBLE) / count(*) AS avg_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 6) AS DOUBLE) / count(*) AS avg_price,
       CAST(round(sum(CAST(l_discount AS DECIMAL(18,4))), 6) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark, sf_dir):
    """Filter → multi-aggregate groupBy (TPC-H Q1 shape). Scan-side filter
    is pushed to parquet; partial aggregation runs map-side before the
    single exchange on the (tiny-cardinality) group key."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc = _dec("l_discount", "8,4")
    tax = _dec("l_tax", "8,4")
    one = F.lit(1).cast("decimal(8,4)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _sum_dbl(_dec("l_quantity")).alias("sum_qty"),
        _sum_dbl(_dec("l_extendedprice")).alias("sum_base_price"),
        _sum_dbl(_dec("l_extendedprice") * (one - disc)).alias("sum_disc_price"),
        _sum_dbl(_dec("l_extendedprice") * (one - disc) * (one + tax)).alias("sum_charge"),
        (F.round(F.sum(_dec("l_quantity")), 6).cast("double") / F.count("*")).alias("avg_qty"),
        (F.round(F.sum(_dec("l_extendedprice")), 6).cast("double") / F.count("*")).alias("avg_price"),
        (F.round(F.sum(_dec("l_discount")), 6).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_top_orders",
    """
SELECT l_orderkey,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 6) AS DOUBLE) AS revenue,
       epoch(o_orderdate)::BIGINT AS o_orderdate_s, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_top_orders(spark, sf_dir):
    """3-way join → agg → deterministic top-k (TPC-H Q3 shape). customer is
    tiny → broadcast; orders⋈lineitem shuffles on the orderkey."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(8,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _sum_dbl(
                _dec("l_extendedprice") * (one - _dec("l_discount", "8,4"))
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("long").alias("o_orderdate_s"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 6) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_region_revenue(spark, sf_dir):
    """6-way join with a dimension-chain filter (TPC-H Q5 shape). All
    dimensions broadcast; the only shuffle is lineitem⋈orders + final agg."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    one = F.lit(1).cast("decimal(8,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            _sum_dbl(
                _dec("l_extendedprice") * (one - _dec("l_discount", "8,4"))
            ).alias("revenue")
        )
    )


@register(
    "ranking_top_customers",
    """
SELECT * FROM (
    SELECT n_name, c_custkey, c_acctbal,
           row_number()  OVER w AS rnk,
           rank()        OVER w AS rnk_gaps,
           dense_rank()  OVER w AS rnk_dense
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey)
) WHERE rnk <= 3
""",
)
def ranking_top_customers(spark, sf_dir):
    """Ranking window functions: top-3 customers by balance per nation."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rnk"),
            F.rank().over(w).alias("rnk_gaps"),
            F.dense_rank().over(w).alias("rnk_dense"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "rollup_returns",
    """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 6) AS DOUBLE) AS sum_qty,
       count(*) AS cnt
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_returns(spark, sf_dir):
    """Hierarchical grouping-sets aggregation (ROLLUP)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(_sum_dbl(_dec("l_quantity")).alias("sum_qty"), F.count("*").alias("cnt"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "cnt",
        )
    )


@register(
    "set_ops_customers",
    """
SELECT 'union' AS op, c FROM (
    SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT 'intersect', c FROM (
    SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT 'except', c FROM (
    SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
""",
)
def set_ops_customers(spark, sf_dir):
    """Set operators: UNION / INTERSECT / EXCEPT (distinct semantics),
    tagged and stacked."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c")
    )
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c")
    )
    return (
        a.union(b).distinct().select(F.lit("union").alias("op"), "c")
        .unionAll(a.intersect(b).select(F.lit("intersect").alias("op"), "c"))
        .unionAll(a.subtract(b).select(F.lit("except").alias("op"), "c"))
    )


# --------------------------------------------------------------------------
# Event-stream operators over `events` (window shapes beyond the
# reference's single tumbling window, as-of join, JSON extraction, dedup).
# --------------------------------------------------------------------------


@register(
    "sliding_window_counts",
    """
SELECT (CAST(floor(epoch(ts) / 30) AS BIGINT) - i) * 30 AS w_start,
       (CAST(floor(epoch(ts) / 30) AS BIGINT) - i) * 30 + 60 AS w_end,
       event_type,
       count(*) AS cnt,
       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 6) AS DOUBLE) AS sum_value
FROM events CROSS JOIN (VALUES (0), (1)) offs(i)
GROUP BY 1, 2, 3
""",
)
def sliding_window_counts(spark, sf_dir):
    """Sliding (hopping) window agg: 60s window, 30s slide — each event lands
    in 2 windows (Catalyst's Expand operator; still one shuffle)."""
    from kafka_streams_example_spark.operators.windows import sliding_agg

    ev = _load_parallel(spark, sf_dir, "events")
    out = sliding_agg(
        ev,
        "ts",
        "60 seconds",
        "30 seconds",
        ["event_type"],
        [
            F.count("*").alias("cnt"),
            _sum_dbl(_dec("value")).alias("sum_value"),
        ],
    )
    return out.select(
        F.col("w.start").cast("long").alias("w_start"),
        F.col("w.end").cast("long").alias("w_end"),
        "event_type",
        "cnt",
        "sum_value",
    )


@register(
    "session_windows",
    """
WITH marked AS (
    SELECT user_id, ts, value,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 300000000
                  OR lag(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
    SELECT user_id, ts, value,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_no
    FROM marked
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) + 300000000 AS session_end_us,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 6) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_no
""",
)
def session_windows(spark, sf_dir):
    """Session windows with a 5-minute inactivity gap per user —
    F.session_window handles merge semantics in batch AND streaming; the
    oracle replicates it with the gaps-and-islands pattern."""
    from kafka_streams_example_spark.operators.windows import session_agg

    ev = _load_parallel(spark, sf_dir, "events")
    out = session_agg(
        ev,
        "ts",
        "5 minutes",
        ["user_id"],
        [
            F.count("*").alias("n_events"),
            _sum_dbl(_dec("value")).alias("sum_value"),
        ],
    )
    return out.select(
        "user_id",
        F.unix_micros(F.col("w.start")).alias("session_start_us"),
        F.unix_micros(F.col("w.end")).alias("session_end_us"),
        "n_events",
        "sum_value",
    )


@register(
    "asof_join_orders",
    """
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
       o.o_orderkey, o.o_totalprice
FROM events e LEFT JOIN orders o
  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
QUALIFY row_number() OVER (
    PARTITION BY e.event_id
    ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC) = 1
""",
)
def asof_join_orders(spark, sf_dir):
    """As-of join: each event picks the customer's most recent order at or
    before the event time (ties → max orderkey). Implemented as a union +
    running last() — one shuffle, linear scan; no range join."""
    from kafka_streams_example_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey", "o_totalprice"
    )
    out = asof_join(
        ev,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=["o_orderkey", "o_totalprice"],
        right_tiebreak="o_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "o_orderkey",
        "o_totalprice",
    )


@register(
    "events_json_stats",
    """
SELECT event_type,
       count(*) AS cnt,
       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(sum(CAST(props->>'k' AS BIGINT)) AS DOUBLE) / count(*) AS avg_k
FROM events
GROUP BY event_type
""",
)
def events_json_stats(spark, sf_dir):
    """Semi-structured JSON extraction (the reference's whole serde layer is
    two expressions in Spark: from_json/get_json_object)."""
    ev = _load_parallel(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count("*")).alias("avg_k"),
    )


@register(
    "events_variant_extract",
    """
SELECT event_id,
       CAST(props->>'k' AS BIGINT) AS k,
       CAST(CAST(props->>'k' AS BIGINT) % 2 = 0 AS INT) AS k_even,
       CAST(props->>'missing' IS NOT NULL AS INT) AS has_missing
FROM events
""",
)
def events_variant_extract(spark, sf_dir):
    """Semi-structured extraction through Spark 4's VariantType: the raw
    JSON payload parses ONCE into the binary variant encoding, and every
    path extraction reads the variant (no re-parse per path — the scaling
    point vs get_json_object, which re-parses the string for each field).
    try_variant_get on an absent path yields NULL instead of erroring."""
    ev = _load_parallel(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return ev.withColumn("v", v).select(
        "event_id",
        F.variant_get(F.col("v"), "$.k", "long").alias("k"),
        (F.variant_get(F.col("v"), "$.k", "long") % 2 == 0)
        .cast("int")
        .alias("k_even"),
        F.try_variant_get(F.col("v"), "$.missing", "string")
        .isNotNull()
        .cast("int")
        .alias("has_missing"),
    )


def _pyds_oracle_sql() -> str:
    """Reconstruct the solar_sim generator IN SQL: splitmix64 via
    split-multiply modular arithmetic (a 64x64→mod-2^64 product computed
    in 32-bit halves so no intermediate exceeds INT128), then the same
    30s-window aggregation — the Python DataSource path gets a full
    value oracle with no backing table."""
    m64, m32 = 1 << 64, 1 << 32
    epoch0 = 1704067200  # 2024-01-01T00:00:00Z
    seed, rows, parts = 42, 2000, 4

    def modmul(a: str, const: int) -> str:
        return (
            f"CAST(((CAST({a} % {m32} AS HUGEINT) * {const})"
            f" + ((CAST({a} // {m32} AS HUGEINT) * {const}) % {m32}) * {m32})"
            f" % {m64} AS UBIGINT)"
        )

    return f"""
WITH idx AS (
    SELECT p.p, i.i
    FROM (SELECT unnest(generate_series(0, {parts - 1})) AS p) p,
         (SELECT unnest(generate_series(0, {rows - 1})) AS i) i
),
s0 AS (SELECT p, i, {seed} * 1000003 + p * 1000000 + i AS n FROM idx),
s1 AS (SELECT p, i,
              CAST((CAST(n AS HUGEINT) + 11400714819323198485) % {m64} AS UBIGINT) AS x1
       FROM s0),
s1b AS (SELECT p, i, xor(x1, x1 >> 30) AS y1 FROM s1),
s2 AS (SELECT p, i, {modmul('y1', 0xBF58476D1CE4E5B9)} AS x2 FROM s1b),
s2b AS (SELECT p, i, xor(x2, x2 >> 27) AS y2 FROM s2),
s3 AS (SELECT p, i, {modmul('y2', 0x94D049BB133111EB)} AS x3 FROM s2b),
gen AS (
    SELECT CAST({epoch0} + p * {rows} + i AS BIGINT) AS es,
           'P' || CAST(hv % 5 AS VARCHAR) AS panel,
           'M' || CAST((hv >> 8) % 4 AS VARCHAR) AS module,
           round(CAST((hv >> 16) % 10000 AS DOUBLE) / 100.0, 2) AS power
    FROM (SELECT p, i, xor(x3, x3 >> 31) AS hv FROM s3)
)
SELECT CAST(floor(es / 30) * 30 AS BIGINT) AS w_start,
       CAST(floor(es / 30) * 30 + 30 AS BIGINT) AS w_end,
       panel, module,
       count(*) AS cnt,
       round(sum(power), 6) AS sum_power
FROM gen
GROUP BY 1, 2, 3, 4
"""


@register("pyds_solar_sim_agg", _pyds_oracle_sql())
def pyds_solar_sim_agg(spark, sf_dir):
    """The solar module aggregation fed from a custom Python DataSource
    (Spark 4 extension point, sources/pyds.py) instead of Kafka/files —
    a deterministic partitioned telemetry generator. The oracle
    RECONSTRUCTS the generator in DuckDB SQL (splitmix64 in modular
    arithmetic — see _pyds_oracle_sql), so even this no-backing-table
    source is value-checked; the exact output is additionally pinned
    against a pandas recomputation in tests/test_multimodal_custom.py.
    sum_power is rounded to 6dp on both sides (windows straddling a
    generator-partition boundary merge float partials in
    engine-dependent order), and the HALF_UP avg — whose 1dp ties sit
    exactly on re-derived float noise — is omitted here: that semantic
    is oracle-proven on the events table by solar_module_agg."""
    from kafka_streams_example_spark.sources.pyds import SolarSimDataSource

    spark.dataSource.register(SolarSimDataSource)
    raw = (
        spark.read.format("solar_sim")
        .option("partitions", "4")
        .option("rows_per_partition", "2000")
        .load()
    )
    out = solar.with_window_epoch(solar.module_aggregates(raw))
    return out.select(
        "w_start",
        "w_end",
        "panel",
        "module",
        "cnt",
        F.round("sum_power", 6).alias("sum_power"),
    )


@register(
    "dedup_events_keyed",
    """
SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) = 1
""",
)
def dedup_events_keyed(spark, sf_dir):
    """Keyed dedup keeping the earliest row — the deterministic form of
    dropDuplicates (which keeps an arbitrary row; fine for semantics, wrong
    for reproducible pipelines).

    Expressed as min(struct(ts, event_id)) per key rather than a
    row_number window: struct comparison is lexicographic, so the min is
    exactly the (ts, event_id)-first row, but the aggregate gets map-side
    partial combine — at scale only one candidate per key per partition
    shuffles, instead of every row sorting within its key partition."""
    ev = _load_parallel(spark, sf_dir, "events")
    first = F.min(
        F.struct(F.unix_micros(F.col("ts")).alias("ts_us"), F.col("event_id"))
    ).alias("f")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(first)
        .select(
            "user_id",
            "event_type",
            F.col("f.event_id").alias("event_id"),
            F.col("f.ts_us").alias("ts_us"),
        )
    )


# --------------------------------------------------------------------------
# LLM-training-data operators over `documents` / `embeddings`
# (north star: dedup, text analysis, similarity search at 100TB).
# --------------------------------------------------------------------------

from kafka_streams_example_spark.operators import dedup as dd  # noqa: E402
from kafka_streams_example_spark.operators import text as tx  # noqa: E402
from kafka_streams_example_spark.operators import similarity as sim  # noqa: E402

# DuckDB equivalents of the text.py tokenizer, shared by the doc oracles.
_TOKS = "list_filter(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')"
_NGRAMS = (
    "list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 0)),"
    " i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
)


@register(
    "dedup_exact_docs",
    """
SELECT md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS fp,
       min(doc_id) AS keep_id,
       count(*) AS n_dups
FROM documents
GROUP BY 1
""",
)
def dedup_exact_docs(spark, sf_dir):
    """Exact dedup: hash-groupBy on the normalized-content fingerprint,
    keep-min survivor. One shuffle on an unskewed high-cardinality key."""
    return dd.exact_dedup(_load_parallel(spark, sf_dir, "documents"))


@register(
    "doc_fingerprints",
    """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS fp,
       length(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS n_chars_norm
FROM documents
""",
)
def doc_fingerprints(spark, sf_dir):
    """Per-document content fingerprint (md5 of normalized text) — the
    portable identity used by exact dedup and incremental pipelines."""
    from kafka_streams_example_spark.functions.hashing import fingerprint_md5, normalize_text

    docs = _load_parallel(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint_md5(F.col("text")).alias("fp"),
        F.length(normalize_text(F.col("text"))).alias("n_chars_norm"),
    )


@register(
    "text_quality_stats",
    f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_words,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]')) AS n_tokens_bpe,
       round(CASE WHEN len(toks) > 0 THEN
           len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x)))
           / CAST(len(toks) AS DOUBLE) ELSE 0.0 END, 6) AS stop_ratio,
       round(CASE WHEN length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g')) > 0 THEN
           length(regexp_replace(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g'), '[A-Za-z0-9]', '', 'g'))
           / CAST(length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g')) AS DOUBLE) ELSE 0.0 END, 6) AS special_ratio
FROM t
""",
)
def text_quality_stats(spark, sf_dir):
    """Text-quality features: word count, BPE-ish token count, stopword
    ratio, special-char ratio — all JVM-side expressions, no Python UDFs."""
    docs = _load_parallel(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.word_count(F.col("text")).alias("n_words"),
        tx.token_count(F.col("text")).alias("n_tokens_bpe"),
        F.round(tx.stopword_ratio(F.col("text"), "en"), 6).alias("stop_ratio"),
        F.round(tx.special_char_ratio(F.col("text")), 6).alias("special_ratio"),
    )


def _duck_lang_sql() -> str:
    """DuckDB oracle for lang_id, generated from the same STOPWORDS lists
    so the two implementations cannot drift."""
    ratio_cols = []
    for lang in sorted(tx.STOPWORDS):
        words = ", ".join(f"'{w}'" for w in tx.STOPWORDS[lang])
        ratio_cols.append(
            f"CASE WHEN len(toks) > 0 THEN "
            f"len(list_filter(toks, x -> list_contains([{words}], x)))"
            f" / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS r_{lang}"
        )
    best = "greatest(" + ", ".join(f"r_{l}" for l in sorted(tx.STOPWORDS)) + ")"
    case = "CASE "
    for lang in sorted(tx.STOPWORDS):
        case += f"WHEN {best} > 0 AND r_{lang} = {best} THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"""
WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, lang, {", ".join(ratio_cols)} FROM t)
SELECT doc_id, lang, {case} AS lang_pred FROM s
"""


@register("lang_id_docs", _duck_lang_sql())
def lang_id_docs(spark, sf_dir):
    """Heuristic language ID (stopword-hit argmax, deterministic
    tie-breaking) next to the labeled lang column."""
    docs = _load_parallel(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", tx.lang_id(F.col("text")).alias("lang_pred"))


@register(
    "neardup_ngram_pairs",
    f"""
WITH d AS (
    SELECT doc_id, lang, source, {_NGRAMS} AS ng
    FROM (SELECT doc_id, lang, source, {_TOKS} AS t FROM documents)
),
nz AS (SELECT * FROM d WHERE len(ng) > 0)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       floor(len(list_intersect(a.ng, b.ng))
             / CAST(len(list_distinct(list_concat(a.ng, b.ng))) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM nz a JOIN nz b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.ng, b.ng))
      / CAST(len(list_distinct(list_concat(a.ng, b.ng))) AS DOUBLE) >= 0.5
""",
)
def neardup_ngram_pairs(spark, sf_dir):
    """Exact 3-gram-Jaccard near-dup pairs within (lang, source) blocks —
    the oracle-checkable verifier stage of the dedup stack (the MinHash-LSH
    candidate generator below replaces the blocking at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(
        docs,
        block_key=F.concat_ws("|", F.col("lang"), F.col("source")),
        threshold=0.5,
    )


@register("neardup_minhash_pairs")
def neardup_minhash_pairs(spark, sf_dir):
    """MinHash(32 hashes) + LSH(8 bands) candidate pairs verified at exact
    3-gram Jaccard ≥ 0.5. Approximate candidate generation → rows-only
    driver check; tests/test_operators.py asserts recall against the exact
    blocked pairs instead."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_pairs(docs, threshold=0.5)


@register(
    "similarity_cosine_topk",
    """
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
scored AS (
    SELECT q.q_id, e.vec_id,
           list_aggregate(list_transform(generate_series(1, 64),
               i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), 'sum')
           / (sqrt(list_aggregate(list_transform(generate_series(1, 64),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum'))
            * sqrt(list_aggregate(list_transform(generate_series(1, 64),
                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), 'sum')))
           AS score
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> q.q_id
)
SELECT q_id, vec_id, rnk, round(score, 6) AS score
FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rnk
      FROM scored)
WHERE rnk <= 10
""",
)
def similarity_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 per query vector (query set = vec_id < 8,
    broadcast). The exact baseline the LSH path is measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=10, dim=64)


def _hyperplanes(n_planes: int = 6, dim: int = 64, seed: int = 7) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_planes)]


@register("similarity_lsh_topk")
def similarity_lsh_topk(spark, sf_dir):
    """SimHash-bucketed approximate top-10 (6 hyperplanes → 64 buckets,
    ~64x candidate pruning), exact cosine re-rank. Approximate → rows-only
    driver check; recall vs the exact top-k is asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.lsh_bucketed_topk(
        emb, emb.filter(F.col("vec_id") < 8), _hyperplanes(), k=10, dim=64
    )


@register("neardup_embeddings")
def neardup_embeddings(spark, sf_dir):
    """Embedding-cosine near-dup pairs (SimHash buckets → exact cosine
    ≥ threshold) — rows-only driver check, recall asserted in tests.
    The synthetic corpus is near-orthogonal (max pairwise cosine ≈ 0.46),
    so the demo threshold is 0.4; production near-dup uses ≥ 0.9."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dd.embedding_neardup_pairs(emb, _hyperplanes(), threshold=0.4)


# --------------------------------------------------------------------------
# Multimodal columns, custom-UDA surface, remaining relational coverage.
# --------------------------------------------------------------------------

from kafka_streams_example_spark.operators import multimodal as mm  # noqa: E402
from kafka_streams_example_spark.operators import custom_agg as ca  # noqa: E402


@register(
    "multimodal_binary_meta",
    """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,  -- DuckDB md5(VARCHAR) hashes the UTF-8 bytes == Spark md5(encode(text,'utf-8'))
       'application/octet-stream' AS mime
FROM documents
""",
)
def multimodal_binary_meta(spark, sf_dir):
    """Opaque-binary metadata pass: payload sizes + content fingerprints,
    pure JVM expressions (operators/multimodal.py)."""
    return mm.multimodal_meta(_load_parallel(spark, sf_dir, "documents"))


def _md5_byte_sql(hex_col: str, i: int) -> str:
    """DuckDB expression for byte ``i`` (0-based) of an md5 hex string —
    reproduces hashlib.md5(...).digest()[i] so the fake-codec outputs get
    an exact oracle."""
    nib = "(strpos('0123456789abcdef', substr({h}, {p}, 1)) - 1)"
    hi = nib.format(h=hex_col, p=2 * i + 1)
    lo = nib.format(h=hex_col, p=2 * i + 2)
    return f"(16 * {hi} + {lo})"


@register(
    "multimodal_byte_features",
    f"""
WITH h AS (
    SELECT doc_id, hex(encode(text)) AS hx,
           CAST(octet_length(encode(text)) AS BIGINT) AS n
    FROM documents
),
b AS (
    SELECT doc_id,
           16 * (strpos('0123456789ABCDEF', substr(hx, CAST(2*i-1 AS INT), 1)) - 1)
              + (strpos('0123456789ABCDEF', substr(hx, CAST(2*i   AS INT), 1)) - 1) AS byte
    FROM h, unnest(generate_series(1, n)) AS u(i)
),
cnt AS (SELECT doc_id, byte, count(*) AS c FROM b GROUP BY 1, 2),
tot AS (SELECT doc_id, n FROM h),
ag AS (
    SELECT cnt.doc_id,
           -sum((cnt.c / CAST(t.n AS DOUBLE)) * log2(cnt.c / CAST(t.n AS DOUBLE))) AS e,
           sum(cnt.byte * cnt.c) / CAST(t.n AS DOUBLE) AS m
    FROM cnt JOIN tot t USING (doc_id)
    GROUP BY cnt.doc_id, t.n
)
SELECT t.doc_id, t.n AS n_bytes,
       round(coalesce(ag.e, 0.0) + 0.0, 6) AS byte_entropy,
       round(coalesce(ag.m, 0.0) + 0.0, 6) AS mean_byte
FROM tot t LEFT JOIN ag USING (doc_id)
""",
)
def multimodal_byte_features(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction over binary payloads
    (byte entropy, mean byte) — REAL numpy computation standing in for any
    media embed/score pass. The payload is the UTF-8 text bytes; the oracle
    histograms the SAME bytes (hex(encode(text)) parsed pairwise), so it is
    exact for non-ASCII text too, not just code points ≤ 127. Rounded to 6dp
    on both sides to collapse float-summation-order noise (+0.0 kills
    -0.0)."""
    docs = mm.with_binary_payload(_load_parallel(spark, sf_dir, "documents"))
    feats = mm.byte_features(docs)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.col("byte_entropy") + F.lit(0.0), 6).alias("byte_entropy"),
        F.round(F.col("mean_byte") + F.lit(0.0), 6).alias("mean_byte"),
    )


@register(
    "multimodal_decode_fake",
    f"""
WITH h AS (SELECT doc_id, md5(text) AS hx, text FROM documents)
SELECT doc_id,
       CAST(64 + {_md5_byte_sql('hx', 0)} % 192 AS INT) AS width,
       CAST(64 + {_md5_byte_sql('hx', 1)} % 192 AS INT) AS height,
       CAST(1 + {_md5_byte_sql('hx', 2)} % 4 AS INT) AS channels,
       text IS NOT NULL AS ok
FROM h
""",
)
def multimodal_decode_fake(spark, sf_dir):
    """Decode-stage plumbing (binary → width/height/channels) with the
    deterministic fake codec; the real path raises NotImplementedError
    until an image library is present (operators/multimodal.py). The fake
    dims derive from md5 digest bytes, which DuckDB reproduces from the
    hex string — so even the Python mapInPandas path is oracle-exact."""
    docs = mm.with_binary_payload(_load_parallel(spark, sf_dir, "documents"))
    return mm.decode_images(docs, fake=True)


@register(
    "udaf_weighted_avg",
    """
SELECT l_returnflag,
       CAST(sum(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
           / sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS weighted_avg,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def udaf_weighted_avg(spark, sf_dir):
    """Custom UDA surface (U1): price-weighted mean quantity via Arrow
    applyInPandas with integer-exact accumulation (order-independent, hence
    oracle-checkable)."""
    li = load_table(spark, sf_dir, "lineitem")
    return ca.weighted_avg_in_pandas(
        li, group_col="l_returnflag", value_col="l_quantity", weight_col="l_extendedprice"
    )


@register(
    "cube_order_priority",
    """
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       count(*) AS cnt,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 6) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_order_priority(spark, sf_dir):
    """CUBE grouping sets over orders."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"), _sum_dbl(_dec("o_totalprice")).alias("sum_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "cnt",
            "sum_price",
        )
    )


@register(
    "distinct_counts",
    """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(*) AS cnt
FROM events
GROUP BY event_type
""",
)
def distinct_counts(spark, sf_dir):
    """Exact distinct aggregation (count DISTINCT expands to a two-phase
    agg in Catalyst)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count("*").alias("cnt"),
    )


@register(
    "approx_distinct_users",
    """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(*) AS cnt,
       TRUE AS approx_within_5pct
FROM events
GROUP BY event_type
""",
)
def approx_distinct_users(spark, sf_dir):
    """HyperLogLog++ approximate distinct, self-audited: the sketch bytes
    are engine-specific so the estimate itself cannot be cross-checked in
    DuckDB, but the estimate's ERROR BOUND can — the query emits the exact
    count plus a boolean asserting |approx − exact| ≤ 5%·exact (rsd=0.01,
    so 5% is a ≥5σ envelope). The oracle recomputes the exact side and
    pins the boolean TRUE, making the sketch's accuracy contract itself
    driver-hash-verifiable instead of a rows-only check."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
            F.count("*").alias("cnt"),
        )
        .select(
            "event_type",
            "exact_users",
            "cnt",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.greatest(F.lit(1.0), 0.05 * F.col("exact_users"))
            ).alias("approx_within_5pct"),
        )
    )


@register(
    "string_date_functions",
    """
SELECT o_orderkey,
       upper(o_orderpriority) AS prio_upper,
       substr(o_orderpriority, 1, 1) AS prio_code,
       length(o_orderpriority) AS prio_len,
       concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(month(o_orderdate) AS INT) AS o_month,
       CAST(day(o_orderdate) AS INT) AS o_day,
       CAST(quarter(o_orderdate) AS INT) AS o_quarter
FROM orders
WHERE o_orderkey <= 1000
""",
)
def string_date_functions(spark, sf_dir):
    """Scalar string/date function coverage (X1/X2 beyond the reference's
    round/sqrt/abs/pow)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return orders.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
    )


@register(
    "sql_q6_revenue_delta",
    """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(8,4))), 6) AS DOUBLE) AS promo_revenue,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def sql_q6_revenue_delta(spark, sf_dir):
    """The engine's SQL-text surface (TPC-H Q6 shape): same catalog views,
    same Catalyst plan as the DataFrame API."""
    from kafka_streams_example_spark.sources.files import register_views

    register_views(spark, sf_dir, tables=("lineitem",))
    return spark.sql(
        """
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * CAST(l_discount AS DECIMAL(8,4))), 6) AS DOUBLE)
                   AS promo_revenue,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


@register(
    "json_wire_roundtrip",
    _SOLAR_CTE
    + """
SELECT m.panel AS kafka_key, m.w_start, m.module,
       round(m.sum_power, 4) AS sum_power, m.cnt
FROM mod m JOIN stats s USING (w_start, panel)
WHERE abs(m.sum_power - s.panel_avg) > 1.0 * round(sqrt(s.squares_sum / s.panel_cnt), 1)
""",
)
def json_wire_roundtrip(spark, sf_dir):
    """S2 wire format: anomalies → to_json (the Kafka sink value,
    reference: SolarConsumer.java:184-188) → from_json → fields. Proves the
    serde layer is lossless for the output schema."""
    from pyspark.sql import types as T

    df = solar.events_as_solar(_load_parallel(spark, sf_dir, "events"))
    out = solar.with_window_epoch(solar.anomalies(df))
    wire = out.select(
        F.col("panel").alias("kafka_key"),
        F.to_json(
            F.struct(
                F.col("w_start"),
                F.col("module"),
                F.round("sum_power", 4).alias("sum_power"),
                F.col("cnt"),
            )
        ).alias("value"),
    )
    value_schema = T.StructType(
        [
            T.StructField("w_start", T.LongType()),
            T.StructField("module", T.StringType()),
            T.StructField("sum_power", T.DoubleType()),
            T.StructField("cnt", T.LongType()),
        ]
    )
    return wire.select(
        "kafka_key", F.from_json(F.col("value"), value_schema).alias("v")
    ).select("kafka_key", "v.*")


@register(
    "dedup_clusters",
    f"""
WITH RECURSIVE
t AS (SELECT doc_id, lang, source, {_TOKS} AS toks FROM documents),
d AS (SELECT doc_id, lang, source,
             list_distinct(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ng
      FROM t),
nz AS (SELECT * FROM d WHERE len(ng) > 0),
near_edges AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM nz a JOIN nz b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.ng, b.ng))
          / CAST(len(list_distinct(list_concat(a.ng, b.ng))) AS DOUBLE) >= 0.5
),
fp AS (SELECT doc_id, md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS f
       FROM documents),
fp_star AS (
    SELECT g.keeper AS id_a, fp.doc_id AS id_b
    FROM fp JOIN (SELECT f, min(doc_id) AS keeper FROM fp GROUP BY f) g USING (f)
    WHERE fp.doc_id <> g.keeper
),
edges AS (SELECT * FROM near_edges UNION SELECT * FROM fp_star),
undirected AS (SELECT id_a AS u, id_b AS v FROM edges
               UNION SELECT id_b, id_a FROM edges),
reach(id, lbl) AS (
    SELECT u, u FROM undirected
    UNION
    SELECT e.u, r.lbl FROM undirected e JOIN reach r ON r.id = e.v
)
SELECT id AS doc_id, min(lbl) AS cluster_id,
       (id = min(lbl)) AS is_keeper
FROM reach GROUP BY id
""",
)
def dedup_clusters(spark, sf_dir):
    """End-to-end dedup decision: near-dup pairs (blocked 3-gram Jaccard
    ≥ 0.5) + exact-dup star edges → connected components (iterative
    min-label propagation, one shuffle per round, lineage cut per
    iteration) → (doc, cluster, keeper). Oracle: recursive-CTE transitive
    closure in DuckDB — same clusters, engine-independent."""
    from kafka_streams_example_spark.functions.hashing import fingerprint_md5
    from kafka_streams_example_spark.operators.graph import dedup_clusters as dc

    docs = load_table(spark, sf_dir, "documents")
    near = dd.ngram_jaccard_pairs(
        docs,
        block_key=F.concat_ws("|", F.col("lang"), F.col("source")),
        threshold=0.5,
    ).select("id_a", "id_b")
    fp = docs.select("doc_id", fingerprint_md5(F.col("text")).alias("f"))
    keepers = fp.groupBy("f").agg(F.min("doc_id").alias("keeper"))
    fp_star = (
        fp.join(keepers, "f")
        .filter(F.col("doc_id") != F.col("keeper"))
        .select(F.col("keeper").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    return dc(near.union(fp_star))


@register(
    "pivot_user_events",
    """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS click,
       count(*) FILTER (WHERE event_type = 'error')    AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS signup,
       count(*) FILTER (WHERE event_type = 'view')     AS view
FROM events
GROUP BY user_id
""",
)
def pivot_user_events(spark, sf_dir):
    """Pivot: event types to columns (Catalyst rewrites to conditional
    aggregation — exactly the oracle's FILTER form)."""
    ev = _load_parallel(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@register(
    "semi_anti_joins",
    """
SELECT 'semi' AS op, c_custkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
UNION ALL
SELECT 'anti', c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
""",
)
def semi_anti_joins(spark, sf_dir):
    """Left-semi and left-anti joins (EXISTS / NOT EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    fo = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    semi = cust.join(fo, cust.c_custkey == fo.o_custkey, "left_semi").select(
        F.lit("semi").alias("op"), "c_custkey"
    )
    anti = cust.join(fo, cust.c_custkey == fo.o_custkey, "left_anti").select(
        F.lit("anti").alias("op"), "c_custkey"
    )
    return semi.unionAll(anti)


@register(
    "token_frequencies",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
x AS (SELECT unnest(toks) AS token FROM t)
SELECT token, count(*) AS freq
FROM x
GROUP BY token
HAVING count(*) >= 5
""",
)
def token_frequencies(spark, sf_dir):
    """Explode / lateral-view shape: corpus token frequencies (the
    vocabulary-building pass of a text pipeline)."""
    docs = _load_parallel(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tx.tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= 5)
    )


@register(
    "value_percentiles",
    """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
""",
)
def value_percentiles(spark, sf_dir):
    """Exact percentiles (linear interpolation — Spark `percentile` and
    DuckDB `quantile_cont` share the definition; rounded to absorb the
    interpolation's last-ULP arithmetic)."""
    ev = _load_parallel(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@register("similarity_ivf_topk")
def similarity_ivf_topk(spark, sf_dir):
    """IVF approximate top-10: 16 coarse cells (deterministic demo
    centroids: vec_id < 16; production trains k-means on a sample),
    nprobe=4, exact cosine re-rank. Rows-only driver check; recall vs
    brute force asserted in tests.

    The footer-metadata row count (zero Spark jobs) sizes the candidate
    estimate (queries × rows × nprobe/cells — the window input is the
    UNION over all 8 query vectors' probed cells) so the Arrow
    local-top-k prune only engages when the window shuffle it bounds
    would actually be large (VERDICT r03 #3)."""
    from kafka_streams_example_spark.sources.files import table_row_count

    emb = load_table(spark, sf_dir, "embeddings")
    est = 8 * table_row_count(spark, sf_dir, "embeddings") * 4 // 16
    return sim.ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        centroids=emb.filter(F.col("vec_id") < 16),
        nprobe=4,
        k=10,
        dim=64,
        candidate_rows=est,
    )


@register(
    "q4_order_priority_check",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def q4_order_priority_check(spark, sf_dir):
    """Correlated EXISTS (TPC-H Q4 shape) → left-semi join on a compound
    condition."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q12_shipmode_case_agg",
    """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
""",
)
def q12_shipmode_case_agg(spark, sf_dir):
    """Conditional (CASE WHEN) aggregation over a join (TPC-H Q12 shape)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_ratio",
    """
SELECT CAST(round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%%'
               THEN CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))
               ELSE CAST(0 AS DECIMAL(18,4)) END), 4) AS DOUBLE)
       / CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 4) AS DOUBLE)
       AS promo_revenue_pct,
       count(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
""",
)
def q14_promo_ratio(spark, sf_dir):
    """Ratio of conditional sums (TPC-H Q14 shape), decimal-exact on both
    sides of the division."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(8,4)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", "8,4"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.round(F.sum(promo) * F.lit(100).cast("decimal(8,4)"), 4).cast("double")
                / F.round(F.sum(rev), 4).cast("double")
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n"),
        )
    )


@register(
    "q18_large_orders",
    """
SELECT o_orderkey, o_custkey,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 6) AS DOUBLE) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_custkey
HAVING sum(l_quantity) > 150
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
""",
)
def q18_large_orders(spark, sf_dir):
    """HAVING + deterministic top-k (TPC-H Q18 shape)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            _sum_dbl(_dec("l_quantity")).alias("total_qty"),
            F.sum("l_quantity").alias("__raw_qty"),
        )
        .filter(F.col("__raw_qty") > 150)
        .drop("__raw_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "scalar_subquery_above_avg",
    """
SELECT c_custkey, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*) FROM customer)
""",
)
def scalar_subquery_above_avg(spark, sf_dir):
    """Scalar subquery: customers above the mean balance. The mean is a
    double; both engines compare against sum/count of identical values —
    the comparison is strict-inequality on values well away from the mean
    boundary at any realistic ULP, and the subquery evaluates once
    (broadcast scalar)."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.agg((F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("a"))
    return cust.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("a")
    ).select("c_custkey", "c_acctbal")


@register(
    "array_functions_docs",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_distinct,
       array_to_string(list_sort(list_distinct(toks))[1:3], ' ') AS first3_sorted,
       list_contains(toks, 'the') AS has_the,
       list_sort(list_distinct(toks))[1] AS min_token
FROM t WHERE len(toks) > 0
""",
)
def array_functions_docs(spark, sf_dir):
    """Array/higher-order function coverage: size, distinct, sort, slice,
    contains — scalar-ized outputs so cross-engine comparison is exact."""
    docs = _load_parallel(spark, sf_dir, "documents")
    toks = tx.tokens(F.lower(F.col("text")))
    sorted_distinct = F.array_sort(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_join(F.slice(sorted_distinct, 1, 3), " ").alias("first3_sorted"),
        F.array_contains(toks, "the").alias("has_the"),
        F.element_at(sorted_distinct, 1).alias("min_token"),
    ).filter(F.size(toks) > 0)


@register(
    "doc_perplexity_proxy",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
x AS (SELECT doc_id, unnest(toks) AS token FROM t),
freq AS (SELECT token, count(*) AS c FROM x GROUP BY token),
tot AS (SELECT sum(c) AS n FROM freq),
scored AS (
    SELECT x.doc_id, ln(CAST(f.c AS DOUBLE) / (SELECT n FROM tot)) AS logp
    FROM x JOIN freq f USING (token)
)
SELECT doc_id,
       count(*) AS n_tokens,
       round(-sum(logp) / count(*), 6) AS avg_neg_logp
FROM scored GROUP BY doc_id
""",
)
def doc_perplexity_proxy(spark, sf_dir):
    """Unigram-LM quality score: mean negative log corpus-probability of a
    doc's tokens (the cheap perplexity proxy used for corpus filtering).
    Two aggregations + one broadcast-able frequency join — no Python."""
    docs = _load_parallel(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tx.tokens(F.lower(F.col("text")))).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    scored = (
        toks.join(F.broadcast(freq), "token")
        .join(F.broadcast(total))
        .withColumn("logp", F.log(F.col("c").cast("double") / F.col("n")))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(-F.sum("logp") / F.count("*"), 6).alias("avg_neg_logp"),
    )


@register(
    "sample_docs_by_hash",
    """
SELECT doc_id, lang
FROM documents
WHERE CAST(('0x' || substr(md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))), 1, 15)) AS BIGINT) % 100 < 10
""",
)
def sample_docs_by_hash(spark, sf_dir):
    """Deterministic ~10%% content-hash sampling — reproducible across
    runs, engines and cluster sizes (rand()-based sampling is none of
    those). The standard way to carve stable dev/eval splits from a
    training corpus."""
    from kafka_streams_example_spark.functions.hashing import normalize_text, stable_long

    docs = _load_parallel(spark, sf_dir, "documents")
    return docs.filter(
        stable_long(normalize_text(F.col("text"))) % 100 < 10
    ).select("doc_id", "lang")


@register(
    "truncate_to_context",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       least(len(toks), 32) AS n_kept,
       array_to_string(toks[1:32], ' ') AS truncated
FROM t
""",
)
def truncate_to_context(spark, sf_dir):
    """Context-window preparation: clip each document to its first 32
    tokens (array slice + join — the tokenize-truncate-detokenize pass of
    a training-data pipeline)."""
    docs = _load_parallel(spark, sf_dir, "documents")
    toks = tx.tokens(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.least(F.size(toks), F.lit(32)).alias("n_kept"),
        F.array_join(F.slice(toks, 1, 32), " ").alias("truncated"),
    )


@register(
    "q10_returned_items",
    """
SELECT c_custkey, c_name, n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 6) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark, sf_dir):
    """Returned-item revenue ranking (TPC-H Q10 shape)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(8,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _sum_dbl(
                _dec("l_extendedprice") * (one - _dec("l_discount", "8,4"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_filter",
    """
SELECT count(*) AS n,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 6) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""",
)
def q19_disjunctive_filter(spark, sf_dir):
    """Disjunctive multi-attribute predicate across a join (TPC-H Q19
    shape) — exercises OR-predicate pushdown and CNF conversion."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(8,4)")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return j.filter(cond).agg(
        F.count("*").alias("n"),
        _sum_dbl(_dec("l_extendedprice") * (one - _dec("l_discount", "8,4"))).alias("revenue"),
    )


@register(
    "funnel_signup_purchase",
    """
WITH firsts AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
           min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
    FROM events GROUP BY user_id
)
SELECT count(*) AS n_users,
       count(first_signup) AS n_signed_up,
       count(CASE WHEN first_purchase > first_signup THEN 1 END) AS n_converted
FROM firsts
""",
)
def funnel_signup_purchase(spark, sf_dir):
    """Event-funnel analysis: users whose first purchase follows their
    first signup — conditional-min aggregation, one shuffle."""
    ev = _load_parallel(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.count("first_signup").alias("n_signed_up"),
        F.count(
            F.when(F.col("first_purchase") > F.col("first_signup"), 1)
        ).alias("n_converted"),
    )


@register(
    "q17_small_quantity_revenue",
    """
WITH part_avg AS (
    SELECT l_partkey, 0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*)) AS half_avg
    FROM lineitem GROUP BY l_partkey
)
SELECT count(*) AS n,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 6) AS DOUBLE) AS revenue
FROM lineitem JOIN part_avg USING (l_partkey)
WHERE l_quantity < half_avg
""",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """Correlated per-group aggregate subquery (TPC-H Q17 shape),
    decorrelated into an aggregate + self-join — the form Catalyst's
    subquery decorrelation produces anyway, written explicitly."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (
            F.lit(0.5)
            * (F.sum(_dec("l_quantity")).cast("double") / F.count("*"))
        ).alias("half_avg")
    )
    return (
        li.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.count("*").alias("n"),
            _sum_dbl(_dec("l_extendedprice")).alias("revenue"),
        )
    )


@register(
    "set_ops_multiset",
    """
SELECT 'intersect_all' AS op, c FROM (
    SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
UNION ALL
SELECT 'except_all', c FROM (
    SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
""",
)
def set_ops_multiset(spark, sf_dir):
    """Multiset set operators (INTERSECT ALL / EXCEPT ALL) — bag
    semantics with multiplicities, distinct from set_ops_customers."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c"))
    b = orders.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("c"))
    return (
        a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "c")
        .unionAll(a.exceptAll(b).select(F.lit("except_all").alias("op"), "c"))
    )


@register(
    "solar_wire_reference_format",
    _SOLAR_CTE
    + """
SELECT m.panel AS key, m.module AS moduleName, m.cnt AS count,
       round(m.sum_power, 4) AS sumPower,
       s.panel_cnt AS panelCount,
       round(s.squares_sum, 4) AS squaresSum,
       round(sqrt(s.squares_sum / s.panel_cnt), 1) AS deviance
FROM mod m JOIN stats s USING (w_start, panel)
WHERE abs(m.sum_power - s.panel_avg) > 1.0 * round(sqrt(s.squares_sum / s.panel_cnt), 1)
""",
)
def solar_wire_reference_format(spark, sf_dir):
    """The reference's exact output wire format (nested
    SolarModuleAggregatorJoiner JSON, camelCase Jackson names) serialized
    with to_json and parsed back — proving a reference consumer could read
    this engine's anomaly topic unchanged."""
    from pyspark.sql import types as T

    df = solar.events_as_solar(_load_parallel(spark, sf_dir, "events"))
    wire = solar.anomalies_wire_format(solar.anomalies(df))
    value_schema = T.StructType(
        [
            T.StructField("moduleName", T.StringType()),
            T.StructField("panelName", T.StringType()),
            T.StructField("count", T.LongType()),
            T.StructField("sumPower", T.DoubleType()),
            T.StructField("avgPower", T.DoubleType()),
            T.StructField(
                "solarPanelAggregator",
                T.StructType(
                    [
                        T.StructField("panelName", T.StringType()),
                        T.StructField("count", T.LongType()),
                        T.StructField("sumPower", T.DoubleType()),
                        T.StructField("avgPower", T.DoubleType()),
                        T.StructField("squaresSum", T.DoubleType()),
                        T.StructField("variance", T.DoubleType()),
                        T.StructField("deviance", T.DoubleType()),
                    ]
                ),
            ),
        ]
    )
    parsed = wire.select("key", F.from_json("value", value_schema).alias("v"))
    return parsed.select(
        "key",
        F.col("v.moduleName").alias("moduleName"),
        F.col("v.count").alias("count"),
        F.round("v.sumPower", 4).alias("sumPower"),
        F.col("v.solarPanelAggregator.count").alias("panelCount"),
        F.round("v.solarPanelAggregator.squaresSum", 4).alias("squaresSum"),
        F.col("v.solarPanelAggregator.deviance").alias("deviance"),
    )


# Portable HALF_UP quality rounding: floor(x*10^4+0.5)/10^4 — the SAME
# double ops Spark's operators/text.py:round_half_up performs, so both
# engines round decimal-boundary quality scores identically (plain
# round() diverges: Spark rounds the decimal repr, DuckDB the binary).
_QUALITY_SQL = """floor((0.4 * least(1.0, len(toks) / 100.0)
               + 0.3 * (CASE WHEN len(toks) > 0 THEN
                     len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x)))
                     / CAST(len(toks) AS DOUBLE) ELSE 0.0 END)
               + 0.3 * (1.0 - CASE WHEN length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g')) > 0 THEN
                     length(regexp_replace(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g'), '[A-Za-z0-9]', '', 'g'))
                     / CAST(length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g')) AS DOUBLE) ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0"""


@register(
    "llm_corpus_prep",
    f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
scored AS (
    SELECT doc_id, text, toks,
           {_QUALITY_SQL}
           AS quality
    FROM t
),
kept AS (SELECT * FROM scored WHERE quality >= 0.5),
fp AS (
    SELECT *, md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS f FROM kept
),
dedup AS (
    SELECT * FROM fp
    QUALIFY row_number() OVER (PARTITION BY f ORDER BY doc_id) = 1
),
sampled AS (
    SELECT * FROM dedup
    WHERE CAST(('0x' || substr(md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))), 1, 15)) AS BIGINT) % 100 < 50
)
SELECT doc_id, quality,
       least(len(toks), 32) AS n_kept,
       array_to_string(toks[1:32], ' ') AS truncated
FROM sampled
""",
)
def llm_corpus_prep(spark, sf_dir):
    """The composed training-data pipeline: quality filter (≥0.5) →
    exact-dedup keepers → deterministic 50%% content-hash sample →
    32-token truncation. One declarative plan — Catalyst fuses the
    whole chain into scan → project/filter → one shuffle (dedup window)
    → project. The composition proof for the operator library."""
    from kafka_streams_example_spark.functions.hashing import (
        fingerprint_md5,
        normalize_text,
        stable_long,
    )
    from pyspark.sql import Window

    docs = _load_parallel(spark, sf_dir, "documents")
    toks = tx.tokens(F.lower(F.col("text")))
    scored = docs.select(
        "doc_id",
        "text",
        toks.alias("toks"),
        tx.quality_score(F.col("text")).alias("quality"),
    ).filter(F.col("quality") >= 0.5)
    fp = scored.withColumn("f", fingerprint_md5(F.col("text")))
    dedup = (
        fp.withColumn(
            "rn", F.row_number().over(Window.partitionBy("f").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
    )
    sampled = dedup.filter(
        stable_long(normalize_text(F.col("text"))) % 100 < 50
    )
    return sampled.select(
        "doc_id",
        "quality",
        F.least(F.size("toks"), F.lit(32)).alias("n_kept"),
        F.array_join(F.slice(F.col("toks"), 1, 32), " ").alias("truncated"),
    )


@register(
    "hll_sketch_rollup",
    """
SELECT event_type,
       count(DISTINCT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT)) AS n_days,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS rollup_within_5pct
FROM events
GROUP BY event_type
""",
)
def hll_sketch_rollup(spark, sf_dir):
    """Mergeable-sketch rollup — THE pattern for distinct counts at 100TB:
    build one HLL sketch per (utc-day, event_type) partition, then merge
    sketches across days per event_type instead of re-scanning raw data.
    Self-audited for the driver: sketch bytes are engine-specific, so the
    query joins the rolled-up estimate against the exact distinct count
    and emits the exact side plus a boolean pinning the merged estimate
    inside a 5% envelope — the rollup's accuracy contract is what the
    DuckDB oracle hash-verifies. Day is the tz-independent epoch day
    (floor(epoch/86400)) so both engines bucket identically."""
    ev = _load_parallel(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("long") / 86400).cast("long")
    daily = ev.groupBy(day.alias("day"), "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    rolled = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count("*").alias("n_days"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return rolled.join(F.broadcast(exact), "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= F.greatest(F.lit(1.0), 0.05 * F.col("exact_users"))
        ).alias("rollup_within_5pct"),
    )


@register(
    "value_percentiles_approx",
    """
SELECT event_type,
       count(*) AS n,
       TRUE AS p50_rank_ok,
       TRUE AS p90_rank_ok,
       TRUE AS p99_rank_ok
FROM events
GROUP BY event_type
""",
)
def value_percentiles_approx(spark, sf_dir):
    """approx_percentile (single-pass GK quantile sketch) — the streaming/
    huge-cardinality alternative to exact percentiles — self-audited via
    the sketch's own mathematical guarantee: a returned value must sit
    within rank ε·n of the target rank (ε = 1/accuracy = 1e-4). The query
    joins the approximate percentiles back to the data, counts rows
    strictly-below / at-or-below each returned value, and emits booleans
    asserting the rank bracket q·n ± tol holds (tol = 2%·n + 10, a wide
    multiple of the sketch bound, tie-safe via the lt/le pair). The DuckDB
    oracle recomputes n exactly and pins the booleans TRUE — turning an
    engine-specific sketch into a driver-hash-verifiable contract."""
    ev = _load_parallel(spark, sf_dir, "events")
    ap = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("p")
    )
    j = ev.join(F.broadcast(ap), "event_type")
    aggs = [F.count("*").alias("n")]
    for i, q in enumerate((0.5, 0.9, 0.99)):
        v = F.col("p")[i]
        aggs.append(
            F.sum((F.col("value") < v).cast("long")).alias(f"lt_{i}")
        )
        aggs.append(
            F.sum((F.col("value") <= v).cast("long")).alias(f"le_{i}")
        )
    g = j.groupBy("event_type").agg(*aggs)
    tol = 0.02 * F.col("n") + 10
    out = ["event_type", F.col("n")]
    for i, (q, label) in enumerate(((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))):
        target = q * F.col("n")
        out.append(
            (
                (F.col(f"lt_{i}") <= target + tol)
                & (F.col(f"le_{i}") >= target - tol)
            ).alias(f"{label}_rank_ok")
        )
    return g.select(*out)


@register(
    "cumulative_user_value",
    """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       CAST(round(sum(CAST(value AS DECIMAL(18,4)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING), 6) AS DOUBLE) AS running_total,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS event_no
FROM events
""",
)
def cumulative_user_value(spark, sf_dir):
    """Running totals per user (window frame ROWS UNBOUNDED PRECEDING) —
    exact decimal accumulation so every prefix sum matches bit-for-bit."""
    from pyspark.sql import Window

    ev = _load_parallel(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.round(F.sum(_dec("value")).over(w), 6).cast("double").alias("running_total"),
        F.row_number().over(wo).alias("event_no"),
    )


@register(
    "lag_lead_deltas",
    """
SELECT event_id, user_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS us_since_prev,
       lead(event_type) OVER w AS next_event_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def lag_lead_deltas(spark, sf_dir):
    """lag/lead window functions: inter-event gaps and next-event lookahead
    per user — the building block of funnel and retention analyses."""
    from pyspark.sql import Window

    ev = _load_parallel(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        (ts_us - F.lag(ts_us).over(w)).alias("us_since_prev"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@register(
    "null_handling_outer_join",
    """
SELECT c.c_custkey,
       coalesce(o.n_orders, 0) AS n_orders,
       (o.n_orders IS NULL) AS never_ordered,
       CAST(round(coalesce(o.total, CAST(0 AS DECIMAL(18,4))), 6) AS DOUBLE) AS total_spent
FROM customer c
LEFT JOIN (
    SELECT o_custkey, count(*) AS n_orders,
           sum(CAST(o_totalprice AS DECIMAL(18,4))) AS total
    FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
""",
)
def null_handling_outer_join(spark, sf_dir):
    """Outer-join NULL semantics: customers without orders surface as NULL
    aggregates, normalized with coalesce — plus an explicit IS NULL flag
    (NULL handling must be deliberate, not incidental, in a 100TB join)."""
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).alias("total"),
        )
    )
    return cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.col("n_orders").isNull().alias("never_ordered"),
        F.round(
            F.coalesce(F.col("total"), F.lit(0).cast("decimal(18,4)")), 6
        ).cast("double").alias("total_spent"),
    )


@register(
    "date_arithmetic",
    """
SELECT o_orderkey,
       date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
       epoch(date_trunc('month', o_orderdate))::BIGINT AS month_start_s,
       epoch(o_orderdate + INTERVAL 90 DAY)::BIGINT AS due_s,
       CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS yyyymm
FROM orders WHERE o_orderkey <= 500
""",
)
def date_arithmetic(spark, sf_dir):
    """Date/interval arithmetic: day differences, month truncation,
    interval addition — all tz-pinned (UTC session) so epoch outputs are
    engine-portable."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return orders.select(
        "o_orderkey",
        F.datediff(
            F.lit("2000-01-01 00:00:00").cast("timestamp"), F.col("o_orderdate")
        ).alias("days_to_y2k"),
        F.date_trunc("month", F.col("o_orderdate")).cast("long").alias("month_start_s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).cast("long").alias("due_s"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("yyyymm"),
    )


def _duck_minhash_sql(
    ngram: int = 3, num_hashes: int = 32, bands: int = 8, threshold: float = 0.5,
    seed: int = 42,
) -> str:
    """DuckDB oracle for the FULL MinHash-LSH pipeline — same md5-derived
    shingle hashes, same seeded permutations, same banding — so even the
    *approximate* candidate set is bit-reproduced across engines."""
    import random

    P = (1 << 31) - 1
    rng = random.Random(seed)
    params = [(rng.randrange(1, P), rng.randrange(0, P)) for _ in range(num_hashes)]
    rows = num_hashes // bands
    sig_terms = ", ".join(
        f"list_min(list_transform(h31, x -> ({a} * x + {b}) % {P}))"
        for a, b in params
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
d AS (SELECT doc_id,
             list_distinct(list_transform(generate_series(1, greatest(len(toks) - {ngram - 1}, 0)),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ng
      FROM t),
nz AS (SELECT * FROM d WHERE len(ng) > 0),
hashed AS (
    SELECT doc_id,
           list_distinct(list_transform(ng, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT))) AS h60
    FROM nz),
sigs AS (
    SELECT doc_id, h60, [{sig_terms}] AS sig
    FROM (SELECT doc_id, h60, list_transform(h60, x -> x % {P}) AS h31 FROM hashed)),
banded AS (
    SELECT doc_id, b.band,
           md5(array_to_string(sig[b.band * {rows} + 1 : b.band * {rows} + {rows}], ',')) AS bhash
    FROM sigs, (SELECT unnest(generate_series(0, {bands - 1})) AS band) b),
cand AS (
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM banded l JOIN banded r
      ON l.band = r.band AND l.bhash = r.bhash AND l.doc_id < r.doc_id),
verified AS (
    SELECT c.id_a, c.id_b,
           len(list_intersect(a.h60, b.h60))
           / CAST(len(a.h60) + len(b.h60) - len(list_intersect(a.h60, b.h60)) AS DOUBLE) AS jac
    FROM cand c JOIN hashed a ON a.doc_id = c.id_a JOIN hashed b ON b.doc_id = c.id_b)
SELECT id_a, id_b, floor(jac * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM verified WHERE jac >= {threshold}
"""


# Upgrade the MinHash query from rows-only to fully oracle-checked: the
# permutations, shingle hashes and banding are engine-portable by
# construction (functions/hashing.py), so even the approximate candidate
# generation reproduces exactly.
ORACLES["neardup_minhash_pairs"] = _duck_minhash_sql()


def _duck_round_half_up(expr: str, scale: int) -> str:
    """SQL twin of operators/text.py:round_half_up — floor(x*10^s+0.5)/10^s
    with the same double ops Spark performs, so decimal-boundary values
    (jaccard 9/128, cume 41/640) round identically on both engines."""
    p = "1" + "0" * scale
    return f"floor(({expr}) * {p}.0 + 0.5) / {p}.0"


def _duck_dot(a: str, b: str, dim: int = 64) -> str:
    # operands parenthesized: array-literal casts like [..]::DOUBLE[] need
    # (expr)[i] indexing to parse
    return (
        f"list_aggregate(list_transform(generate_series(1, {dim}),"
        f" i -> CAST(({a})[i] AS DOUBLE) * CAST(({b})[i] AS DOUBLE)), 'sum')"
    )


def _duck_cosine(a: str, b: str, dim: int = 64) -> str:
    return (
        f"({_duck_dot(a, b, dim)} / "
        f"(sqrt({_duck_dot(a, a, dim)}) * sqrt({_duck_dot(b, b, dim)})))"
    )


def _duck_simhash_bucket(vec: str, planes: list[list[float]], dim: int = 64) -> str:
    """Bucket id = sign pattern vs the same hyperplane constants the Spark
    side uses — fold order and double arithmetic identical, so the bucket
    assignment reproduces bit-exactly."""
    expr = "0"
    for p in planes:
        arr = "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]"
        expr = (
            f"({expr}) * 2 + (CASE WHEN {_duck_dot(vec, arr, dim)} >= 0"
            " THEN 1 ELSE 0 END)"
        )
    return expr


def _duck_lsh_topk_sql(k: int = 10) -> str:
    planes = _hyperplanes()
    return f"""
WITH c AS (SELECT vec_id, embedding,
                  {_duck_simhash_bucket('embedding', planes)} AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS qv, bucket
      FROM c WHERE vec_id < 8),
scored AS (
    SELECT q.q_id, c.vec_id,
           {_duck_cosine('q.qv', 'c.embedding')} AS score
    FROM c JOIN q USING (bucket)
    WHERE c.vec_id <> q.q_id)
SELECT q_id, vec_id, rnk, round(score, 6) AS score
FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rnk
      FROM scored)
WHERE rnk <= {k}
"""


def _duck_embedding_neardup_sql(threshold: float = 0.4) -> str:
    planes = _hyperplanes()
    return f"""
WITH c AS (SELECT vec_id AS id, embedding AS v,
                  {_duck_simhash_bucket('embedding', planes)} AS bucket
           FROM embeddings)
SELECT l.id AS id_a, r.id AS id_b,
       round({_duck_cosine('l.v', 'r.v')}, 6) AS cosine
FROM c l JOIN c r ON l.bucket = r.bucket AND l.id < r.id
WHERE {_duck_cosine('l.v', 'r.v')} >= {threshold}
"""


# Upgrade the SimHash-LSH ops from rows-only to fully oracle-checked: the
# hyperplanes are seeded constants shared with the Spark side, and the
# fold-order-identical double arithmetic makes buckets and cosines
# bit-equal across engines.
ORACLES["similarity_lsh_topk"] = _duck_lsh_topk_sql()
ORACLES["neardup_embeddings"] = _duck_embedding_neardup_sql()


def _duck_ivf_sql(n_centroids: int = 16, nprobe: int = 4, k: int = 10) -> str:
    cos_c = _duck_cosine("c.embedding", "cent.cv")
    cos_q = _duck_cosine("q.qv", "cent.cv")
    cos_s = _duck_cosine("qp.qv", "a.embedding")
    return f"""
WITH cent AS (SELECT vec_id AS centroid_id, embedding AS cv
              FROM embeddings WHERE vec_id < {n_centroids}),
assign AS (
    SELECT vec_id, embedding, centroid_id FROM (
        SELECT c.vec_id, c.embedding, cent.centroid_id,
               row_number() OVER (PARTITION BY c.vec_id
                   ORDER BY {cos_c} DESC, cent.centroid_id) AS rn
        FROM embeddings c CROSS JOIN cent)
    WHERE rn = 1),
qprobe AS (
    SELECT q_id, qv, centroid_id FROM (
        SELECT q.q_id, q.qv, cent.centroid_id,
               row_number() OVER (PARTITION BY q.q_id
                   ORDER BY {cos_q} DESC, cent.centroid_id) AS rn
        FROM (SELECT vec_id AS q_id, embedding AS qv
              FROM embeddings WHERE vec_id < 8) q
        CROSS JOIN cent)
    WHERE rn <= {nprobe}),
scored AS (
    SELECT qp.q_id, a.vec_id, {cos_s} AS score
    FROM assign a JOIN qprobe qp USING (centroid_id)
    WHERE a.vec_id <> qp.q_id)
SELECT q_id, vec_id, rnk, round(score, 6) AS score
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
          ORDER BY score DESC, vec_id) AS rnk FROM scored)
WHERE rnk <= {k}
"""


# IVF joins the fully-oracle-checked club as well: fixed centroids +
# fold-order-identical cosine make assignment, probing and re-ranking
# reproduce exactly.
ORACLES["similarity_ivf_topk"] = _duck_ivf_sql()


@register(
    "regex_extraction",
    """
SELECT doc_id,
       regexp_extract(source, '([a-z]+)([0-9]+)', 1) AS src_name,
       CAST(regexp_extract(source, '([a-z]+)([0-9]+)', 2) AS INT) AS src_num,
       coalesce(nullif(regexp_extract(text, '(spark|stream|batch)', 1), ''), 'none') AS first_keyword,
       greatest(n_chars, 100) AS floored_chars,
       CASE WHEN n_chars > 300 THEN 'long' WHEN n_chars > 150 THEN 'mid' ELSE 'short' END AS len_class
FROM documents
""",
)
def regex_extraction(spark, sf_dir):
    """Regex group extraction + conditional scalars (nullif/coalesce/
    greatest/CASE) — the remaining scalar-function surface."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("source", r"([a-z]+)([0-9]+)", 1).alias("src_name"),
        F.regexp_extract("source", r"([a-z]+)([0-9]+)", 2).cast("int").alias("src_num"),
        F.coalesce(
            F.nullif(F.regexp_extract("text", r"(spark|stream|batch)", 1), F.lit("")),
            F.lit("none"),
        ).alias("first_keyword"),
        F.greatest("n_chars", F.lit(100)).alias("floored_chars"),
        F.when(F.col("n_chars") > 300, "long")
        .when(F.col("n_chars") > 150, "mid")
        .otherwise("short")
        .alias("len_class"),
    )


# Extended TPC-H-shape relational coverage registers itself on import
# (kept in a separate module; depends on `register`, so the import must
# stay at the bottom of this file).
from kafka_streams_example_spark import relational_extra  # noqa: E402,F401

# Thematic query packages (round-7 consolidation of the former numbered
# tranches — same self-registration pattern, code unchanged, order pinned
# by query_order.py). `text` must import before `stats`/`eval`: both patch
# an oracle with ORACLES["quality_logreg_score"], which text registers.
from kafka_streams_example_spark.queries import text  # noqa: E402,F401
from kafka_streams_example_spark.queries import retrieval  # noqa: E402,F401
from kafka_streams_example_spark.queries import dedup  # noqa: E402,F401
from kafka_streams_example_spark.queries import sketches  # noqa: E402,F401
from kafka_streams_example_spark.queries import stats  # noqa: E402,F401
from kafka_streams_example_spark.queries import timeseries  # noqa: E402,F401
from kafka_streams_example_spark.queries import eval as eval_queries  # noqa: E402,F401
from kafka_streams_example_spark.queries import events  # noqa: E402,F401
from kafka_streams_example_spark.queries import multimodal  # noqa: E402,F401
from kafka_streams_example_spark.queries import operational  # noqa: E402,F401

# SQL-surface battery registered after the relational/tranche sets it
# cross-references.
from kafka_streams_example_spark import sql_surface  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Canonical ordering: registration order is FROZEN as data (query_order.py)
# so the physical module layout can change without churning the driver's
# bounded verification window (its rotation tiebreaks on this order).
# Genuinely new queries may be registered before being added to the frozen
# list — they sort after it, in registration order — but CI
# (tests/test_bench_contract.py) requires the list to be updated in the
# same change, so the canonical file stays the single source of truth.
# ---------------------------------------------------------------------------
from kafka_streams_example_spark.query_order import CANONICAL_ORDER  # noqa: E402


def _canonicalize() -> None:
    missing = [n for n in CANONICAL_ORDER if n not in QUERIES]
    assert not missing, f"canonical queries not registered: {missing}"
    rank = {n: i for i, n in enumerate(CANONICAL_ORDER)}
    fallback = {n: i for i, n in enumerate(QUERIES)}
    ordered = sorted(QUERIES, key=lambda n: (rank.get(n, len(rank)), fallback[n]))
    q = {n: QUERIES[n] for n in ordered}
    o = {n: ORACLES[n] for n in ordered if n in ORACLES}
    QUERIES.clear()
    QUERIES.update(q)
    ORACLES.clear()
    ORACLES.update(o)


_canonicalize()
