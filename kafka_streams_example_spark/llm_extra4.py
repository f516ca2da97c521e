"""Fifth tranche: corpus-indexing, robust-stats and temporal analytics
operators (round 3, part 2).

- inverted_index_postings: token -> (doc_freq, total_tf, first-8 postings)
                           inverted index build, the retrieval-side
                           counterpart of tfidf_top_terms.
- token_pmi_pairs:         pointwise mutual information of token pairs
                           co-occurring in a document — collocation mining
                           for tokenizer/phrase curation.
- cohort_retention:        weekly signup-cohort retention triangle over
                           events — the canonical product-analytics query.
- median_mad_outliers:     robust per-group outlier detection via exact
                           median + MAD (the robust alternative to the
                           solar pipeline's mean/stddev anomaly rule).
- scd2_user_state:         slowly-changing-dimension (type 2) history of
                           each user's event_type state: gaps-and-islands
                           collapse with valid_from/valid_to ranges.
- winsorized_chars_by_source: p05/p95-winsorized mean doc length per
                           source — outlier-robust corpus statistics.
- deterministic_group_sample: k-per-group reservoir-style sample keyed by
                           a salted content hash — stable under retries,
                           repartitioning and engine changes.
- order_window_overlaps:   interval-overlap self-join (both sides are
                           ranges) of per-customer 30-day fulfillment
                           windows — the overlap-join operator class that
                           asof/range joins don't cover.
- orders_column_profile:   per-column null/distinct data-quality profile
                           in one scan — the ingest-gate audit.
- lateral_top_orders_per_segment: correlated LATERAL subquery (top-3
                           orders per market segment) — SQL-surface parity
                           for lateral joins.

Scale notes (100 TB shapes):
- the inverted index bounds per-token state to the first 8 postings via a
  row_number over the deduplicated (tok, doc) table, whose partitioning
  the final aggregate reuses, so stopword keys never accumulate
  corpus-sized postings lists in an executor;
- PMI pair generation is per-document and JVM-side (higher-order array
  functions), bounded by the per-doc distinct-token count — never a
  corpus-level self-join; the vocabulary side of the join is a broadcast;
- cohort retention is ONE shuffle on user_id (collect_set of the bounded
  per-user week set), then a tiny triangle aggregate — no events⋈events;
- median/MAD is scan + broadcast-join passes (the per-group medians are
  group-cardinality-sized), never a window over the fact table;
- SCD2 shuffles once on user_id; windows stay inside user partitions;
- the group sample pre-prunes to k rows per (group, input partition)
  before the global per-group top-k, so a hot group never funnels its
  full corpus share through one reducer;
- the overlap join is an equi-join on the entity key with the range
  predicate applied inside bounded per-key groups (never a cartesian);
- the column profile is one scan with a multi-distinct Expand — exact by
  design here; the approximate variant at 100 TB is approx_distinct_users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.registry import _TOKS, _load_parallel, register

# --------------------------------------------------------------------------
# inverted_index_postings — token -> doc_freq / total_tf / capped postings
# --------------------------------------------------------------------------


@register(
    "inverted_index_postings",
    f"""
WITH toks AS (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
td AS (
    SELECT tok, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2
)
SELECT tok,
       CAST(count(*) AS BIGINT) AS doc_freq,
       CAST(sum(tf) AS BIGINT) AS total_tf,
       array_to_string(list_sort(list(doc_id))[1:8], ',') AS postings_csv
FROM td
GROUP BY tok
HAVING count(*) >= 2
""",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per token, document frequency, total term
    frequency and the first 8 postings (ascending doc_id) as a CSV string.

    100 TB shape: the corpus-sized token stream shuffles once into the
    map-side-combined (tok, doc) pre-aggregate; the postings-capping
    row_number re-shuffles only that deduplicated table on tok and the
    final aggregate reuses the window's partitioning (exchange reuse).
    Per-token executor state is bounded to 8 postings even for
    stopwords; doc_freq/total_tf come from counters, not lists."""
    docs = _load_parallel(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tx.tokens(F.lower(F.col("text")))).alias("tok")
    )
    td = toks.groupBy("tok", "doc_id").agg(F.count("*").alias("tf"))
    rn = F.row_number().over(Window.partitionBy("tok").orderBy("doc_id"))
    return (
        td.withColumn("rn", rn)
        .groupBy("tok")
        .agg(
            F.count("*").cast("bigint").alias("doc_freq"),
            F.sum("tf").cast("bigint").alias("total_tf"),
            F.array_join(
                F.array_sort(F.collect_list(F.when(F.col("rn") <= 8, F.col("doc_id")))),
                ",",
            ).alias("postings_csv"),
        )
        .filter(F.col("doc_freq") >= 2)
    )


# --------------------------------------------------------------------------
# token_pmi_pairs — collocation mining via PMI
# --------------------------------------------------------------------------


@register(
    "token_pmi_pairs",
    f"""
WITH t AS (
    SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents
),
n AS (SELECT count(DISTINCT doc_id) AS nd FROM t),
f AS (SELECT tok, count(*) AS df FROM t GROUP BY 1),
pc AS (
    SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS pair_docs
    FROM t a JOIN t b USING (doc_id)
    WHERE a.tok < b.tok
    GROUP BY 1, 2
)
SELECT tok_a, tok_b,
       CAST(pair_docs AS BIGINT) AS pair_docs,
       round(ln(CAST(pair_docs * nd AS DOUBLE)
                / CAST(fa.df * fb.df AS DOUBLE)), 6) AS pmi
FROM pc
CROSS JOIN n
JOIN f fa ON fa.tok = pc.tok_a
JOIN f fb ON fb.tok = pc.tok_b
WHERE pair_docs >= 5
""",
)
def token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of distinct-token pairs co-occurring
    in a document: pmi = ln(P(a,b) / (P(a)P(b))).

    100 TB shape: pairs are generated per-document with JVM higher-order
    array functions (bounded by the per-doc distinct-token count squared,
    never a corpus self-join); the token-frequency table is
    vocabulary-sized and broadcast; the doc count joins as a 1-row
    broadcast scalar. The integer products stay < 2^53 so the double
    division is exact on both engines."""
    docs = _load_parallel(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.array_sort(F.array_distinct(tx.tokens(F.lower(F.col("text"))))).alias("ts"),
    )
    exploded = t.select("doc_id", F.explode("ts").alias("tok"))
    nd = exploded.agg(F.countDistinct("doc_id").alias("nd"))
    freq = exploded.groupBy("tok").agg(F.count("*").alias("df"))
    pairs = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "flatten(transform(ts, (x, i) ->"
                " transform(slice(ts, i + 2, size(ts)),"
                " y -> struct(x AS tok_a, y AS tok_b))))"
            )
        ).alias("p"),
    ).select("doc_id", "p.tok_a", "p.tok_b")
    pc = (
        pairs.groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("pair_docs"))
        .filter(F.col("pair_docs") >= 5)
    )
    fa = F.broadcast(freq.withColumnRenamed("tok", "tok_a").withColumnRenamed("df", "df_a"))
    fb = F.broadcast(freq.withColumnRenamed("tok", "tok_b").withColumnRenamed("df", "df_b"))
    return (
        pc.join(fa, "tok_a")
        .join(fb, "tok_b")
        .join(F.broadcast(nd))
        .select(
            "tok_a",
            "tok_b",
            F.col("pair_docs").cast("bigint").alias("pair_docs"),
            F.round(
                F.log(
                    (F.col("pair_docs") * F.col("nd")).cast("double")
                    / (F.col("df_a") * F.col("df_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )


# --------------------------------------------------------------------------
# cohort_retention — weekly signup-cohort retention triangle
# --------------------------------------------------------------------------


@register(
    "cohort_retention",
    """
WITH uw AS (
    SELECT user_id, date_trunc('week', ts) AS week
    FROM events GROUP BY 1, 2
),
cohort AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1),
r AS (
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, uw.week) / 7 AS BIGINT)
               AS week_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM uw JOIN cohort c USING (user_id)
    GROUP BY 1, 2
)
SELECT cohort_week, week_offset, n_active,
       round(n_active * 1.0 /
             max(CASE WHEN week_offset = 0 THEN n_active END)
                 OVER (PARTITION BY cohort_week), 6) AS retention
FROM r
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users are assigned to the ISO week of
    their first event; each (cohort_week, week_offset) cell counts users
    active that many weeks later, plus the retention ratio vs week 0.

    100 TB shape: ONE shuffle on user_id — each user's distinct-week set
    (bounded: weeks, not events) is built with collect_set in the same
    aggregation that finds the cohort week, so there is no events⋈events
    join and no second fact shuffle; the triangle aggregate and its
    window run on cohort-cardinality rows."""
    ev = _load_parallel(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    per_user = (
        ev.select("user_id", week.alias("week"))
        .groupBy("user_id")
        .agg(
            F.min("week").alias("cohort_week"),
            F.collect_set("week").alias("weeks"),
        )
    )
    r = (
        per_user.select(
            "cohort_week", F.explode("weeks").alias("week")
        )
        .withColumn(
            "week_offset",
            (F.datediff("week", "cohort_week") / 7).cast("bigint"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("bigint").alias("n_active"))
    )
    w0 = Window.partitionBy("cohort_week")
    base = F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(w0)
    return r.select(
        "cohort_week",
        "week_offset",
        "n_active",
        F.round(F.col("n_active") * 1.0 / base, 6).alias("retention"),
    )


# --------------------------------------------------------------------------
# median_mad_outliers — robust per-group outlier detection
# --------------------------------------------------------------------------


@register(
    "median_mad_outliers",
    """
WITH med AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med
    FROM events GROUP BY 1
),
dev AS (
    SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
    FROM events e JOIN med m USING (event_type)
),
mad AS (
    SELECT event_type, min(med) AS med,
           quantile_cont(adev, 0.5) AS mad,
           count(*) AS n
    FROM dev GROUP BY 1
)
SELECT d.event_type,
       CAST(min(m.n) AS BIGINT) AS n,
       round(min(m.med), 6) AS med,
       round(min(m.mad), 6) AS mad,
       CAST(sum(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       round(sum(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
             * 1.0 / min(m.n), 6) AS outlier_rate
FROM dev d JOIN mad m USING (event_type)
GROUP BY 1
""",
)
def median_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers per event_type: exact median, MAD (median absolute
    deviation), and the count beyond the 3σ-equivalent robust fence
    (|x − med| > 3·1.4826·MAD) — the estimator that, unlike the solar
    pipeline's mean/stddev rule, is not itself dragged by the outliers.

    100 TB shape: two scan+broadcast-join passes (medians and MADs are
    group-cardinality tables, broadcast back onto the fact scan) — never
    a window over the fact table partitioned by a 5-value key, which
    would funnel the corpus through 5 reducers."""
    ev = _load_parallel(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("adev"), "med"
    )
    mad = dev.groupBy("event_type").agg(
        F.min("med").alias("med"),
        F.percentile("adev", F.lit(0.5)).alias("mad"),
        F.count("*").alias("n"),
    )
    fence = 3 * 1.4826 * F.col("mad")
    hit = F.when(F.col("adev") > fence, 1).otherwise(0)
    return (
        dev.select("event_type", "adev")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("n").cast("bigint").alias("n"),
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(hit).cast("bigint").alias("n_outliers"),
            F.round(F.sum(hit) * 1.0 / F.min("n"), 6).alias("outlier_rate"),
        )
    )


# --------------------------------------------------------------------------
# scd2_user_state — type-2 slowly-changing-dimension history
# --------------------------------------------------------------------------


@register(
    "scd2_user_state",
    """
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                THEN 1 ELSE 0 END AS changed
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
versioned AS (
    SELECT *, sum(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS version
    FROM flagged
),
collapsed AS (
    SELECT user_id, CAST(version AS BIGINT) AS version,
           min(event_type) AS state,
           min(ts) AS valid_from,
           CAST(count(*) AS BIGINT) AS n_events
    FROM versioned GROUP BY 1, 2
)
SELECT user_id, version, state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
           AS valid_to,
       n_events
FROM collapsed
""",
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history of each user's event_type state: consecutive
    identical states collapse into one versioned row with
    [valid_from, valid_to) effective ranges (open range = NULL valid_to)
    — the dimension-versioning building block, via gaps-and-islands.

    100 TB shape: one shuffle on user_id; the change-flag window, running
    version sum, collapse aggregate and valid_to lead all reuse that same
    partitioning (exchange reuse), and per-user partitions are bounded."""
    ev = _load_parallel(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    versioned = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "version"
        ),
    )
    collapsed = versioned.groupBy("user_id", "version").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return collapsed.select(
        "user_id",
        F.col("version").cast("bigint").alias("version"),
        "state",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
    )


# --------------------------------------------------------------------------
# winsorized_chars_by_source — outlier-robust corpus length statistics
# --------------------------------------------------------------------------


@register(
    "winsorized_chars_by_source",
    """
WITH q AS (
    SELECT source,
           quantile_cont(CAST(n_chars AS DOUBLE), 0.05) AS p05,
           quantile_cont(CAST(n_chars AS DOUBLE), 0.95) AS p95
    FROM documents GROUP BY 1
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(min(q.p05), 6) AS p05,
       round(min(q.p95), 6) AS p95,
       round(avg(CAST(d.n_chars AS DOUBLE)), 6) AS mean_raw,
       round(avg(least(greatest(CAST(d.n_chars AS DOUBLE), q.p05), q.p95)), 6)
           AS mean_winsorized,
       CAST(sum(CASE WHEN CAST(d.n_chars AS DOUBLE) < q.p05
                       OR CAST(d.n_chars AS DOUBLE) > q.p95
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
FROM documents d JOIN q USING (source)
GROUP BY 1
""",
)
def winsorized_chars_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean document length per source: values outside the
    exact per-source [p05, p95] band are clipped to the fence before
    averaging — the corpus statistic that one 500 MB crawl artifact
    cannot drag.

    100 TB shape: percentile pass produces a source-cardinality table
    that broadcasts back onto the second scan; no fact-table window."""
    docs = _load_parallel(spark, sf_dir, "documents")
    chars = F.col("n_chars").cast("double")
    q = docs.groupBy("source").agg(
        F.percentile(chars, F.lit(0.05)).alias("p05"),
        F.percentile(chars, F.lit(0.95)).alias("p95"),
    )
    clipped = F.least(F.greatest(chars, F.col("p05")), F.col("p95"))
    out_of_band = (chars < F.col("p05")) | (chars > F.col("p95"))
    return (
        docs.join(F.broadcast(q), "source")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.min("p05"), 6).alias("p05"),
            F.round(F.min("p95"), 6).alias("p95"),
            F.round(F.avg(chars), 6).alias("mean_raw"),
            F.round(F.avg(clipped), 6).alias("mean_winsorized"),
            F.sum(F.when(out_of_band, 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped"),
        )
    )


# --------------------------------------------------------------------------
# deterministic_group_sample — stable k-per-group sample
# --------------------------------------------------------------------------

_SAMPLE_SALT = ":sample"
_SAMPLE_K = 5


@register(
    "deterministic_group_sample",
    f"""
WITH h AS (
    SELECT lang, doc_id,
           md5(CAST(doc_id AS VARCHAR) || '{_SAMPLE_SALT}') AS sample_key
    FROM documents
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY lang
                                 ORDER BY sample_key, doc_id) AS rank
    FROM h
)
SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, sample_key
FROM r WHERE rank <= {_SAMPLE_K}
""",
)
def deterministic_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=5 documents per language, chosen as the k smallest salted-md5
    keys — a reservoir-style sample whose membership is a pure function
    of the ids (stable under retries, repartitioning, re-ingestion and
    engine swaps), unlike rand()-based sampling.

    100 TB shape: a per-(lang, input-partition) local top-k prunes the
    corpus to k·partitions·langs candidate rows BEFORE the global
    per-lang rank, so a dominant language never funnels its whole corpus
    share through a single reducer."""
    docs = _load_parallel(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SAMPLE_SALT)))
    h = docs.select("lang", "doc_id", key.alias("sample_key"), F.spark_partition_id().alias("pid"))
    local = Window.partitionBy("lang", "pid").orderBy("sample_key", "doc_id")
    pruned = (
        h.withColumn("lrn", F.row_number().over(local))
        .filter(F.col("lrn") <= _SAMPLE_K)
        .drop("lrn", "pid")
    )
    final = Window.partitionBy("lang").orderBy("sample_key", "doc_id")
    return (
        pruned.withColumn("rank", F.row_number().over(final).cast("bigint"))
        .filter(F.col("rank") <= _SAMPLE_K)
        .select("lang", "rank", "doc_id", "sample_key")
    )


# --------------------------------------------------------------------------
# order_window_overlaps — interval-overlap self-join per customer
# --------------------------------------------------------------------------


@register(
    "order_window_overlaps",
    """
WITH w AS (
    SELECT o_custkey, o_orderkey, o_orderdate AS w_start,
           o_orderdate + INTERVAL 29 DAY AS w_end
    FROM orders
)
SELECT a.o_custkey AS custkey,
       CAST(count(*) AS BIGINT) AS n_overlapping_pairs,
       CAST(max(date_diff('day',
                          greatest(a.w_start, b.w_start),
                          least(a.w_end, b.w_end)) + 1) AS BIGINT)
           AS max_overlap_days
FROM w a JOIN w b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND a.w_start <= b.w_end AND b.w_start <= a.w_end
GROUP BY 1
""",
)
def order_window_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: pairs of a customer's orders whose
    30-day fulfillment windows [orderdate, orderdate+29d] overlap, with
    the widest overlap in days — the both-sides-are-ranges join class
    that asof (point→range) and banded range joins don't cover.

    100 TB shape: an equi-join on the entity key (customer) with the
    overlap predicate evaluated inside bounded per-key groups — pair
    count is quadratic only in the per-customer order count, never a
    cartesian or a date-crossed blowup."""
    o = _load_parallel(spark, sf_dir, "orders")
    w = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("w_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 29 DAYS")).alias("w_end"),
    )
    a, b = w.alias("a"), w.alias("b")
    overlap_days = (
        F.datediff(
            F.least(F.col("a.w_end"), F.col("b.w_end")),
            F.greatest(F.col("a.w_start"), F.col("b.w_start")),
        )
        + 1
    )
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("a.w_start") <= F.col("b.w_end"))
            & (F.col("b.w_start") <= F.col("a.w_end")),
        )
        .groupBy(F.col("a.o_custkey").alias("custkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_overlapping_pairs"),
            F.max(overlap_days).cast("bigint").alias("max_overlap_days"),
        )
    )


# --------------------------------------------------------------------------
# orders_column_profile — one-scan data-quality profile
# --------------------------------------------------------------------------

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@register(
    "orders_column_profile",
    "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of orders (row count, null count,
    exact distinct count) — the ingest-gate audit that catches a broken
    upstream export before it poisons a training run.

    100 TB shape: ONE scan; the multi-distinct aggregate plans a single
    Expand (6× row multiply, each row carrying one column's value) —
    exact by design here, with approx_count_distinct as the documented
    sketch alternative at corpus scale (see approx_distinct_users)."""
    o = _load_parallel(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.count(c).alias(f"nn_{c}") for c in _PROFILE_COLS],
        *[F.countDistinct(c).alias(f"nd_{c}") for c in _PROFILE_COLS],
    )
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return agg.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack}) AS (column_name, nonnull, n_distinct)",
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("n_rows") - F.col("nonnull")).cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )


# --------------------------------------------------------------------------
# lateral_top_orders_per_segment — correlated LATERAL subquery
# --------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT s.c_mktsegment, t.o_orderkey, t.o_totalprice
FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
LATERAL (SELECT o.o_orderkey, o.o_totalprice
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         WHERE c.c_mktsegment = s.c_mktsegment
         ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 3) t
"""


@register("lateral_top_orders_per_segment", _LATERAL_SQL)
def lateral_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: the top-3 orders by price within each
    market segment, written as a per-row dependent subquery with its own
    ORDER BY/LIMIT — SQL-surface parity for lateral joins (the identical
    statement runs on the DuckDB oracle).

    100 TB shape: Catalyst decorrelates the lateral into a broadcast
    dimension join + per-segment rank (no per-segment re-execution);
    the driving side is the 5-row distinct-segment relation, so the only
    corpus-scale work is the single orders⋈customer broadcast join."""
    for t in ("customer", "orders"):
        _load_parallel(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)
