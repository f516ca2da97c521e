"""Twenty-third query tranche: robust trends, exponential smoothing,
budgeted mixture allocation and entity-resolution survivorship — a
Theil-Sen estimator (median of pairwise slopes) beside its OLS
counterpart on the daily event series, a Holt linear-trend smoothing
trace with dyadic coefficients (bit-exact across engines, no rounding
needed), a greedy token-budget mixture allocation across document
sources (the "what do we actually train on" planner), and the
merge/survivorship stage that completes the phonetic-blocking entity
resolution flow from llm_extra20.

Slopes and medians are ratios of exact integers (interpolated medians
average two identical doubles); the Holt recurrence uses alpha=0.5 /
beta=0.25 — exactly-representable dyadics — so every level/trend value
is the same double on both engines unrounded; allocation is pure
integer arithmetic over a deterministic ordering.

Reference parity note: the reference engine (Kafka Streams DSL,
SolarConsumer.java) has no analogue — these extend the engine toward
the LLM-data-pipeline north star (SURVEY.md §2, beyond-reference
table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.llm_extra20 import _phonetic_sql, _PH_TYPO_DUCK, _PH_TYPO_MOD
from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.registry import (
    _duck_round_half_up,
    _load_parallel,
    register,
)

# --------------------------------------------------------------------------
# theil_sen_trend — robust daily-volume slope vs OLS
# --------------------------------------------------------------------------

_BYDAY = """
SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY 1
"""


@register(
    "theil_sen_trend",
    f"""
WITH byday AS ({_BYDAY}),
pairs AS (
    SELECT CAST(b.cnt - a.cnt AS DOUBLE) / (b.day - a.day) AS slope
    FROM byday a JOIN byday b ON b.day > a.day
),
ts AS (
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           quantile_cont(slope, 0.5) AS m
    FROM pairs
),
ols AS (
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(count(*) * sum(day * cnt) - sum(day) * sum(cnt) AS DOUBLE)
           / (count(*) * sum(day * day) - sum(day) * sum(day)) AS b1
    FROM byday
)
SELECT n_days, n_pairs,
       round(m, 6) AS theil_sen_slope,
       round(b1, 6) AS ols_slope
FROM ts CROSS JOIN ols
""",
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily event volume — the median of all
    pairwise slopes, immune to ~29% outlier contamination where OLS
    (reported beside it, from integer sufficient statistics) is not.
    Every slope is a ratio of exact integers, so the pair set is
    bit-identical across engines and the interpolated median averages
    two identical doubles.

    100 TB shape: the corpus collapses to the day-grain series in one
    combinable aggregate; the O(d^2) pair join runs on the BOUNDED
    day table (a year is ~365 rows -> 66k pairs), never on events. At
    decade-scale series you'd switch to the repeated-median variant or
    sample pairs; the corpus-side cost is unchanged either way."""
    ev = _load_parallel(spark, sf_dir, "events")
    byday = ev.groupBy(
        F.floor(F.col("ts").cast("long") / 86400).cast("long").alias("day")
    ).agg(F.count("*").alias("cnt"))
    a, b = byday.alias("a"), byday.alias("b")
    pairs = a.join(F.broadcast(b), F.col("b.day") > F.col("a.day")).select(
        (
            (F.col("b.cnt") - F.col("a.cnt")).cast("double")
            / (F.col("b.day") - F.col("a.day"))
        ).alias("slope")
    )
    ts = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("m"),
    )
    ols = byday.agg(
        F.count("*").cast("long").alias("n_days"),
        (
            (
                F.count("*") * F.sum(F.col("day") * F.col("cnt"))
                - F.sum("day") * F.sum("cnt")
            ).cast("double")
            / (
                F.count("*") * F.sum(F.col("day") * F.col("day"))
                - F.sum("day") * F.sum("day")
            )
        ).alias("b1"),
    )
    return ts.join(F.broadcast(ols)).select(
        "n_days",
        "n_pairs",
        F.round("m", 6).alias("theil_sen_slope"),
        F.round("b1", 6).alias("ols_slope"),
    )


# --------------------------------------------------------------------------
# holt_linear_trace — double exponential smoothing, dyadic coefficients
# --------------------------------------------------------------------------

_HW_ALPHA = 0.5  # dyadic: every smoothed value is exactly representable
_HW_BETA = 0.25


@register(
    "holt_linear_trace",
    f"""
WITH RECURSIVE byday AS ({_BYDAY}),
seq AS (
    SELECT row_number() OVER (ORDER BY day) AS rn, day, cnt FROM byday
),
n AS (SELECT max(rn) AS n FROM seq),
hw AS (
    SELECT s1.rn, s1.day, s1.cnt,
           CAST(s1.cnt AS DOUBLE) AS level,
           CAST(s2.cnt - s1.cnt AS DOUBLE) AS trend
    FROM seq s1 JOIN seq s2 ON s1.rn = 1 AND s2.rn = 2
    UNION ALL
    SELECT s.rn, s.day, s.cnt,
           {_HW_ALPHA} * s.cnt + {1 - _HW_ALPHA} * (hw.level + hw.trend),
           {_HW_BETA} * (({_HW_ALPHA} * s.cnt
                          + {1 - _HW_ALPHA} * (hw.level + hw.trend)) - hw.level)
               + {1 - _HW_BETA} * hw.trend
    FROM hw JOIN seq s ON s.rn = hw.rn + 1
)
SELECT rn, day, cnt, level, trend
FROM hw
""",
)
def holt_linear_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend (double exponential) smoothing trace over the
    daily event series: level_t = a*x_t + (1-a)(level+trend),
    trend_t = b*(level_t - level) + (1-b)*trend, initialized the
    textbook way (level_1 = x_1, trend_1 = x_2 - x_1). The coefficients
    are DYADIC (a=0.5, b=0.25), so with integer inputs every level and
    trend is an exactly-representable double and the trace hash-matches
    UNROUNDED — the recurrence itself is the verified artifact, not a
    tolerance around it. DuckDB walks the recurrence with a recursive
    CTE; Spark folds the sorted day array with F.aggregate.

    100 TB shape: one combinable aggregate to the bounded day series;
    the sequential fold is inherent to exponential smoothing (each
    state depends on the last) and runs on day-count rows — the right
    place for a sequential stage. Forecasts are level + h*trend off the
    final row."""
    ev = _load_parallel(spark, sf_dir, "events")
    byday = ev.groupBy(
        F.floor(F.col("ts").cast("long") / 86400).cast("long").alias("day")
    ).agg(F.count("*").alias("cnt"))
    series = byday.agg(
        F.sort_array(F.collect_list(F.struct("day", "cnt"))).alias("s")
    )
    a, b = _HW_ALPHA, _HW_BETA
    # fold: acc = array of (rn, day, cnt, level, trend); new level inlined
    # twice in the trend update (a lambda can't bind an intermediate)
    new_level = (
        f"{a} * CAST(x.cnt AS DOUBLE)"
        " + (1.0 - {a}) * (element_at(acc, -1).level + element_at(acc, -1).trend)"
    ).replace("{a}", str(a))
    fold = f"""
    aggregate(
        slice(s, 3, greatest(size(s) - 2, 0)),
        array(struct(
            CAST(1 AS BIGINT) AS rn, s[0].day AS day, s[0].cnt AS cnt,
            CAST(s[0].cnt AS DOUBLE) AS level,
            CAST(s[1].cnt - s[0].cnt AS DOUBLE) AS trend
        ), struct(
            CAST(2 AS BIGINT) AS rn, s[1].day AS day, s[1].cnt AS cnt,
            {a} * CAST(s[1].cnt AS DOUBLE)
                + {1 - a} * (CAST(s[0].cnt AS DOUBLE)
                             + CAST(s[1].cnt - s[0].cnt AS DOUBLE)) AS level,
            {b} * (({a} * CAST(s[1].cnt AS DOUBLE)
                    + {1 - a} * (CAST(s[0].cnt AS DOUBLE)
                                 + CAST(s[1].cnt - s[0].cnt AS DOUBLE)))
                   - CAST(s[0].cnt AS DOUBLE))
                + {1 - b} * CAST(s[1].cnt - s[0].cnt AS DOUBLE) AS trend
        )),
        (acc, x) -> acc || array(struct(
            element_at(acc, -1).rn + 1 AS rn, x.day AS day, x.cnt AS cnt,
            {new_level} AS level,
            {b} * (({new_level}) - element_at(acc, -1).level)
                + {1 - b} * element_at(acc, -1).trend AS trend
        ))
    )
    """
    return (
        # the textbook init needs two observations; an empty/1-day series
        # yields no trace rows (and s[0]/s[1] must not be evaluated)
        series.filter(F.size("s") >= 2)
        .select(F.explode(F.expr(fold)).alias("r"))
        .select("r.rn", "r.day", "r.cnt", "r.level", "r.trend")
    )


# --------------------------------------------------------------------------
# mixture_budget_allocation — greedy quality-first token budgeting
# --------------------------------------------------------------------------

_MB_BUDGET_SHARE = 2  # budget = total_tokens // 2

_MB_TOKS = (
    "CAST(len(regexp_extract_all(text,"
    " '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]')) AS BIGINT)"
)


@register(
    "mixture_budget_allocation",
    f"""
WITH t AS (
    SELECT source, {_MB_TOKS} AS toks,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
    FROM documents
),
g AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS tokens_available,
           CAST(sum(en) AS BIGINT) AS c_en,
           CAST(count(*) AS BIGINT) AS c
    FROM t GROUP BY 1
),
tot AS (SELECT sum(tokens_available) // {_MB_BUDGET_SHARE} AS budget FROM g),
ranked AS (
    SELECT source, n_docs, tokens_available,
           CAST(c_en AS DOUBLE) / c AS en_share,
           CAST(coalesce(sum(tokens_available) OVER (
               ORDER BY CAST(c_en AS DOUBLE) / c DESC, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
    FROM g
)
SELECT source, n_docs, tokens_available,
       {_duck_round_half_up("en_share", 6)} AS en_share,
       CAST(greatest(least(tokens_available,
                           (SELECT budget FROM tot) - cum_before),
                     0) AS BIGINT) AS allocated_tokens,
       greatest(least(tokens_available,
                      (SELECT budget FROM tot) - cum_before), 0)
           < tokens_available AS truncated
FROM ranked
""",
)
def mixture_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy quality-first mixture allocation: rank document sources by
    English share (the quality proxy; ties broken by source name) and
    fill a token budget of half the corpus top-down — each source gets
    min(its tokens, remaining budget). This is the planner a training
    run consults to decide what actually gets sampled; the allocation
    is pure integer arithmetic over a deterministic ordering, so the
    driver hash pins the exact mixture, and sum(allocated) == budget
    whenever the budget binds (tested).

    100 TB shape: one scan to per-source sufficient statistics, a
    window over the SOURCE-cardinality table, broadcast scalar budget.
    Swapping the quality proxy for a learned per-source score is a
    one-column change on the same plan."""
    docs = _load_parallel(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        tx.token_count(F.col("text")).cast("long").alias("toks"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("en"),
    )
    g = t.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("tokens_available"),
        F.sum("en").cast("long").alias("c_en"),
        F.count("*").cast("long").alias("c"),
    )
    tot = g.agg(
        F.expr(f"sum(tokens_available) div {_MB_BUDGET_SHARE}").alias("budget")
    )
    en_share = F.col("c_en").cast("double") / F.col("c")
    w = Window.orderBy(en_share.desc(), F.col("source")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = g.select(
        "source",
        "n_docs",
        "tokens_available",
        en_share.alias("en_share_raw"),
        F.coalesce(F.sum("tokens_available").over(w), F.lit(0).cast("long"))
        .cast("long")
        .alias("cum_before"),
    ).join(F.broadcast(tot))
    alloc = F.greatest(
        F.least(
            F.col("tokens_available"), F.col("budget") - F.col("cum_before")
        ),
        F.lit(0).cast("long"),
    )
    return ranked.select(
        "source",
        "n_docs",
        "tokens_available",
        tx.round_half_up(F.col("en_share_raw"), 6).alias("en_share"),
        alloc.cast("long").alias("allocated_tokens"),
        (alloc < F.col("tokens_available")).alias("truncated"),
    )


# --------------------------------------------------------------------------
# er_merge_survivorship — the merge stage of the blocking ER flow
# --------------------------------------------------------------------------


@register(
    "er_merge_survivorship",
    f"""
WITH dirty AS (
    SELECT p_partkey, p_name FROM part
    UNION ALL
    SELECT p_partkey + 1000000, {_PH_TYPO_DUCK} AS p_name
    FROM part WHERE p_partkey % {_PH_TYPO_MOD} = 0
),
t AS (
    SELECT p_partkey, p_name, string_split(p_name, ' ') AS w FROM dirty
),
sig AS (
    SELECT p_name,
           {_phonetic_sql("w[1]", "duck")} || '-' || {_phonetic_sql("w[2]", "duck")} AS signature,
           count(*) AS n
    FROM t WHERE len(w) >= 2
    GROUP BY 1, 2
),
ranked AS (
    SELECT signature, p_name, n,
           row_number() OVER (PARTITION BY signature
                              ORDER BY n DESC, p_name) AS rk
    FROM sig
),
surv AS (SELECT signature, p_name AS survivor_name, n AS survivor_n
         FROM ranked WHERE rk = 1)
SELECT s.signature,
       CAST(sum(g.n) AS BIGINT) AS n_records,
       CAST(count(*) AS BIGINT) AS n_names,
       max(s.survivor_name) AS survivor_name,
       CAST(sum(g.n) - max(s.survivor_n) AS BIGINT) AS merged_records,
       CAST(max(levenshtein(s.survivor_name, g.p_name)) AS BIGINT)
           AS max_edit_distance
FROM sig g JOIN surv s USING (signature)
GROUP BY s.signature
""",
)
def er_merge_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge/survivorship stage of the entity-resolution flow: within
    each phonetic block (the same dirty registry + signatures as
    phonetic_blocking_pairs), the canonical surface form is the most
    frequent name (ties: lexicographically first), every other record
    merges into it, and ``max_edit_distance`` reports the block's merge
    radius — the QA number a steward checks before trusting the merge
    (a radius that jumps means the block key is over-merging).

    100 TB shape: records collapse to (signature, name) counts BEFORE
    any ranking — the survivorship window runs over the name-vocabulary
    table, not records — and the Levenshtein verify runs once per
    distinct (survivor, name) pair, not per record pair. The same
    collapse-then-decide discipline as the blocking census."""
    part = _load_parallel(spark, sf_dir, "part")
    typo = F.array_join(
        F.expr(
            "transform(split(p_name, ' '),"
            " x -> substring(x, 1, 1) || regexp_replace(substring(x, 2),"
            " '[aeiou]', ''))"
        ),
        " ",
    )
    dirty = part.select("p_partkey", "p_name").unionByName(
        part.filter(F.col("p_partkey") % _PH_TYPO_MOD == 0).select(
            (F.col("p_partkey") + 1000000).alias("p_partkey"),
            typo.alias("p_name"),
        )
    )
    t = dirty.select(
        "p_name", F.split(F.col("p_name"), " ").alias("w")
    ).filter(F.size("w") >= 2)
    sig = t.groupBy(
        "p_name",
        F.expr(
            f"{_phonetic_sql('w[0]')} || '-' || {_phonetic_sql('w[1]')}"
        ).alias("signature"),
    ).agg(F.count("*").alias("n"))
    w_rk = Window.partitionBy("signature").orderBy(
        F.col("n").desc(), F.col("p_name")
    )
    ranked = sig.select(
        "signature", "p_name", "n", F.row_number().over(w_rk).alias("rk")
    )
    surv = ranked.filter(F.col("rk") == 1).select(
        "signature",
        F.col("p_name").alias("survivor_name"),
        F.col("n").alias("survivor_n"),
    )
    return (
        sig.join(F.broadcast(surv), "signature")
        .groupBy("signature")
        .agg(
            F.sum("n").cast("long").alias("n_records"),
            F.count("*").cast("long").alias("n_names"),
            F.max("survivor_name").alias("survivor_name"),
            (F.sum("n") - F.max("survivor_n")).cast("long").alias("merged_records"),
            F.max(F.levenshtein(F.col("survivor_name"), F.col("p_name")))
            .cast("long")
            .alias("max_edit_distance"),
        )
    )
