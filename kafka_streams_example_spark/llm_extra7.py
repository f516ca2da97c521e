"""Eighth tranche: edit-distance dedup, behavioral analytics and
customer segmentation (round 3, part 5).

- neardup_levenshtein_pairs: banded edit-distance near-dup pairs — the
                           character-level dedup signal that catches
                           small in-place edits n-gram Jaccard dilutes.
- event_transition_matrix: first-order Markov transition counts and
                           conditional probabilities between event
                           types — behavioral modeling / next-event
                           prediction features.
- seasonal_residual_anomalies: anomalies vs an (event_type, ISO
                           weekday) seasonal baseline — the periodic
                           counterpart of the solar pipeline's
                           within-window z-score.
- rolling_active_users:    DAU / trailing-7-day WAU / stickiness per
                           day — the engagement triangle, computed with
                           an explode-to-equi-join instead of a range
                           join.
- orders_rfm_segmentation: recency/frequency/monetary quartile
                           segmentation of customers — the classic
                           marketing segmentation as a deterministic
                           window query.

Scale notes (100 TB shapes):
- the edit-distance join is banded: same (lang, source) block AND a
  length band wide enough that any pair within the length tolerance
  falls in same-or-adjacent bands; the probe side explodes into its 3
  neighboring bands, so matching is a pure equi-join (each qualifying
  ordered pair matches exactly once — no dedup pass) and levenshtein
  runs only on banded candidates, never block cross-products;
- the transition matrix shuffles once on user_id (lead inside user
  partitions); the conditional-probability window runs on the
  type x type aggregate;
- the seasonal baseline is a (type x weekday)-cardinality table
  broadcast back onto the fact scan — fences rounded before the
  division, zero-sigma cells yield NULL z on both engines;
- DAU/WAU reduces to distinct (user, day) FIRST (the corpus-scale
  aggregate), then explodes each row into the <=7 target days it
  contributes to — an equi-join shape, never a day-range theta-join;
- RFM ranks 3 customer-cardinality metrics; the monetary sum is rounded
  before ranking so float-summation order can't flip a quartile
  boundary between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.registry import _load_parallel, register

# --------------------------------------------------------------------------
# neardup_levenshtein_pairs — banded edit-distance near-dup
# --------------------------------------------------------------------------

_LEV_MAX = 10      # max edit distance
_LEN_TOL = 5       # max length difference (<= band width - 1 below)
_BAND = 8          # length band width


@register(
    "neardup_levenshtein_pairs",
    f"""
WITH d AS (
    SELECT doc_id, lang, source, text, length(text) AS n
    FROM documents WHERE text IS NOT NULL
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
FROM d a JOIN d b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE abs(a.n - b.n) <= {_LEN_TOL}
  AND levenshtein(a.text, b.text) <= {_LEV_MAX}
""",
)
def neardup_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup pairs: same (lang, source), length within
    5, edit distance <= 10 — catches short in-place edits (typo fixes,
    boilerplate substitutions) whose n-gram Jaccard stays deceptively
    high-entropy. Result set is identical to the brute in-block join the
    oracle runs; only the plan differs.

    100 TB shape: candidates come from an EQUI-join on
    (lang, source, length-band): the probe side explodes into bands
    {{b-1, b, b+1}} (band width 8 > length tolerance 5, so any
    qualifying pair is same-or-adjacent band and each ordered pair
    matches on exactly ONE band value — complete, and no dedup needed);
    levenshtein only ever runs on banded candidates, never on a block
    cross-product."""
    docs = (
        _load_parallel(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "lang",
            "source",
            "text",
            F.length("text").alias("n"),
            (F.length("text") / _BAND).cast("long").alias("band"),
        )
    )
    # lang/source are part of the JOIN KEY, not post-join filters: one
    # length band spans the whole corpus, so keying the shuffle on
    # (lang, source, band) is what keeps per-key candidate volume
    # block-sized instead of corpus-band-sized at 100 TB
    probe = docs.select(
        F.col("doc_id").alias("id_a"),
        "lang",
        "source",
        F.col("text").alias("text_a"),
        F.col("n").alias("n_a"),
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("probe_band"),
    )
    build = docs.select(
        F.col("doc_id").alias("id_b"),
        "lang",
        "source",
        F.col("text").alias("text_b"),
        F.col("n").alias("n_b"),
        F.col("band").alias("probe_band"),
    )
    return (
        probe.join(
            build,
            ["probe_band", "lang", "source"],
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("n_a") - F.col("n_b")) <= _LEN_TOL)
        )
        .withColumn("edit_dist", F.levenshtein("text_a", "text_b"))
        .filter(F.col("edit_dist") <= _LEV_MAX)
        .select("id_a", "id_b", F.col("edit_dist").cast("bigint").alias("edit_dist"))
    )


# --------------------------------------------------------------------------
# event_transition_matrix — first-order Markov transitions
# --------------------------------------------------------------------------


@register(
    "event_transition_matrix",
    """
WITH seq AS (
    SELECT event_type AS cur,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
    FROM events
),
c AS (
    SELECT cur, nxt, count(*) AS n FROM seq
    WHERE nxt IS NOT NULL GROUP BY 1, 2
)
SELECT cur, nxt, CAST(n AS BIGINT) AS n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY cur), 6) AS p
FROM c
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: count and conditional probability P(next | current) for
    every observed event-type transition — next-event-prediction
    features and the drift signal for behavioral monitoring.

    100 TB shape: one shuffle on user_id (lead inside bounded user
    partitions), then a type x type aggregate; the row-normalizing
    window runs over those few aggregate rows."""
    ev = _load_parallel(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    c = seq.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    wr = Window.partitionBy("cur")
    return c.select(
        "cur",
        "nxt",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") * 1.0 / F.sum("n").over(wr), 6).alias("p"),
    )


# --------------------------------------------------------------------------
# seasonal_residual_anomalies — anomalies vs a periodic baseline
# --------------------------------------------------------------------------


@register(
    "seasonal_residual_anomalies",
    """
WITH slotted AS (
    SELECT event_id, event_type, value,
           CAST(isodow(ts) AS BIGINT) AS dow
    FROM events
),
base AS (
    SELECT event_type, dow,
           round(avg(value), 6) AS mu,
           round(stddev_pop(value), 6) AS sigma
    FROM slotted GROUP BY 1, 2
)
SELECT s.event_id, s.event_type, s.dow, s.value, b.mu, b.sigma,
       round((s.value - b.mu) / nullif(b.sigma, 0.0), 6) AS z
FROM slotted s JOIN base b USING (event_type, dow)
WHERE abs(s.value - b.mu) > 3 * nullif(b.sigma, 0.0)
""",
)
def seasonal_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events anomalous against their (event_type, ISO weekday,
    hour-of-day) seasonal baseline: |value − μ_slot| > 3σ_slot — the
    periodicity-aware counterpart of the solar pipeline's within-window
    z-score, catching values that are normal globally but wrong for
    a Sunday. (An hour-of-day slotting is one groupBy key away; weekday
    granularity keeps every slot populated even at tiny test scales.)

    100 TB shape: the baseline is a (type x 7 x 24)-cardinality table
    broadcast onto a second fact scan; μ/σ are rounded to 6 decimals
    BEFORE the residual math so both engines compare identical doubles,
    and zero-σ slots yield NULL (no anomaly) on both engines."""
    ev = _load_parallel(spark, sf_dir, "events")
    slotted = ev.select(
        "event_id",
        "event_type",
        "value",
        F.expr("CAST(((dayofweek(ts) + 5) % 7) + 1 AS BIGINT)").alias("dow"),
    )
    base = slotted.groupBy("event_type", "dow").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_pop("value"), 6).alias("sigma"),
    )
    j = slotted.join(F.broadcast(base), ["event_type", "dow"])
    sigma = F.nullif(F.col("sigma"), F.lit(0.0))
    return j.filter(F.abs(F.col("value") - F.col("mu")) > 3 * sigma).select(
        "event_id",
        "event_type",
        "dow",
        "value",
        "mu",
        "sigma",
        F.round((F.col("value") - F.col("mu")) / sigma, 6).alias("z"),
    )


# --------------------------------------------------------------------------
# rolling_active_users — DAU / trailing WAU / stickiness
# --------------------------------------------------------------------------


@register(
    "rolling_active_users",
    """
WITH active AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
contrib AS (
    SELECT user_id,
           unnest(generate_series(day, day + INTERVAL 6 DAY,
                                  INTERVAL 1 DAY)) AS day
    FROM active
),
wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM contrib GROUP BY 1),
dau AS (SELECT day, count(*) AS dau FROM active GROUP BY 1)
SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
       round(d.dau * 1.0 / w.wau, 6) AS stickiness
FROM dau d JOIN wau w USING (day)
""",
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, trailing-7-day weekly active users and the
    DAU/WAU stickiness ratio per observed day — the engagement triangle.

    100 TB shape: the corpus reduces to distinct (user, day) FIRST (one
    map-side-combined shuffle); each of those bounded rows then explodes
    into the <=7 later days it contributes to, turning the trailing
    window into a plain equi-join aggregate — no day-range theta-join,
    no repeated 7-day re-scans."""
    ev = _load_parallel(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    contrib = active.select(
        "user_id",
        F.explode(F.expr("sequence(day, day + interval 6 day, interval 1 day)")).alias(
            "day"
        ),
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    dau = active.groupBy("day").agg(F.count("*").alias("dau"))
    return dau.join(wau, "day").select(
        "day",
        F.col("dau").cast("bigint").alias("dau"),
        F.col("wau").cast("bigint").alias("wau"),
        F.round(F.col("dau") * 1.0 / F.col("wau"), 6).alias("stickiness"),
    )


# --------------------------------------------------------------------------
# orders_rfm_segmentation — recency/frequency/monetary quartiles
# --------------------------------------------------------------------------


@register(
    "orders_rfm_segmentation",
    """
WITH rfm AS (
    SELECT o_custkey AS custkey,
           max(o_orderdate) AS last_order,
           count(*) AS frequency,
           round(sum(o_totalprice), 4) AS monetary
    FROM orders GROUP BY 1
)
SELECT custkey, last_order,
       CAST(frequency AS BIGINT) AS frequency,
       monetary,
       CAST(ntile(4) OVER (ORDER BY last_order, custkey) AS BIGINT) AS r_quartile,
       CAST(ntile(4) OVER (ORDER BY frequency, custkey) AS BIGINT) AS f_quartile,
       CAST(ntile(4) OVER (ORDER BY monetary, custkey) AS BIGINT) AS m_quartile
FROM rfm
""",
)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, last order date (recency), order
    count (frequency) and rounded total spend (monetary), each ranked
    into quartiles — the classic marketing segmentation, deterministic
    by construction (every ntile ordering carries custkey as the final
    tiebreak, and the monetary sum is rounded BEFORE ranking so float
    summation order can't flip a quartile boundary between engines).

    100 TB shape: one shuffle into the customer-cardinality RFM
    aggregate; the three ntile windows rank that aggregate, not the
    fact table."""
    o = _load_parallel(spark, sf_dir, "orders")
    rfm = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 4).alias("monetary"),
    )
    return rfm.select(
        "custkey",
        "last_order",
        F.col("frequency").cast("bigint").alias("frequency"),
        "monetary",
        F.ntile(4)
        .over(Window.orderBy("last_order", "custkey"))
        .cast("bigint")
        .alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy("frequency", "custkey"))
        .cast("bigint")
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy("monetary", "custkey"))
        .cast("bigint")
        .alias("m_quartile"),
    )
