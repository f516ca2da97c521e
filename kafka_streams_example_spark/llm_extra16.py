"""Seventeenth query tranche: sketch algebra and series diagnostics a
100 TB pipeline runs continuously — a Count-Min sketch with an exact
heavy-hitter audit, KMV/theta set operations (union AND intersection
estimates across segments), a Benford first-digit fraud screen, an
autocorrelation profile and a CUSUM changepoint scan over the daily
series, the hashing-trick sparse featurizer, and a calibration audit of
the fixed-weight quality classifier.

All seven are fully oracle-checked: every "probabilistic" quantity is a
deterministic function of md5-derived hashes or plan-literal constants,
so the sketches reproduce bit-exactly on both engines (the same
discipline as llm_extra15's Bloom/KMV queries).

Reference parity note: the reference engine (Kafka Streams DSL,
SolarConsumer.java) has no analogue — these extend the engine toward the
LLM-data-pipeline north star (SURVEY.md §2, beyond-reference table).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_example_spark.registry import (
    _TOKS,
    ORACLES,
    _load_parallel,
    register,
)

# --------------------------------------------------------------------------
# countmin_heavy_hitters — Count-Min sketch + exact heavy-hitter audit
# --------------------------------------------------------------------------

_CM_D = 4  # hash rows
_CM_W = 64  # counters per row
_CM_TOPK = 20


def _spark_cm_pos(tok, d: int):
    """Counter position for hash row d: md5-derived 60-bit value mod w —
    the engine-portable flavor (functions/hashing.py:stable_long)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cm{d}:"), tok)), 1, 15), 16, 10
        ).cast("long")
        % _CM_W
    )


def _duck_cm_pos(tok: str, d: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('cm' || {d} || ':' || {tok}), 1, 15)) AS BIGINT)"
        f" % {_CM_W}"
    )


@register(
    "countmin_heavy_hitters",
    f"""
WITH tok AS (
    SELECT unnest({_TOKS}) AS token FROM documents
),
counts AS (
    SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token
),
cells AS (
    SELECT d.d, {_duck_cm_pos("token", "d.d")} AS pos, sum(cnt) AS cell
    FROM counts, (SELECT unnest(generate_series(0, {_CM_D - 1})) AS d) d
    GROUP BY d.d, pos
),
topk AS (
    SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT {_CM_TOPK}
),
probe_pos AS (
    SELECT t.token, t.cnt, d.d, {_duck_cm_pos("t.token", "d.d")} AS pos
    FROM topk t
    CROSS JOIN (SELECT unnest(generate_series(0, {_CM_D - 1})) AS d) d
),
probe AS (
    SELECT p.token, p.cnt, min(c.cell) AS est
    FROM probe_pos p JOIN cells c ON c.d = p.d AND c.pos = p.pos
    GROUP BY p.token, p.cnt
)
SELECT token,
       cnt AS exact_count,
       CAST(est AS BIGINT) AS cm_estimate,
       CAST(est - cnt AS BIGINT) AS overcount,
       est >= cnt AS never_undercounts
FROM probe
""",
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005, public method)
    over the corpus token stream, audited against exact counts for the
    top-{_CM_TOPK} heavy hitters: every token increments d={_CM_D}
    counters (one per hash row, w={_CM_W} wide), a probe reads the MIN
    of its {_CM_D} counters, and the defining one-sided guarantee —
    estimate >= true count, always — is emitted as a column the oracle
    pins TRUE.

    Scale shape: the sketch is a FIXED d*w = {_CM_D * _CM_W}-cell
    aggregate with map-side combine (the groupBy key space is bounded,
    so partial aggregation collapses each partition to <= d*w rows
    before the exchange), mergeable across shards by cell-wise sum —
    the standard mergeable-summary layout. The probe set (top-k via
    TakeOrderedAndProject) and the cell table both broadcast; nothing
    wide shuffles twice. The exact `counts` CTE is the audit twin — a
    production run publishes only the sketch."""
    docs = _load_parallel(spark, sf_dir, "documents")
    from kafka_streams_example_spark.operators import text as tx

    counts = (
        docs.select(F.explode(tx.tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    counts = counts.cache()
    ds = F.explode(F.array(*[F.lit(d) for d in range(_CM_D)])).alias("d")

    def pos_for_d(tok):
        expr = F.when(F.col("d") == 0, _spark_cm_pos(tok, 0))
        for d in range(1, _CM_D - 1):
            expr = expr.when(F.col("d") == d, _spark_cm_pos(tok, d))
        return expr.otherwise(_spark_cm_pos(tok, _CM_D - 1))

    cells = (
        counts.select("token", "cnt", ds)
        .select("d", pos_for_d(F.col("token")).alias("pos"), "cnt")
        .groupBy("d", "pos")
        .agg(F.sum("cnt").alias("cell"))
    )
    topk = counts.orderBy(F.col("cnt").desc(), "token").limit(_CM_TOPK)
    probed = (
        topk.select("token", "cnt", ds)
        .select("token", "cnt", "d", pos_for_d(F.col("token")).alias("pos"))
        .join(F.broadcast(cells), ["d", "pos"])
        .groupBy("token", "cnt")
        .agg(F.min("cell").alias("est"))
    )
    return probed.select(
        "token",
        F.col("cnt").alias("exact_count"),
        F.col("est").cast("long").alias("cm_estimate"),
        (F.col("est") - F.col("cnt")).cast("long").alias("overcount"),
        (F.col("est") >= F.col("cnt")).alias("never_undercounts"),
    )


# --------------------------------------------------------------------------
# theta_sketch_set_ops — KMV union + intersection estimates across segments
# --------------------------------------------------------------------------

_TH_K = 32
_TH_SPACE = float(1 << 60)

_DUCK_UDAY = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '@' || "
    "CAST(CAST(floor(epoch(ts) / 86400) AS BIGINT) AS VARCHAR)), 1, 15)) AS BIGINT)"
)


@register(
    "theta_sketch_set_ops",
    f"""
WITH ha AS (
    SELECT DISTINCT {_DUCK_UDAY} AS h FROM events WHERE event_type = 'click'
),
hb AS (
    SELECT DISTINCT {_DUCK_UDAY} AS h FROM events WHERE event_type = 'purchase'
),
hu AS (SELECT h FROM ha UNION SELECT h FROM hb),
sk AS (SELECT h FROM hu ORDER BY h LIMIT {_TH_K}),
kth AS (SELECT max(h) AS h_k, CAST(count(*) AS BIGINT) AS k_seen FROM sk),
flags AS (
    SELECT count(*) FILTER (WHERE a.h IS NOT NULL AND b.h IS NOT NULL)
               AS c_both
    FROM sk LEFT JOIN ha a ON sk.h = a.h LEFT JOIN hb b ON sk.h = b.h
),
ex AS (
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM hu) AS exact_union,
           (SELECT CAST(count(*) AS BIGINT)
            FROM ha JOIN hb ON ha.h = hb.h) AS exact_inter
),
est AS (
    SELECT kth.k_seen, f.c_both, e.exact_union, e.exact_inter,
           CASE WHEN kth.k_seen < {_TH_K} THEN CAST(kth.k_seen AS DOUBLE)
                ELSE ({_TH_K} - 1) / (kth.h_k / {_TH_SPACE!r}) END AS u_raw
    FROM kth, flags f, ex e
)
SELECT CAST({_TH_K} AS BIGINT) AS k,
       k_seen,
       exact_union,
       round(u_raw, 2) AS est_union,
       exact_inter,
       round(c_both / CAST(k_seen AS DOUBLE) * u_raw, 2) AS est_inter,
       round(abs(u_raw - exact_union) / exact_union, 6) AS union_rel_err,
       abs(u_raw - exact_union) / exact_union <= 3.0 / sqrt({_TH_K})
           AS union_within_bound
FROM est
""",
)
def theta_sketch_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/KMV sketch SET OPERATIONS (Dasgupta et al., the public
    theta-sketch framework): estimate the distinct-count of the UNION
    and the INTERSECTION of two segments — daily-active (user, day)
    keys for clicks vs purchases — from two k={_TH_K} minimum-value
    sketches, without ever computing the exact sets together. Union:
    the k smallest of the merged sketch gives (k-1)/theta. Intersection:
    the fraction of the union sketch's hashes present in BOTH sides
    scales the union estimate (the standard theta-intersection rule).
    Small-cardinality regime (k_seen < k) falls back to the exact
    observed count, like kmv_distinct_sketch.

    Both estimates are deterministic functions of the md5 hash values,
    so the oracle reproduces them exactly; the exact union/intersection
    columns are the audit twins, and the union's ~1/sqrt(k) error bound
    is pinned as a boolean (3 sigma).

    Scale shape: each side's sketch is a TakeOrderedAndProject top-k
    over distinct 60-bit hashes (hash-only shuffle, no raw keys); the
    union sketch and membership flags operate on <= 2k rows, broadcast.
    Sketches are mergeable — per-shard sketches union by re-taking the
    k smallest, which is how the 100 TB path would roll segments up."""
    events = _load_parallel(spark, sf_dir, "events")
    uday = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit("@"),
                    F.floor(F.col("ts").cast("long") / 86400)
                    .cast("long")
                    .cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    ha = (
        events.filter(F.col("event_type") == "click")
        .select(uday.alias("h"))
        .distinct()
    )
    hb = (
        events.filter(F.col("event_type") == "purchase")
        .select(uday.alias("h"))
        .distinct()
    )
    ha = ha.cache()
    hb = hb.cache()
    hu = ha.union(hb).distinct()
    sk = hu.orderBy("h").limit(_TH_K)
    kth = sk.agg(
        F.max("h").alias("h_k"), F.count("*").cast("long").alias("k_seen")
    )
    flags = (
        sk.join(ha.withColumn("in_a", F.lit(1)), "h", "left")
        .join(hb.withColumn("in_b", F.lit(1)), "h", "left")
        .agg(
            F.count(
                F.when(F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1)
            )
            .cast("long")
            .alias("c_both")
        )
    )
    ex_u = hu.agg(F.count("*").cast("long").alias("exact_union"))
    ex_i = ha.join(hb, "h").agg(F.count("*").cast("long").alias("exact_inter"))
    u_raw = F.when(
        F.col("k_seen") < _TH_K, F.col("k_seen").cast("double")
    ).otherwise(F.lit(float(_TH_K - 1)) / (F.col("h_k") / F.lit(_TH_SPACE)))
    rel = F.abs(u_raw - F.col("exact_union")) / F.col("exact_union")
    return (
        kth.crossJoin(F.broadcast(flags))
        .crossJoin(F.broadcast(ex_u))
        .crossJoin(F.broadcast(ex_i))
        .select(
            F.lit(_TH_K).cast("long").alias("k"),
            "k_seen",
            "exact_union",
            F.round(u_raw, 2).alias("est_union"),
            "exact_inter",
            F.round(
                F.col("c_both") / F.col("k_seen").cast("double") * u_raw, 2
            ).alias("est_inter"),
            F.round(rel, 6).alias("union_rel_err"),
            (rel <= 3.0 / (_TH_K**0.5)).alias("union_within_bound"),
        )
    )


# --------------------------------------------------------------------------
# benford_first_digit — first-significant-digit distribution audit
# --------------------------------------------------------------------------

# Benford expected shares log10(1 + 1/d), precomputed once and embedded as
# identical double literals in BOTH engines' plans.
_BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}
_DUCK_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_P.items())
    + " END"
)


@register(
    "benford_first_digit",
    f"""
WITH d AS (
    SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                1, 1) AS BIGINT) AS digit
    FROM orders
),
obs AS (
    SELECT digit, CAST(count(*) AS BIGINT) AS n_orders FROM d GROUP BY digit
),
tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n FROM obs)
SELECT digit,
       n_orders,
       round(n_orders / CAST(t.n AS DOUBLE), 6) AS obs_share,
       round({_DUCK_BENFORD_CASE}, 6) AS benford_share,
       round(pow(n_orders - t.n * ({_DUCK_BENFORD_CASE}), 2)
             / (t.n * ({_DUCK_BENFORD_CASE})), 6) AS chi2_term
FROM obs, tot t
""",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    data-quality / fraud screen a pipeline runs on any monetary or
    count-like column: the observed share of each leading digit vs the
    Benford expectation log10(1+1/d), with the per-digit chi-square
    term (obs - exp)^2 / exp so the consumer can threshold the sum.

    The first digit comes from the decimal string of floor(x) — integer
    string formatting is exact and identical on both engines, where a
    log10-based digit extraction could disagree at power-of-ten
    boundaries. The Benford shares are Python-precomputed literals
    baked into both plans.

    Scale: one map-only digit extraction + a 9-group aggregate with
    map-side combine; the grand total broadcasts back. No wide shuffle
    at any size."""
    orders = _load_parallel(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("long")
    obs = (
        orders.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )
    tot = obs.agg(F.sum("n_orders").cast("long").alias("n"))
    p = None
    for d, pv in _BENFORD_P.items():
        cond = (F.col("digit") == d, F.lit(pv))
        p = F.when(*cond) if p is None else p.when(*cond)
    exp_cnt = F.col("n") * p
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_orders",
        F.round(F.col("n_orders") / F.col("n").cast("double"), 6).alias(
            "obs_share"
        ),
        F.round(p, 6).alias("benford_share"),
        F.round(
            F.pow(F.col("n_orders") - exp_cnt, 2) / exp_cnt, 6
        ).alias("chi2_term"),
    )


# --------------------------------------------------------------------------
# acf_daily_events — autocorrelation profile of the daily activity series
# --------------------------------------------------------------------------

_ACF_MAX_LAG = 7

_DUCK_DAILY = """
    SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS x
    FROM events GROUP BY day
"""


@register(
    "acf_daily_events",
    f"""
WITH series AS ({_DUCK_DAILY}),
stats AS (
    SELECT avg(x) AS mu,
           sum(pow(x - (SELECT avg(x) FROM series), 2)) AS denom
    FROM series
),
lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
pairs AS (
    SELECT l.lag, a.x AS xa, b.x AS xb
    FROM lags l
    JOIN series a ON TRUE
    JOIN series b ON b.day = a.day + l.lag
)
SELECT p.lag,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(sum((p.xa - s.mu) * (p.xb - s.mu)) / s.denom, 6) AS acf
FROM pairs p, stats s
GROUP BY p.lag, s.denom
""",
)
def acf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation profile (lags 1..{_ACF_MAX_LAG}) of the daily
    event-count series — the seasonality fingerprint a pipeline computes
    before choosing rollup windows or detecting weekly cycles:
    r_k = sum((x_t - mu)(x_t+k - mu)) / sum((x_t - mu)^2), the standard
    sample ACF with the full-series denominator.

    Scale shape: the raw table collapses to one row per day in a single
    map-side-combined aggregate (the ONLY pass over the events table);
    every subsequent step — mean/denominator, the lag self-join (an
    equi-join on day+lag over the exploded 1..{_ACF_MAX_LAG} lag set),
    and the per-lag reduction — operates on the tiny daily series, which
    broadcasts. Day bucketing uses tz-independent epoch days."""
    events = _load_parallel(spark, sf_dir, "events")
    series = (
        events.select(
            F.floor(F.col("ts").cast("long") / 86400).cast("long").alias("day")
        )
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("x"))
    )
    series = series.cache()
    # denom must use the same mu both engines derive: avg over exact longs
    mu_df = series.agg(F.avg("x").alias("mu"))
    denom_df = series.crossJoin(F.broadcast(mu_df)).agg(
        F.sum(F.pow(F.col("x") - F.col("mu"), 2)).alias("denom")
    )
    lags = F.explode(
        F.array(*[F.lit(k) for k in range(1, _ACF_MAX_LAG + 1)])
    ).alias("lag")
    a = series.select(F.col("day").alias("da"), F.col("x").alias("xa"), lags)
    b = series.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    pairs = a.join(
        F.broadcast(b), F.col("db") == F.col("da") + F.col("lag")
    )
    return (
        pairs.crossJoin(F.broadcast(mu_df))
        .crossJoin(F.broadcast(denom_df))
        .groupBy("lag", "denom")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(
                F.sum((F.col("xa") - F.col("mu")) * (F.col("xb") - F.col("mu")))
                / F.col("denom"),
                6,
            ).alias("acf"),
        )
        .select("lag", "n_pairs", "acf")
    )


# --------------------------------------------------------------------------
# cusum_changepoint — CUSUM drift scan over the daily series
# --------------------------------------------------------------------------


@register(
    "cusum_changepoint",
    f"""
WITH series AS ({_DUCK_DAILY}),
stats AS (
    SELECT avg(x) AS mu,
           sqrt(sum(pow(x - (SELECT avg(x) FROM series), 2)) / count(*))
               AS sigma
    FROM series
),
dev AS (
    SELECT s.day, s.x, st.sigma,
           s.x - st.mu - 0.5 * st.sigma AS d
    FROM series s, stats st
),
cum AS (
    SELECT day, x, sigma,
           sum(d) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run
    FROM dev
),
cusum AS (
    SELECT day, x, sigma, run,
           run - least(0.0, min(run) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_pos
    FROM cum
)
SELECT day, x,
       round(s_pos, 6) AS cusum_pos,
       round(s_pos - 4.0 * sigma, 6) > 0.0 AS alarm
FROM cusum
""",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint scan (Page 1954, public method) over
    the daily event-count series: accumulate deviations above
    mu + 0.5*sigma and alarm when the positive CUSUM statistic exceeds
    4*sigma — the standard drift detector a pipeline runs on ingest
    volume to catch upstream breakage.

    The textbook recursion s_t = max(0, s_t-1 + dev_t) is not a plain
    window aggregate, but it EQUALS run_t - min(0, min_i<=t run_i) where
    run is the ordinary cumulative sum — so both engines compute it with
    two stock window functions over the day-ordered series (identical
    left-to-right fold order => identical doubles), no recursion, no
    UDF. The alarm threshold compares the 6dp-rounded difference, per
    the cross-engine threshold discipline.

    Scale: one map-side-combined aggregate collapses events to the daily
    series; the windows run over that tiny series in a single partition
    — the correct plan, since the series is one row per day regardless
    of input size."""
    from pyspark.sql import Window

    events = _load_parallel(spark, sf_dir, "events")
    series = (
        events.select(
            F.floor(F.col("ts").cast("long") / 86400).cast("long").alias("day")
        )
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("x"))
    )
    series = series.cache()
    mu_df = series.agg(F.avg("x").alias("mu"))
    sig_df = (
        series.crossJoin(F.broadcast(mu_df))
        .agg(
            F.sqrt(
                F.sum(F.pow(F.col("x") - F.col("mu"), 2)) / F.count("*")
            ).alias("sigma")
        )
    )
    dev = (
        series.crossJoin(F.broadcast(mu_df))
        .crossJoin(F.broadcast(sig_df))
        .select(
            "day",
            "x",
            "sigma",
            (F.col("x") - F.col("mu") - 0.5 * F.col("sigma")).alias("d"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = dev.withColumn("run", F.sum("d").over(w))
    s_pos = F.col("run") - F.least(F.lit(0.0), F.min("run").over(w))
    return cum.select(
        "day",
        "x",
        F.round(s_pos, 6).alias("cusum_pos"),
        (F.round(s_pos - 4.0 * F.col("sigma"), 6) > 0.0).alias("alarm"),
    )


# --------------------------------------------------------------------------
# feature_hashing_sparse — hashing-trick sparse featurizer
# --------------------------------------------------------------------------

_FH_DIM = 16


@register(
    "feature_hashing_sparse",
    f"""
WITH tok AS (
    SELECT doc_id, unnest({_TOKS}) AS token FROM documents
),
mapped AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5('fh:' || token), 1, 15)) AS BIGINT)
               % {_FH_DIM} AS dim,
           CASE WHEN CAST(('0x' || substr(md5('fs:' || token), 1, 15))
                     AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sign
    FROM tok
)
SELECT doc_id, CAST(dim AS BIGINT) AS dim,
       CAST(sum(sign) AS BIGINT) AS weight
FROM mapped
GROUP BY doc_id, dim
""",
)
def feature_hashing_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer (Weinberger et al. 2009, public method):
    each token hashes to one of {_FH_DIM} buckets with a +-1 sign from an
    independent hash, and the per-(doc, bucket) signed counts form the
    sparse feature vector — the fixed-width, vocabulary-free text
    representation downstream linear models train on at corpus scale
    (no vocab table to build, ship, or version).

    Output is the sparse COO layout (doc_id, dim, weight) — the honest
    representation at 100 TB, where a dense 2^20-wide row would be
    mostly zeros. Sign cancellation CAN produce explicit zero weights
    for a touched bucket; they stay in the output (both engines emit the
    same groups).

    Scale shape: bucket and sign are computed MAP-SIDE from each token,
    so only (doc_id, dim, sign) ints cross the exchange — never token
    strings — and partial aggregation combines the <= {_FH_DIM} buckets
    per doc before the shuffle. One shuffle total, keyed (doc_id, dim)."""
    docs = _load_parallel(spark, sf_dir, "documents")
    from kafka_streams_example_spark.operators import text as tx

    tok = docs.select(
        "doc_id", F.explode(tx.tokens(F.lower(F.col("text")))).alias("token")
    )
    dim = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("fh:"), F.col("token"))), 1, 15),
            16,
            10,
        ).cast("long")
        % _FH_DIM
    )
    sign = F.when(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("fs:"), F.col("token"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        tok.select("doc_id", dim.alias("dim"), sign.alias("sign"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("sign").cast("long").alias("weight"))
        .select("doc_id", F.col("dim").cast("long").alias("dim"), "weight")
    )


# --------------------------------------------------------------------------
# score_calibration_bins — calibration audit of the quality classifier
# --------------------------------------------------------------------------


@register(
    "score_calibration_bins",
    f"""
WITH q AS ({{logreg}}),
lab AS (
    SELECT q.doc_id, q.quality_prob, d.lang = 'en' AS is_en
    FROM q JOIN documents d ON q.doc_id = d.doc_id
),
binned AS (
    SELECT least(CAST(floor(quality_prob * 10.0) AS BIGINT), 9) AS bin,
           quality_prob,
           CASE WHEN is_en THEN 1.0 ELSE 0.0 END AS y
    FROM lab
)
SELECT bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(quality_prob), 6) AS mean_prob,
       round(avg(y), 6) AS frac_en,
       round(avg(quality_prob) - avg(y), 6) AS calibration_gap
FROM binned
GROUP BY bin
""",
)
def score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit of the fixed-weight quality classifier
    (llm_extra15.quality_logreg_score) against a deterministic proxy
    label (is-English): docs bucket into deciles of the 6dp-rounded
    predicted probability, and each bin reports its mean prediction vs
    the empirical label rate — the reliability-diagram table every
    model-in-the-loop data pipeline publishes before trusting a scorer
    to gate 100 TB of training data.

    The Spark side CALLS the registered classifier query and the oracle
    INLINES the classifier's registered SQL — the two can never drift
    apart, the same composition discipline as the solar-topology CTEs.

    Scale: the classifier is map-only; the decile histogram is a
    10-group aggregate with map-side combine. The doc join is by key
    (doc_id), pruned to two columns."""
    from kafka_streams_example_spark.registry import QUERIES

    q = QUERIES["quality_logreg_score"](spark, sf_dir).select(
        "doc_id", "quality_prob"
    )
    docs = _load_parallel(spark, sf_dir, "documents").select("doc_id", "lang")
    lab = q.join(docs, "doc_id").select(
        "quality_prob", (F.col("lang") == "en").alias("is_en")
    )
    binned = lab.select(
        F.least(
            F.floor(F.col("quality_prob") * 10.0).cast("long"), F.lit(9)
        ).alias("bin"),
        "quality_prob",
        F.when(F.col("is_en"), 1.0).otherwise(0.0).alias("y"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("quality_prob"), 6).alias("mean_prob"),
        F.round(F.avg("y"), 6).alias("frac_en"),
        F.round(F.avg("quality_prob") - F.avg("y"), 6).alias(
            "calibration_gap"
        ),
    )


# Inline the classifier's registered oracle so the calibration oracle can
# never drift from the scorer it audits.
ORACLES["score_calibration_bins"] = ORACLES["score_calibration_bins"].format(
    logreg=ORACLES["quality_logreg_score"]
)
