"""Twenty-second query tranche: survival / hypothesis-test / sketch-
compression statistics — a Kaplan-Meier estimator of signup→purchase
conversion (right-censored at the study horizon), a Mann-Whitney U test
(tie-corrected, from integer sufficient statistics) comparing English
vs non-English document lengths, and a b-bit MinHash audit that
measures how much Jaccard accuracy survives 1-bit signature compression
(the Li & König trick that shrinks sketch storage 32× at planet scale).

All ranks/counts stay integral (midranks doubled, as roc_auc_quality);
the KM product runs as an ordered log-sum window over the bounded
day-grain series; b-bit estimates are exact rationals over the 32
permutations. Transcendental sums follow the chisq precedent (bounded
series, native 6dp round).

Reference parity note: the reference engine (Kafka Streams DSL,
SolarConsumer.java) has no analogue — these extend the engine toward
the LLM-data-pipeline north star (SURVEY.md §2, beyond-reference
table). b-bit minwise hashing: Li & König, WWW 2010.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.registry import (
    _TOKS,
    _load_parallel,
    register,
)

# --------------------------------------------------------------------------
# kaplan_meier_conversion — signup→purchase survival with right censoring
# --------------------------------------------------------------------------


@register(
    "kaplan_meier_conversion",
    """
WITH s AS (
    SELECT user_id, min(floor(epoch(ts))) AS s0
    FROM events WHERE event_type = 'signup' GROUP BY 1
),
p AS (
    SELECT e.user_id, min(floor(epoch(e.ts))) AS p0
    FROM events e JOIN s ON e.user_id = s.user_id
    WHERE e.event_type = 'purchase' AND floor(epoch(e.ts)) > s.s0
    GROUP BY 1
),
h AS (SELECT max(floor(epoch(ts))) AS horizon FROM events),
dur AS (
    SELECT s.user_id,
           CASE WHEN p.p0 IS NOT NULL THEN 1 ELSE 0 END AS ev,
           CAST(floor((coalesce(p.p0, h.horizon) - s.s0) / 86400.0) AS BIGINT) AS day
    FROM s LEFT JOIN p ON s.user_id = p.user_id CROSS JOIN h
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dur),
byday AS (
    SELECT day,
           CAST(sum(ev) AS BIGINT) AS n_events,
           CAST(sum(1 - ev) AS BIGINT) AS n_censored
    FROM dur GROUP BY 1
),
risk AS (
    SELECT day, n_events, n_censored,
           (SELECT n FROM tot)
           - CAST(coalesce(sum(n_events + n_censored) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS n_risk
    FROM byday
),
surv AS (
    SELECT day, n_risk, n_events, n_censored,
           sum(CASE WHEN n_events > 0 AND n_events < n_risk
                    THEN ln(1.0 - CAST(n_events AS DOUBLE) / n_risk)
                    ELSE 0.0 END)
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS lsum,
           max(CASE WHEN n_events >= n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS absorbed
    FROM risk
)
SELECT day, n_risk, n_events, n_censored,
       CASE WHEN absorbed = 1 THEN 0.0 ELSE round(exp(lsum), 6) END AS survival
FROM surv
""",
)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier estimator of time-to-first-purchase after signup:
    users with a signup enter the study at their first signup second;
    the event is their first later purchase; everyone else is
    right-censored at the study horizon (the corpus max timestamp).
    S(t) = prod over event days u <= t of (1 - d_u/n_u), computed as an
    ordered log-sum window over the bounded day-grain series so both
    engines accumulate in the identical order (exp of the running sum —
    a day where d = n drives S to exactly 0 via ln(0) = -inf on both
    engines). Censoring-only days appear as rows (they shrink n_risk)
    with S unchanged — the standard KM table shape.

    100 TB shape: per-user entry/event times are two min-aggregates
    keyed on user (map-side combined), the duration table is one row
    per user, and everything after is day-grain — the window runs over
    the bounded study-length series, never over users."""
    ev = _load_parallel(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("long").alias("sec")
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("sec").alias("s0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("sec") > F.col("s0"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("p0"))
    )
    h = ev.agg(F.max("sec").alias("horizon"))
    dur = (
        s.join(p, "user_id", "left")
        .join(F.broadcast(h))
        .select(
            F.col("p0").isNotNull().cast("int").alias("ev"),
            F.floor(
                (F.coalesce(F.col("p0"), F.col("horizon")) - F.col("s0")) / 86400.0
            )
            .cast("long")
            .alias("day"),
        )
    )
    tot = dur.agg(F.count("*").alias("n"))
    byday = dur.groupBy("day").agg(
        F.sum("ev").cast("long").alias("n_events"),
        F.sum(1 - F.col("ev")).cast("long").alias("n_censored"),
    )
    w_before = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    risk = byday.join(F.broadcast(tot)).select(
        "day",
        "n_events",
        "n_censored",
        (
            F.col("n")
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(w_before),
                F.lit(0).cast("long"),
            )
        )
        .cast("long")
        .alias("n_risk"),
    )
    w_run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    # a day where every remaining subject converts drives S to exactly 0;
    # model it as an absorbing flag instead of ln(0) (DuckDB raises on
    # ln(0) where Spark yields -Inf — the flag keeps both engines exact)
    lterm = F.when(
        (F.col("n_events") > 0) & (F.col("n_events") < F.col("n_risk")),
        F.log(F.lit(1.0) - F.col("n_events").cast("double") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    absorbed = F.max(
        (F.col("n_events") >= F.col("n_risk")).cast("int")
    ).over(w_run)
    return risk.select(
        "day",
        "n_risk",
        "n_events",
        "n_censored",
        F.when(absorbed == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(lterm).over(w_run)), 6))
        .alias("survival"),
    )


# --------------------------------------------------------------------------
# mannwhitney_doclen_test — tie-corrected Mann-Whitney U, en vs non-en
# --------------------------------------------------------------------------


@register(
    "mannwhitney_doclen_test",
    """
WITH t AS (
    SELECT n_chars, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
    FROM documents
),
per AS (
    SELECT n_chars, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS c1
    FROM t GROUP BY 1
),
ranked AS (
    SELECT c, c1,
           2 * CAST(coalesce(sum(c) OVER (ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               + c + 1 AS midrank2
    FROM per
),
stats AS (
    SELECT CAST(sum(c1) AS BIGINT) AS n1,
           CAST(sum(c) - sum(c1) AS BIGINT) AS n2,
           CAST(sum(c) AS BIGINT) AS nn,
           CAST(sum(c1 * midrank2) AS BIGINT) AS r1_2,
           CAST(sum(c * c * c - c) AS BIGINT) AS tie3
    FROM ranked
)
SELECT n1 AS n_en, n2 AS n_other,
       CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u_en,
       round((CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2.0
              - CAST(n1 AS DOUBLE) * n2 / 2.0)
             / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                    * ((nn + 1) - CAST(tie3 AS DOUBLE) / (nn * (nn - 1.0)))),
             6) AS z_score
FROM stats
""",
)
def mannwhitney_doclen_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing English vs
    non-English document lengths — the nonparametric two-sample test a
    corpus monitor runs when distributions are skewed and a t-test's
    normality assumption is junk. Midranks are kept DOUBLED (the
    roc_auc_quality device) so the rank sum, U numerator and the tie
    correction sum(t^3 - t) are all exact BIGINTs; the only doubles are
    the final normal-approximation divisions, evaluated in the same
    order on both engines. u_en is dyadic (an exact .5 multiple), so
    it needs no rounding at all.

    100 TB shape: the corpus collapses to the distinct-value table in
    one combinable aggregate, the rank window runs over distinct values
    (bounded by the value domain), and the output is one row."""
    docs = _load_parallel(spark, sf_dir, "documents")
    t = docs.select(
        "n_chars", F.when(F.col("lang") == "en", 1).otherwise(0).alias("y")
    )
    per = t.groupBy("n_chars").agg(
        F.count("*").alias("c"), F.sum("y").alias("c1")
    )
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per.select(
        "c",
        "c1",
        (
            2 * F.coalesce(F.sum("c").over(w), F.lit(0).cast("long"))
            + F.col("c")
            + 1
        ).alias("midrank2"),
    )
    stats = ranked.agg(
        F.sum("c1").cast("long").alias("n1"),
        (F.sum("c") - F.sum("c1")).cast("long").alias("n2"),
        F.sum("c").cast("long").alias("nn"),
        F.sum(F.col("c1") * F.col("midrank2")).cast("long").alias("r1_2"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie3"),
    )
    u_en = (F.col("r1_2") - F.col("n1") * (F.col("n1") + 1)).cast("double") / 2.0
    var = (
        F.col("n1").cast("double")
        * F.col("n2")
        / 12.0
        * (
            (F.col("nn") + 1)
            - F.col("tie3").cast("double") / (F.col("nn") * (F.col("nn") - 1.0))
        )
    )
    return stats.select(
        F.col("n1").alias("n_en"),
        F.col("n2").alias("n_other"),
        u_en.alias("u_en"),
        F.round(
            (u_en - F.col("n1").cast("double") * F.col("n2") / 2.0) / F.sqrt(var),
            6,
        ).alias("z_score"),
    )


# --------------------------------------------------------------------------
# bbit_minhash_estimate — 1-bit signature compression accuracy audit
# --------------------------------------------------------------------------

_BB_NGRAM = 3
_BB_HASHES = 32
_BB_BANDS = 8
_BB_SEED = 42  # same permutations as neardup_minhash_pairs
_MERSENNE = (1 << 31) - 1


def _bb_params() -> list[tuple[int, int]]:
    rng = random.Random(_BB_SEED)
    return [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(_BB_HASHES)
    ]


def _bb_duck_sql() -> str:
    """Same signature/banding CTEs as neardup_minhash_pairs' oracle
    (registry._duck_minhash_sql), extended with the full-signature and
    1-bit agreement estimates per candidate pair."""
    P = _MERSENNE
    rows = _BB_HASHES // _BB_BANDS
    sig_terms = ", ".join(
        f"list_min(list_transform(h31, x -> ({a} * x + {b}) % {P}))"
        for a, b in _bb_params()
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
d AS (SELECT doc_id,
             list_distinct(list_transform(generate_series(1, greatest(len(toks) - {_BB_NGRAM - 1}, 0)),
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
    FROM sigs, (SELECT unnest(generate_series(0, {_BB_BANDS - 1})) AS band) b),
cand AS (
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM banded l JOIN banded r
      ON l.band = r.band AND l.bhash = r.bhash AND l.doc_id < r.doc_id),
scored AS (
    SELECT c.id_a, c.id_b,
           len(list_intersect(a.h60, b.h60))
           / CAST(len(a.h60) + len(b.h60) - len(list_intersect(a.h60, b.h60)) AS DOUBLE)
               AS jac,
           len(list_filter(generate_series(1, {_BB_HASHES}),
               i -> a.sig[i] = b.sig[i])) AS k_full,
           len(list_filter(generate_series(1, {_BB_HASHES}),
               i -> a.sig[i] % 2 = b.sig[i] % 2)) AS k_bit
    FROM cand c JOIN sigs a ON a.doc_id = c.id_a JOIN sigs b ON b.doc_id = c.id_b)
SELECT id_a, id_b,
       floor(jac * 1000000.0 + 0.5) / 1000000.0 AS jac_exact,
       CAST(k_full AS DOUBLE) / {_BB_HASHES} AS est_full,
       greatest(2.0 * (CAST(k_bit AS DOUBLE) / {_BB_HASHES}) - 1.0, 0.0) AS est_1bit
FROM scored
"""


@register("bbit_minhash_estimate", _bb_duck_sql())
def bbit_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b-bit MinHash accuracy audit (Li & König 2010): for every LSH
    candidate pair, the exact shingle Jaccard, the full 32-permutation
    signature estimate (matches/32) and the 1-bit estimate
    (2·agree/32 − 1, clamped at 0 — for b=1 each permutation keeps only
    the parity bit, so storage drops 32x and E[agree] = (1+J)/2 for
    distinct minima). Shipping this as a standing audit is how you
    decide whether compressed sketches are safe for a given corpus:
    both estimates are exact rationals over the permutation count, so
    the driver hash pins the full estimator pipeline, not a tolerance.

    100 TB shape: identical to neardup_minhash_pairs — one corpus-scale
    shingle-hash pass, signatures shuffle on band keys, and the audit
    join touches only candidate pairs; the 1-bit variant is the scale
    PATH (4 bytes/doc of signature instead of 128) whose accuracy this
    query measures before you commit to it."""
    from kafka_streams_example_spark.operators.dedup import (
        hashed_shingles,
        minhash_signature,
    )
    from kafka_streams_example_spark.operators.text import word_ngrams

    docs = _load_parallel(spark, sf_dir, "documents")
    hashed = (
        docs.select("doc_id", word_ngrams(F.col("text"), _BB_NGRAM).alias("ng"))
        .filter(F.size("ng") > 0)
        .select("doc_id", hashed_shingles(F.col("ng")).alias("h60"))
    )
    sigs = hashed.select(
        "doc_id",
        "h60",
        minhash_signature(F.col("h60"), _BB_HASHES, _BB_SEED).alias("sig"),
    )
    rows = _BB_HASHES // _BB_BANDS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.array_join(
                        F.slice(F.col("sig"), b * rows + 1, rows).cast(
                            "array<string>"
                        ),
                        ",",
                    )
                ).alias("bhash"),
            )
            for b in range(_BB_BANDS)
        ]
    )
    banded = sigs.select(
        "doc_id", F.explode(band_structs).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bhash").alias("bhash"))
    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .distinct()
    )
    a = sigs.select(
        F.col("doc_id").alias("id_a"),
        F.col("h60").alias("h60_a"),
        F.col("sig").alias("sig_a"),
    )
    b = sigs.select(
        F.col("doc_id").alias("id_b"),
        F.col("h60").alias("h60_b"),
        F.col("sig").alias("sig_b"),
    )
    inter = F.size(F.array_intersect("h60_a", "h60_b"))
    union = F.size("h60_a") + F.size("h60_b") - inter
    jac = inter.cast("double") / union.cast("double")
    k_full = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m,
        )
    )
    k_bit = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x % 2) == (y % 2)),
            lambda m: m,
        )
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            tx.round_half_up(jac, 6).alias("jac_exact"),
            (k_full.cast("double") / _BB_HASHES).alias("est_full"),
            F.greatest(
                2.0 * (k_bit.cast("double") / _BB_HASHES) - 1.0, F.lit(0.0)
            ).alias("est_1bit"),
        )
    )
