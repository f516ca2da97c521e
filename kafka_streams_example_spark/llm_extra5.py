"""Sixth tranche: language-model statistics, graph analytics on the
co-occurrence vocabulary, weighted sampling, skew diagnostics and feature
scaling (round 3, part 3).

- bigram_lm_probs:         add-k-smoothed bigram conditional
                           probabilities — the n-gram LM that backs
                           perplexity-style quality scoring.
- cooccurrence_triangles:  triangle enumeration on the token
                           co-occurrence graph — graph analytics beyond
                           connected components (clustering-coefficient
                           building block).
- weighted_domain_sample:  deterministic weighted sampling without
                           replacement (Efraimidis–Spirakis keys from a
                           salted hash) — reproducible corpus subsetting
                           where longer documents are proportionally more
                           likely.
- key_skew_report:         per-key volume / share / hottest-subkey
                           diagnosis — the query you run BEFORE choosing
                           partition keys at 100 TB.
- robust_scaler_features:  per-language z-score and IQR-robust scaling of
                           document features — classifier feature prep.

Scale notes (100 TB shapes):
- bigram generation is per-document JVM zip_with (never a self-join);
  prefix counts and the vocabulary size join back as broadcasts;
- triangle enumeration runs on the VOCABULARY graph (edges =
  sufficiently-supported token pairs), which is bounded and broadcast —
  the only corpus-scale work is the same bounded pair count PMI uses;
- the weighted sample is a distributed TakeOrdered (per-partition local
  top-k, tiny driver merge), not a global sort;
- the skew report is one scan: (key, subkey) pre-aggregate, hottest cell
  via struct-max inside the key-cardinality aggregate, grand total via a
  window over the aggregate's few rows — no second scan, no join;
- robust scaling broadcasts lang-cardinality stats onto a map-only pass;
  fences are rounded BEFORE the division so both engines divide
  identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.functions.hashing import stable_long
from kafka_streams_example_spark.registry import (
    _TOKS,
    _duck_round_half_up,
    _load_parallel,
    register,
)

# --------------------------------------------------------------------------
# bigram_lm_probs — add-k smoothed bigram LM
# --------------------------------------------------------------------------

_LM_K = 0.5  # add-k smoothing constant (exactly representable)


@register(
    "bigram_lm_probs",
    f"""
WITH d AS (SELECT {_TOKS} AS t FROM documents),
bg AS (
    SELECT t[i] AS tok_a, t[i + 1] AS tok_b
    FROM d, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS g(i)
),
v AS (
    SELECT count(DISTINCT tok) AS vocab
    FROM (SELECT tok_a AS tok FROM bg UNION SELECT tok_b FROM bg)
),
pre AS (SELECT tok_a, count(*) AS n_a FROM bg GROUP BY 1),
pair AS (SELECT tok_a, tok_b, count(*) AS n_ab FROM bg GROUP BY 1, 2)
SELECT pair.tok_a, pair.tok_b,
       CAST(n_ab AS BIGINT) AS n_ab,
       CAST(n_a AS BIGINT) AS n_a,
       round((n_ab + {_LM_K}) / (n_a + {_LM_K} * vocab), 6) AS prob
FROM pair
JOIN pre USING (tok_a)
CROSS JOIN v
WHERE n_ab >= 5
""",
)
def bigram_lm_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-k-smoothed bigram conditional probabilities
    P(b|a) = (c(a,b)+k) / (c(a·)+k·|V|) over whitespace tokens — the
    n-gram language model behind perplexity-style corpus quality scores
    (doc_perplexity_proxy consumes exactly this shape).

    100 TB shape: bigrams come from a per-document JVM zip_with (no
    self-join, no Python); the prefix-count table and |V| are
    vocabulary-sized broadcasts; counts stay < 2^53 so the smoothed
    division is exact on both engines."""
    docs = _load_parallel(spark, sf_dir, "documents")
    t = docs.select(tx.tokens(F.lower(F.col("text"))).alias("t"))
    bg = t.select(
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, greatest(size(t) - 1, 0)),"
                " slice(t, 2, greatest(size(t) - 1, 0)),"
                " (x, y) -> struct(x AS tok_a, y AS tok_b))"
            )
        ).alias("b")
    ).select("b.tok_a", "b.tok_b")
    vocab = (
        bg.select(F.col("tok_a").alias("tok"))
        .union(bg.select("tok_b"))
        .agg(F.countDistinct("tok").alias("vocab"))
    )
    pre = bg.groupBy("tok_a").agg(F.count("*").alias("n_a"))
    pair = (
        bg.groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    return (
        pair.join(F.broadcast(pre), "tok_a")
        .join(F.broadcast(vocab))
        .select(
            "tok_a",
            "tok_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.round(
                (F.col("n_ab") + F.lit(_LM_K))
                / (F.col("n_a") + F.lit(_LM_K) * F.col("vocab")),
                6,
            ).alias("prob"),
        )
    )


# --------------------------------------------------------------------------
# cooccurrence_triangles — triangles on the token co-occurrence graph
# --------------------------------------------------------------------------

_TRI_SUPPORT = 10  # min co-occurring docs for an edge


@register(
    "cooccurrence_triangles",
    f"""
WITH t AS (
    SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents
),
e AS (
    SELECT a.tok AS u, b.tok AS v, count(*) AS support
    FROM t a JOIN t b USING (doc_id)
    WHERE a.tok < b.tok
    GROUP BY 1, 2
    HAVING count(*) >= {_TRI_SUPPORT}
)
SELECT e1.u AS tok_a, e1.v AS tok_b, e2.v AS tok_c,
       CAST(least(e1.support, e2.support, e3.support) AS BIGINT)
           AS min_support
FROM e e1
JOIN e e2 ON e2.u = e1.v
JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
""",
)
def cooccurrence_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration on the token co-occurrence graph (edges =
    token pairs sharing >= 10 documents), with each triangle's weakest
    edge support — the clustering-coefficient / community-structure
    building block, and the graph op beyond connected-component dedup.

    100 TB shape: the only corpus-scale work is the bounded per-document
    pair count (the PMI shape); the resulting vocabulary graph is tiny,
    so both triangle joins are broadcasts — no corpus-sized three-way
    join ever exists. The a<b<c orientation makes each triangle appear
    exactly once."""
    docs = _load_parallel(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.array_sort(F.array_distinct(tx.tokens(F.lower(F.col("text"))))).alias("ts"),
    )
    pairs = t.select(
        F.explode(
            F.expr(
                "flatten(transform(ts, (x, i) ->"
                " transform(slice(ts, i + 2, size(ts)),"
                " y -> struct(x AS u, y AS v))))"
            )
        ).alias("p")
    ).select("p.u", "p.v")
    e = (
        pairs.groupBy("u", "v")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _TRI_SUPPORT)
    )
    e1 = e.select(F.col("u").alias("tok_a"), F.col("v").alias("tok_b"),
                  F.col("support").alias("s1"))
    e2 = e.select(F.col("u").alias("tok_b"), F.col("v").alias("tok_c"),
                  F.col("support").alias("s2"))
    e3 = e.select(F.col("u").alias("tok_a"), F.col("v").alias("tok_c"),
                  F.col("support").alias("s3"))
    return (
        e1.join(F.broadcast(e2), "tok_b")
        .join(F.broadcast(e3), ["tok_a", "tok_c"])
        .select(
            "tok_a",
            "tok_b",
            "tok_c",
            F.least("s1", "s2", "s3").cast("bigint").alias("min_support"),
        )
    )


# --------------------------------------------------------------------------
# weighted_domain_sample — Efraimidis–Spirakis without-replacement sample
# --------------------------------------------------------------------------

_WS_SALT = ":wsample"
_WS_K = 20
_TWO60 = float(1 << 60)


@register(
    "weighted_domain_sample",
    f"""
WITH keyed AS (
    SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS weight,
           pow((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{_WS_SALT}'),
                                     1, 15)) AS BIGINT) + 0.5) / {_TWO60},
               1.0 / CAST(n_chars AS DOUBLE)) AS sample_key
    FROM documents
    WHERE n_chars > 0
)
SELECT doc_id, source, weight,
       {_duck_round_half_up("sample_key", 6)} AS sample_key
FROM keyed
ORDER BY {_duck_round_half_up("sample_key", 6)} DESC, doc_id
LIMIT {_WS_K}
""",
)
def weighted_domain_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis): each document gets key u^(1/w) where u is a
    salted-hash uniform and w = n_chars; the global top-20 keys are the
    sample. Longer documents are proportionally likelier, yet membership
    is a pure function of the ids — reproducible across engines, retries
    and repartitioning (contrast rand()-based sampling).

    100 TB shape: map-only key computation + distributed TakeOrdered
    (per-partition local top-k, k-row driver merge) — no global sort."""
    docs = _load_parallel(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    h = stable_long(F.concat(F.col("doc_id").cast("string"), F.lit(_WS_SALT)))
    w = F.col("n_chars").cast("double")
    key = F.pow((h + F.lit(0.5)) / F.lit(_TWO60), F.lit(1.0) / w)
    # order by the ROUNDED key (doc_id tiebreak) on both engines: pow()
    # is <=1-ulp accurate, not correctly rounded, so an unrounded
    # boundary near the LIMIT could admit different documents per engine
    # (ADVICE r03); rounding must itself be the portable floor twin —
    # engine-native round() diverges on 6dp half-boundaries (ADVICE r04)
    return (
        docs.select(
            "doc_id",
            "source",
            w.alias("weight"),
            tx.round_half_up(key, 6).alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), "doc_id")
        .limit(_WS_K)
    )


# --------------------------------------------------------------------------
# key_skew_report — partition-key skew diagnosis
# --------------------------------------------------------------------------


@register(
    "key_skew_report",
    """
WITH per_sub AS (
    SELECT event_type, user_id, count(*) AS cnt
    FROM events GROUP BY 1, 2
),
per_key AS (
    SELECT event_type, sum(cnt) AS n_events, count(*) AS n_subkeys
    FROM per_sub GROUP BY 1
),
tot AS (SELECT sum(n_events) AS total FROM per_key),
hot AS (
    SELECT event_type, user_id AS hottest_user, cnt AS hottest_user_events
    FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY cnt DESC, user_id DESC) AS rn
        FROM per_sub
    ) WHERE rn = 1
)
SELECT k.event_type,
       CAST(k.n_events AS BIGINT) AS n_events,
       CAST(k.n_subkeys AS BIGINT) AS n_subkeys,
       round(k.n_events * 1.0 / total, 6) AS share,
       h.hottest_user,
       CAST(h.hottest_user_events AS BIGINT) AS hottest_user_events,
       round(h.hottest_user_events * 1.0 / k.n_events, 6) AS hot_share
FROM per_key k
JOIN hot h USING (event_type)
CROSS JOIN tot
""",
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key skew diagnosis for events keyed by event_type: total
    volume and share per key, subkey cardinality, and the hottest
    (event_type, user) cell with its within-key share — the report that
    decides whether a key needs salting BEFORE a 100 TB shuffle is
    launched (operators/skew.py is the mitigation this query justifies).

    100 TB shape: ONE corpus scan — a single shuffle into the map-side
    combined (key, subkey) pre-aggregate; the hottest cell falls out of
    a struct-max (cnt-then-subkey ordering, identical to the oracle's
    rank) inside the same key-cardinality aggregate, and the grand total
    is an unpartitioned window over those few aggregate rows — no second
    scan, no join, no corpus-sized window."""
    from pyspark.sql import Window

    ev = _load_parallel(spark, sf_dir, "events")
    per_sub = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("cnt"))
    per_key = per_sub.groupBy("event_type").agg(
        F.sum("cnt").alias("n_events"),
        F.count("*").alias("n_subkeys"),
        F.max(F.struct(F.col("cnt"), F.col("user_id"))).alias("hot"),
    )
    per_key = per_key.withColumn(
        "total", F.sum("n_events").over(Window.partitionBy())
    )
    return per_key.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("n_subkeys").cast("bigint").alias("n_subkeys"),
        F.round(F.col("n_events") * 1.0 / F.col("total"), 6).alias("share"),
        F.col("hot.user_id").alias("hottest_user"),
        F.col("hot.cnt").cast("bigint").alias("hottest_user_events"),
        F.round(F.col("hot.cnt") * 1.0 / F.col("n_events"), 6).alias("hot_share"),
    )


# --------------------------------------------------------------------------
# robust_scaler_features — per-language feature scaling
# --------------------------------------------------------------------------


@register(
    "robust_scaler_features",
    """
WITH s AS (
    SELECT lang,
           round(avg(CAST(n_chars AS DOUBLE)), 6) AS mu,
           round(stddev_pop(CAST(n_chars AS DOUBLE)), 6) AS sigma,
           round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS p50,
           round(quantile_cont(CAST(n_chars AS DOUBLE), 0.75)
                 - quantile_cont(CAST(n_chars AS DOUBLE), 0.25), 6) AS iqr
    FROM documents GROUP BY 1
)
SELECT d.doc_id, d.lang, d.n_chars,
       round((CAST(d.n_chars AS DOUBLE) - s.mu) / nullif(s.sigma, 0.0), 6)
           AS z_chars,
       round((CAST(d.n_chars AS DOUBLE) - s.p50) / nullif(s.iqr, 0.0), 6)
           AS robust_chars
FROM documents d JOIN s USING (lang)
""",
)
def robust_scaler_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language standard (z-score) and IQR-robust scaling of document
    length — the feature-preparation pass for a quality classifier, with
    the robust variant immune to heavy-tailed crawl artifacts.

    100 TB shape: lang-cardinality stats broadcast onto a map-only
    second scan. The fences (mean, stddev, median, IQR) are rounded to 6
    decimals BEFORE the division so both engines divide bit-identical
    doubles; zero spread yields NULL (nullif) on both engines rather
    than Spark-Inf-vs-DuckDB-NULL divergence."""
    docs = _load_parallel(spark, sf_dir, "documents")
    chars = F.col("n_chars").cast("double")
    s = docs.groupBy("lang").agg(
        F.round(F.avg(chars), 6).alias("mu"),
        F.round(F.stddev_pop(chars), 6).alias("sigma"),
        F.round(F.percentile(chars, F.lit(0.5)), 6).alias("p50"),
        F.round(
            F.percentile(chars, F.lit(0.75)) - F.percentile(chars, F.lit(0.25)), 6
        ).alias("iqr"),
    )
    return docs.join(F.broadcast(s), "lang").select(
        "doc_id",
        "lang",
        "n_chars",
        F.round((chars - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0.0)), 6).alias(
            "z_chars"
        ),
        F.round(
            (chars - F.col("p50")) / F.nullif(F.col("iqr"), F.lit(0.0)), 6
        ).alias("robust_chars"),
    )
