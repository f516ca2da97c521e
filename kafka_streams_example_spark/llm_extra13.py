"""Fourteenth tranche: sketch-recall accounting, graph centrality, IR
scoring and curation accounting (round 4, part 2).

- minhash_recall_report:   measured recall of the full MinHash-LSH
                           pipeline against the exact pair set at the
                           same threshold — the one number that says
                           whether the sketch config is safe to trust.
- token_pagerank_centrality: PageRank (3 unrolled power iterations,
                           d=0.85) on the token co-occurrence graph —
                           graph centrality beyond connected components
                           and triangles.
- user_activity_islands:   per-user merge of overlapping activity
                           intervals (gaps-and-islands) — session
                           coverage without a fixed session-gap window
                           operator.
- bm25_topk_docs:          BM25 (k1=1.2, b=0.75) top-10 documents for a
                           fixed query term set — the classic IR scorer
                           over the postings shapes already proven.
- phrase_blocklist_rates:  per-source share of documents containing any
                           blocklisted phrase — the policy-filter
                           impact report run before enabling a filter.
- dedup_reduction_report:  docs/chars/tokens before vs after exact-dedup
                           keeper election — the one-row accounting of
                           what dedup buys.

Scale notes (100 TB shapes):
- the recall report composes two already-audited pipelines (banded
  MinHash, prefix-filtered AllPairs); the comparison joins the two
  sparse PAIR tables, never the corpus;
- PageRank runs entirely on the support-thresholded VOCABULARY graph
  (bounded, broadcastable); the only corpus-scale work is the same
  bounded per-document pair count PMI/triangles pay; iterations are
  unrolled joins on the tiny graph;
- islands are one shuffle on user_id (two stacked windows inside user
  partitions) + a per-user aggregate;
- BM25 needs df per query term (tiny aggregate broadcast back), corpus
  N and avgdl (1-row broadcast), then a map-only score and a
  distributed TakeOrdered top-k — no shuffle beyond the aggregates;
- the blocklist report is one scan with per-row contains() flags into a
  source-cardinality aggregate;
- the reduction report is one scan + one shuffle on the 16-byte content
  fingerprint (the exact-dedup shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.operators import dedup as dd
from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.functions.hashing import fingerprint_md5
from kafka_streams_example_spark.registry import (
    _NGRAMS,
    _TOKS,
    _duck_round_half_up,
    _load_parallel,
    register,
)

# --------------------------------------------------------------------------
# minhash_recall_report — sketch recall vs exact, measured
# --------------------------------------------------------------------------

_MR_T = 0.5


def _exact_pairs_sql(threshold: float) -> str:
    """Brute-force exact pair SELECT at ``threshold`` (unblocked) — the
    oracle-side ground truth the sketch is measured against."""
    return f"""
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM (SELECT doc_id, {_NGRAMS} AS ng
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents)) a
JOIN (SELECT doc_id, {_NGRAMS} AS ng
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents)) b
  ON a.doc_id < b.doc_id
WHERE len(a.ng) > 0 AND len(b.ng) > 0
  AND len(list_intersect(a.ng, b.ng))
      / CAST(len(list_distinct(list_concat(a.ng, b.ng))) AS DOUBLE)
      >= {threshold}
"""


def _minhash_oracle_sql() -> str:
    from kafka_streams_example_spark import registry as _reg

    return _reg.ORACLES["neardup_minhash_pairs"]


@register(
    "minhash_recall_report",
    f"""
WITH m AS (SELECT id_a, id_b FROM ({_minhash_oracle_sql()})),
e AS ({_exact_pairs_sql(_MR_T)}),
j AS (SELECT e.id_a, e.id_b, m.id_a IS NOT NULL AS hit
      FROM e LEFT JOIN m USING (id_a, id_b))
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST((SELECT count(*) FROM m) AS BIGINT) AS n_detected,
       CAST(count(*) FILTER (WHERE NOT hit) AS BIGINT) AS n_missed,
       {_duck_round_half_up(
           "count(*) FILTER (WHERE hit)"
           " / CAST(nullif(count(*), 0) AS DOUBLE)", 6)} AS recall
FROM j
""",
)
def minhash_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the full MinHash(32)+LSH(8 bands) pipeline
    against the EXACT near-dup pair set at the same Jaccard threshold
    (0.5): how many true pairs the banding surfaced, how many it missed.
    The acceptance gate before the sketch replaces exact pair search on
    a corpus too large to verify — composed entirely from the two
    already-audited pipelines.

    100 TB shape: both inputs are sparse pair tables (prefix-filtered
    AllPairs for truth, banded LSH for the sketch); the recall join
    runs on pairs, never the corpus. In production the exact side runs
    on a SAMPLE — the standard recall protocol — which this query
    expresses by feeding it a sampled sf_dir."""
    docs = _load_parallel(spark, sf_dir, "documents")
    # each pair table feeds TWO consumers (its count and the anti-join),
    # and both are sparse id-pair frames — cache so the expensive
    # generation runs once per materialization
    exact = (
        dd.ngram_jaccard_pairs(
            docs, block_key=F.lit("all"), threshold=_MR_T, freq_order=True
        )
        .select("id_a", "id_b")
        .cache()
    )
    detected = dd.minhash_pairs(docs, threshold=_MR_T).select("id_a", "id_b").cache()
    n_exact = exact.agg(F.count("*").cast("bigint").alias("n_exact"))
    n_det = detected.agg(F.count("*").cast("bigint").alias("n_detected"))
    n_missed = (
        exact.join(detected, ["id_a", "id_b"], "left_anti")
        .agg(F.count("*").cast("bigint").alias("n_missed"))
    )
    return (
        n_exact.crossJoin(F.broadcast(n_det))
        .crossJoin(F.broadcast(n_missed))
        .select(
            "n_exact",
            "n_detected",
            "n_missed",
            tx.round_half_up(
                (F.col("n_exact") - F.col("n_missed"))
                / F.nullif(F.col("n_exact"), F.lit(0)).cast("double"),
                6,
            ).alias("recall"),
        )
    )


# --------------------------------------------------------------------------
# token_pagerank_centrality — unrolled power iteration on the token graph
# --------------------------------------------------------------------------

_PR_SUPPORT = 10   # same co-occurrence support floor as the triangle query
_PR_D = 0.85
_PR_ITERS = 3
_PR_K = 20


def _pr_sql() -> str:
    base = f"""
t AS (SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents),
e AS (
    SELECT a.tok AS u, b.tok AS v
    FROM t a JOIN t b USING (doc_id)
    WHERE a.tok < b.tok
    GROUP BY 1, 2
    HAVING count(*) >= {_PR_SUPPORT}
),
und AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
nodes AS (SELECT DISTINCT u AS tok FROM und),
n AS (SELECT count(*) AS cnt FROM nodes),
deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
r0 AS (SELECT tok, 1.0 / (SELECT cnt FROM n) AS r FROM nodes)"""
    steps = []
    for i in range(_PR_ITERS):
        steps.append(
            f"""r{i + 1} AS (
    SELECT nodes.tok,
           (1.0 - {_PR_D}) / (SELECT cnt FROM n)
           + {_PR_D} * coalesce(c.s, 0.0) AS r
    FROM nodes LEFT JOIN (
        SELECT und.v AS tok, sum(r{i}.r / deg.d) AS s
        FROM und JOIN r{i} ON r{i}.tok = und.u
                 JOIN deg ON deg.u = und.u
        GROUP BY und.v) c USING (tok))"""
        )
    return (
        "WITH " + base + ",\n" + ",\n".join(steps) + f"""
SELECT tok, round(r, 6) AS rank
FROM r{_PR_ITERS}
ORDER BY round(r, 6) DESC, tok
LIMIT {_PR_K}
"""
    )


@register("token_pagerank_centrality", _pr_sql())
def token_pagerank_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality (damping 0.85, 3 power iterations, uniform
    init) over the token co-occurrence graph (edges = token pairs
    sharing >= 10 documents, both directions), top-20 tokens — the graph
    centrality primitive beyond connected components (dedup_clusters)
    and triangles (cooccurrence_triangles). Iterations are UNROLLED so
    the oracle is plain SQL and the Spark plan is a fixed join chain.

    100 TB shape: the corpus-scale work is the same bounded per-document
    pair count PMI/triangles pay; the graph itself is vocabulary-sized,
    so every iteration is a broadcast-scale join. Ordering uses the
    6dp-ROUNDED rank (token tiebreak) on both engines so last-ulp
    summation noise can't flip the LIMIT boundary."""
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
    # the edge table feeds 4+ consumers (both und directions, deg,
    # nodes, every unrolled iteration's src join) and is the ONLY
    # corpus-scale stage — cache so the explode+aggregate runs once
    e = (
        pairs.groupBy("u", "v")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _PR_SUPPORT)
        .select("u", "v")
        .cache()
    )
    und = e.union(e.select(F.col("v"), F.col("u"))).select(
        F.col("u"), F.col("v")
    )
    nodes = und.select(F.col("u").alias("tok")).distinct()
    n = nodes.agg(F.count("*").alias("cnt"))
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    src = und.join(deg, "u")  # (u, v, d): contribution edges with out-degree
    r = nodes.crossJoin(F.broadcast(n)).select(
        "tok", (F.lit(1.0) / F.col("cnt")).alias("r")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            src.join(r.select(F.col("tok").alias("u"), "r"), "u")
            .groupBy(F.col("v").alias("tok"))
            .agg(F.sum(F.col("r") / F.col("d")).alias("s"))
        )
        r = (
            nodes.join(contrib, "tok", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "tok",
                (
                    (F.lit(1.0) - F.lit(_PR_D)) / F.col("cnt")
                    + F.lit(_PR_D) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return (
        r.select("tok", F.round("r", 6).alias("rank"))
        .orderBy(F.desc("rank"), "tok")
        .limit(_PR_K)
    )


# --------------------------------------------------------------------------
# user_activity_islands — gaps-and-islands interval merge
# --------------------------------------------------------------------------

_ISL_GAP = 300  # each event opens a 300s activity interval


@register(
    "user_activity_islands",
    f"""
WITH iv AS (
    SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
           CAST(floor(epoch(ts)) AS BIGINT) + {_ISL_GAP} AS e
    FROM events
),
flagged AS (
    SELECT user_id, s, e,
           CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS new_island
    FROM iv
),
islands AS (
    SELECT user_id, s, e,
           sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
    FROM flagged
),
merged AS (
    SELECT user_id, island_id, min(s) AS island_start, max(e) AS island_end
    FROM islands GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(island_end - island_start) AS BIGINT) AS total_active_secs,
       CAST(max(island_end - island_start) AS BIGINT) AS max_island_secs
FROM merged
GROUP BY user_id
""",
)
def user_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each event opens a 300s activity interval;
    overlapping/touching intervals per user merge into islands. Reports
    per user the island count, total merged active seconds and the
    longest island — session coverage computed by interval MERGING
    (contrast session_windows' fixed-gap session ids: islands merge by
    interval overlap, the form that generalizes to heterogeneous
    interval sources).

    100 TB shape: one shuffle on user_id; the new-island flag is a
    running max over the cumulative interval end and the island id a
    running sum of flags — two stacked windows over the SAME partition
    ordering (one exchange, one sort), then a per-user aggregate."""
    ev = _load_parallel(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + _ISL_GAP).alias("e"),
    )
    by_user = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_end = F.max("e").over(
        by_user.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(F.col("s") > prev_max_end, 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island_id",
        F.sum("new_island").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    merged = islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("island_start"), F.max("e").alias("island_end")
    )
    return merged.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_islands"),
        F.sum(F.col("island_end") - F.col("island_start"))
        .cast("bigint")
        .alias("total_active_secs"),
        F.max(F.col("island_end") - F.col("island_start"))
        .cast("bigint")
        .alias("max_island_secs"),
    )


# --------------------------------------------------------------------------
# bm25_topk_docs — classic IR scoring over the proven postings shapes
# --------------------------------------------------------------------------

_BM25_TERMS = ["slow", "batch", "hash"]
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K = 10


@register(
    "bm25_topk_docs",
    f"""
WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
ln_ AS (SELECT doc_id, toks, len(toks) AS dl FROM d),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM ln_),
tf AS (
    SELECT doc_id, dl,
           {", ".join(
               f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
               for i, t in enumerate(_BM25_TERMS))}
    FROM ln_
),
df AS (
    SELECT {", ".join(
        f"count(*) FILTER (WHERE tf_{i} > 0) AS df_{i}"
        for i in range(len(_BM25_TERMS)))}
    FROM tf
),
scored AS (
    SELECT doc_id,
           {" + ".join(
               f"(ln(1.0 + (n - df_{i} + 0.5) / (df_{i} + 0.5))"
               f" * tf_{i} * ({_BM25_K1} + 1.0)"
               f" / (tf_{i} + {_BM25_K1} * (1.0 - {_BM25_B}"
               f" + {_BM25_B} * dl / avgdl)))"
               for i in range(len(_BM25_TERMS)))} AS score
    FROM tf CROSS JOIN df CROSS JOIN stats
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY round(score, 6) DESC, doc_id
LIMIT {_BM25_K}
""",
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75, Lucene idf = ln(1+(N-df+0.5)/(df+0.5)))
    top-10 documents for the fixed query {{slow, batch, hash}} — the
    classic lexical retrieval scorer, fully engine-portable: tf/df/N/dl
    are integers, avgdl is an exact integer-sum division, so both
    engines feed identical doubles into the same expression tree;
    ordering uses the 6dp-rounded score (doc_id tiebreak).

    100 TB shape: per-term df is one tiny aggregate broadcast back with
    the 1-row (N, avgdl) stats; scoring is map-only; the top-k is a
    distributed TakeOrdered, not a global sort."""
    docs = _load_parallel(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", tx.tokens(F.lower(F.col("text"))).alias("toks")
    ).withColumn("dl", F.size("toks"))
    def _tf(term: str):
        # one-arg lambda: a second parameter would be read as the index
        return F.size(F.filter(F.col("toks"), lambda x: x == F.lit(term)))

    tf = base.select(
        "doc_id",
        "dl",
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(_BM25_TERMS)],
    )
    df_row = tf.agg(
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ]
    )
    stats = base.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )
    scored = tf.crossJoin(F.broadcast(df_row)).crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(_BM25_TERMS)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        term = (
            idf
            * F.col(f"tf_{i}")
            * (F.lit(_BM25_K1) + 1.0)
            / (
                F.col(f"tf_{i}")
                + F.lit(_BM25_K1)
                * (
                    F.lit(1.0)
                    - F.lit(_BM25_B)
                    # nullif: an all-empty-token corpus has avgdl=0 and
                    # must yield NULL scores (oracle x/0 -> NULL), not
                    # an ANSI divide error
                    + F.lit(_BM25_B)
                    * F.col("dl")
                    / F.nullif(F.col("avgdl"), F.lit(0.0))
                )
            )
        )
        score = term if score is None else score + term
    return (
        scored.select("doc_id", F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(_BM25_K)
    )


# --------------------------------------------------------------------------
# phrase_blocklist_rates — policy-filter impact report
# --------------------------------------------------------------------------

_BLOCK_PHRASES = ["slow scan", "slow merge", "big join", "hash join"]


@register(
    "phrase_blocklist_rates",
    f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE {" OR ".join(
           f"contains(lower(coalesce(text, '')), '{p}')"
           for p in _BLOCK_PHRASES)}) AS BIGINT) AS n_flagged,
       {_duck_round_half_up(
           "count(*) FILTER (WHERE " + " OR ".join(
               f"contains(lower(coalesce(text, '')), '{p}')"
               for p in _BLOCK_PHRASES)
           + ") / CAST(count(*) AS DOUBLE)", 6)} AS flagged_rate
FROM documents
GROUP BY source
""",
)
def phrase_blocklist_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source impact of a phrase blocklist (substring match against
    a fixed policy lexicon): documents flagged and the flagged share —
    the report you read BEFORE enabling a policy filter, so a phrase
    that would delete 40% of one source gets caught in review, not in
    production.

    100 TB shape: one scan, per-row contains() flags folded into a
    source-cardinality aggregate; the lexicon is a compile-time constant
    (a real deployment broadcasts it)."""
    docs = _load_parallel(spark, sf_dir, "documents")
    text = F.lower(F.coalesce(F.col("text"), F.lit("")))
    flagged = None
    for p in _BLOCK_PHRASES:
        c = F.contains(text, F.lit(p))
        flagged = c if flagged is None else flagged | c
    return docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(flagged, 1).otherwise(0)).cast("bigint").alias("n_flagged"),
        tx.round_half_up(
            F.sum(F.when(flagged, 1).otherwise(0)) / F.count("*").cast("double"),
            6,
        ).alias("flagged_rate"),
    )


# --------------------------------------------------------------------------
# dedup_reduction_report — what exact dedup buys, in one row
# --------------------------------------------------------------------------


@register(
    "dedup_reduction_report",
    f"""
WITH k AS (
    SELECT n_chars, len({_TOKS}) AS n_toks,
           row_number() OVER (
               PARTITION BY md5(trim(regexp_replace(lower(coalesce(text, '')),
                                                    '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))
               ORDER BY doc_id) = 1 AS is_keeper
    FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE is_keeper) AS BIGINT) AS n_keepers,
       CAST(count(*) FILTER (WHERE NOT is_keeper) AS BIGINT) AS n_removed,
       CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars_total,
       CAST(coalesce(sum(n_chars) FILTER (WHERE is_keeper), 0) AS BIGINT)
           AS chars_kept,
       CAST(coalesce(sum(n_toks), 0) AS BIGINT) AS tokens_total,
       CAST(coalesce(sum(n_toks) FILTER (WHERE is_keeper), 0) AS BIGINT)
           AS tokens_kept,
       {_duck_round_half_up(
           "count(*) FILTER (WHERE NOT is_keeper)"
           " / CAST(nullif(count(*), 0) AS DOUBLE)", 6)} AS doc_reduction
FROM k
""",
)
def dedup_reduction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row accounting of exact dedup: documents, characters and
    tokens before vs after content-fingerprint keeper election, plus
    the document reduction ratio — the number that justifies (or kills)
    a dedup stage in the pipeline budget.

    100 TB shape: one scan; the keeper flag is the exact-dedup window
    on the 16-byte content fingerprint (the only shuffle), folded into
    a single aggregate of conditional sums."""
    docs = _load_parallel(spark, sf_dir, "documents")
    text = F.coalesce(F.col("text"), F.lit(""))
    keeper = (
        F.row_number().over(
            Window.partitionBy(fingerprint_md5(text)).orderBy("doc_id")
        )
        == 1
    )
    k = docs.select(
        "n_chars",
        F.size(tx.tokens(F.lower(text))).alias("n_toks"),
        keeper.alias("is_keeper"),
    )
    return k.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("is_keeper"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_keepers"),
        F.sum(F.when(~F.col("is_keeper"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("bigint").alias("chars_total"),
        F.coalesce(F.sum(F.when(F.col("is_keeper"), F.col("n_chars"))), F.lit(0))
        .cast("bigint")
        .alias("chars_kept"),
        F.coalesce(F.sum("n_toks"), F.lit(0)).cast("bigint").alias("tokens_total"),
        F.coalesce(F.sum(F.when(F.col("is_keeper"), F.col("n_toks"))), F.lit(0))
        .cast("bigint")
        .alias("tokens_kept"),
        tx.round_half_up(
            F.sum(F.when(~F.col("is_keeper"), 1).otherwise(0))
            / F.nullif(F.count("*"), F.lit(0)).cast("double"),
            6,
        ).alias("doc_reduction"),
    )
