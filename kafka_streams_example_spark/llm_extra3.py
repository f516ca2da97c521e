"""Fourth tranche of training-data-pipeline operators (round 3).

- dedup_survivorship:      canonical-record election per exact-dup group
                           (max-content keeper + field-level merge stats) —
                           the record-linkage step after duplicate
                           detection.
- train_eval_split:        deterministic hash-based train/valid/test
                           split with per-split integrity stats — split
                           membership must be a pure function of the
                           example, never of layout or time.
- minhash_jaccard_estimate: sketch-accuracy audit — MinHash-estimated vs
                           exact Jaccard on verified near-dup pairs, with
                           the absolute error. The query that tells you
                           whether 32 permutations are enough before you
                           trust the sketch at 100 TB.
- power_iteration_top_component: top principal direction of the embedding
                           Gram matrix via declarative power iteration —
                           the PCA building block, same broadcast-small/
                           scan-big shape as kmeans_lloyd.
- time_weighted_average:   piecewise-constant time-weighted mean of
                           events.value per user (the metric for
                           irregularly sampled telemetry, vs the plain
                           mean that over-weights bursts).
- vocab_coverage_oov:      top-K corpus vocabulary coverage / OOV rate
                           per language — the tokenizer-fit signal for
                           corpus curation.

Scale notes (100 TB shapes):
- survivorship is one shuffle on the 16-byte content fingerprint;
- the split assignment is map-only (hash of the id), stats one shuffle on
  a 3-value key crossed with lang;
- the sketch audit reuses the prefix-filtered pair path (no all-pairs)
  and joins tiny 32-long signatures, never shingle sets, to the pairs;
- power iteration broadcasts a dim-sized vector against the corpus scan
  and shuffles dim-sized partials per iteration (like kmeans: corpus is
  scanned, never collected);
- TWA is a per-user window (bounded partitions) + per-user aggregate;
- vocab is a distributed top-K (TakeOrdered) broadcast back onto the
  token stream — the corpus-sized token explode aggregates map-side.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.operators import dedup as dd
from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.functions.hashing import stable_long
from kafka_streams_example_spark.registry import _TOKS, _load_parallel, register
from kafka_streams_example_spark.sources.files import load_table, table_row_count

# --------------------------------------------------------------------------
# dedup_survivorship — canonical record per exact-duplicate group
# --------------------------------------------------------------------------


@register(
    "dedup_survivorship",
    """
WITH g AS (
    SELECT *,
           md5(text) AS fp,
           row_number() OVER (PARTITION BY md5(text)
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM documents
)
SELECT fp,
       max(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
       count(*) AS n_dups,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       min(doc_id) AS first_seen
FROM g
GROUP BY fp
""",
)
def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (canonical-record election) per exact-duplicate group:
    groups share an md5 content fingerprint; the keeper is the richest
    record (max n_chars, ties to the lowest doc_id — a deterministic
    total order), and the merged row carries field-level lineage stats
    (distinct langs/sources seen across the group, first-seen id).

    One shuffle on the 16-byte fingerprint (high-cardinality, unskewed);
    the keeper election is a window inside the same hash partitioning, so
    the whole query is a single exchange at any scale."""
    docs = _load_parallel(spark, sf_dir, "documents")
    w = Window.partitionBy("fp").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    g = docs.withColumn("fp", F.md5("text")).withColumn(
        "rn", F.row_number().over(w)
    )
    return g.groupBy("fp").agg(
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keep_id"),
        F.count("*").alias("n_dups"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.min("doc_id").alias("first_seen"),
    )


# --------------------------------------------------------------------------
# train_eval_split — deterministic hash split with integrity stats
# --------------------------------------------------------------------------

_SPLIT_SALT = ":split"  # decouples split hashing from any other id hash


def split_col(id_col) -> F.Column:
    """The canonical 80/10/10 train/valid/test assignment: salted md5 →
    60-bit int → mod 100. THE single definition — every query that
    reasons about splits (train_eval_split, cross_split_leakage_pairs)
    must use this or its SQL twin ``split_case_sql`` so they can never
    measure different splits."""
    bucket = stable_long(F.concat(id_col.cast("string"), F.lit(_SPLIT_SALT))) % 100
    return (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )


def split_case_sql(id_expr: str) -> str:
    """DuckDB twin of :func:`split_col` for oracle SQL."""
    h = (
        f"CAST(('0x' || substr(md5(CAST({id_expr} AS VARCHAR) ||"
        f" '{_SPLIT_SALT}'), 1, 15)) AS BIGINT) % 100"
    )
    return (
        f"CASE WHEN {h} < 80 THEN 'train'"
        f" WHEN {h} < 90 THEN 'valid' ELSE 'test' END"
    )


@register(
    "train_eval_split",
    f"""
WITH b AS (
    SELECT *,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{_SPLIT_SALT}'), 1, 15))
                AS BIGINT) % 100 AS bucket
    FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'valid'
            ELSE 'test' END AS split,
       lang,
       count(*) AS n_docs,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM b
GROUP BY 1, 2
""",
)
def train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split: the bucket is a pure
    function of the example id (salted md5 → 60-bit int → mod 100), so
    membership is stable under repartitioning, retries, re-ingestion and
    engine changes — the property that prevents train/test leakage when
    the corpus is rebuilt. Emits per-(split, lang) integrity stats.

    Map-only assignment (no shuffle until the tiny stats aggregate);
    adding examples never moves an existing example across splits."""
    docs = _load_parallel(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", split_col(F.col("doc_id")))
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# minhash_jaccard_estimate — sketch accuracy vs exact Jaccard
# --------------------------------------------------------------------------

_MH_NUM = 32
_MH_SEED = 42
_MH_M = (1 << 31) - 1  # operators.dedup._MERSENNE
_MH_PARAMS = [
    (r.randrange(1, _MH_M), r.randrange(0, _MH_M))
    for r in [random.Random(_MH_SEED)]
    for _ in range(_MH_NUM)
]

_NGRAMS3 = (
    "list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 0)),"
    " i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
)

_SIG_EXPRS = ", ".join(
    f"list_min(list_transform(hs, h -> ({a} * (h % {_MH_M}) + {b}) % {_MH_M}))"
    for a, b in _MH_PARAMS
)


@register(
    "minhash_jaccard_estimate",
    f"""
WITH d AS (
    SELECT doc_id, lang, source, {_NGRAMS3} AS ng
    FROM (SELECT doc_id, lang, source, {_TOKS} AS t FROM documents)
),
nz AS (SELECT * FROM d WHERE len(ng) > 0),
sig AS (
    SELECT doc_id,
           [{_SIG_EXPRS}] AS sg
    FROM (SELECT doc_id,
                 list_transform(ng, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS hs
          FROM nz)
),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.ng, b.ng))
           / CAST(len(list_distinct(list_concat(a.ng, b.ng))) AS DOUBLE) AS jac
    FROM nz a JOIN nz b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.ng, b.ng))
          / CAST(len(list_distinct(list_concat(a.ng, b.ng))) AS DOUBLE) >= 0.3
)
SELECT p.id_a, p.id_b,
       floor(p.jac * 1000000.0 + 0.5) / 1000000.0 AS exact_jaccard,
       floor(len(list_filter(generate_series(1, {_MH_NUM}),
                             i -> sa.sg[i] = sb.sg[i])) / {_MH_NUM}.0
             * 1000000.0 + 0.5) / 1000000.0 AS est_jaccard,
       floor(abs(floor(p.jac * 1000000.0 + 0.5) / 1000000.0
                 - len(list_filter(generate_series(1, {_MH_NUM}),
                                   i -> sa.sg[i] = sb.sg[i])) / {_MH_NUM}.0)
             * 1000000.0 + 0.5) / 1000000.0 AS abs_err
FROM pairs p
JOIN sig sa ON p.id_a = sa.doc_id
JOIN sig sb ON p.id_b = sb.doc_id
""",
)
def minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit: for every verified near-dup pair (exact
    3-gram Jaccard ≥ 0.3 within (lang, source) blocks), the MinHash
    estimate (fraction of agreeing positions across 32 seeded
    permutations) next to the exact value and the absolute error — run
    this before trusting a 32-permutation sketch corpus-wide.

    Pair discovery reuses the prefix-filtered AllPairs path
    (operators/dedup.py:ngram_jaccard_pairs — no in-block cross product).
    Signatures are computed in ONE corpus pass: the pair list is melted
    to (pair, side, doc_id), signatures join it once on doc_id, and the
    result is regrouped back to (sa, sb) — the corpus is never hashed
    twice and signatures never shuffle on two different keys (the
    two-join form re-executed the 32-permutation hashing per side). The
    permutations are the exact ones minhash_signature(seed=42) uses,
    reproduced literally in the oracle."""
    docs = _load_parallel(spark, sf_dir, "documents")
    blk = F.concat(
        F.base64(F.encode(F.col("lang"), "utf-8")),
        F.lit("|"),
        F.base64(F.encode(F.col("source"), "utf-8")),
    )
    pairs = dd.ngram_jaccard_pairs(docs, block_key=blk, threshold=0.3)
    melt = pairs.select(
        "id_a",
        "id_b",
        "jaccard",
        F.explode(
            F.array(
                F.struct(F.lit("a").alias("side"), F.col("id_a").alias("doc_id")),
                F.struct(F.lit("b").alias("side"), F.col("id_b").alias("doc_id")),
            )
        ).alias("s"),
    ).select("id_a", "id_b", "jaccard", "s.side", "s.doc_id")
    sig = (
        docs.select("doc_id", tx.word_ngrams(F.col("text"), 3).alias("ng"))
        .filter(F.size("ng") > 0)
        .select(
            "doc_id",
            dd.minhash_signature(
                dd.hashed_shingles(F.col("ng")), _MH_NUM, _MH_SEED
            ).alias("sg"),
        )
    )
    both = (
        melt.join(sig, "doc_id")
        .groupBy("id_a", "id_b", "jaccard")
        .agg(
            F.max(F.when(F.col("side") == "a", F.col("sg"))).alias("sa"),
            F.max(F.when(F.col("side") == "b", F.col("sg"))).alias("sb"),
        )
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("sa"), F.col("sb"), lambda x, y: x == y),
            lambda m: m,
        )
    ) / F.lit(float(_MH_NUM))
    return both.select(
        "id_a",
        "id_b",
        F.col("jaccard").alias("exact_jaccard"),
        tx.round_half_up(est, 6).alias("est_jaccard"),
        tx.round_half_up(F.abs(F.col("jaccard") - est), 6).alias("abs_err"),
    )


# --------------------------------------------------------------------------
# power_iteration_top_component — PCA direction, declaratively
# --------------------------------------------------------------------------

_PI_DIM = 64
_PI_ITER = 2


def _duck_power_iteration_sql(dim: int = _PI_DIM, iterations: int = _PI_ITER) -> str:
    """Unrolled power iteration in DuckDB — same round-6 contract as
    kmeans (_duck_kmeans_sql): both engines renormalize identical rounded
    doubles each iteration, so per-row dot products match bit-exactly and
    the row-order-dependent per-dimension sums agree at 6 decimals."""
    v0 = "[" + ", ".join(["0.125"] * dim) + "]::DOUBLE[]"
    sql = f"WITH v0 AS (SELECT {v0} AS v)"
    prev = "v0"
    for it in range(1, iterations + 1):
        sql += f""",
d{it} AS (
    SELECT e.vec_id,
           list_aggregate(list_transform(generate_series(1, {dim}),
               i -> CAST(e.embedding[i] AS DOUBLE) * v.v[i]), 'sum') AS d
    FROM embeddings e CROSS JOIN {prev} v
),
s{it} AS (
    SELECT CAST(pos AS INT) AS pos,
           round(sum(CAST(e.embedding[pos] AS DOUBLE) * d.d), 6) AS sval
    FROM embeddings e
    JOIN d{it} d ON e.vec_id = d.vec_id
    CROSS JOIN range(1, {dim + 1}) AS t(pos)
    GROUP BY 1
),
n{it} AS (SELECT sqrt(sum(sval * sval)) AS nrm FROM s{it}),
v{it} AS (
    SELECT list(round(sval / nrm, 6) ORDER BY pos) AS v
    FROM s{it} CROSS JOIN n{it}
)"""
        prev = f"v{it}"
    return (
        sql
        + f"""
SELECT CAST(pos AS INT) AS dim_pos, round(sval / nrm, 6) AS component
FROM s{iterations} CROSS JOIN n{iterations}
"""
    )


@register("power_iteration_top_component", _duck_power_iteration_sql())
def power_iteration_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the (uncentered) embedding Gram matrix
    X'X via power iteration — the PCA/spectral building block, written as
    the same declarative iterate-broadcast-aggregate loop as kmeans_lloyd:
    per iteration, one corpus scan computes per-row projections x·v (the
    dim-sized v is broadcast), a (dim)-key aggregate re-forms X'Xv, and
    the renormalized vector is rounded to 6 decimals so both engines
    iterate identical doubles. The corpus is never collected; the only
    shuffle per iteration carries dim × partitions partial sums."""
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        F.col("vec_id").alias("id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("x"),
    )
    v = spark.range(1).select(
        F.array(*[F.lit(1.0 / 8.0)] * _PI_DIM).alias("v")
    )
    for _ in range(_PI_ITER):
        proj = vecs.crossJoin(F.broadcast(v)).select(
            "id",
            "x",
            F.aggregate(
                F.sequence(F.lit(1), F.lit(_PI_DIM)),
                F.lit(0.0),
                lambda acc, i: acc
                + F.element_at(F.col("x"), i) * F.element_at(F.col("v"), i),
            ).alias("d"),
        )
        s = (
            proj.select(F.posexplode("x").alias("pos0", "val"), "d")
            .groupBy((F.col("pos0") + 1).cast("int").alias("pos"))
            .agg(F.round(F.sum(F.col("val") * F.col("d")), 6).alias("sval"))
        )
        nrm = s.agg(F.sqrt(F.sum(F.col("sval") * F.col("sval"))).alias("nrm"))
        v = (
            s.crossJoin(nrm)
            .select("pos", F.round(F.col("sval") / F.col("nrm"), 6).alias("vv"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "vv"))),
                    lambda t: t.vv,
                ).alias("v")
            )
        )
    final = s.crossJoin(nrm)
    return final.select(
        F.col("pos").alias("dim_pos"),
        F.round(F.col("sval") / F.col("nrm"), 6).alias("component"),
    )


# --------------------------------------------------------------------------
# time_weighted_average — piecewise-constant TWA per user
# --------------------------------------------------------------------------


@register(
    "time_weighted_average",
    """
WITH o AS (
    SELECT user_id, value, epoch_us(ts) AS t,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS nt,
           min(epoch_us(ts)) OVER (PARTITION BY user_id) AS t0,
           max(epoch_us(ts)) OVER (PARTITION BY user_id) AS t1
    FROM events
)
SELECT user_id,
       count(*) AS n_events,
       CAST(max(t1 - t0) AS BIGINT) AS span_us,
       round(CASE WHEN max(t1) = max(t0) THEN avg(value)
                  ELSE sum(value * ((nt - t) / CAST(t1 - t0 AS DOUBLE)))
             END, 6) AS twa_value
FROM o
GROUP BY user_id
""",
)
def time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piecewise-constant time-weighted average of events.value per user:
    each observation holds until the next one, weighted by its holding
    time over the user's observed span (the last observation carries no
    weight; a single-event or zero-span user falls back to the plain
    mean). This is the correct mean for irregularly sampled telemetry —
    the plain mean over-weights bursts.

    One window + one aggregate, both partitioned by user_id — bounded
    per-key state, no global sort. Weights are ratios of int64
    microsecond differences (bit-identical across engines); the final
    order-dependent float sum is rounded at 6dp like every other float
    aggregate in the registry."""
    ev = _load_parallel(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), F.col("event_id"))
    span = Window.partitionBy("user_id")
    o = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("t"),
        F.lead(F.unix_micros("ts")).over(w).alias("nt"),
        F.min(F.unix_micros("ts")).over(span).alias("t0"),
        F.max(F.unix_micros("ts")).over(span).alias("t1"),
    )
    twa = F.when(F.max("t1") == F.max("t0"), F.avg("value")).otherwise(
        F.sum(
            F.col("value") * ((F.col("nt") - F.col("t")) / (F.col("t1") - F.col("t0")).cast("double"))
        )
    )
    return o.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max(F.col("t1") - F.col("t0")).cast("bigint").alias("span_us"),
        F.round(twa, 6).alias("twa_value"),
    )


# --------------------------------------------------------------------------
# vocab_coverage_oov — tokenizer-fit / OOV-rate signal
# --------------------------------------------------------------------------

_VOCAB_K = 100


@register(
    "vocab_coverage_oov",
    f"""
WITH toks AS (
    SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents
),
vocab AS (
    SELECT tok FROM (
        SELECT tok, count(*) AS c FROM toks GROUP BY 1
        ORDER BY c DESC, tok
        LIMIT {_VOCAB_K})
),
per_doc AS (
    SELECT t.doc_id, t.lang,
           count(*) AS n_toks,
           count(*) FILTER (WHERE v.tok IS NULL) AS n_oov
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY 1, 2
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       CAST(sum(n_oov) AS BIGINT) AS total_oov,
       round(avg(n_oov / CAST(n_toks AS DOUBLE)), 6) AS avg_oov_ratio
FROM per_doc
GROUP BY lang
""",
)
def vocab_coverage_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage: build the top-100 corpus vocabulary (count
    desc, token asc — deterministic) and report per-language OOV rates —
    the signal for sizing a tokenizer vocabulary against a corpus mix.

    The vocabulary is a distributed top-K (TakeOrdered over the
    map-side-combined token counts, never a global sort) and joins back
    BROADCAST, so the corpus-scale token stream shuffles once (the
    per-doc aggregate); empty-token documents drop out of the token
    explode on both engines identically."""
    docs = _load_parallel(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(tx.tokens(F.lower(F.col("text")))).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(_VOCAB_K)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_toks"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.sum("n_oov").cast("bigint").alias("total_oov"),
        F.round(F.avg(F.col("n_oov") / F.col("n_toks").cast("double")), 6).alias(
            "avg_oov_ratio"
        ),
    )


# --------------------------------------------------------------------------
# ann_recall_at_k — index-quality evaluation (IVF vs exact)
# --------------------------------------------------------------------------


def _ann_recall_sql() -> str:
    """Composes the two already-proven oracles (exact brute-force top-10
    and IVF top-10) and computes per-query overlap — the oracle inherits
    their bit-exactness, so recall itself is exact."""
    from kafka_streams_example_spark import registry

    exact_sql = registry.ORACLES["similarity_cosine_topk"]
    ivf_sql = registry.ORACLES["similarity_ivf_topk"]
    return f"""
WITH exact AS (SELECT q_id, vec_id FROM ({exact_sql}) x),
approx AS (SELECT q_id, vec_id FROM ({ivf_sql}) a),
base AS (SELECT q_id, count(*) AS n_exact FROM exact GROUP BY 1),
hits AS (SELECT a.q_id, count(*) AS n_hits
         FROM approx a JOIN exact e USING (q_id, vec_id) GROUP BY 1)
SELECT b.q_id, b.n_exact,
       coalesce(h.n_hits, 0) AS n_hits,
       round(coalesce(h.n_hits, 0) / 10.0, 6) AS recall_at_10
FROM base b LEFT JOIN hits h USING (q_id)
"""


@register("ann_recall_at_k", _ann_recall_sql())
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation: recall@10 of the IVF index against the
    exact brute-force top-10, per query — the acceptance gate before an
    approximate index replaces exact search in a retrieval pipeline.
    Same parameters as the registered similarity_ivf_topk (16 cells,
    nprobe=4, queries = vec_id < 8).

    Both sides reuse the existing operators, so the eval costs one exact
    pass over the query set (queries are a sample — exact search over a
    sample is the standard recall protocol) plus the IVF path being
    measured; the overlap join is per-query×k rows, trivially small."""
    from kafka_streams_example_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    # queries × rows × nprobe/cells: the window input unions all 8
    # query vectors' probed cells
    est = 8 * table_row_count(spark, sf_dir, "embeddings") * 4 // 16
    exact = sim.cosine_topk(emb, q, k=10, dim=64).select("q_id", "vec_id")
    approx = sim.ivf_topk(
        emb, q, centroids=emb.filter(F.col("vec_id") < 16), nprobe=4, k=10, dim=64,
        candidate_rows=est,
    ).select("q_id", "vec_id")
    base = exact.groupBy("q_id").agg(F.count("*").alias("n_exact"))
    hits = approx.join(exact, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count("*").alias("n_hits")
    )
    return base.join(hits, "q_id", "left").select(
        "q_id",
        "n_exact",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / 10.0, 6).alias("recall_at_10"),
    )


# --------------------------------------------------------------------------
# contamination_blast_radius — hop-capped recursive closure (WITH RECURSIVE)
# --------------------------------------------------------------------------

_BLAST_HOPS = 3

_BLAST_EDGES_SQL = """
WITH RECURSIVE
t AS (SELECT doc_id, lang, source, {toks} AS toks FROM documents),
d AS (SELECT doc_id, lang, source,
             list_distinct(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ng
      FROM t),
nz AS (SELECT * FROM d WHERE len(ng) > 0),
edges AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM nz a JOIN nz b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.ng, b.ng))
          / CAST(len(list_distinct(list_concat(a.ng, b.ng))) AS DOUBLE) >= 0.5
),
und AS (SELECT id_a AS u, id_b AS v FROM edges
        UNION SELECT id_b, id_a FROM edges),
reach(seed, id, hops) AS (
    SELECT u, u, 0 FROM (SELECT DISTINCT u FROM und) s
    UNION ALL
    SELECT r.seed, e.v, r.hops + 1
    FROM reach r JOIN und e ON e.u = r.id
    WHERE r.hops < {max_hops}
)
SELECT seed, id AS doc_id, CAST(min(hops) AS INT) AS hops
FROM reach
WHERE seed <> id
GROUP BY 1, 2
"""


@register(
    "contamination_blast_radius",
    _BLAST_EDGES_SQL.format(toks=_TOKS, max_hops=_BLAST_HOPS),
)
def contamination_blast_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop transitive closure over the near-dup graph via Spark
    4's WITH RECURSIVE: every doc reachable within 3 near-dup hops of
    each edge endpoint, with its hop distance — the "blast radius" a
    contaminated document infects through duplicate links (contamination
    is transitive: a near-dup of a near-dup of a benchmark doc is still
    leaked).

    This is the declarative spelling of the closure the iterative CC
    operator (operators/graph.py) computes loop-wise; Spark's recursive
    CTE currently supports UNION ALL only, so the hop cap both bounds
    path re-expansion on cycles and guarantees termination, and the
    min-hop dedup happens in the final aggregate. Pair generation at
    100 TB swaps the exact blocked join for the MinHash candidate path,
    exactly as dedup_clusters does."""
    docs = _load_parallel(spark, sf_dir, "documents")
    # Materialize the (tiny) edge list BEFORE the recursion: a recursive
    # CTE re-evaluates its referenced plans per step, which would re-run
    # the whole pair-generation join once per hop (measured 8 s → 1 s at
    # sf0.1). The checkpointed edge list is pairs-sized — trivially small
    # next to the corpus that produced it.
    # NULL-safe, collision-free block key (same construction as the
    # sketch-audit query): concat_ws would merge NULL-bearing blocks and
    # collide on '|'-containing values, diverging from the oracle's
    # NULL-propagating equality join.
    blk = F.concat(
        F.base64(F.encode(F.col("lang"), "utf-8")),
        F.lit("|"),
        F.base64(F.encode(F.col("source"), "utf-8")),
    )
    pairs = (
        dd.ngram_jaccard_pairs(docs, block_key=blk, threshold=0.5)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    pairs.createOrReplaceTempView("__blast_edges")
    return spark.sql(
        f"""
        WITH RECURSIVE
        und AS (SELECT id_a AS u, id_b AS v FROM __blast_edges
                UNION SELECT id_b, id_a FROM __blast_edges),
        reach(seed, id, hops) AS (
            SELECT u, u, 0 FROM (SELECT DISTINCT u FROM und) s
            UNION ALL
            SELECT r.seed, e.v, r.hops + 1
            FROM reach r JOIN und e ON e.u = r.id
            WHERE r.hops < {_BLAST_HOPS}
        )
        SELECT seed, id AS doc_id, CAST(min(hops) AS INT) AS hops
        FROM reach
        WHERE seed <> id
        GROUP BY 1, 2
        """
    )


# --------------------------------------------------------------------------
# similarity_pair_histogram — dedup-threshold calibration curve
# --------------------------------------------------------------------------


@register(
    "similarity_pair_histogram",
    f"""
WITH d AS (
    SELECT doc_id, lang, source, {_NGRAMS3} AS ng
    FROM (SELECT doc_id, lang, source, {_TOKS} AS t FROM documents)
),
nz AS (SELECT * FROM d WHERE len(ng) > 0),
pairs AS (
    SELECT floor(len(list_intersect(a.ng, b.ng))
           / CAST(len(list_distinct(list_concat(a.ng, b.ng))) AS DOUBLE)
           * 1000000.0 + 0.5) / 1000000.0 AS jac
    FROM nz a JOIN nz b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.ng, b.ng))
          / CAST(len(list_distinct(list_concat(a.ng, b.ng))) AS DOUBLE) >= 0.2
)
SELECT CAST(least(floor(jac * 10), 9) AS INT) AS bucket,
       round(least(floor(jac * 10), 9) / 10.0, 1) AS bucket_lo,
       count(*) AS n_pairs,
       min(jac) AS min_jac,
       max(jac) AS max_jac
FROM pairs
GROUP BY 1, 2
""",
)
def similarity_pair_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold calibration: the similarity histogram of candidate
    pairs (blocked 3-gram Jaccard ≥ 0.2, bucketed by 0.1) — the curve you
    read before choosing the near-dup cutoff, instead of cargo-culting
    0.8. One pair computation feeds every bucket; at 100 TB the pair
    source swaps to the MinHash candidate path like every other consumer
    of the pair generator."""
    docs = _load_parallel(spark, sf_dir, "documents")
    blk = F.concat(
        F.base64(F.encode(F.col("lang"), "utf-8")),
        F.lit("|"),
        F.base64(F.encode(F.col("source"), "utf-8")),
    )
    pairs = dd.ngram_jaccard_pairs(docs, block_key=blk, threshold=0.2)
    bucket = F.least(F.floor(F.col("jaccard") * 10), F.lit(9)).cast("int")
    return (
        pairs.withColumn("bucket", bucket)
        .withColumn("bucket_lo", F.round(F.col("bucket") / 10.0, 1))
        .groupBy("bucket", "bucket_lo")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("jaccard").alias("min_jac"),
            F.max("jaccard").alias("max_jac"),
        )
    )
