"""Sixteenth query tranche: engine-level primitives a 100 TB pipeline
leans on — a distributed Bloom-filter build + probe join (the runtime-
filter / semi-join-pruning shape), a Johnson–Lindenstrauss random-
projection distortion audit (the dimensionality-reduction contract
behind every ANN shortcut), and a fixed-weight logistic quality
classifier (fasttext-style model scoring as pure column expressions).

All three are fully oracle-checked: the Bloom positions, JL signs and
logistic features are md5-/constant-derived on both engines, so even the
"probabilistic" outputs reproduce bit-exactly.

Reference parity note: the reference engine (Kafka Streams DSL,
SolarConsumer.java) has no analogue — these extend the engine toward the
LLM-data-pipeline north star (SURVEY.md §2, beyond-reference table).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_example_spark.operators import similarity as sim
from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.registry import (
    _TOKS,
    _load_parallel,
    register,
)

# --------------------------------------------------------------------------
# bloom_filter_probe_join — distributed Bloom build + broadcast probe
# --------------------------------------------------------------------------

_BF_M = 16384  # bits
_BF_K = 5  # hash functions
_BF_WORD = 64  # bits per bitmap word


def _spark_bf_pos(key, j: int):
    """Bloom bit position j for a key: md5-derived 60-bit integer mod m —
    the engine-portable flavor (functions/hashing.py:stable_long); at
    100 TB the hot path would swap in xxhash64 and keep the layout."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bf{j}:"), key.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % _BF_M
    )


def _duck_bf_pos(key: str, j: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('bf' || {j} || ':' || {key}), 1, 15)) AS BIGINT)"
        f" % {_BF_M}"
    )


def _spark_bf_pos_for_j(key):
    """Position for the exploded per-row hash index `j` (0.._BF_K-1)."""
    expr = F.when(F.col("j") == 0, _spark_bf_pos(key, 0))
    for j in range(1, _BF_K - 1):
        expr = expr.when(F.col("j") == j, _spark_bf_pos(key, j))
    return expr.otherwise(_spark_bf_pos(key, _BF_K - 1))


@register(
    "bloom_filter_probe_join",
    f"""
WITH members AS (
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
),
mpos AS (
    SELECT DISTINCT {_duck_bf_pos("o_custkey", "j")} AS pos
    FROM members, (SELECT unnest(generate_series(0, {_BF_K - 1})) AS j)
),
probe AS (
    SELECT c_custkey, j, {_duck_bf_pos("c_custkey", "j")} AS pos
    FROM customer, (SELECT unnest(generate_series(0, {_BF_K - 1})) AS j)
),
hits AS (
    SELECT p.c_custkey,
           count(*) FILTER (WHERE m.pos IS NOT NULL) = {_BF_K} AS contained
    FROM probe p LEFT JOIN mpos m ON p.pos = m.pos
    GROUP BY p.c_custkey
),
flagged AS (
    SELECT h.c_custkey, h.contained,
           EXISTS (SELECT 1 FROM members m WHERE m.o_custkey = h.c_custkey)
               AS is_member
    FROM hits h
)
SELECT contained, is_member, CAST(count(*) AS BIGINT) AS n_keys
FROM flagged
GROUP BY contained, is_member
""",
)
def bloom_filter_probe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Bloom-filter semi-join pruning, built entirely from
    DataFrame ops: the member side (custkeys with a finished order)
    hashes each key to k={_BF_K} bit positions, folds them into an
    m=16 Kbit bitmap with a bit_or aggregate (m/64 = 256 rows), and the
    tiny bitmap broadcasts to the probe side (every customer), which is
    "contained" iff all k of its bits are set. Output is the
    (contained × is_member) confusion matrix — false negatives are
    structurally impossible (that cell never appears), false positives
    are the bounded cost of pruning. Spark 4 keeps bloom_filter_agg
    internal to its runtime-filter rewrite, so this is the user-level
    equivalent — and the exact shape of build-small-filter,
    broadcast-it, prune-the-big-scan at 100 TB.

    Oracle: positions are md5-derived on both engines, so membership in
    the bit set (DuckDB checks position membership directly — the same
    set the bitmap encodes) reproduces exactly, false positives
    included."""
    orders = _load_parallel(spark, sf_dir, "orders")
    cust = _load_parallel(spark, sf_dir, "customer")
    members = (
        orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(_BF_K)])).alias("j")
    mbits = (
        members.select("o_custkey", js)
        .select(_spark_bf_pos_for_j(F.col("o_custkey")).alias("pos"))
        .select(
            (F.col("pos") / _BF_WORD).cast("long").alias("word"),
            (F.col("pos") % _BF_WORD).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits"))
    )
    ppos = cust.select("c_custkey", js).select(
        "c_custkey", _spark_bf_pos_for_j(F.col("c_custkey")).alias("pos")
    )
    probed = (
        ppos.withColumn("word", (F.col("pos") / _BF_WORD).cast("long"))
        .withColumn("bit", (F.col("pos") % _BF_WORD).cast("int"))
        .join(F.broadcast(mbits), "word", "left")
        .select(
            "c_custkey",
            (
                F.expr(
                    "shiftright(coalesce(bits, CAST(0 AS BIGINT)), bit) & 1"
                )
                == 1
            ).alias("hit"),
        )
        .groupBy("c_custkey")
        .agg((F.sum(F.col("hit").cast("int")) == _BF_K).alias("contained"))
    )
    flagged = probed.join(
        members.withColumnRenamed("o_custkey", "c_custkey").withColumn(
            "is_member", F.lit(True)
        ),
        "c_custkey",
        "left",
    ).select("contained", F.coalesce("is_member", F.lit(False)).alias("is_member"))
    return flagged.groupBy("contained", "is_member").agg(
        F.count("*").cast("long").alias("n_keys")
    )


# --------------------------------------------------------------------------
# jl_projection_distortion — Johnson–Lindenstrauss pair-distance audit
# --------------------------------------------------------------------------

_JL_DIM = 64
_JL_K = 16


def _jl_signs() -> list[list[float]]:
    """The ±1/sqrt(k) projection matrix, derived from md5 so it is a
    shared constant (embedded as literals in BOTH engines' plans, never
    shipped): sign(j,i) = parity of md5("jl:j:i")."""
    scale = 1.0 / (_JL_K**0.5)
    return [
        [
            (
                scale
                if int(hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()[:15], 16) % 2
                == 0
                else -scale
            )
            for i in range(_JL_DIM)
        ]
        for j in range(_JL_K)
    ]


_JL = _jl_signs()


def _duck_jl_row(j: int) -> str:
    arr = "[" + ", ".join(repr(x) for x in _JL[j]) + "]::DOUBLE[]"
    return (
        f"list_aggregate(list_transform(generate_series(1, {_JL_DIM}),"
        f" i -> diff[i] * ({arr})[i]), 'sum')"
    )


@register(
    "jl_projection_distortion",
    f"""
WITH pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_transform(generate_series(1, {_JL_DIM}),
                          i -> CAST(a.embedding[i] AS DOUBLE)
                               - CAST(b.embedding[i] AS DOUBLE)) AS diff
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    WHERE a.vec_id % 2 = 0
),
dist AS (
    SELECT id_a, id_b,
           list_aggregate(list_transform(generate_series(1, {_JL_DIM}),
                          i -> diff[i] * diff[i]), 'sum') AS d_orig_sq,
           {" + ".join(f"pow({_duck_jl_row(j)}, 2)" for j in range(_JL_K))}
               AS d_proj_sq
    FROM pairs
)
SELECT id_a, id_b,
       round(d_orig_sq, 6) AS d_orig_sq,
       round(d_proj_sq, 6) AS d_proj_sq,
       round(d_proj_sq / nullif(d_orig_sq, 0.0), 6) AS distortion
FROM dist
""",
)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random-projection audit: project the 64-dim
    embeddings to k=16 dims with a seeded ±1/sqrt(k) sign matrix (a
    CONSTANT, baked into the plan as literals — nothing extra crosses
    the wire) and report, for each consecutive vec-id pair, the squared
    distance before and after projection and their ratio. The JL lemma
    says the distortion concentrates around 1 — this is the certificate
    you compute before trusting a projected index (LSH, IVF on reduced
    vectors) at 100 TB, and the distance math is one map-only scan over
    a narrow self-join (adjacent ids: a 1-row-shift join, no pair
    explosion).

    Projection of the DIFFERENCE vector equals the difference of
    projections (linearity), so each pair costs k dot products over one
    diff array — folds in identical order on both engines."""
    emb = _load_parallel(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")
    )
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    diff = F.zip_with("ea", "eb", lambda x, y: x.cast("double") - y.cast("double"))
    pairs = (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select("id_a", "id_b", diff.alias("diff"))
    )
    d_orig = sim.dot(F.col("diff"), F.col("diff"), _JL_DIM)
    d_proj = None
    for j in range(_JL_K):
        row = F.array(*[F.lit(x) for x in _JL[j]])
        comp = F.pow(sim.dot(F.col("diff"), row, _JL_DIM), 2)
        d_proj = comp if d_proj is None else d_proj + comp
    dist = pairs.select(
        "id_a",
        "id_b",
        d_orig.alias("d_orig_sq"),
        d_proj.alias("d_proj_sq"),
    )
    return dist.select(
        "id_a",
        "id_b",
        F.round("d_orig_sq", 6).alias("d_orig_sq"),
        F.round("d_proj_sq", 6).alias("d_proj_sq"),
        F.round(
            F.col("d_proj_sq") / F.nullif(F.col("d_orig_sq"), F.lit(0.0)), 6
        ).alias("distortion"),
    )


# --------------------------------------------------------------------------
# quality_logreg_score — fixed-weight logistic quality classifier
# --------------------------------------------------------------------------

# Published-style fixed weights (fasttext-like linear quality model):
# bias, ln(1+tokens), stopword ratio, special-char ratio, avg token len.
_LR_W = {
    "bias": -2.0,
    "log_tokens": 0.8,
    "stop_ratio": 3.0,
    "special_ratio": -5.0,
    "avg_tok_len": -0.1,
}
_LR_STOPS = ", ".join(f"'{w}'" for w in tx.STOPWORDS["en"])


@register(
    "quality_logreg_score",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks, text FROM documents),
feat AS (
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           ln(1.0 + len(toks)) AS f_log_tokens,
           CASE WHEN len(toks) > 0 THEN
               len(list_filter(toks, x -> list_contains([{_LR_STOPS}], x)))
               / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS f_stop,
           CASE WHEN length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g')) > 0 THEN
               length(regexp_replace(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g'), '[A-Za-z0-9]', '', 'g'))
               / CAST(length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g')) AS DOUBLE) ELSE 0.0 END AS f_special,
           CASE WHEN len(toks) > 0 THEN
               list_aggregate(list_transform(toks, x -> length(x)), 'sum')
               / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS f_avg_len
    FROM t
),
scored AS (
    SELECT doc_id, n_tokens,
           round(f_stop, 6) AS stop_ratio,
           round(f_special, 6) AS special_ratio,
           round(f_avg_len, 6) AS avg_tok_len,
           round(1.0 / (1.0 + exp(-({_LR_W["bias"]}
               + {_LR_W["log_tokens"]} * f_log_tokens
               + {_LR_W["stop_ratio"]} * f_stop
               + {_LR_W["special_ratio"]} * f_special
               + {_LR_W["avg_tok_len"]} * f_avg_len))), 6) AS quality_prob
    FROM feat
)
SELECT doc_id, n_tokens, stop_ratio, special_ratio, avg_tok_len,
       quality_prob, quality_prob >= 0.5 AS kept
FROM scored
""",
)
def quality_logreg_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-weight logistic-regression quality classifier (the
    fasttext-style linear scorer every corpus pipeline runs before
    training): engineered features — log token count, stopword ratio,
    special-char ratio, mean token length — dotted with published
    weights through a sigmoid, entirely as JVM column expressions (zero
    Python in the hot path; a learned model swaps the literal weights
    for a broadcast weight row, same plan). `kept` is the boolean the
    downstream filter consumes, decided on the 6dp-rounded probability
    so both engines threshold the same value.

    Scale: map-only scan, no shuffle, whole-stage-codegen'd; the
    features reuse text_quality_stats' exact definitions (registry.py)
    so the classifier can never drift from the published feature
    semantics."""
    docs = _load_parallel(spark, sf_dir, "documents")
    toks = tx.tokens(F.lower(F.col("text")))
    n_tok = F.size(toks)
    f_log_tokens = F.log(F.lit(1.0) + n_tok)
    f_stop = tx.stopword_ratio(F.col("text"), "en")
    f_special = tx.special_char_ratio(F.col("text"))
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    f_avg_len = F.when(
        n_tok > 0, tok_chars / n_tok.cast("double")
    ).otherwise(F.lit(0.0))
    z = (
        F.lit(_LR_W["bias"])
        + F.lit(_LR_W["log_tokens"]) * f_log_tokens
        + F.lit(_LR_W["stop_ratio"]) * f_stop
        + F.lit(_LR_W["special_ratio"]) * f_special
        + F.lit(_LR_W["avg_tok_len"]) * f_avg_len
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(f_stop, 6).alias("stop_ratio"),
        F.round(f_special, 6).alias("special_ratio"),
        F.round(f_avg_len, 6).alias("avg_tok_len"),
        prob.alias("quality_prob"),
        (prob >= 0.5).alias("kept"),
    )


# --------------------------------------------------------------------------
# kmv_distinct_sketch — k-minimum-values cardinality estimate
# --------------------------------------------------------------------------

_KMV_K = 64
_KMV_SPACE = float(1 << 60)  # stable_long's hash space


@register(
    "kmv_distinct_sketch",
    f"""
WITH hashed AS (
    SELECT DISTINCT CAST(('0x' || substr(md5(trim(regexp_replace(lower(text),
               '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))), 1, 15)) AS BIGINT) AS h
    FROM documents
),
kth AS (
    SELECT max(h) AS h_k, CAST(count(*) AS BIGINT) AS k_seen
    FROM (SELECT h FROM hashed ORDER BY h LIMIT {_KMV_K})
),
exact AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM hashed),
est AS (
    SELECT kth.h_k, kth.k_seen, e.n_exact,
           CASE WHEN kth.k_seen < {_KMV_K} THEN CAST(kth.k_seen AS DOUBLE)
                ELSE ({_KMV_K} - 1) / (kth.h_k / {_KMV_SPACE!r}) END AS raw
    FROM kth, exact e
)
SELECT CAST({_KMV_K} AS BIGINT) AS k,
       n_exact,
       h_k AS kth_hash,
       round(raw, 2) AS kmv_estimate,
       round(abs(raw - n_exact) / n_exact, 6) AS rel_err,
       abs(raw - n_exact) / n_exact <= 3.0 / sqrt({_KMV_K}) AS within_bound
FROM est
""",
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002,
    public method) over the corpus' normalized-content fingerprints —
    "how many distinct documents, without a global distinct": hash every
    normalized text into [0, 2^60), keep the k=64 smallest distinct
    hashes, and estimate cardinality as (k-1)/fraction-of-hash-space at
    the kth minimum (exact k_seen when fewer than k hashes exist — the
    standard small-cardinality regime). Unlike HLL, the KMV estimate is
    a pure deterministic function of the md5 hash values — so the
    ESTIMATE ITSELF is oracle-exact, not just an accuracy contract; the
    relative-error column is audited against the ~1/sqrt(k) bound
    (3 sigma).

    Scale shape: the k smallest hashes compute as TakeOrderedAndProject
    (per-partition top-k, then a k-sized merge at the driver — no global
    sort, no wide shuffle); the sketch state is k longs, and merging
    shards = min-k over unioned sketches, the standard mergeable-summary
    layout at 100 TB. (The exact n_exact column is the audit twin — a
    production run would publish only the sketch side.)"""
    docs = _load_parallel(spark, sf_dir, "documents")
    from kafka_streams_example_spark.functions.hashing import (
        normalize_text,
        stable_long,
    )

    hashed = docs.select(
        stable_long(normalize_text(F.col("text"))).alias("h")
    ).distinct()
    kth = (
        hashed.orderBy("h")
        .limit(_KMV_K)
        .agg(F.max("h").alias("h_k"), F.count("*").cast("long").alias("k_seen"))
    )
    exact = hashed.agg(F.count("*").cast("long").alias("n_exact"))
    est = F.when(
        F.col("k_seen") < _KMV_K, F.col("k_seen").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1)) / (F.col("h_k") / F.lit(_KMV_SPACE))
    )
    rel = F.abs(est - F.col("n_exact")) / F.col("n_exact")
    return (
        kth.crossJoin(F.broadcast(exact))
        .select(
            F.lit(_KMV_K).cast("long").alias("k"),
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("h_k").alias("kth_hash"),
            F.round(est, 2).alias("kmv_estimate"),
            F.round(rel, 6).alias("rel_err"),
            (rel <= 3.0 / (_KMV_K**0.5)).alias("within_bound"),
        )
    )


# --------------------------------------------------------------------------
# shard_manifest — reproducible dataset manifest with content checksums
# --------------------------------------------------------------------------

_MAN_SHARDS = 16
_MAN_MOD = (1 << 60) - 1  # commutative-checksum modulus


@register(
    "shard_manifest",
    f"""
WITH t AS (
    SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % {_MAN_SHARDS} AS shard,
           n_chars,
           CAST(('0x' || substr(md5(trim(regexp_replace(lower(text),
                '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))), 1, 15)) AS BIGINT) AS fph
    FROM documents
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(fph) % {_MAN_MOD} AS BIGINT) AS content_checksum
FROM t
GROUP BY shard
""",
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible dataset manifest — the versioning record a training
    run pins before reading a corpus: docs assign to {_MAN_SHARDS} shards
    by id hash, and each shard publishes its doc count, byte budget and a
    content checksum (sum of 60-bit normalized-text fingerprints mod
    2^60-1). The checksum is ORDER-INDEPENDENT (commutative sum), so it
    is insensitive to scan order, partitioning and shuffle — two runs
    over the same data always agree, any changed/dropped/added doc flips
    it. That commutativity is what makes it computable as an ordinary
    map-side-combined aggregate at 100 TB, where a concatenation-based
    hash (string_agg ORDER BY) would need a per-shard global sort.

    DuckDB's sum() promotes to HUGEINT (128-bit) and Spark's sum of
    longs wraps at 2^63 — so fingerprints stay in [0, 2^60) and the
    Spark side sums DECIMAL(38,0) to match the exact wide sum before the
    final modulus."""
    docs = _load_parallel(spark, sf_dir, "documents")
    from kafka_streams_example_spark.functions.hashing import (
        normalize_text,
        stable_long,
    )

    t = docs.select(
        (stable_long(F.col("doc_id").cast("string")) % _MAN_SHARDS).alias("shard"),
        "n_chars",
        stable_long(normalize_text(F.col("text"))).alias("fph"),
    )
    return t.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        (F.sum(F.col("fph").cast("decimal(38,0)")) % _MAN_MOD)
        .cast("long")
        .alias("content_checksum"),
    )
