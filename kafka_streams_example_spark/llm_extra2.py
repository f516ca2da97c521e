"""Third tranche of large-scale training-data-pipeline operators:

- doc_chunking:          fixed-size overlapping character chunks (the
                         standard pre-embedding / pre-training split),
                         1 doc -> N chunk rows with content hashes.
- pack_sequences:        offset-bucket packing of docs into fixed
                         token-budget training sequences, sharded so the
                         prefix-sum window never sees more than one shard.
- tfidf_top_terms:       per-document top-3 TF-IDF terms (the classic
                         keyword/feature extraction over a corpus).
- value_histogram:       fixed-width histogram of a numeric column —
                         pure arithmetic bucketing, one shuffle.
- ewma_trailing_signal:  trailing exponentially-weighted moving average
                         per user via explicit lag taps (feature
                         engineering for event-sequence models).
- pii_scrub_events:      digit-run redaction over the raw props payload
                         with redaction counts (the PII-scrub shape;
                         production swaps in real PII regexes).
- neardup_dedup_corpus:  end-to-end near-dup dedup — survivors after
                         removing every doc that near-duplicates a
                         lower-id doc (keep-first policy over the exact
                         3-gram-Jaccard pair set).

Engine-surface extensions beyond the reference
(thingsboard/kafka-streams-example has no corpus layer at all —
SURVEY.md §2 "operators the reference does NOT have" + north star).

Scale notes (100 TB target):
- doc_chunking / pii_scrub / ewma / histogram are map-side or
  single-shuffle; chunking's explode multiplies rows ~4x but stays
  inside whole-stage codegen (sequence + substring, no Python).
- pack_sequences partitions its running-sum window by a deterministic
  doc_id shard, so state per window partition is bounded by shard size
  (shard count scales with the INPUT via pack_shard_count; a global
  prefix-sum would serialize on one task).
- tfidf joins the per-(doc,term) TF table to the per-term DF table on
  `term`; DF is corpus-wide but tiny relative to the corpus (vocab,
  not tokens) -> broadcast.
- neardup_dedup_corpus anti-joins the corpus against the near-dup pair
  set's right side; the pair set is orders of magnitude smaller than
  the corpus -> broadcast anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.operators import dedup as dd
from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.registry import _TOKS, _load_parallel, register
from kafka_streams_example_spark.sources.files import table_row_count

# --------------------------------------------------------------------------
# doc_chunking
# --------------------------------------------------------------------------

_CHUNK = 200  # chunk size (chars)
_STRIDE = 150  # stride => 50-char overlap between consecutive chunks


@register(
    "doc_chunking",
    f"""
SELECT doc_id,
       CAST(i AS INT) AS chunk_id,
       CAST(i * {_STRIDE} + 1 AS BIGINT) AS chunk_start,
       CAST(length(substr(text, CAST(i * {_STRIDE} + 1 AS BIGINT), {_CHUNK})) AS INT) AS chunk_len,
       md5(substr(text, CAST(i * {_STRIDE} + 1 AS BIGINT), {_CHUNK})) AS chunk_md5
FROM documents, unnest(generate_series(0, CAST(floor((length(text) - 1) / {_STRIDE}) AS BIGINT))) AS u(i)
WHERE length(text) > 0
""",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping character chunking: 200-char chunks every
    150 chars (50-char overlap), the standard split before embedding or
    context-window packing. One row per (doc, chunk) with the chunk's
    content hash for downstream chunk-level dedup.

    All JVM-side (sequence -> explode -> substring -> md5): the explode
    multiplies rows by ~len/stride but never leaves whole-stage codegen,
    and chunk hashing makes the output joinable without carrying text.
    """
    docs = _load_parallel(spark, sf_dir, "documents")
    n_chunks = F.floor((F.length("text") - F.lit(1)) / F.lit(_STRIDE))
    chunked = (
        docs.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks)).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_id"),
            (F.col("i") * _STRIDE + 1).cast("bigint").alias("chunk_start"),
            F.substring(
                F.col("text"), (F.col("i") * _STRIDE + 1).cast("int"), _CHUNK
            ).alias("chunk"),
        )
    )
    return chunked.select(
        "doc_id",
        "chunk_id",
        "chunk_start",
        F.length("chunk").alias("chunk_len"),
        F.md5(F.encode("chunk", "utf-8")).alias("chunk_md5"),
    )


# --------------------------------------------------------------------------
# pack_sequences
# --------------------------------------------------------------------------

_CTX = 512  # token budget per packed training sequence
_MIN_SHARDS = 16  # shard-count floor (small inputs)
_DOCS_PER_SHARD = 4096  # target docs per packing shard (bounds window state)


def pack_shard_count(n_docs: int) -> int:
    """Data-dependent packing shard count: ~one shard per 4096 docs with a
    floor of 16. A FIXED shard count caps window parallelism — at 100 TB
    each window partition would hold corpus/16 rows sorted on one reducer;
    deriving shards from input size keeps per-shard rows bounded
    (~_DOCS_PER_SHARD for uniformly distributed doc_ids) so the prefix
    sum scales out with the data."""
    return max(_MIN_SHARDS, -(-n_docs // _DOCS_PER_SHARD))


@register(
    "pack_sequences",
    f"""
WITH s AS (
    SELECT greatest({_MIN_SHARDS},
                    CAST(ceil(count(*) / {_DOCS_PER_SHARD}.0) AS BIGINT)) AS n_shards
    FROM documents
),
t AS (
    SELECT doc_id,
           doc_id % s.n_shards AS shard,
           len({_TOKS}) AS n_tokens
    FROM documents, s
),
c AS (
    SELECT *,
           sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS cum_before
    FROM t
)
SELECT shard,
       CAST(floor(cum_before / {_CTX}) AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,  -- HUGEINT→float64 in pandas otherwise
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM c
GROUP BY 1, 2
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-bucket sequence packing: within each deterministic shard
    (doc_id % n_shards), docs are laid out in doc_id order and assigned to
    the training sequence their starting token offset falls in
    (seq_id = floor(cum_before / 512)). This is offset bucketing, NOT
    greedy packing — a sequence's total_tokens can exceed the 512 budget
    when a long doc lands on or straddles a boundary (true greedy packing
    needs a stateful sequential pass; downstream truncation absorbs the
    overflow). Emits per-sequence stats.

    The running sum is a window over (shard); the shard count scales with
    the input (pack_shard_count: ~4096 docs per shard) so each window
    partition holds a bounded number of rows and packing parallelizes
    with the cluster instead of serializing on a single global prefix sum.
    """
    docs = _load_parallel(spark, sf_dir, "documents")
    # footer-metadata count: zero Spark jobs, same value as count(*)
    shards = pack_shard_count(table_row_count(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % shards).alias("shard"),
        F.size(tx.tokens(F.lower(F.col("text")))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (
        c.groupBy(
            "shard",
            F.floor(F.col("cum_before") / _CTX).cast("bigint").alias("seq_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# --------------------------------------------------------------------------
# tfidf_top_terms
# --------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    f"""
WITH toks AS (
    SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
),
df AS (
    SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS INT) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rnk
      FROM scored)
WHERE rnk <= 3
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (idf = ln(N/df), deterministic
    term-name tiebreak) — the classic corpus keyword extraction.

    Two aggregations over the exploded token table (per-(doc,term) TF and
    per-term DF); DF is vocabulary-sized — tiny next to the corpus — so it
    broadcasts back onto TF, and the only large shuffles are the two
    token-keyed groupBys with map-side partial aggregation.
    """
    docs = _load_parallel(spark, sf_dir, "documents")
    # scalar dimension from parquet footers — no Spark count job
    n_docs = table_row_count(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tx.tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf", "rnk")
    )


# --------------------------------------------------------------------------
# value_histogram
# --------------------------------------------------------------------------

_H_LO, _H_HI, _H_NB = 0.0, 100.0, 20  # [0,100) in 20 buckets + clamp


@register(
    "value_histogram",
    f"""
SELECT CAST(least(greatest(floor((value - {_H_LO}) / {(_H_HI - _H_LO) / _H_NB}), 0), {_H_NB - 1}) AS INT) AS bucket,
       round(least(greatest(floor((value - {_H_LO}) / {(_H_HI - _H_LO) / _H_NB}), 0), {_H_NB - 1}) * {(_H_HI - _H_LO) / _H_NB} + {_H_LO}, 2) AS bucket_lo,
       count(*) AS n,
       round(min(value), 2) AS min_v,
       round(max(value), 2) AS max_v,
       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_v
FROM events
GROUP BY 1, 2
""",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of events.value: 20 buckets over [0,100) with
    clamp-to-edge for outliers. Bucketing is closed-form arithmetic (no
    width_bucket dependency, portable across engines), so the whole query
    is one map-side-combinable groupBy on a 20-value key. The sum runs in
    decimal for cross-engine bit-exactness (see registry._dec).
    """
    events = _load_parallel(spark, sf_dir, "events")
    step = (_H_HI - _H_LO) / _H_NB
    bucket = F.least(
        F.greatest(F.floor((F.col("value") - _H_LO) / step), F.lit(0)),
        F.lit(_H_NB - 1),
    ).cast("int")
    return (
        events.withColumn("bucket", bucket)
        .withColumn("bucket_lo", F.round(F.col("bucket") * step + _H_LO, 2))
        .groupBy("bucket", "bucket_lo")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("min_v"),
            F.round(F.max("value"), 2).alias("max_v"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")  # decimal math inside, double out: exact 2dp value,
            .alias("sum_v"),  # pandas-dtype-identical to the DuckDB oracle
        )
    )


# --------------------------------------------------------------------------
# ewma_trailing_signal
# --------------------------------------------------------------------------

_EWMA_ALPHA = 0.6
_EWMA_TAPS = 8


def _ewma_taps_sql() -> str:
    num = " + ".join(
        f"coalesce(lag(value, {k}) OVER w, 0) * {_EWMA_ALPHA ** k!r}"
        for k in range(_EWMA_TAPS)
    )
    den = " + ".join(
        f"(CASE WHEN lag(value, {k}) OVER w IS NULL THEN 0 ELSE {_EWMA_ALPHA ** k!r} END)"
        for k in range(_EWMA_TAPS)
    )
    # den = 0 only if every tap is NULL (possible iff `value` is nullable):
    # guard the divide so Spark (x/0 → Inf/NaN) and DuckDB (x/0 → NULL)
    # cannot diverge — both emit NULL via the same CASE.
    return f"""
SELECT event_id, user_id,
       CASE WHEN ({den}) > 0 THEN round(({num}) / ({den}), 6) END AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("ewma_trailing_signal", _ewma_taps_sql())
def ewma_trailing_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exponentially-weighted moving average of each user's event
    values (8 taps, alpha = 0.6, normalized over the taps present) — the
    smoothed-signal feature for event-sequence models.

    Expressed as explicit lag taps instead of the recursive EWMA: the
    recursion needs either unbounded per-key state or pow(alpha,-n) terms
    that overflow doubles on long histories; fixed taps are a bounded
    window frame per user, exact, and identical across engines.
    """
    events = _load_parallel(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = sum(
        (F.coalesce(F.lag("value", k).over(w), F.lit(0.0)) * (_EWMA_ALPHA**k)
         for k in range(_EWMA_TAPS)),
        start=F.lit(0.0),
    )
    den = sum(
        (F.when(F.lag("value", k).over(w).isNull(), 0.0).otherwise(_EWMA_ALPHA**k)
         for k in range(_EWMA_TAPS)),
        start=F.lit(0.0),
    )
    # same guarded divide as the oracle (see _ewma_taps_sql)
    return events.select(
        "event_id",
        "user_id",
        F.when(den > 0, F.round(num / den, 6)).alias("ewma"),
    )


# --------------------------------------------------------------------------
# pii_scrub_events
# --------------------------------------------------------------------------


@register(
    "pii_scrub_events",
    """
SELECT event_id,
       regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_redactions
FROM events
""",
)
def pii_scrub_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction pass over the raw event payload: every digit run is
    replaced by a `<NUM>` sentinel and counted. This is the PII-scrub
    pipeline shape (map-only, zero shuffles, stays in codegen); a
    production pass swaps in real PII regexes (emails, phones, SSNs)
    with the identical plan.
    """
    events = _load_parallel(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.regexp_replace("props", r"[0-9]+", "<NUM>").alias("scrubbed"),
        F.regexp_count("props", F.lit(r"[0-9]+")).alias("n_redactions"),
    )


# --------------------------------------------------------------------------
# neardup_dedup_corpus
# --------------------------------------------------------------------------

_PAIRS_CTE = f"""
WITH d AS (
    SELECT doc_id, lang, source, {{ngrams}} AS ng
    FROM (SELECT doc_id, lang, source, {_TOKS} AS t FROM documents)
),
nz AS (SELECT * FROM d WHERE len(ng) > 0),
pairs AS (
    SELECT b.doc_id AS dup_id
    FROM nz a JOIN nz b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.ng, b.ng))
          / CAST(len(list_distinct(list_concat(a.ng, b.ng))) AS DOUBLE) >= 0.5
)
"""

_NGRAMS3 = (
    "list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 0)),"
    " i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
)


@register(
    "neardup_dedup_corpus",
    _PAIRS_CTE.format(ngrams=_NGRAMS3)
    + """
SELECT d.lang, d.source,
       count(*) AS n_docs,
       count(*) FILTER (WHERE p.dup_id IS NULL) AS n_survivors,
       min(d.doc_id) AS min_doc
FROM documents d
LEFT JOIN (SELECT DISTINCT dup_id FROM pairs) p ON d.doc_id = p.dup_id
GROUP BY 1, 2
""",
)
def neardup_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup deduplication with the keep-first policy: a doc
    is removed iff it 3-gram-Jaccard-matches (>= 0.5, within (lang,source)
    blocks) some lower doc_id. Reports per-(lang,source) corpus size vs
    survivor count — the dedup yield dashboard.

    The pair set (dup ids) is orders of magnitude smaller than the corpus,
    so survival is a broadcast left-anti-style join; at 100 TB the pair
    generation itself runs through the MinHash-LSH candidate path
    (operators/dedup.py:minhash_pairs) instead of exact blocking.
    """
    docs = _load_parallel(spark, sf_dir, "documents")
    # Collision-free, NULL-faithful block key: base64 never contains '|',
    # so distinct (lang, source) pairs can't collide the way a plain
    # concat_ws could when values contain the delimiter; and F.concat
    # null-propagates, matching the oracle's equality join (which pairs
    # nothing when lang/source is NULL — concat_ws would have skipped the
    # NULL and merged (NULL,'x') with ('x',NULL)).
    blk = F.concat(
        F.base64(F.encode(F.col("lang"), "utf-8")),
        F.lit("|"),
        F.base64(F.encode(F.col("source"), "utf-8")),
    )
    pairs = dd.ngram_jaccard_pairs(docs, block_key=blk, threshold=0.5)
    dups = pairs.select(F.col("id_b").alias("dup_id")).distinct()
    return (
        docs.join(
            F.broadcast(dups), docs.doc_id == dups.dup_id, "left"
        )
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("dup_id").isNull(), 1)).alias("n_survivors"),
            F.min("doc_id").alias("min_doc"),
        )
    )


# --------------------------------------------------------------------------
# udtf_word_windows — Python UDTF surface (Spark 4)
# --------------------------------------------------------------------------

_WW = 5  # words per window (stride == size: non-overlapping)


@register(
    "udtf_word_windows",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       CAST(i AS INT) AS win_id,
       array_to_string(toks[(i * {_WW} + 1):((i + 1) * {_WW})], ' ') AS window_text,
       CAST(len(toks[(i * {_WW} + 1):((i + 1) * {_WW})]) AS INT) AS n_words
FROM t, unnest(generate_series(0, CAST(ceil(len(toks) / {_WW}.0) - 1 AS BIGINT))) AS u(i)
WHERE len(toks) > 0
""",
)
def udtf_word_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-overlapping 5-word windows per document, produced by a Python
    UDTF (Spark 4 user-defined table function) driven through a LATERAL
    join — the 1-row-to-N-rows Python extension point, complementing
    mapInPandas (operators/multimodal.py) on the N-to-M side.

    The UDTF class is function-local so cloudpickle ships it by value
    (see sources/pyds.py for the rationale). Deterministic output → full
    DuckDB oracle parity even though the compute path is Python.
    At scale the UDTF runs per-partition in Arrow-batched Python workers;
    for this particular op the pure-JVM sequence/slice form (doc_chunking)
    is preferred — this entry exists to keep the UDTF surface tested.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="win_id int, window_text string, n_words int")
    class WordWindows:
        def eval(self, text: str):
            toks = [t for t in (text or "").strip().lower().split() if t]
            for i in range(0, len(toks), _WW):
                win = toks[i : i + _WW]
                yield i // _WW, " ".join(win), len(win)

    spark.udtf.register("word_windows", WordWindows)
    docs = _load_parallel(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        """
        SELECT d.doc_id, w.win_id, w.window_text, w.n_words
        FROM udtf_docs_in d, LATERAL word_windows(d.text) w
        """
    )


# --------------------------------------------------------------------------
# chunk_dedup_ratio — line/segment-level dedup signal (C4 / RefinedWeb shape)
# --------------------------------------------------------------------------


@register(
    "chunk_dedup_ratio",
    f"""
WITH ch AS (
    SELECT doc_id,
           md5(substr(text, CAST(i * {_CHUNK} + 1 AS BIGINT), {_CHUNK})) AS h
    FROM documents,
         unnest(generate_series(0, CAST(floor((length(text) - 1) / {_CHUNK}) AS BIGINT))) AS u(i)
    WHERE length(text) > 0
),
freq AS (SELECT h, count(*) AS n_occ FROM ch GROUP BY 1)
SELECT ch.doc_id,
       count(*) AS n_chunks,
       count(*) FILTER (WHERE freq.n_occ > 1) AS n_dup_chunks,
       round(count(*) FILTER (WHERE freq.n_occ > 1)
             / CAST(count(*) AS DOUBLE), 6) AS dup_ratio
FROM ch JOIN freq USING (h)
GROUP BY 1
""",
)
def chunk_dedup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level dedup signal (the C4/RefinedWeb line-dedup shape over
    fixed 200-char segments, since the synthetic corpus has no newlines):
    fraction of each doc's non-overlapping segments whose content hash
    occurs more than once corpus-wide. Docs above a dup_ratio threshold
    get dropped or trimmed by the corpus-prep pipeline.

    Two shuffles at any scale: hash-frequency groupBy (map-side combine;
    the value is a 1-int count), then the hash-keyed equi-join back and a
    per-doc groupBy. No text moves after the map stage — only 16-byte
    hashes."""
    docs = _load_parallel(spark, sf_dir, "documents")
    n_chunks = F.floor((F.length("text") - F.lit(1)) / F.lit(_CHUNK))
    ch = (
        docs.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks)).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            F.md5(
                F.encode(
                    F.substring(
                        F.col("text"), (F.col("i") * _CHUNK + 1).cast("int"), _CHUNK
                    ),
                    "utf-8",
                )
            ).alias("h"),
        )
    )
    freq = ch.groupBy("h").agg(F.count("*").alias("n_occ"))
    return (
        ch.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count(F.when(F.col("n_occ") > 1, 1)).alias("n_dup_chunks"),
            F.round(
                F.count(F.when(F.col("n_occ") > 1, 1)) / F.count("*"), 6
            ).alias("dup_ratio"),
        )
    )


# --------------------------------------------------------------------------
# domain_mixture_weights — sampling weights for corpus domain re-balancing
# --------------------------------------------------------------------------


@register(
    "domain_mixture_weights",
    """
WITH g AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
s AS (SELECT CAST(sum(n) AS DOUBLE) AS total, CAST(count(*) AS DOUBLE) AS n_groups
      FROM g)
SELECT lang, source, n,
       round(n / s.total, 6) AS corpus_share,
       round(s.total / (s.n_groups * n), 6) AS sample_weight
FROM g, s
""",
)
def domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture re-balancing weights: per (lang, source) domain, its
    corpus share and the multiplicative sampling weight that would equalize
    domains (uniform target share / actual share) — the knob a training-
    data pipeline turns to up/down-sample domains before packing.

    One groupBy on the (tiny) domain key plus a broadcast of the 1-row
    total — the corpus itself is touched once; weights join back onto docs
    via a broadcast when the sampler applies them."""
    docs = _load_parallel(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(F.count("*").alias("n"))
    s = g.agg(
        F.sum("n").cast("double").alias("total"),
        F.count("*").cast("double").alias("n_groups"),
    )
    return g.join(F.broadcast(s)).select(
        "lang",
        "source",
        "n",
        F.round(F.col("n") / F.col("total"), 6).alias("corpus_share"),
        F.round(F.col("total") / (F.col("n_groups") * F.col("n")), 6).alias(
            "sample_weight"
        ),
    )


# --------------------------------------------------------------------------
# curriculum_quality_bins — per-language difficulty deciles
# --------------------------------------------------------------------------


@register(
    "curriculum_quality_bins",
    f"""
WITH t AS (
    SELECT doc_id, lang, len({_TOKS}) AS n_tokens, length(text) AS n_chars
    FROM documents
),
b AS (
    SELECT *, ntile(10) OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS bin
    FROM t
)
SELECT lang, CAST(bin AS INT) AS bin,
       count(*) AS n_docs,
       CAST(min(n_tokens) AS INT) AS min_tokens,
       CAST(max(n_tokens) AS INT) AS max_tokens,
       round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
FROM b
GROUP BY 1, 2
""",
)
def curriculum_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: per-language token-length deciles (ntile with a
    deterministic doc_id tiebreak) with per-bin stats — the
    easy-to-hard example ordering used by curriculum schedules.

    The decile window partitions by lang, so sort state is bounded per
    language, not global; at 100 TB swap the exact ntile for
    approx_percentile thresholds (same output contract) if a single
    language outgrows a partition sort."""
    docs = _load_parallel(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        F.size(tx.tokens(F.lower(F.col("text")))).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    w = Window.partitionBy("lang").orderBy("n_tokens", "doc_id")
    return (
        t.withColumn("bin", F.ntile(10).over(w))
        .groupBy("lang", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("avg_chars"),
        )
    )


# --------------------------------------------------------------------------
# preference_pairs — RLHF-style chosen/rejected example assembly
# --------------------------------------------------------------------------


@register(
    "preference_pairs",
    """
WITH e AS (
    SELECT user_id,
           CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
           event_id, value
    FROM events
),
r AS (
    SELECT *,
           row_number() OVER (PARTITION BY user_id, day
                              ORDER BY value DESC, event_id) AS rb,
           row_number() OVER (PARTITION BY user_id, day
                              ORDER BY value ASC, event_id) AS rw
    FROM e
)
SELECT b.user_id, b.day,
       b.event_id AS chosen_id, w.event_id AS rejected_id,
       round(b.value - w.value, 6) AS margin
FROM (SELECT * FROM r WHERE rb = 1) b
JOIN (SELECT * FROM r WHERE rw = 1) w USING (user_id, day)
WHERE b.value > w.value
""",
)
def preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair assembly (the RLHF/DPO dataset shape): per
    (user, day) group, the highest-value event becomes `chosen` and the
    lowest-value `rejected` (deterministic event_id tiebreaks), emitted
    with the value margin; single-event days produce no pair.

    Spark plan: ONE map-side-combinable aggregation — max_by/min_by on
    (value, ±event_id) struct orderings — instead of the oracle's two
    ranking windows + self-join: one shuffle on the pair key, constant
    state per group, no sort. The oracle's window form is the same
    result by construction."""
    ev = _load_parallel(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day")
    g = (
        ev.select("user_id", day, "event_id", "value")
        .groupBy("user_id", "day")
        .agg(
            F.max_by(
                F.struct(F.col("event_id"), F.col("value")),
                F.struct(F.col("value"), (-F.col("event_id")).alias("neg")),
            ).alias("b"),
            F.min_by(
                F.struct(F.col("event_id"), F.col("value")),
                F.struct(F.col("value"), F.col("event_id")),
            ).alias("w"),
        )
    )
    return g.filter(F.col("b.value") > F.col("w.value")).select(
        "user_id",
        "day",
        F.col("b.event_id").alias("chosen_id"),
        F.col("w.event_id").alias("rejected_id"),
        F.round(F.col("b.value") - F.col("w.value"), 6).alias("margin"),
    )


# --------------------------------------------------------------------------
# substring_span_dupes — exact-substring dedup signal (token-span level)
# --------------------------------------------------------------------------

_SPAN_W = 16  # tokens per span
_SPAN_S = 8  # span stride (overlapping: catches dups at any alignment % 8)


@register(
    "substring_span_dupes",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sp AS (
    SELECT doc_id,
           md5(array_to_string(toks[(i * {_SPAN_S} + 1):(i * {_SPAN_S} + {_SPAN_W})], ' ')) AS h
    FROM t,
         unnest(generate_series(0, CAST(floor(greatest(len(toks) - {_SPAN_W}, 0) / {_SPAN_S}) AS BIGINT))) AS u(i)
    WHERE len(toks) >= {_SPAN_W}
),
freq AS (SELECT h, count(*) AS n_occ FROM sp GROUP BY 1)
SELECT sp.doc_id,
       count(*) AS n_spans,
       count(*) FILTER (WHERE freq.n_occ > 1) AS n_dup_spans,
       round(count(*) FILTER (WHERE freq.n_occ > 1)
             / CAST(count(*) AS DOUBLE), 6) AS dup_ratio
FROM sp JOIN freq USING (h)
GROUP BY 1
""",
)
def substring_span_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication signal at token-span granularity (the
    train-data dedup tier between whole-doc fingerprints and char-segment
    hashes): overlapping 16-token spans every 8 tokens, hashed; a span is
    duplicated if its hash occurs anywhere else in the corpus. Reports
    per-doc span counts and the duplicated-span ratio — the signal
    suffix-array exact-substring dedup thresholds on, at 1/stride the
    cost, and the overlap guarantees any ≥23-token verbatim repeat is
    caught regardless of alignment.

    Scale shape (identical to chunk_dedup_ratio): after the explode, only
    16-byte hashes move — one map-side-combinable frequency groupBy, one
    hash equi-join back, one per-doc groupBy. Text stays in the scan
    stage."""
    docs = _load_parallel(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tx.tokens(F.lower(F.col("text"))).alias("toks"))
    n_spans = F.floor(
        F.greatest(F.size("toks") - F.lit(_SPAN_W), F.lit(0)) / F.lit(_SPAN_S)
    ).cast("long")
    sp = (
        toks.filter(F.size("toks") >= _SPAN_W)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), n_spans)).alias("i"),
            "toks",
        )
        .select(
            "doc_id",
            F.md5(
                F.encode(
                    F.array_join(
                        F.slice(
                            F.col("toks"),
                            (F.col("i") * _SPAN_S + 1).cast("int"),
                            _SPAN_W,
                        ),
                        " ",
                    ),
                    "utf-8",
                )
            ).alias("h"),
        )
    )
    freq = sp.groupBy("h").agg(F.count("*").alias("n_occ"))
    return (
        sp.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.count(F.when(F.col("n_occ") > 1, 1)).alias("n_dup_spans"),
            F.round(
                F.count(F.when(F.col("n_occ") > 1, 1)) / F.count("*"), 6
            ).alias("dup_ratio"),
        )
    )


# --------------------------------------------------------------------------
# pack_sequences_greedy — true budget-disciplined packing (stateful)
# --------------------------------------------------------------------------


def greedy_pack(lengths: list[int], budget: int) -> list[int]:
    """Reference greedy packer: walk docs in order, open a new sequence
    whenever adding the next doc would exceed the budget (a doc longer
    than the budget gets a sequence of its own). Returns the seq index
    per doc. Pure Python — the per-shard kernel AND the test oracle."""
    seq, used = 0, 0
    out = []
    for n in lengths:
        if used > 0 and used + n > budget:
            seq, used = seq + 1, 0
        out.append(seq)
        used += n
    return out


@register(
    "pack_sequences_greedy",
    f"""
WITH RECURSIVE s AS (
    SELECT greatest({_MIN_SHARDS},
                    CAST(ceil(count(*) / {_DOCS_PER_SHARD}.0) AS BIGINT)) AS n_shards
    FROM documents
),
t AS MATERIALIZED (
    SELECT doc_id,
           doc_id % s.n_shards AS shard,
           len({_TOKS}) AS n_tokens,
           row_number() OVER (PARTITION BY doc_id % s.n_shards
                              ORDER BY doc_id) AS rn
    FROM documents, s
),
pack AS (
    SELECT shard, rn, doc_id, n_tokens,
           CAST(0 AS BIGINT) AS seq_id, n_tokens AS used
    FROM t WHERE rn = 1
    UNION ALL
    SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
           CASE WHEN p.used > 0 AND p.used + t.n_tokens > {_CTX}
                THEN p.seq_id + 1 ELSE p.seq_id END,
           CASE WHEN p.used > 0 AND p.used + t.n_tokens > {_CTX}
                THEN t.n_tokens ELSE p.used + t.n_tokens END
    FROM pack p JOIN t ON t.shard = p.shard AND t.rn = p.rn + 1
)
SELECT shard,
       seq_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM pack
GROUP BY 1, 2
""",
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE greedy sequence packing (the budget-disciplined complement of
    pack_sequences' offset bucketing): within each shard, docs are walked
    in doc_id order and a sequence closes when the next doc would push it
    past the 512-token budget — so no multi-doc sequence ever exceeds the
    budget (only a single over-long doc can). Greedy packing is
    inherently sequential, so it runs as an applyInPandas kernel per
    shard; the shard count scales with the input (pack_shard_count),
    bounding each kernel to ~4096 docs regardless of corpus size.

    Python-kernel output is deterministic (sorted walk, pure function) —
    checked against an independent per-shard reference in tests AND fully
    hash-verified by the DuckDB oracle, which replays the same greedy fold
    as a WITH RECURSIVE walk (one recursion step per doc rank, all shards
    advancing in lockstep over a MATERIALIZED token-count table)."""
    import pandas as pd

    docs = _load_parallel(spark, sf_dir, "documents")
    # footer-metadata count: zero Spark jobs, same value as count(*)
    shards = pack_shard_count(table_row_count(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % shards).alias("shard"),
        F.size(tx.tokens(F.lower(F.col("text")))).alias("n_tokens"),
    )

    budget = _CTX

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # local copy of greedy_pack: the kernel ships to workers via
        # cloudpickle, and a module-global reference would require this
        # package on the WORKER's sys.path (see sources/pyds.py docstring)
        def _greedy(lengths: list[int], b: int) -> list[int]:
            seq, used = 0, 0
            out = []
            for n in lengths:
                if used > 0 and used + n > b:
                    seq, used = seq + 1, 0
                out.append(seq)
                used += n
            return out

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pdf["seq_id"] = _greedy(pdf["n_tokens"].tolist(), budget)
        g = pdf.groupby("seq_id", sort=True)
        out = pd.DataFrame(
            {
                "shard": pdf["shard"].iloc[0],
                "seq_id": g.size().index.astype("int64"),
                "n_docs": g.size().to_numpy(),
                "total_tokens": g["n_tokens"].sum().to_numpy(),
                "first_doc": g["doc_id"].min().to_numpy(),
                "last_doc": g["doc_id"].max().to_numpy(),
            }
        )
        return out

    return t.groupBy("shard").applyInPandas(
        pack,
        "shard BIGINT, seq_id BIGINT, n_docs BIGINT, total_tokens BIGINT, "
        "first_doc BIGINT, last_doc BIGINT",
    )


# --------------------------------------------------------------------------
# winnowing_fingerprints — rolling-hash document fingerprints (MOSS)
# --------------------------------------------------------------------------

_WIN_K = 8  # chars per gram (rolling-hash width)
_WIN_W = 4  # winnowing window (grams per min-selection window)
_WIN_B = 256  # polynomial base
_WIN_P = (1 << 31) - 1  # Mersenne modulus — keeps every term in int64/ANSI
_WIN_POWS = [pow(_WIN_B, _WIN_K - 1 - j, _WIN_P) for j in range(_WIN_K)]


def _win_gram_sql(s: str, i: str) -> str:
    terms = " + ".join(
        f"(CAST(ascii(substr({s}, {i} + {j}, 1)) AS BIGINT) * {_WIN_POWS[j]}) % {_WIN_P}"
        for j in range(_WIN_K)
    )
    return f"(({terms}) % {_WIN_P})"


@register(
    "winnowing_fingerprints",
    f"""
WITH nrm AS (
    SELECT doc_id, trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS s
    FROM documents
),
g AS (
    SELECT doc_id,
           list_transform(generate_series(1, greatest(length(s) - {_WIN_K - 1}, 0)),
                          i -> {_win_gram_sql('s', 'i')}) AS gh
    FROM nrm
),
fp AS (
    SELECT doc_id, gh,
           list_sort(list_distinct(
               list_transform(generate_series(1, greatest(len(gh) - {_WIN_W - 1}, 0)),
                              i -> list_aggregate(gh[i:i + {_WIN_W - 1}], 'min')))) AS f
    FROM g
)
SELECT doc_id,
       CAST(len(gh) AS INT) AS n_grams,
       CAST(len(f) AS INT) AS n_fps,
       md5(array_to_string(f, ',')) AS fp_digest
FROM fp
""",
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing (Schleimer/
    Wilkerson/Aiken's MOSS scheme — public algorithm): polynomial Rabin
    hashes of all 8-char grams of the normalized text, then the minimum
    hash of each 4-gram window, deduplicated — the fingerprint set any
    two documents sharing a ≥11-char verbatim run must overlap on.

    Declarative form: each gram hash is computed position-wise (same
    values the O(1)-per-step rolling recurrence yields — a mod-P
    polynomial is position-independent), so the scan parallelizes per
    row instead of carrying sequential state; per-term mod keeps every
    intermediate below 2^41, safe under ANSI int64. Emits per-doc gram/
    fingerprint counts plus an md5 digest of the sorted fingerprint set
    (join key for corpus-level plagiarism/reuse detection).
    """
    docs = _load_parallel(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"[ \t\n\x0B\f\r]+", " "))
    staged = docs.select("doc_id", norm.alias("s")).withColumn(
        "codes", F.transform(F.split(F.col("s"), ""), lambda ch: F.ascii(ch))
    )

    def gram_hash(i):
        # int64 arithmetic: ascii codes are 32-bit, and int*int would
        # overflow under ANSI at pow values near 2^31
        acc = None
        for j in range(_WIN_K):
            term = (
                F.element_at(F.col("codes"), i + j).cast("long")
                * F.lit(_WIN_POWS[j]).cast("long")
            ) % F.lit(_WIN_P).cast("long")
            acc = term if acc is None else acc + term
        return acc % F.lit(_WIN_P).cast("long")

    grams = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.length("s") - (_WIN_K - 1), F.lit(0))
        ),
        gram_hash,
    )
    staged = staged.withColumn("gh", grams)
    fps = F.array_sort(
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("gh") - (_WIN_W - 1), F.lit(0))
                ),
                lambda i: F.array_min(F.slice(F.col("gh"), i, _WIN_W)),
            )
        )
    )
    return staged.withColumn("f", fps).select(
        "doc_id",
        F.size("gh").cast("int").alias("n_grams"),
        F.size("f").cast("int").alias("n_fps"),
        F.md5(F.encode(F.array_join(F.col("f"), ","), "utf-8")).alias("fp_digest"),
    )


# --------------------------------------------------------------------------
# incremental_ingest_dedup — new-batch dedup against the existing corpus
# --------------------------------------------------------------------------

_INGEST_SPLIT = 400  # doc_id >= split = the "incoming" batch


@register(
    "incremental_ingest_dedup",
    f"""
WITH idx AS (
    SELECT md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS fp
    FROM documents WHERE doc_id < {_INGEST_SPLIT}
),
incoming AS (
    SELECT doc_id, lang,
           md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS fp
    FROM documents WHERE doc_id >= {_INGEST_SPLIT}
)
SELECT i.lang,
       count(*) AS n_incoming,
       count(*) FILTER (WHERE x.fp IS NOT NULL) AS n_dup_vs_index,
       count(*) FILTER (WHERE x.fp IS NULL) AS n_new
FROM incoming i
LEFT JOIN (SELECT DISTINCT fp FROM idx) x ON i.fp = x.fp
GROUP BY 1
""",
)
def incremental_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup — the production shape where a new
    batch is checked against the EXISTING corpus index instead of
    re-deduplicating the world: incoming docs (doc_id >= split stands in
    for the day's crawl) probe the historical fingerprint index and are
    classified duplicate-vs-new per language.

    Scale shape: the index side carries only 16-byte fingerprints (at
    100 TB it is the persisted fingerprint table, bucketed by fp, not a
    rescan of the corpus); the probe is a fp-keyed join that AQE turns
    into a broadcast when the daily batch is small, and the incoming
    text never shuffles — fingerprints are computed in the scan stage.
    The same split extends to the MinHash index for near-dup probes
    (operators/dedup.py:minhash_pairs on incoming ∪ candidate bands).
    """
    from kafka_streams_example_spark.functions.hashing import fingerprint_md5

    docs = _load_parallel(spark, sf_dir, "documents")
    idx = (
        docs.filter(F.col("doc_id") < _INGEST_SPLIT)
        .select(fingerprint_md5(F.col("text")).alias("fp"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    incoming = docs.filter(F.col("doc_id") >= _INGEST_SPLIT).select(
        "doc_id", "lang", fingerprint_md5(F.col("text")).alias("fp")
    )
    return (
        incoming.join(idx, "fp", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_incoming"),
            F.count(F.when(F.col("hit").isNotNull(), 1)).alias("n_dup_vs_index"),
            F.count(F.when(F.col("hit").isNull(), 1)).alias("n_new"),
        )
    )


# --------------------------------------------------------------------------
# zipf_law_fit — corpus token-frequency power-law diagnostics
# --------------------------------------------------------------------------

_ZIPF_TOP = 500  # fit over the top-N ranks (the power-law regime)


@register(
    "zipf_law_fit",
    f"""
WITH tok AS (SELECT unnest({_TOKS}) AS term FROM documents),
freq AS (SELECT term, count(*) AS f FROM tok GROUP BY 1),
ranked AS (
    SELECT f, row_number() OVER (ORDER BY f DESC, term) AS r FROM freq
)
SELECT count(*) AS n_terms,
       round(regr_slope(ln(f), ln(r)), 5) AS zipf_slope,
       round(regr_intercept(ln(f), ln(r)), 5) AS zipf_intercept,
       round(regr_r2(ln(f), ln(r)), 5) AS fit_r2
FROM ranked
WHERE r <= {_ZIPF_TOP}
""",
)
def zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law diagnostics for a training corpus: OLS fit of
    ln(frequency) against ln(rank) over the top-500 token ranks via the
    regr_slope / regr_intercept / regr_r2 aggregate family — natural text
    sits near slope -1; a corpus drifting far off is a synthetic-data /
    boilerplate red flag.

    The ranking window is VOCABULARY-sized (the token groupBy with
    map-side combine collapses the corpus first), so the single-partition
    sort it implies is over ~1e5-1e6 rows at any corpus scale — bounded,
    unlike a corpus-wide global window. Tie-broken by term for
    deterministic ranks on both engines."""
    docs = _load_parallel(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tx.tokens(F.lower(F.col("text")))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("f"))
    )
    ranked = freq.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("f"), F.asc("term")))
    ).filter(F.col("r") <= _ZIPF_TOP)
    lf, lr = F.log(F.col("f")), F.log(F.col("r"))
    return ranked.agg(
        F.count("*").alias("n_terms"),
        F.round(F.regr_slope(lf, lr), 5).alias("zipf_slope"),
        F.round(F.regr_intercept(lf, lr), 5).alias("zipf_intercept"),
        F.round(F.regr_r2(lf, lr), 5).alias("fit_r2"),
    )


# --------------------------------------------------------------------------
# label_mean_embeddings — element-wise vector pooling per group
# --------------------------------------------------------------------------


@register(
    "label_mean_embeddings",
    """
WITH e AS (
    SELECT label, i AS dim_pos, CAST(embedding[i] AS DOUBLE) AS val
    FROM embeddings,
         unnest(generate_series(1, len(embedding))) AS u(i)
)
SELECT label,
       CAST(dim_pos AS INT) AS dim_pos,
       round(avg(val), 6) AS mean_val,
       count(*) AS n_vectors
FROM e
GROUP BY 1, 2
""",
)
def label_mean_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean pooling of embeddings per label — the pooling
    step behind chunk-embeddings→document-embedding and per-class
    centroids (classifier prototypes, clustering seeds). Emitted in long
    form (label, dim, mean) so the oracle is engine-portable; callers
    reassemble vectors with the sort-collect idiom in
    operators/similarity.py:kmeans_lloyd.

    Scale shape: posexplode multiplies rows by dim, but the groupBy on
    (label, dim) combines map-side, so the shuffle is |labels| x dim
    rows — independent of corpus size (the same k x dim bound as the
    k-means update step)."""
    emb = _load_parallel(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "val"))
        .groupBy("label", (F.col("pos0") + 1).cast("int").alias("dim_pos"))
        .agg(
            F.round(F.avg(F.col("val").cast("double")), 6).alias("mean_val"),
            F.count("*").alias("n_vectors"),
        )
    )


# --------------------------------------------------------------------------
# neardup_simhash_pairs — Hamming-distance near-dup via SimHash banding
# --------------------------------------------------------------------------

_SH_BANDS = 4  # 60-bit fingerprint → 4 bands x 15 bits
_SH_BITS = 15
_SH_HAM = 6  # max Hamming distance to report


@register(
    "neardup_simhash_pairs",
    f"""
WITH d AS (
    SELECT doc_id, {{ngrams}} AS ng
    FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
),
nz AS (SELECT * FROM d WHERE len(ng) > 0),
h AS (
    SELECT doc_id,
           list_transform(ng, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS hs
    FROM nz
),
votes AS (
    SELECT doc_id, j, sum(CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
    FROM h, unnest(hs) AS u(x), unnest(generate_series(0, 59)) AS b(j)
    GROUP BY 1, 2
),
fp AS (
    SELECT doc_id,
           sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END) AS f
    FROM votes GROUP BY 1
),
banded AS (
    SELECT doc_id, f, b.b AS band, (f >> ({_SH_BITS} * b.b)) & {(1 << _SH_BITS) - 1} AS bv
    FROM fp, unnest(generate_series(0, {_SH_BANDS - 1})) AS b(b)
),
cand AS (
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b, l.f AS fa, r.f AS fb
    FROM banded l JOIN banded r
      ON l.band = r.band AND l.bv = r.bv AND l.doc_id < r.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(fa, fb)) <= {_SH_HAM}
""".format(
        ngrams=_NGRAMS3
    ),
)
def neardup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs — the Hamming-distance dedup tier: 60-bit
    per-bit-majority fingerprints over 3-gram shingles, banded into 4x15
    bits; pairs sharing any band verify by bit_count(xor) <= 6. A pair
    within Hamming distance d must agree on some band when d < bands
    (pigeonhole), so banding is lossless for d <= 3 here and a cheap
    high-recall filter above that.

    The scale shape mirrors minhash_pairs: only (id, band value) rides
    the self-equi-join shuffle, the fingerprint is 8 bytes per doc, and
    the verify is one xor+popcount per candidate — no shingle sets move
    after fingerprinting. Seeded md5-derived shingle hashes make the
    fingerprints — and therefore the pair set — engine-exact."""
    from kafka_streams_example_spark.operators.dedup import simhash64
    from kafka_streams_example_spark.operators.text import word_ngrams

    docs = _load_parallel(spark, sf_dir, "documents")
    fp = (
        docs.select("doc_id", word_ngrams(F.col("text"), 3).alias("ng"))
        .filter(F.size("ng") > 0)
        .select("doc_id", simhash64(F.col("ng")).alias("f"))
    )
    # band slices unrolled with LITERAL shift widths: shiftright takes a
    # Python int, and a float-pow division would corrupt low bits once the
    # fingerprint exceeds 2^53
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("f"), b * _SH_BITS)
                .bitwiseAND(F.lit((1 << _SH_BITS) - 1))
                .alias("bv"),
            )
            for b in range(_SH_BANDS)
        ]
    )
    banded = fp.select(
        "doc_id", "f", F.explode(band_structs).alias("bk")
    ).select("doc_id", "f", F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"))
    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            F.col("l.f").alias("fa"),
            F.col("r.f").alias("fb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= _SH_HAM)
        .select("id_a", "id_b", "hamming")
    )
