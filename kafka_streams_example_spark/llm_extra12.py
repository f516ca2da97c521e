"""Thirteenth tranche: contamination audits, ANN training-data ops and
corpus-curation observability (round 4).

- cross_split_leakage_pairs: near-dup pairs that CROSS the train/valid/
                           test split boundary — the leakage audit that
                           says whether eval scores are trustworthy.
- cross_lingual_neardup_pairs: near-dup pairs whose sides carry different
                           lang labels — mislabeled-language / translated
                           -boilerplate detection.
- minhash_band_tuning_report: the LSH S-curve evaluated on MEASURED pair
                           similarities for candidate (bands x rows)
                           configs — pick banding from data, not folklore.
- hard_negative_mining:    per query vector, the top-k most-similar
                           vectors with a DIFFERENT label — contrastive-
                           training negative selection.
- tokenizer_fertility_by_lang: BPE-ish tokens per word and chars per
                           token by language — the tokenizer-fit readout
                           that decides vocab allocation.
- dedup_cluster_size_histogram: distribution of dup-cluster sizes — the
                           shape that distinguishes mirror-heavy corpora
                           (few giant clusters) from light duplication.
- embedding_norm_outliers: per-label embedding-norm statistics with
                           2-sigma outlier counts — the embedding-space
                           health check before similarity search.
- corpus_mixture_entropy:  entropy of the (lang x source) mixture — one
                           number for "how concentrated is this corpus",
                           plus the dominant cell.
- quality_filter_threshold_sweep: survivors at candidate unigram-LM
                           quality thresholds — pick the filter cutoff
                           from the sweep, not by guessing.
- semdedup_prune:          SemDeDup (Abbas et al. 2023, public method):
                           cluster embeddings to cells, drop any vector
                           with a more-senior in-cell neighbor above the
                           cosine threshold — semantic dedup at
                           cluster-bounded cost.

Scale notes (100 TB shapes):
- the three pair-table queries reuse the freq-ordered AllPairs prefix
  path (token-frequency cost, never all-pairs); splits/langs attach to
  the sparse PAIR table, and the band-tuning math runs on pairs x 4
  config rows;
- hard negatives follow cosine_topk's broadcast-queries/scan-corpus
  shape; the label filter prunes candidates before the rank window;
- the cluster histogram adds two tiny aggregates on top of the proven
  connected-components output;
- norm outliers fold norms in one scan; per-label fences are rounded
  BEFORE the comparison so engine summation order can't flip a count;
- mixture entropy is a (langs x sources)-cell aggregate with windows on
  those few cells;
- the threshold sweep is the ablation-report shape: one scan, per-row
  score, conditional sums unpivoted to threshold rows;
- semdedup joins within centroid cells only (the SemDeDup contract: k
  is chosen so cells stay bounded); norms fold once in the assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.operators import dedup as dd
from kafka_streams_example_spark.operators import similarity as sim
from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.llm_extra3 import split_case_sql, split_col
from kafka_streams_example_spark.registry import (
    _NGRAMS,
    _TOKS,
    _duck_cosine,
    _duck_round_half_up,
    _load_parallel,
    register,
)
from kafka_streams_example_spark.sources.files import load_table

# --------------------------------------------------------------------------
# shared: the unblocked near-dup pair table (3-gram Jaccard >= 0.3)
# --------------------------------------------------------------------------

_PAIR_T = 0.3

# DuckDB mirror of dd.ngram_jaccard_pairs(block=all, threshold=0.3):
# brute-force in SQL (the oracle may be quadratic — the ENGINE may not).
_PAIRS_CTE = f"""
d AS (
    SELECT doc_id, lang, {_NGRAMS} AS ng
    FROM (SELECT doc_id, lang, {_TOKS} AS t FROM documents)
),
nz AS (SELECT * FROM d WHERE len(ng) > 0),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           a.lang AS lang_a, b.lang AS lang_b,
           floor(len(list_intersect(a.ng, b.ng))
                 / CAST(len(list_distinct(list_concat(a.ng, b.ng))) AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS jaccard
    FROM nz a JOIN nz b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.ng, b.ng))
          / CAST(len(list_distinct(list_concat(a.ng, b.ng))) AS DOUBLE)
          >= {_PAIR_T}
)
"""

def _neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unblocked freq-ordered AllPairs near-dup pairs at threshold 0.3 —
    the shared input of the three pair-table audits.

    Cached: the pair table is sparse (ids + one double) and feeds three
    registered audits whose analyzed plans are identical up to this
    point, so Spark's plan-equality cache lookup materializes the
    expensive AllPairs pass ONCE per session for all of them (the same
    discipline as neardup_transitivity_audit's cached edge table)."""
    docs = _load_parallel(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(
        docs, block_key=F.lit("all"), threshold=_PAIR_T, freq_order=True
    ).cache()


# --------------------------------------------------------------------------
# cross_split_leakage_pairs — train/eval contamination audit
# --------------------------------------------------------------------------


@register(
    "cross_split_leakage_pairs",
    f"""
WITH {_PAIRS_CTE}
SELECT id_a, id_b, jaccard,
       {split_case_sql("id_a")} AS split_a,
       {split_case_sql("id_b")} AS split_b
FROM pairs
WHERE {split_case_sql("id_a")} <> {split_case_sql("id_b")}
""",
)
def cross_split_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (unblocked 3-gram Jaccard >= 0.3) whose two sides
    land in DIFFERENT splits of the deterministic 80/10/10 hash split —
    each row is an eval example with a training-set near-duplicate, i.e.
    measured train/test leakage. The audit to run after train_eval_split
    and before trusting any held-out metric.

    100 TB shape: pairs come from the freq-ordered AllPairs prefix path
    (never all-pairs); the split label is a map-side pure function of
    the ids already ON the sparse pair table — no join back to the
    corpus."""
    pairs = _neardup_pairs(spark, sf_dir).select("id_a", "id_b", "jaccard")
    out = pairs.select(
        "id_a",
        "id_b",
        "jaccard",
        split_col(F.col("id_a")).alias("split_a"),
        split_col(F.col("id_b")).alias("split_b"),
    )
    return out.filter(F.col("split_a") != F.col("split_b"))


# --------------------------------------------------------------------------
# cross_lingual_neardup_pairs — mislabeled-language detection
# --------------------------------------------------------------------------


@register(
    "cross_lingual_neardup_pairs",
    f"""
WITH {_PAIRS_CTE}
SELECT id_a, id_b, jaccard, lang_a, lang_b
FROM pairs
WHERE lang_a <> lang_b
""",
)
def cross_lingual_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs whose sides carry DIFFERENT language labels —
    either a mislabeled language (the dominant cause in practice) or
    shared untranslated boilerplate. Language-blocked dedup never sees
    these pairs; this is the audit for what that blocking assumes away.

    100 TB shape: the deliberately unblocked pair generation is the
    freq-ordered AllPairs path; lang labels ride the prepared (id, blk)
    rows the pair generator already carries, joined back from the
    sparse pair table to the two-column (doc_id, lang) projection."""
    docs = _load_parallel(spark, sf_dir, "documents")
    langs = docs.select("doc_id", "lang")
    pairs = _neardup_pairs(spark, sf_dir).select("id_a", "id_b", "jaccard")
    return (
        pairs.join(
            langs.select(F.col("doc_id").alias("id_a"), F.col("lang").alias("lang_a")),
            "id_a",
        )
        .join(
            langs.select(F.col("doc_id").alias("id_b"), F.col("lang").alias("lang_b")),
            "id_b",
        )
        .filter(F.col("lang_a") != F.col("lang_b"))
        .select("id_a", "id_b", "jaccard", "lang_a", "lang_b")
    )


# --------------------------------------------------------------------------
# minhash_band_tuning_report — LSH S-curve on measured similarities
# --------------------------------------------------------------------------

_BAND_CONFIGS = [(32, 1), (16, 2), (8, 4), (4, 8)]  # bands x rows = 32 hashes

# Rounding policy for this module (ADVICE r05): the paired round(…, 6)
# sites below (mean_p_detect / min_p_detect / expected_detected, score,
# mean_norm / std_norm, entropy) intentionally use ENGINE-NATIVE round on
# both sides. Their inputs are transcendental/irrational doubles (pow
# S-curves, sqrt norms, log2 entropies) that cannot land exactly on a
# 6dp half-boundary, so the portable floor-twin (`round_half_up` /
# `_duck_round_half_up`) buys nothing; it is reserved for k/n rationals
# (llm_extra5/12/13 detection ratios), which CAN hit boundaries exactly.


@register(
    "minhash_band_tuning_report",
    f"""
WITH {_PAIRS_CTE},
cfg AS (SELECT * FROM (VALUES {", ".join(f"({b}, {r})" for b, r in _BAND_CONFIGS)})
        AS t(n_bands, rows_per_band)),
scored AS (
    SELECT cfg.n_bands, cfg.rows_per_band,
           1.0 - pow(1.0 - pow(jaccard, rows_per_band), n_bands) AS p
    FROM pairs CROSS JOIN cfg
)
SELECT CAST(n_bands AS BIGINT) AS n_bands,
       CAST(rows_per_band AS BIGINT) AS rows_per_band,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(avg(p), 6) AS mean_p_detect,
       round(min(p), 6) AS min_p_detect,
       round(sum(p), 6) AS expected_detected
FROM scored
GROUP BY 1, 2
""",
)
def minhash_band_tuning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding tuned from data: for each candidate (bands x rows)
    split of a 32-hash MinHash signature, the S-curve detection
    probability 1-(1-J^r)^b evaluated at the MEASURED Jaccard of every
    verified near-dup pair — expected recall (mean/min/sum) per config.
    The report that justifies a banding choice before re-sketching a
    100 TB corpus.

    100 TB shape: the expensive part is the pair table (freq-ordered
    AllPairs, shared path); the S-curve math is pairs x 4 config rows
    with the config side broadcast."""
    pairs = _neardup_pairs(spark, sf_dir).select("jaccard")
    cfg = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).cast("long").alias("n_bands"),
                    F.lit(r).cast("long").alias("rows_per_band"),
                )
                for b, r in _BAND_CONFIGS
            ]
        )
    ).alias("cfg")
    scored = pairs.select("jaccard", cfg).select(
        F.col("cfg.n_bands").alias("n_bands"),
        F.col("cfg.rows_per_band").alias("rows_per_band"),
        (
            F.lit(1.0)
            - F.pow(
                F.lit(1.0) - F.pow(F.col("jaccard"), F.col("cfg.rows_per_band")),
                F.col("cfg.n_bands"),
            )
        ).alias("p"),
    )
    return scored.groupBy("n_bands", "rows_per_band").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.avg("p"), 6).alias("mean_p_detect"),
        F.round(F.min("p"), 6).alias("min_p_detect"),
        F.round(F.sum("p"), 6).alias("expected_detected"),
    )


# --------------------------------------------------------------------------
# hard_negative_mining — contrastive negatives by label-filtered top-k
# --------------------------------------------------------------------------

_HN_K = 5


@register(
    "hard_negative_mining",
    f"""
WITH q AS (SELECT vec_id AS q_id, label AS q_label, embedding AS qv
           FROM embeddings WHERE vec_id < 8),
scored AS (
    SELECT q.q_id, q.q_label, e.vec_id, e.label AS neg_label,
           {_duck_cosine("q.qv", "e.embedding")} AS score
    FROM embeddings e CROSS JOIN q
    WHERE e.label <> q.q_label
)
SELECT q_id, q_label, vec_id, neg_label, rnk, round(score, 6) AS score
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
          ORDER BY score DESC, vec_id) AS rnk
      FROM scored)
WHERE rnk <= {_HN_K}
""",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative selection for contrastive training: per query
    vector (vec_id < 8), the top-5 most-cosine-similar vectors carrying
    a DIFFERENT label — the negatives that actually move a contrastive
    loss, vs easy random negatives.

    100 TB shape: cosine_topk's broadcast-queries / scan-corpus shape;
    the label inequality prunes candidates BEFORE the rank window, and
    norms fold once per side before the pairing join."""
    from kafka_streams_example_spark.operators import ensure_min_partitions

    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") < 8)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("label").alias("q_label"),
            F.col("embedding").alias("q_vec"),
        )
        .withColumn("q_nrm", sim.norm(F.col("q_vec"), 64))
    )
    c = ensure_min_partitions(
        emb.select("vec_id", "label", "embedding")
    ).withColumn("nrm", sim.norm(F.col("embedding"), 64))
    scored = (
        c.join(F.broadcast(q), F.col("label") != F.col("q_label"))
        .withColumn(
            "score",
            sim.dot(F.col("q_vec"), F.col("embedding"), 64)
            / F.nullif(F.col("q_nrm") * F.col("nrm"), F.lit(0.0)),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _HN_K)
        .select(
            "q_id",
            "q_label",
            "vec_id",
            F.col("label").alias("neg_label"),
            "rnk",
            F.round("score", 6).alias("score"),
        )
    )


# --------------------------------------------------------------------------
# tokenizer_fertility_by_lang — tokenizer-fit readout
# --------------------------------------------------------------------------

# same explicit-whitespace BPE-ish pattern as token_count (registry
# n_tokens_bpe): letter runs | single digits | any other non-space char
_BPE_RE_SQL = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0B\f\r]"


@register(
    "tokenizer_fertility_by_lang",
    f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({_TOKS})) AS BIGINT) AS n_words,
       CAST(sum(len(regexp_extract_all(text, '{_BPE_RE_SQL}'))) AS BIGINT)
           AS n_tokens_bpe,
       {_duck_round_half_up(
           f"sum(len(regexp_extract_all(text, '{_BPE_RE_SQL}')))"
           f" / CAST(nullif(sum(len({_TOKS})), 0) AS DOUBLE)", 6)} AS fertility,
       {_duck_round_half_up(
           f"sum(n_chars) / CAST(nullif(sum(len(regexp_extract_all("
           f"text, '{_BPE_RE_SQL}'))), 0) AS DOUBLE)", 6)} AS chars_per_token
FROM documents
GROUP BY lang
""",
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens per whitespace
    word (how many subword pieces a word shatters into) and characters
    per token — the two numbers that say whether a tokenizer fits a
    language before committing vocab budget. High fertility = the
    language pays more sequence length per word.

    100 TB shape: one scan, per-row JVM regexp counts, a
    langs-cardinality aggregate — no shuffle beyond the tiny key."""
    docs = _load_parallel(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        "n_chars",
        F.size(tx.tokens(F.lower(F.col("text")))).alias("nw"),
        tx.token_count(F.col("text")).alias("nt"),
    )
    # nullif guards: a lang whose docs all tokenize empty must yield
    # NULL ratios (the oracle's x/0 -> NULL), not an ANSI divide error
    return per.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("nw").cast("bigint").alias("n_words"),
        F.sum("nt").cast("bigint").alias("n_tokens_bpe"),
        tx.round_half_up(
            F.sum("nt") / F.nullif(F.sum("nw"), F.lit(0)).cast("double"), 6
        ).alias("fertility"),
        tx.round_half_up(
            F.sum("n_chars") / F.nullif(F.sum("nt"), F.lit(0)).cast("double"), 6
        ).alias("chars_per_token"),
    )


# --------------------------------------------------------------------------
# dedup_cluster_size_histogram — dup-cluster shape
# --------------------------------------------------------------------------


def _clusters_oracle_sql() -> str:
    """The proven dedup_clusters recursive-CTE oracle, embedded as a
    subquery (its WITH RECURSIVE prefix must lead the whole statement)."""
    from kafka_streams_example_spark import registry as _reg

    sql = _reg.ORACLES["dedup_clusters"].strip()
    assert sql.upper().startswith("WITH RECURSIVE")
    return sql


@register(
    "dedup_cluster_size_histogram",
    f"""
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM (SELECT cluster_id, count(*) AS cluster_size
      FROM ({_clusters_oracle_sql()}) GROUP BY cluster_id)
GROUP BY 1
""",
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of dup-cluster sizes (from the proven
    connected-components dedup decision): how many clusters of 2, of 3,
    ... — the shape that distinguishes a mirror-heavy corpus (few giant
    clusters eating the dedup budget) from light pairwise duplication,
    and the denominator for 'docs removed by dedup' accounting.

    100 TB shape: two tiny aggregates (cluster-cardinality, then
    size-cardinality) on top of dedup_clusters' output — the CC cost is
    the shared, already-audited part."""
    from kafka_streams_example_spark import registry as _reg

    clusters = _reg.QUERIES["dedup_clusters"](spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count("*").cast("bigint").alias("n_clusters")
    ).select(F.col("cluster_size").cast("bigint").alias("cluster_size"), "n_clusters")


# --------------------------------------------------------------------------
# embedding_norm_outliers — embedding-space health check
# --------------------------------------------------------------------------


@register(
    "embedding_norm_outliers",
    """
WITH norms AS (
    SELECT label,
           round(sqrt(list_aggregate(list_transform(generate_series(1, 64),
               i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
               'sum')), 6) AS nrm
    FROM embeddings
),
stats AS (
    SELECT label,
           count(*) AS n_vecs,
           round(avg(nrm), 6) AS mean_norm,
           round(stddev_pop(nrm), 6) AS std_norm
    FROM norms GROUP BY label
)
SELECT s.label,
       CAST(s.n_vecs AS BIGINT) AS n_vecs,
       s.mean_norm, s.std_norm,
       CAST(count(*) FILTER (WHERE abs(n.nrm - s.mean_norm) > 2 * s.std_norm)
            AS BIGINT) AS n_outliers
FROM norms n JOIN stats s USING (label)
GROUP BY s.label, s.n_vecs, s.mean_norm, s.std_norm
""",
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-norm statistics with 2-sigma outlier counts —
    the embedding-space health check (collapsed or exploded norms ruin
    cosine retrieval) run before any similarity index is built.

    Fences (mean, std) are ROUNDED to 6dp before the outlier comparison
    and norms are rounded the same, so engine summation order cannot
    flip a boundary membership (the robust_scaler discipline).

    100 TB shape: norms fold in the scan; label stats are a
    label-cardinality broadcast back onto the norm stream."""
    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select(
        "label", F.round(sim.norm(F.col("embedding"), 64), 6).alias("nrm")
    )
    stats = norms.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg("nrm"), 6).alias("mean_norm"),
        F.round(F.stddev_pop("nrm"), 6).alias("std_norm"),
    )
    return (
        norms.join(F.broadcast(stats), "label")
        .groupBy("label", "n_vecs", "mean_norm", "std_norm")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("nrm") - F.col("mean_norm"))
                    > 2 * F.col("std_norm"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "label",
            F.col("n_vecs").cast("bigint").alias("n_vecs"),
            "mean_norm",
            "std_norm",
            "n_outliers",
        )
    )


# --------------------------------------------------------------------------
# corpus_mixture_entropy — mixture concentration in one row
# --------------------------------------------------------------------------


@register(
    "corpus_mixture_entropy",
    """
WITH cells AS (SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2),
tot AS (SELECT sum(c) AS n FROM cells),
langs AS (SELECT lang, sum(c) AS c FROM cells GROUP BY 1)
SELECT CAST((SELECT count(*) FROM langs) AS BIGINT) AS n_langs,
       CAST((SELECT count(DISTINCT source) FROM cells) AS BIGINT) AS n_sources,
       CAST((SELECT count(*) FROM cells) AS BIGINT) AS n_cells,
       round((SELECT -sum((CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n))
              FROM langs, tot), 6) AS entropy_lang_bits,
       round((SELECT -sum((CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n))
              FROM cells, tot), 6) AS entropy_cell_bits,
       round((SELECT max(c) / CAST(max(n) AS DOUBLE) FROM cells, tot), 6)
           AS max_cell_share
""",
)
def corpus_mixture_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture concentration of the corpus in one row: Shannon entropy
    (bits) of the language marginal and of the full (lang x source) cell
    distribution, plus the largest cell's share — the number that says
    'this corpus is 90% one source' before training bakes that in.

    100 TB shape: one scan to (langs x sources) cells; every entropy
    term is computed on those few cells."""
    docs = _load_parallel(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count("*").alias("c"))
    tot = cells.agg(F.sum("c").alias("n"))
    langs = cells.groupBy("lang").agg(F.sum("c").alias("c"))

    def _entropy(df):
        p = F.col("c").cast("double") / F.col("n")
        return df.crossJoin(F.broadcast(tot)).agg(
            F.round(-F.sum(p * F.log2(p)), 6).alias("h"),
            F.count("*").cast("bigint").alias("k"),
        )

    lang_h = _entropy(langs).select(
        F.col("k").alias("n_langs"), F.col("h").alias("entropy_lang_bits")
    )
    cell_h = _entropy(cells).select(
        F.col("k").alias("n_cells"), F.col("h").alias("entropy_cell_bits")
    )
    n_sources = cells.agg(
        F.countDistinct("source").cast("bigint").alias("n_sources")
    )
    max_share = cells.crossJoin(F.broadcast(tot)).agg(
        F.round(F.max("c") / F.max("n").cast("double"), 6).alias("max_cell_share")
    )
    return (
        lang_h.crossJoin(F.broadcast(n_sources))
        .crossJoin(F.broadcast(cell_h))
        .crossJoin(F.broadcast(max_share))
        .select(
            "n_langs",
            "n_sources",
            "n_cells",
            "entropy_lang_bits",
            "entropy_cell_bits",
            "max_cell_share",
        )
    )


# --------------------------------------------------------------------------
# quality_filter_threshold_sweep — pick the filter cutoff from data
# --------------------------------------------------------------------------

_QF_THRESHOLDS = [3.40, 3.42, 3.45, 3.50]


def _proxy_oracle_sql() -> str:
    """The registered doc_perplexity_proxy oracle — the sweep must score
    with EXACTLY the quality definition that query publishes."""
    from kafka_streams_example_spark import registry as _reg

    return _reg.ORACLES["doc_perplexity_proxy"]


@register(
    "quality_filter_threshold_sweep",
    f"""
WITH scored AS (
    SELECT doc_id, avg_neg_logp AS score FROM ({_proxy_oracle_sql()})
)
{" UNION ALL ".join(
    f'''SELECT CAST({t} AS DOUBLE) AS threshold,
       CAST(count(*) FILTER (WHERE score <= {t}) AS BIGINT) AS n_kept,
       {_duck_round_half_up(
           f"count(*) FILTER (WHERE score <= {t})"
           " / CAST(count(*) AS DOUBLE)", 6)} AS share_kept
FROM scored''' for t in _QF_THRESHOLDS)}
""",
)
def quality_filter_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor counts at candidate quality-filter cutoffs: per
    threshold over the unigram-LM quality score (doc_perplexity_proxy's
    mean negative log-probability, lower = more typical text), how many
    documents a `score <= t` filter keeps and their corpus share — the
    sweep you read before freezing a filter threshold, instead of
    guessing one and re-running the corpus.

    Scores are rounded to 6dp BEFORE the threshold comparison on both
    engines so summation order cannot flip a boundary document.

    100 TB shape: the scored table IS the registered doc_perplexity_proxy
    query (composed, not copied — the sweep can never drift from the
    score it documents); the sweep itself is ONE aggregate of
    conditional sums over it, unpivoted to threshold rows — not one
    scan per threshold."""
    from kafka_streams_example_spark import registry as _reg

    scored = (
        _reg.QUERIES["doc_perplexity_proxy"](spark, sf_dir)
        .select("doc_id", F.col("avg_neg_logp").alias("score"))
    )
    agg = scored.agg(
        F.count("*").alias("n_total"),
        *[
            F.sum(F.when(F.col("score") <= t, 1).otherwise(0)).alias(f"k_{i}")
            for i, t in enumerate(_QF_THRESHOLDS)
        ],
    )
    # portable half-up (operators/text.py:round_half_up): engine-native
    # round() diverges on 6dp half-boundary k/n ratios (ADVICE r04).
    # floor() must be CAST back to DOUBLE before the /1000000.0: Spark
    # SQL parses the bare literal as DECIMAL(8,1), and LONG/DECIMAL
    # yields a DECIMAL column (driver schema/hash mismatch vs the
    # oracle's DOUBLE).
    stack = ", ".join(
        f"CAST({t} AS DOUBLE), CAST(k_{i} AS BIGINT),"
        f" CAST(floor(k_{i} / CAST(nullif(n_total, 0) AS DOUBLE)"
        f" * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0"
        for i, t in enumerate(_QF_THRESHOLDS)
    )
    return agg.selectExpr(
        f"stack({len(_QF_THRESHOLDS)}, {stack})"
        " AS (threshold, n_kept, share_kept)"
    )


# --------------------------------------------------------------------------
# semdedup_prune — SemDeDup: cluster-then-prune semantic dedup
# --------------------------------------------------------------------------

_SD_TAU = 0.35
_SD_MIN_CELLS = 16  # cell-count floor (small inputs)
_SD_PER_CELL = 128  # target vectors per cell — bounds in-cell pair work


def sd_cell_count(n_vectors: int) -> int:
    """Data-dependent SemDeDup cell count: ~one cell per 128 vectors with
    a floor of 16. A FIXED k makes in-cell pair work quadratic in corpus
    size (measured: 14.6x time for 10x rows in the r06 scale sweep);
    deriving k from the input keeps cells bounded so the pairwise stage
    scales with rows — the actual SemDeDup contract (k ~ N / cell_size,
    e.g. ~40M cells over 5B embeddings at 100 TB)."""
    return max(_SD_MIN_CELLS, n_vectors // _SD_PER_CELL)


@register(
    "semdedup_prune",
    f"""
WITH ncell AS (
    SELECT greatest({_SD_MIN_CELLS},
                    CAST(count(*) // {_SD_PER_CELL} AS BIGINT)) AS k
    FROM embeddings),
cent AS (SELECT vec_id AS centroid_id, embedding AS cv
         FROM embeddings, ncell WHERE vec_id < ncell.k),
assign AS (
    SELECT vec_id, embedding, centroid_id FROM (
        SELECT c.vec_id, c.embedding, cent.centroid_id,
               row_number() OVER (PARTITION BY c.vec_id
                   ORDER BY {_duck_cosine("c.embedding", "cent.cv")} DESC,
                            cent.centroid_id) AS rn
        FROM embeddings c CROSS JOIN cent)
    WHERE rn = 1),
drops AS (
    SELECT DISTINCT b.vec_id
    FROM assign a JOIN assign b
      ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    WHERE {_duck_cosine("a.embedding", "b.embedding")} >= {_SD_TAU}
)
SELECT a.vec_id, a.centroid_id, (d.vec_id IS NULL) AS keep
FROM assign a LEFT JOIN drops d USING (vec_id)
""",
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public method):
    assign every embedding to its nearest of 16 fixed centroid cells,
    then drop any vector that has a LOWER-id in-cell neighbor with
    cosine >= tau — semantic near-duplicates collapse to their most
    senior representative without any corpus-wide pair search.

    100 TB shape: the only pairwise work is WITHIN centroid cells, and
    the cell count scales with the input (sd_cell_count: ~128 vectors
    per cell from the parquet footer row count, zero Spark jobs) so that
    stage grows linearly in rows, not quadratically; the assignment is
    the proven broadcast-centroids scan with map-side argmax, and norms
    fold once there."""
    from kafka_streams_example_spark.sources.files import table_row_count

    emb = load_table(spark, sf_dir, "embeddings")
    k = sd_cell_count(table_row_count(spark, sf_dir, "embeddings"))
    cells = sim.ivf_assign(
        emb, emb.filter(F.col("vec_id") < k), dim=64, keep_norm=True
    )
    a = cells.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("v_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = cells.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("v_b"),
        F.col("nrm").alias("nrm_b"),
    )
    drops = (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "score",
            sim.dot(F.col("v_a"), F.col("v_b"), 64)
            / F.nullif(F.col("nrm_a") * F.col("nrm_b"), F.lit(0.0)),
        )
        .filter(F.col("score") >= _SD_TAU)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return (
        cells.select("vec_id", "centroid_id")
        .join(drops, "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            F.coalesce(~F.col("dropped"), F.lit(True)).alias("keep"),
        )
    )
