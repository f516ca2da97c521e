"""Eleventh tranche: pipeline-evaluation and observability operators
(round 3, part 8).

- langid_confusion_matrix: labeled lang vs lang_id prediction with
                           per-cell share of the actual class — the
                           classifier-evaluation matrix, composed from
                           the proven lang_id operator/oracle pair.
- filter_ablation_report:  cumulative survivor counts/chars through the
                           curation filter chain (nonempty → length →
                           token floor → exact-dedup keeper) — the
                           report that says which stage costs the corpus
                           what.
- neardup_transitivity_audit: wedge-closure rate of the near-dup pair
                           graph — how internally consistent the
                           similarity relation is before trusting its
                           connected components as dup clusters.
- output_shard_balance:    doc/byte balance across 64 hash shards — the
                           pre-write audit that catches a skewed output
                           layout before 1000 writers produce one fat
                           file and 999 slivers.

Scale notes (100 TB shapes):
- the confusion matrix is the lang_id scan + a (langs x langs)-cell
  aggregate with its share window on those few cells;
- the ablation report is ONE scan: all stage flags are computed per row
  (the dedup-keeper flag via a window on the content fingerprint, the
  only shuffle), then conditional sums unpivot to stage rows;
- the transitivity audit runs wedge joins on the PAIR table (already
  candidate-pruned upstream), never on the corpus;
- shard balance is a map-only shard assignment + 64-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.operators import dedup as dd
from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.functions.hashing import fingerprint_md5, stable_long
from kafka_streams_example_spark.registry import (
    _TOKS,
    _duck_lang_sql,
    _load_parallel,
    register,
)

# --------------------------------------------------------------------------
# langid_confusion_matrix — classifier evaluation
# --------------------------------------------------------------------------


@register(
    "langid_confusion_matrix",
    f"""
WITH pred AS ({_duck_lang_sql()})
SELECT lang AS actual, lang_pred AS predicted,
       CAST(count(*) AS BIGINT) AS n,
       round(count(*) * 1.0 /
             sum(count(*)) OVER (PARTITION BY lang), 6) AS share_of_actual
FROM pred
GROUP BY 1, 2
""",
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-ratio language identifier
    against the labeled lang column: per (actual, predicted) cell, the
    count and its share of the actual class (the diagonal is recall) —
    the evaluation readout for the heuristic classifier, composed from
    the same operator/oracle pair lang_id_docs already proves.

    100 TB shape: the lang_id scan aggregates straight to
    (langs x langs) cells; the normalizing window runs on those cells."""
    docs = _load_parallel(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("actual"),
        tx.lang_id(F.col("text")).alias("predicted"),
    )
    cells = pred.groupBy("actual", "predicted").agg(F.count("*").alias("n"))
    w = Window.partitionBy("actual")
    return cells.select(
        "actual",
        "predicted",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") * 1.0 / F.sum("n").over(w), 6).alias("share_of_actual"),
    )


# --------------------------------------------------------------------------
# filter_ablation_report — cumulative curation-funnel accounting
# --------------------------------------------------------------------------

_ABLATION_MIN_CHARS = 50
_ABLATION_MIN_TOKS = 10


@register(
    "filter_ablation_report",
    f"""
WITH flagged AS (
    SELECT n_chars,
           length(trim(coalesce(text, ''))) > 0 AS s_nonempty,
           length(trim(coalesce(text, ''))) > 0
               AND coalesce(n_chars, 0) >= {_ABLATION_MIN_CHARS} AS s_len,
           length(trim(coalesce(text, ''))) > 0
               AND coalesce(n_chars, 0) >= {_ABLATION_MIN_CHARS}
               AND len({_TOKS}) >= {_ABLATION_MIN_TOKS} AS s_toks,
           row_number() OVER (
               PARTITION BY md5(trim(regexp_replace(lower(coalesce(text, '')),
                                                    '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))
               ORDER BY doc_id) = 1 AS is_keeper
    FROM documents
)
SELECT 'raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS total_chars FROM flagged
UNION ALL
SELECT 'nonempty', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM flagged WHERE s_nonempty
UNION ALL
SELECT 'min_length', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM flagged WHERE s_len
UNION ALL
SELECT 'min_tokens', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM flagged WHERE s_toks
UNION ALL
SELECT 'exact_dedup', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM flagged
WHERE s_toks AND is_keeper
""",
)
def filter_ablation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-funnel accounting: documents (and their characters)
    surviving each cumulative filter stage — nonempty text, a 50-char
    floor, a 10-token floor, then exact-dedup keeper election — the
    ablation report that attributes corpus loss to the stage that
    caused it.

    100 TB shape: ONE scan; every stage flag is computed per row (the
    keeper flag via a window on the 16-byte content fingerprint — the
    only shuffle), then a single aggregate of conditional sums unpivots
    into the stage rows. The naive per-stage UNION of filtered scans
    would read the corpus five times."""
    docs = _load_parallel(spark, sf_dir, "documents")
    text = F.coalesce(F.col("text"), F.lit(""))
    nonempty = F.length(F.trim(text)) > 0
    s_len = nonempty & (F.coalesce(F.col("n_chars"), F.lit(0)) >= _ABLATION_MIN_CHARS)
    s_toks = s_len & (F.size(tx.tokens(F.lower(text))) >= _ABLATION_MIN_TOKS)
    fp = fingerprint_md5(text)
    keeper = (
        F.row_number().over(Window.partitionBy(fp).orderBy("doc_id")) == 1
    )
    flagged = docs.select(
        "n_chars",
        nonempty.alias("s_nonempty"),
        s_len.alias("s_len"),
        s_toks.alias("s_toks"),
        keeper.alias("is_keeper"),
    )
    stages = {
        "raw": F.lit(True),
        "nonempty": F.col("s_nonempty"),
        "min_length": F.col("s_len"),
        "min_tokens": F.col("s_toks"),
        "exact_dedup": F.col("s_toks") & F.col("is_keeper"),
    }
    agg = flagged.agg(
        *[
            F.sum(F.when(flag, 1).otherwise(0)).alias(f"n_{name}")
            for name, flag in stages.items()
        ],
        *[
            F.coalesce(F.sum(F.when(flag, F.col("n_chars"))), F.lit(0)).alias(
                f"c_{name}"
            )
            for name, flag in stages.items()
        ],
    )
    stack = ", ".join(f"'{name}', n_{name}, c_{name}" for name in stages)
    return agg.selectExpr(
        f"stack({len(stages)}, {stack}) AS (stage, n_docs, total_chars)"
    ).select(
        "stage",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_chars").cast("bigint").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# neardup_transitivity_audit — wedge closure of the similarity graph
# --------------------------------------------------------------------------


@register(
    "neardup_transitivity_audit",
    f"""
WITH d AS (
    SELECT doc_id, {{ng}} AS ng
    FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
),
nz AS (SELECT * FROM d WHERE len(ng) > 0),
e AS MATERIALIZED (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM nz a JOIN nz b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.ng, b.ng))
          / CAST(len(list_distinct(list_concat(a.ng, b.ng))) AS DOUBLE) >= 0.3
),
und AS MATERIALIZED (
    SELECT id_a AS x, id_b AS y FROM e
    UNION ALL SELECT id_b, id_a FROM e
),
wedge AS (
    SELECT e1.x AS a, e1.y AS b, e2.y AS c
    FROM und e1 JOIN und e2 ON e1.y = e2.x AND e1.x < e2.y
),
closed AS (
    SELECT w.a, w.b, w.c,
           CASE WHEN e3.id_a IS NOT NULL THEN 1 ELSE 0 END AS is_closed
    FROM wedge w LEFT JOIN e e3 ON e3.id_a = w.a AND e3.id_b = w.c
)
SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST(count(*) AS BIGINT) AS n_wedges,
       CAST(coalesce(sum(is_closed), 0) AS BIGINT) AS n_closed,
       round(sum(is_closed) * 1.0 / nullif(count(*), 0), 6) AS transitivity
FROM closed
""".format(
        ng="list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 0)),"
        " i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
    ),
)
def neardup_transitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wedge-closure audit of the near-dup similarity graph (3-gram
    Jaccard >= 0.3 pairs, deliberately unblocked: the audit must see
    cross-block wedges): of all wedges a~b~c, how many have the closing
    a~c edge. A low closure rate means similarity is not behaving
    transitively and connected-component dup clusters will over-merge —
    the audit to run before trusting dedup_clusters.

    100 TB shape: even without a blocking key, pair generation is the
    AllPairs prefix-filtered path (token-frequency cost, never the
    corpus cross-product); both wedge joins and the closure probe run
    on the pair table (similarity graphs are sparse), never on the
    corpus."""
    docs = _load_parallel(spark, sf_dir, "documents")
    # the pair table feeds FOUR consumers (both und directions, the
    # closure probe, the edge count); it is sparse (pairs, two longs) so
    # caching it runs the expensive prefix-filtered generation once
    # freq_order=True: the corpus-wide unblocked pass is exactly the
    # boilerplate-heavy case canonical frequency-ordered prefixes prune
    # best (measured >=10x fewer candidates, identical results —
    # test_freq_ordered_allpairs_same_result_fewer_candidates)
    e = (
        dd.ngram_jaccard_pairs(
            docs, block_key=F.lit("all"), threshold=0.3, freq_order=True
        )
        .select("id_a", "id_b")
        .cache()
    )
    und = e.select(F.col("id_a").alias("x"), F.col("id_b").alias("y")).union(
        e.select(F.col("id_b"), F.col("id_a"))
    )
    wedge = (
        und.alias("e1")
        .join(
            und.alias("e2"),
            (F.col("e1.y") == F.col("e2.x")) & (F.col("e1.x") < F.col("e2.y")),
        )
        .select(F.col("e1.x").alias("a"), F.col("e1.y").alias("b"), F.col("e2.y").alias("c"))
    )
    closed = wedge.join(
        e.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"), F.lit(1).alias("hit")),
        ["a", "c"],
        "left",
    )
    n_edges = e.agg(F.count("*").alias("n_edges"))
    agg = closed.agg(
        F.count("*").alias("n_wedges"),
        F.coalesce(F.sum("hit"), F.lit(0)).alias("n_closed"),
    )
    return agg.join(F.broadcast(n_edges)).select(
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("n_wedges").cast("bigint").alias("n_wedges"),
        F.col("n_closed").cast("bigint").alias("n_closed"),
        F.round(
            F.col("n_closed") * 1.0 / F.nullif(F.col("n_wedges"), F.lit(0)), 6
        ).alias("transitivity"),
    )


# --------------------------------------------------------------------------
# output_shard_balance — pre-write layout audit
# --------------------------------------------------------------------------

_N_SHARDS = 64
_SHARD_SALT = ":shard"


@register(
    "output_shard_balance",
    f"""
WITH sharded AS (
    SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{_SHARD_SALT}'),
                                1, 15)) AS BIGINT) % {_N_SHARDS} AS shard,
           n_chars
    FROM documents
),
per_shard AS (
    SELECT shard, count(*) AS n_docs, coalesce(sum(n_chars), 0) AS sum_chars
    FROM sharded GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_shards,
       CAST(min(n_docs) AS BIGINT) AS min_docs,
       CAST(max(n_docs) AS BIGINT) AS max_docs,
       round(avg(n_docs), 6) AS mean_docs,
       round(max(n_docs) / avg(n_docs), 6) AS doc_imbalance,
       CAST(max(sum_chars) AS BIGINT) AS max_shard_chars,
       round(max(sum_chars) / avg(sum_chars), 6) AS char_imbalance
FROM per_shard
""",
)
def output_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-write layout audit: docs and characters per 64 salted-hash
    output shards, with max/mean imbalance factors — the check that
    catches a skewed writer layout (one fat file, 999 slivers) BEFORE a
    1000-writer job runs, and the evidence that the salted-hash shard
    function spreads this corpus evenly. Size is measured in CHARACTERS
    (the n_chars column); for multi-byte UTF-8 text chars != octets, so
    the columns say chars, not bytes (ADVICE r03).

    100 TB shape: map-only shard assignment + a 64-row aggregate of the
    per-shard counters."""
    docs = _load_parallel(spark, sf_dir, "documents")
    shard = (
        stable_long(F.concat(F.col("doc_id").cast("string"), F.lit(_SHARD_SALT)))
        % _N_SHARDS
    )
    per_shard = docs.groupBy(shard.alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).alias("sum_chars"),
    )
    return per_shard.agg(
        F.count("*").cast("bigint").alias("n_shards"),
        F.min("n_docs").cast("bigint").alias("min_docs"),
        F.max("n_docs").cast("bigint").alias("max_docs"),
        F.round(F.avg("n_docs"), 6).alias("mean_docs"),
        F.round(F.max("n_docs") / F.avg("n_docs"), 6).alias("doc_imbalance"),
        F.max("sum_chars").cast("bigint").alias("max_shard_chars"),
        F.round(F.max("sum_chars") / F.avg("sum_chars"), 6).alias("char_imbalance"),
    )
