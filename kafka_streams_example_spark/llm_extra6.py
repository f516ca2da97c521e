"""Seventh tranche: time-series regularization, corpus mixture
re-balancing and saturation diagnostics (round 3, part 4).

- resample_fill_forward:   per-user daily resampling of irregular events
                           with last-observation-carried-forward gap
                           fill — the step that turns event streams into
                           the regular grid downstream models expect.
- dataset_mixture_resample: temperature-flattened (alpha=0.5) source
                           mixture: per-source keep rates and the
                           deterministic hash-selected document counts —
                           the corpus re-balancing pass before training.
- ngram_novelty_curve:     fraction of never-before-seen 3-grams per
                           ingestion batch — the saturation curve that
                           says when more crawl stops adding new content.

Scale notes (100 TB shapes):
- the resample grid is generated per user (bounded: days, not events)
  and joined on (user, day) in one shuffle; the forward-fill window runs
  inside user partitions — the corpus never rides an unbounded window;
- mixture rates come from a source-cardinality aggregate broadcast onto
  a map-only selection pass; rates are rounded to 6 decimals BEFORE the
  hash comparison so both engines select the identical document set;
- the novelty curve shuffles (ngram-hash, batch) pairs only — the
  first-occurrence aggregate and the per-batch counts reuse the same
  ngram partitioning, and text never rides a corpus-scale shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.functions.hashing import stable_long
from kafka_streams_example_spark.registry import _NGRAMS, _TOKS, _load_parallel, register

# --------------------------------------------------------------------------
# resample_fill_forward — daily LOCF resampling per user
# --------------------------------------------------------------------------


@register(
    "resample_fill_forward",
    """
WITH obs AS (
    SELECT user_id, date_trunc('day', ts) AS day, value,
           row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id, date_trunc('day', ts)) AS n_obs
    FROM events
),
last_obs AS (SELECT user_id, day, value AS day_last, n_obs FROM obs WHERE rn = 1),
spans AS (
    SELECT user_id, date_trunc('day', min(ts)) AS d0, date_trunc('day', max(ts)) AS d1
    FROM events GROUP BY 1
),
grid AS (
    SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
    FROM spans
)
SELECT g.user_id, g.day,
       round(last_value(o.day_last IGNORE NULLS)
                 OVER (PARTITION BY g.user_id ORDER BY g.day
                       ROWS UNBOUNDED PRECEDING), 6) AS value_filled,
       CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs
FROM grid g LEFT JOIN last_obs o USING (user_id, day)
""",
)
def resample_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resampling of the irregular event stream per user: one row
    per (user, calendar day) from the user's first to last event, value =
    the day's last observation carried forward across gap days (LOCF),
    plus the day's observation count — the regular grid that
    training-feature pipelines consume.

    100 TB shape: the per-day last observation is a struct-max inside a
    (user, day) aggregate (one corpus shuffle, map-side combined); the
    grid is generated per user with sequence() (bounded by calendar days,
    not events) and the LOCF window runs inside user partitions."""
    ev = _load_parallel(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    obs = ev.groupBy("user_id", day.alias("day")).agg(
        F.max(F.struct("ts", "event_id", "value"))["value"].alias("day_last"),
        F.count("*").alias("n_obs"),
    )
    spans = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    grid = spans.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.round(F.last("day_last", ignorenulls=True).over(w), 6).alias(
                "value_filled"
            ),
            F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
        )
    )


# --------------------------------------------------------------------------
# dataset_mixture_resample — temperature-flattened source mixture
# --------------------------------------------------------------------------

_MIX_SALT = ":mix"
_TWO60_MIX = float(1 << 60)


@register(
    "dataset_mixture_resample",
    f"""
WITH stats AS (
    SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
),
rates AS (
    SELECT source, n_docs,
           round(least(1.0,
                 (sqrt(CAST(n_docs AS DOUBLE))
                  / sum(sqrt(CAST(n_docs AS DOUBLE))) OVER ())
                 * (sum(n_docs) OVER ()) / n_docs), 6) AS keep_rate
    FROM stats
),
sel AS (
    SELECT d.source, d.n_chars, r.keep_rate,
           CASE WHEN (CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '{_MIX_SALT}'),
                                           1, 15)) AS BIGINT) + 0.5) / {_TWO60_MIX}
                     < r.keep_rate
                THEN 1 ELSE 0 END AS kept
    FROM documents d JOIN rates r USING (source)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(keep_rate) AS keep_rate,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN kept = 1 THEN n_chars ELSE 0 END) AS BIGINT)
           AS kept_chars
FROM sel
GROUP BY 1
""",
)
def dataset_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixture (alpha = 0.5): target share
    per source is proportional to sqrt(count), the per-source keep rate
    is min(1, target_share x total / count), and documents are selected
    by comparing a salted-hash uniform against the rate — deterministic
    membership (pure function of doc_id), so the resampled corpus is
    identical across engines, retries and repartitioning.

    100 TB shape: source-cardinality stats (with the share computed in a
    window over those few rows) broadcast onto a map-only selection
    scan; rates are rounded to 6 decimals BEFORE the comparison so both
    engines cut the identical document set despite float-sum ordering."""
    docs = _load_parallel(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    wall = Window.partitionBy()
    sqrt_n = F.sqrt(F.col("n_docs").cast("double"))
    rate = F.round(
        F.least(
            F.lit(1.0),
            (sqrt_n / F.sum(sqrt_n).over(wall))
            * F.sum("n_docs").over(wall)
            / F.col("n_docs"),
        ),
        6,
    )
    rates = stats.select("source", rate.alias("keep_rate"))
    u = (
        stable_long(F.concat(F.col("doc_id").cast("string"), F.lit(_MIX_SALT)))
        + F.lit(0.5)
    ) / F.lit(_TWO60_MIX)
    kept = F.when(u < F.col("keep_rate"), 1).otherwise(0)
    return (
        docs.join(F.broadcast(rates), "source")
        .select("source", "n_chars", "keep_rate", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("keep_rate").alias("keep_rate"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("kept") == 1, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("kept_chars"),
        )
    )


# --------------------------------------------------------------------------
# ngram_novelty_curve — corpus saturation diagnostic
# --------------------------------------------------------------------------

_NOVELTY_BATCH = 50  # docs per ingestion batch (by doc_id order)


@register(
    "ngram_novelty_curve",
    f"""
WITH d AS (
    SELECT doc_id // {_NOVELTY_BATCH} AS batch, {_NGRAMS} AS ng
    FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
),
dp AS (
    SELECT DISTINCT batch, unnest(ng) AS gram FROM d
),
first_seen AS (
    SELECT gram, min(batch) AS first_batch FROM dp GROUP BY 1
),
per_batch AS (
    SELECT batch, count(*) AS n_distinct FROM dp GROUP BY 1
),
novel AS (
    SELECT first_batch AS batch, count(*) AS n_novel
    FROM first_seen GROUP BY 1
)
SELECT p.batch,
       CAST(p.n_distinct AS BIGINT) AS n_distinct,
       CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
       round(coalesce(n.n_novel, 0) * 1.0 / p.n_distinct, 6) AS novelty
FROM per_batch p LEFT JOIN novel n USING (batch)
""",
)
def ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus saturation curve: documents arrive in ingestion batches (50
    docs by id); for each batch, the count of distinct 3-grams it
    contains and how many of them were never seen in ANY earlier batch —
    the novelty fraction that tells you when additional crawl stops
    contributing new content (the decision input for stopping ingestion
    or re-weighting sources).

    100 TB shape: only (gram, batch) pairs shuffle (never text); the
    first-occurrence min-aggregate and the per-batch counts are
    map-side-combined aggregates over that deduplicated pair set."""
    docs = _load_parallel(spark, sf_dir, "documents")
    d = docs.select(
        (F.col("doc_id") / _NOVELTY_BATCH).cast("long").alias("batch"),
        F.explode(tx.word_ngrams(F.col("text"), 3)).alias("gram"),
    )
    dp = d.distinct()
    first_seen = dp.groupBy("gram").agg(F.min("batch").alias("first_batch"))
    per_batch = dp.groupBy("batch").agg(F.count("*").alias("n_distinct"))
    novel = first_seen.groupBy(F.col("first_batch").alias("batch")).agg(
        F.count("*").alias("n_novel")
    )
    return per_batch.join(novel, "batch", "left").select(
        "batch",
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
        F.round(F.coalesce("n_novel", F.lit(0)) * 1.0 / F.col("n_distinct"), 6).alias(
            "novelty"
        ),
    )
