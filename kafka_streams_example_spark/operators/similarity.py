"""Similarity search over embedding columns (`array<float>`).

Two paths, mirroring how vector search actually scales:

- ``cosine_topk``     exact brute force — broadcast the (small) query set,
                      one scan of the corpus, per-query top-k. The baseline
                      and the correctness oracle for everything else.
- ``lsh_bucketed_topk``  random-hyperplane (SimHash) LSH: corpus and queries
                      bucketed by sign pattern; candidates = same-bucket
                      pairs → exact re-rank. The 100TB path: the bucket
                      join prunes the cross product by ~2^bits, and buckets
                      are hash-partitionable.

All dot products are JVM-side higher-order array expressions (no Python).
Element order of the fold is the array order, so scores are bit-identical
across engines that evaluate left-to-right (DuckDB included) — which makes
exact top-k comparison possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column, dim: int) -> Column:
    """Σ a[i]·b[i] folded in array order, all-double arithmetic."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(dim)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double"),
    )


def norm(a: Column, dim: int) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine per query vector (self-matches excluded).

    Deterministic ranking: (score desc, corpus id asc). The query side is
    broadcast — it must be small (true by construction for ANN serving);
    the corpus side streams through one whole-stage-codegen scan.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col))
    scored = (
        c.join(F.broadcast(q), F.col(id_col) != F.col("q_id"))
        .withColumn("score", cosine(F.col("q_vec"), F.col(vec_col), dim))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", F.col(id_col), "rnk", F.round("score", 6).alias("score"))
    )


def simhash_bits(vec: Column, planes: list[list[float]], dim: int) -> Column:
    """Sign pattern of the vector against fixed hyperplanes → bucket id.

    ``planes`` must be deterministic constants (callers derive them from a
    seed) so the bucketing is reproducible across runs and engines.
    """
    bucket = F.lit(0)
    for p in planes:
        arr = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket * 2 + F.when(dot(vec, arr, dim) >= 0, 1).otherwise(0)
    return bucket


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share a SimHash bucket, re-ranked by
    exact cosine. Trades recall for a 2^|planes| reduction in pairs; at
    scale the bucket equi-join replaces the broadcast cross product."""
    c = corpus.select(F.col(id_col), F.col(vec_col)).withColumn(
        "bucket", simhash_bits(F.col(vec_col), planes, dim)
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("bucket", simhash_bits(F.col("q_vec"), planes, dim))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col(id_col) != F.col("q_id"))
        .withColumn("score", cosine(F.col("q_vec"), F.col(vec_col), dim))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", F.col(id_col), "rnk", F.round("score", 6).alias("score"))
    )
