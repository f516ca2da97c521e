"""Synthesize a larger scale factor from sf0.1 by replicate+reseed.

Usage: python tools/make_sfN.py [factor] [out_dir]
(default: 10 -> /tmp/spark_graft_sf1)

Reseeding is designed so the WORKLOAD scales linearly instead of
degenerating into duplicate explosions:

- documents: copy k suffixes every token with ``k`` (a bijective token
  map), so intra-copy n-gram/Jaccard/MinHash structure is preserved
  exactly while cross-copy token sets are disjoint — near-dup pair
  counts scale x k, not x k^2. doc_ids shift by a copy gap.
- embeddings: copy k rotates each vector's components by k positions —
  an orthogonal transform, so intra-copy cosines are bit-preserved
  while cross-copy vectors decorrelate (no duplicate-vector blowup in
  SimHash buckets). vec_ids shift.
- events: ids/users shift by copy gaps; timestamps/values/types kept
  (groups grow x k, the realistic shape for more traffic on the same
  day range).
- TPC-H facts: all foreign/primary keys shift consistently per copy so
  joins stay intact within each copy. Dimension tables (region, nation)
  do not scale, matching TPC-H.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from kafka_streams_example_spark.session import get_spark

SRC = "/root/testdata/sf0.1"

GAPS = {
    "doc_id": 1_000_000,
    "event_id": 100_000_000,
    "user_id": 1_000_000,
    "vec_id": 1_000_000,
    "o_orderkey": 100_000_000,
    "l_orderkey": 100_000_000,
    "c_custkey": 10_000_000,
    "o_custkey": 10_000_000,
    "s_suppkey": 1_000_000,
    "l_suppkey": 1_000_000,
    "p_partkey": 10_000_000,
    "l_partkey": 10_000_000,
}


def _copies(spark, factor: int) -> DataFrame:
    return spark.range(factor).select(F.col("id").cast("int").alias("k"))


def scale_table(spark, name: str, factor: int) -> DataFrame:
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
    if name in ("region", "nation"):
        return df
    out = df.crossJoin(F.broadcast(_copies(spark, factor)))
    for col, gap in GAPS.items():
        if col in df.columns:
            out = out.withColumn(col, F.col(col) + F.col("k").cast("long") * gap)
    if name == "documents":
        # bijective token map per copy (suffix every token with k):
        # intra-copy n-gram structure is preserved exactly, cross-copy
        # token sets are disjoint
        out = out.withColumn(
            "text",
            F.when(F.col("k") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), r"[ \t\n\x0B\f\r]+"),
                        lambda t: F.when(t == "", t).otherwise(
                            F.concat(t, F.col("k").cast("string"))
                        ),
                    ),
                    " ",
                )
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if name == "embeddings":
        d = len(df.select("embedding").head()[0])
        rot = F.when(F.col("k") % d == 0, F.col("embedding")).otherwise(
            F.concat(
                F.slice(F.col("embedding"), (F.col("k") % d) + 1, d),
                F.slice(F.col("embedding"), 1, F.col("k") % d),
            )
        )
        out = out.withColumn("embedding", rot)
    return out.drop("k")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    spark = get_spark(app_name="make-sfN")
    spark.sparkContext.setLogLevel("ERROR")
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        df = scale_table(spark, t, factor)
        # multiple output files so scans parallelize like real inputs
        parts = 1 if t in ("region", "nation") else 16
        df.repartition(parts).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(t, "->", f"{out_dir}/{t}.parquet", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
