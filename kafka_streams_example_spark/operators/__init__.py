from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition up to the session's core count when the input arrives in
    fewer splits. Matters for CPU-heavy per-row derivations (shingling,
    hashing, vector math) over small file counts — a 100MB single-file scan
    otherwise pins the whole derivation to one core. At real scale the scan
    already yields >= cores splits and this is a no-op (no shuffle added)."""
    if n is None:
        n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
