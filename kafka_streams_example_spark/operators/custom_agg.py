"""Custom aggregation surface (U1 in SURVEY.md §2).

The reference's three hand-written accumulators (SolarModuleAggregator.java:
32-41, SolarPanelAggregator.java:35-59) all collapsed into built-in Spark
aggregates. For aggregation logic that genuinely has no built-in, the
engine's UDA surface is Arrow-batched ``applyInPandas`` (grouped-map) /
``pandas_udf`` (grouped-agg) — vectorized, one Python call per group batch,
never per row.

``weighted_avg_in_pandas`` is the reference example: integer-exact
accumulation (int64 products) so results are deterministic regardless of
row order — the property that makes a custom UDA oracle-checkable."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_avg_in_pandas(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    weight_scale: int = 100,
) -> DataFrame:
    """Per-group weighted average where weights are 2-decimal money values,
    scaled to integer cents so the accumulation is exact and order-free.

    Output: group_col, weighted_avg (double), n (long).
    """

    from collections.abc import Iterator

    from kafka_streams_example_spark.operators import ensure_min_partitions

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Map-side combine for a custom UDA: each Arrow batch reduces to one
        # row per group BEFORE any shuffle. groupBy().applyInPandas would
        # instead gather whole groups — with low-cardinality keys that is a
        # handful of giant single-threaded pandas calls; this stays parallel
        # across partitions and shuffles only the partials.
        for pdf in it:
            w = (pdf[weight_col] * weight_scale).round().astype("int64")
            out = pd.DataFrame(
                {
                    group_col: pdf[group_col],
                    "vw": pdf[value_col].astype("int64") * w,
                    "w": w,
                }
            )
            g = out.groupby(group_col, sort=False, as_index=False).agg(
                vw=("vw", "sum"), w=("w", "sum"), n=("w", "size")
            )
            yield g

    partial_schema = f"{group_col} STRING, vw LONG, w LONG, n LONG"
    partial = ensure_min_partitions(
        df.select(group_col, value_col, weight_col)
    ).mapInPandas(partials, partial_schema)
    return partial.groupBy(group_col).agg(
        (F.sum("vw").cast("double") / F.sum("w")).alias("weighted_avg"),
        F.sum("n").alias("n"),
    )


def grouped_agg_quantile(
    df: DataFrame, group_col: str, value_col: str, q: float = 0.5
) -> DataFrame:
    """pandas_udf grouped-agg flavor: per-group quantile (linear
    interpolation, numpy semantics)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pq(v: pd.Series) -> float:
        return float(v.quantile(q, interpolation="linear"))

    return df.groupBy(group_col).agg(pq(F.col(value_col)).alias(f"q{int(q * 100)}"))
