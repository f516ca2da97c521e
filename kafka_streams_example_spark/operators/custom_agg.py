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

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        w = (pdf[weight_col] * weight_scale).round().astype("int64")
        v = pdf[value_col].astype("int64")  # quantities are integral
        wsum = int(w.sum())
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "weighted_avg": [float(int((v * w).sum()) / wsum) if wsum else 0.0],
                "n": [len(pdf)],
            }
        )

    out_schema = f"{group_col} STRING, weighted_avg DOUBLE, n LONG"
    return df.select(group_col, value_col, weight_col).groupBy(group_col).applyInPandas(
        agg, out_schema
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
