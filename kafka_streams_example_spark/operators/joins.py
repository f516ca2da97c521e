"""Join operators beyond plain equi-joins.

The reference's two joins (reference: SolarConsumer.java:142-147, :165-173)
are windowed equi-joins — plain ``df.join(..., on=[window, key])`` in Spark
because both sides carry identical aligned tumbling windows (SURVEY.md §2.1
note 7). This module adds the join shapes a general engine needs that Spark
lacks as built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    right_tiebreak: str,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right.on == left.on`` and ``right_ts <= left_ts`` (ties on the
    timestamp broken by max ``right_tiebreak``). Left rows with no match
    keep NULL payload columns.

    Scale design: NOT a range join (O(n·m) per key) — a union + running
    ``last(ignorenulls)`` window. One shuffle on the key, then a linear
    scan per partition; this survives 100TB because state per key is one
    row of carried payload, and skewed keys split cleanly under AQE since
    the window is computed per (key) partition ordered by time.
    """
    l_marked = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__is_left", F.lit(1)
    )
    r_marked = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__t"),
            F.col(right_tiebreak).alias("__tb"),
            F.struct(*[F.col(c) for c in right_payload]).alias("__payload"),
        )
        .withColumn("__is_left", F.lit(0))
    )
    unioned = l_marked.unionByName(r_marked, allowMissingColumns=True)
    # Right rows sort before left rows at equal timestamps (asof is <=);
    # among right ties, the max tiebreak lands last so `last()` picks it.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last(F.col("__payload"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__is_left") == 1)
    for c in right_payload:
        out = out.withColumn(c, F.col("__match").getField(c))
    return out.drop("__t", "__is_left", "__tb", "__payload", "__match")
