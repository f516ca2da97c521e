"""Streaming ingest contract gate — the data-contract validation suite
(llm_extra19.py:data_contract_validation) as a standing Structured
Streaming program. Violation counts are plain sums, so they aggregate
incrementally in update mode and the cumulative stream state always
equals the batch suite run over the union of everything ingested —
exactly the "run the contract per ingest batch, merge counts as sums"
scale story SCALE.md §14 claims, here proven by the batch/stream parity
test.

FK integrity uses a stream-static join against the parent dimension
(Spark re-plans the static side per micro-batch, so a slowly-changing
parent is picked up without restarting the query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_contract_gate(orders_stream: DataFrame, customer: DataFrame) -> DataFrame:
    """Cumulative contract-violation counters over an orders stream:
    one output row per check with running (n_rows, n_violations) —
    update mode emits refreshed counters each micro-batch.

    Checks mirror the batch suite's orders rows: FK orders→customer
    (stream-static left join), enum domain on o_orderstatus, and the
    o_totalprice positivity range check. (PK uniqueness needs
    cross-batch distinct state and belongs to the dedup tier —
    dedup_stream_within_watermark — not a counter gate.)"""
    probed = orders_stream.join(
        F.broadcast(customer.select("c_custkey")),
        orders_stream["o_custkey"] == customer["c_custkey"],
        "left",
    )
    checks = probed.select(
        F.col("c_custkey").isNull().cast("long").alias("fk_orders_customer"),
        (
            ~F.col("o_orderstatus").isin("O", "F", "P")
            | F.col("o_orderstatus").isNull()
        )
        .cast("long")
        .alias("enum_orderstatus"),
        (F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0.0))
        .cast("long")
        .alias("range_totalprice_positive"),
    )
    stacked = checks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check_name"),
                        F.col(name).alias("v"),
                    )
                    for name in (
                        "fk_orders_customer",
                        "enum_orderstatus",
                        "range_totalprice_positive",
                    )
                ]
            )
        ).alias("c")
    ).select("c.check_name", "c.v")
    return stacked.groupBy("check_name").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("v").cast("long").alias("n_violations"),
    )
