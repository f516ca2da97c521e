"""Observability and output sinks — K1-K5 and S2 in the reference.

The reference logs at five points of its topology via ``foreach`` side
effects (SolarConsumer.java:102-104, :117-119, :131-133, :159-161,
:175-182) and produces to Kafka (:184-188). Spark equivalents, all
non-invasive (no extra topology stages — sinks attach to any DataFrame):
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def console_sink(stream_df: DataFrame, truncate: bool = False, num_rows: int = 20):
    """K1-K5: log every emitted row (streaming console sink)."""
    return (
        stream_df.writeStream.format("console")
        .option("truncate", str(truncate).lower())
        .option("numRows", str(num_rows))
        .outputMode("append")
        .start()
    )


def memory_sink(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Queryable in-memory sink (tests/debugging): results readable via
    ``spark.sql(f"SELECT * FROM {name}")``."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def foreach_batch_sink(
    stream_df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str | None = None,
    output_mode: str = "append",
):
    """The general side-effect sink (the reference's ``foreach``, but
    batch-at-a-time): ``fn(batch_df, batch_id)`` with exactly-once batch
    ids under checkpointing."""
    writer = stream_df.writeStream.outputMode(output_mode).foreachBatch(fn)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def parquet_sink(stream_df: DataFrame, path: str, checkpoint: str):
    """File sink for downstream batch consumption (exactly-once via the
    transaction log)."""
    return (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
