"""Streaming observability: a StreamingQueryListener capturing per-batch
throughput — the operational counterpart of the reference's foreach log
sinks (SolarConsumer.java:102-104 etc.), but out-of-band: zero topology
stages, metrics come from the engine's own progress events."""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class ThroughputListener(StreamingQueryListener):
    """Collects (batch_id, numInputRows, processedRowsPerSecond) per
    progress event. Attach with ``spark.streams.addListener``."""

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "query": p.name,
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "rows_per_sec": p.processedRowsPerSecond,
                "batch_duration_ms": p.batchDuration,
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
