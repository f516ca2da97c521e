"""Python DataSource (Spark 4 API): a deterministic synthetic
solar-telemetry generator.

The reference's only source is a Kafka topic of JSON telemetry
(reference: SolarConsumer.java:47, :97-100). Our engine's source surface is
pluggable; this module exercises Spark's Python DataSource extension point
with a generator that produces the same record shape
`(ts, panel, name, power)` the solar pipeline consumes — useful for load
tests and CI without a broker or fixture files.

Scale shape: the generator is partitioned — each InputPartition derives its
rows independently from (partition_index, row_index), so N partitions scale
across executors with zero coordination, and the output is byte-identical
for a given (seed, partitions, rows_per_partition) regardless of
parallelism.

The classes are defined FUNCTION-LOCALLY (factory below) on purpose:
Spark ships the registered DataSource to Python workers via cloudpickle,
which serializes module-level classes by reference — the worker would then
need this package importable on ITS sys.path (true in our tests, false for
an external driver that sys.path-hacks only its own process). Local classes
serialize by value, so registration works from any session.
"""

from __future__ import annotations


def make_solar_sim_datasource():
    """Build the solar_sim DataSource class (self-contained, cloudpickled
    by value — see module docstring)."""
    import datetime as dt

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )
    from pyspark.sql.types import StructType

    epoch = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def mix64(x: int) -> int:
        """splitmix64 finalizer — cheap deterministic per-row randomness."""
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return x ^ (x >> 31)

    class SolarSimReader(DataSourceReader):
        def __init__(self, options: dict):
            self.n_partitions = int(options.get("partitions", 4))
            self.rows = int(options.get("rows_per_partition", 1000))
            self.seed = int(options.get("seed", 42))
            self.n_panels = int(options.get("panels", 5))
            self.n_modules = int(options.get("modules", 4))

        def partitions(self):
            return [InputPartition(i) for i in range(self.n_partitions)]

        def read(self, partition: InputPartition):
            base = self.seed * 1_000_003 + partition.value * 1_000_000
            for i in range(self.rows):
                h = mix64(base + i)
                panel = h % self.n_panels
                module = (h >> 8) % self.n_modules
                # event time advances 1s per row within the partition
                ts = epoch + dt.timedelta(seconds=partition.value * self.rows + i)
                power = round((h >> 16) % 10_000 / 100.0, 2)
                yield (ts, f"P{panel}", f"M{module}", power)

    class RangePartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class SolarSimStreamReader(DataSourceStreamReader):
        """Micro-batch flavor: offsets are global row counters; each
        ``latestOffset`` call admits one batch of ``rows_per_batch`` rows
        (capped at ``max_rows`` so ``processAllAvailable`` terminates in
        tests). Rows derive from the GLOBAL index with the same splitmix64
        scheme as the batch reader at partition 0, so a drained stream
        equals `spark.read.format("solar_sim")` with partitions=1 — the
        one-program-two-modes property, and replay after a restart is
        byte-identical (offsets fully determine the data).

        Restart safety: a recreated reader starts with ``_pos = 0``, but
        Spark's ``PythonMicroBatchStream`` implements
        ``AcceptsLatestSeenOffset`` and replays the checkpointed offset to
        Python as a degenerate ``partitions(o, o)`` call before the first
        ``latestOffset`` (and replays any pending batch as
        ``partitions(start, end)``) — so both hooks, plus ``commit``,
        advance the high-water mark and ``latestOffset`` can never move
        backwards past a committed offset after a checkpoint restart."""

        def __init__(self, options: dict):
            self.rows_per_batch = int(options.get("rows_per_batch", 100))
            self.n_partitions = int(options.get("partitions", 2))
            self.max_rows = int(options.get("max_rows", 1000))
            self.seed = int(options.get("seed", 42))
            self.n_panels = int(options.get("panels", 5))
            self.n_modules = int(options.get("modules", 4))
            self._pos = 0

        def initialOffset(self) -> dict:
            return {"row": 0}

        def latestOffset(self) -> dict:
            # max() keeps a checkpoint-restored _pos that already exceeds
            # this run's max_rows option from regressing.
            self._pos = max(self._pos, min(self.max_rows, self._pos + self.rows_per_batch))
            return {"row": self._pos}

        def partitions(self, start: dict, end: dict):
            s, e = start["row"], end["row"]
            self._pos = max(self._pos, s, e)  # checkpoint-restore high-water
            if e <= s:
                return [RangePartition(s, s)]
            step = -(-(e - s) // self.n_partitions)
            return [
                RangePartition(lo, min(lo + step, e))
                for lo in range(s, e, step)
            ]

        def read(self, partition):
            base = self.seed * 1_000_003
            for i in range(partition.start, partition.end):
                h = mix64(base + i)
                panel = h % self.n_panels
                module = (h >> 8) % self.n_modules
                ts = epoch + dt.timedelta(seconds=i)
                power = round((h >> 16) % 10_000 / 100.0, 2)
                yield (ts, f"P{panel}", f"M{module}", power)

        def commit(self, end: dict) -> None:
            self._pos = max(self._pos, end["row"])

    class SolarSimDataSource(DataSource):
        """spark.read.format("solar_sim") after
        ``spark.dataSource.register(SolarSimDataSource)``; also a
        streaming source via spark.readStream.format("solar_sim")."""

        _mix64 = staticmethod(mix64)
        _epoch = epoch

        @classmethod
        def name(cls) -> str:
            return "solar_sim"

        def schema(self) -> str:
            return "ts timestamp, panel string, name string, power double"

        def reader(self, schema: StructType) -> DataSourceReader:
            return SolarSimReader(self.options)

        def streamReader(self, schema: StructType) -> DataSourceStreamReader:
            return SolarSimStreamReader(self.options)

    return SolarSimDataSource


SolarSimDataSource = make_solar_sim_datasource()
_mix64 = SolarSimDataSource._mix64
_EPOCH = SolarSimDataSource._epoch


def make_jsonl_sink_datasource():
    """Build the jsonl_sink streaming DataSource (Spark 4 Python
    DataSourceStreamWriter) — the write-side counterpart of the generator
    above, completing the Python extension surface: batch read + stream
    read + stream write.

    Commit protocol (the part that matters): executors stage each
    partition to a temp file and return it in the WriterCommitMessage;
    the DRIVER renames staged files into place and drops a per-batch
    marker only after every task succeeded — so readers never observe a
    half-written batch, and a replayed batch id overwrites its own files
    idempotently (exactly-once per batch on a posix FS; swap the rename
    for an object-store committer at scale). Classes are function-local
    for cloudpickle-by-value (see module docstring)."""
    import json
    import os
    import uuid
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        WriterCommitMessage,
    )

    @dataclass
    class FileCommit(WriterCommitMessage):
        staged: str
        rows: int

    class JsonlStreamWriter(DataSourceStreamWriter):
        def __init__(self, options: dict):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("jsonl_sink requires the 'path' option")

        def write(self, iterator):
            staging = os.path.join(self.path, "_staging")
            os.makedirs(staging, exist_ok=True)
            name = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
            n = 0
            with open(name, "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(), default=str) + "\n")
                    n += 1
            return FileCommit(staged=name, rows=n)

        def commit(self, messages, batchId: int) -> None:
            os.makedirs(os.path.join(self.path, "_commits"), exist_ok=True)
            final = []
            for i, m in enumerate(messages):
                if m is None:
                    continue
                if m.rows == 0:
                    if os.path.exists(m.staged):
                        os.remove(m.staged)
                    continue
                dst = os.path.join(
                    self.path, f"batch-{batchId:05d}-part-{i:04d}.jsonl"
                )
                os.replace(m.staged, dst)
                final.append(os.path.basename(dst))
            # Idempotent replay: a retried batch may have FEWER partitions
            # than the failed attempt — remove that attempt's leftover
            # batch-NNNNN-part-*.jsonl files so glob readers can't
            # double-count rows beyond what the marker lists.
            import glob as _glob

            keep = set(final)
            for stale in _glob.glob(
                os.path.join(self.path, f"batch-{batchId:05d}-part-*.jsonl")
            ):
                if os.path.basename(stale) not in keep:
                    os.remove(stale)
            with open(os.path.join(self.path, "_commits", str(batchId)), "w") as f:
                json.dump({"batch": batchId, "files": sorted(final)}, f)

        def abort(self, messages, batchId: int) -> None:
            for m in messages:
                if m is not None and os.path.exists(m.staged):
                    os.remove(m.staged)

    class JsonlSinkDataSource(DataSource):
        """df.writeStream.format("jsonl_sink").option("path", dir) after
        ``spark.dataSource.register(JsonlSinkDataSource)``."""

        @classmethod
        def name(cls) -> str:
            return "jsonl_sink"

        def schema(self) -> str:  # write-side: schema comes from the df
            return "value string"

        def streamWriter(self, schema, overwrite: bool):
            return JsonlStreamWriter(self.options)

    return JsonlSinkDataSource


JsonlSinkDataSource = make_jsonl_sink_datasource()
