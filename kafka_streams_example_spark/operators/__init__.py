from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

_SIZE_SUFFIXES = {
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
}


def _parse_bytes(v: str) -> int:
    """Parse a Spark byte-size string ('134217728', '128m', '4MB')."""
    s = str(v).strip().lower()
    for suffix in sorted(_SIZE_SUFFIXES, key=len, reverse=True):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * _SIZE_SUFFIXES[suffix])
    return int(s)


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Estimate the scan's partition count from local file sizes using
    Spark's own split-packing formula (FilePartition.maxSplitBytes):
    maxSplit = min(maxPartitionBytes, max(openCostInBytes,
    totalBytes / defaultParallelism)); partitions ~ ceil(total/maxSplit).

    Returns None (caller falls back to ``df.rdd.getNumPartitions()``) for
    non-local/remote inputs or non-scan plans. The point: the RDD
    conversion runs full physical planning (measured 80-270 ms per call),
    while a file listing is ~10 ms — pure driver latency saved on every
    query. The estimate only steers the repartition-or-not heuristic, so
    an approximation is safe: both failure directions cost at most a
    small shuffle or some idle cores on tiny inputs, never correctness.
    """
    try:
        files = df.inputFiles()
        if not files:
            return None
        sizes = []
        for uri in files:
            parsed = urlparse(uri)
            if parsed.scheme not in ("file", ""):
                return None
            sizes.append(os.path.getsize(unquote(parsed.path)))
        conf = df.sparkSession.conf
        max_partition = _parse_bytes(conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
        open_cost = _parse_bytes(conf.get("spark.sql.files.openCostInBytes", "4MB"))
        parallelism = max(1, df.sparkSession.sparkContext.defaultParallelism)
        total = sum(s + open_cost for s in sizes)
        max_split = min(max_partition, max(open_cost, total // parallelism))
        if max_split <= 0:
            return None
        return max(1, math.ceil(total / max_split))
    except Exception:
        return None


def checkpoint_reused(df: DataFrame) -> DataFrame:
    """Eagerly localCheckpoint a SMALL derived frame that downstream plan
    branches reference more than once.

    Spark re-executes a logical subtree once PER REFERENCE — runtime
    exchange reuse only dedupes byte-identical Exchange subplans, and the
    multi-consumer composites here (recall A/Bs, kappa cells, trained
    centroid tables) reference whole aggregated results whose exchanges
    differ across consumers (measured on the executed AQE plans:
    ann_recall_trained_vs_fixed ran 18 parquet scans / 27 exchanges for a
    query over ONE table, ReusedExchange count 0). Checkpointing
    materializes the subtree ONCE per invocation and every consumer reads
    the materialized RDD — guide §3.3's "materialise an intermediate to
    truncate the plan", applied to reused subtrees.

    Unlike ``.cache()`` there is no CacheManager plan-equality entry: a
    fresh invocation of the query recomputes from the parquet inputs, so
    nothing persists across bench/oracle runs. Only for frames small by
    construction (top-k winner sets, k-row centroid tables,
    label-cardinality cells): localCheckpoint persists to executor
    memory/disk, the in-engine analogue of the write-out a production
    pipeline would do for a reused intermediate at 100 TB.

    LAZY (eager=False), deliberately: an eager checkpoint runs the
    subtree as its own blocking job at DataFrame-construction time, which
    SERIALIZES work that one combined action overlaps across idle cores
    (measured: eager checkpoints made ann_recall_trained_vs_fixed 6.7 →
    7.5 s while lazy kept the dedup AND the overlap). The lazy form marks
    the RDD persisted + checkpointed; the query's single action
    materializes it once on first touch and every other consumer reads
    the persisted partitions."""
    return df.localCheckpoint(eager=False)


# Per-frame budget for session-level plan-equality caches. The r11
# VERDICT's open risk #3: the multi-consumer .cache() frames (per-doc
# score table, pair tables, edge lists, n-gram count tables) are narrow
# but CORPUS-CARDINALITY — at 100 TB they are TB-scale cached frames
# competing with execution memory. DataFrame.cache() is MEMORY_AND_DISK
# (degrades, never OOMs), but a cache that mostly lives on disk and
# evicts execution memory is strictly worse than a per-invocation
# materialization, so above the budget the frame falls back to
# ``checkpoint_reused`` (intra-query sharing only, nothing session-wide
# pinned). Parameterised for production (engine default 1 GiB per
# frame); the bench SFs sit orders of magnitude under it, so the local
# protocol is unchanged. Thresholds and per-site estimate formulas are
# documented in SCALE.md §caches.
_CACHE_MAX_BYTES = int(os.environ.get("SPARK_GRAFT_CACHE_MAX_BYTES", str(1 << 30)))


def estimated_input_bytes(df: DataFrame) -> int:
    """Total on-disk byte size of the frame's scan files (compressed
    parquet bytes; driver-side file listing, zero Spark jobs), or -1 when
    the input is not a local file scan. Operator-internal caches scale
    this by a documented expansion factor to budget themselves when the
    caller cannot pass a footer estimate."""
    try:
        files = df.inputFiles()
        if not files:
            return -1
        total = 0
        for uri in files:
            parsed = urlparse(uri)
            if parsed.scheme not in ("file", ""):
                return -1
            total += os.path.getsize(unquote(parsed.path))
        return total
    except Exception:
        return -1


def cache_bounded(df: DataFrame, est_bytes: int) -> DataFrame:
    """Session-cache ``df`` when its estimated materialized size fits the
    per-frame budget; otherwise cut lineage per invocation instead.

    ``est_bytes`` is a driver-side UPPER-BOUND estimate (parquet footer
    bytes/rows × a per-site expansion factor — zero Spark jobs); a
    negative value means "unknown", which falls back — the safe
    direction, mirroring the decontam broadcast guard
    (queries/dedup.py:_maybe_broadcast_bench). Output is identical on
    both paths (proven by tests/test_round12.py's forced-fallback
    parity); only the sharing scope changes."""
    if 0 <= est_bytes <= _CACHE_MAX_BYTES:
        return df.cache()
    return checkpoint_reused(df)


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition up to the session's core count when the input arrives in
    fewer splits. Matters for CPU-heavy per-row derivations (shingling,
    hashing, vector math) over small file counts — a 100MB single-file scan
    otherwise pins the whole derivation to one core. At real scale the scan
    already yields >= cores splits and this is a no-op (no shuffle added)."""
    if n is None:
        n = df.sparkSession.sparkContext.defaultParallelism
    parts = _estimated_scan_partitions(df)
    if parts is None:
        parts = df.rdd.getNumPartitions()
    if parts < n:
        return df.repartition(n)
    return df
