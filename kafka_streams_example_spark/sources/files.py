"""Batch file sources.

The reference has exactly one source — a Kafka topic (reference:
SolarConsumer.java:97-99). A general engine needs file-format scans as well;
these helpers read the driver's parquet tables and register SQL views so
the same queries run through either the DataFrame or the SQL surface.

Scale notes: `spark.read.parquet` gives predicate pushdown + column pruning
for free through the DataSource V2 scan; partition sizing is governed by
``spark.sql.files.maxPartitionBytes`` (set in session.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from kafka_streams_example_spark.schemas import ALL_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Columns that MAY arrive as parquet TIMESTAMP(NANOS) (pandas
# datetime64[ns] writers). Spark has no nanosecond timestamp type — when the
# file carries NANOS we read them as raw INT64 nanos (legacy conf) and
# truncate to microseconds, matching what DuckDB's reader does (ns → us
# floor), so both engines window identically. Files already written as
# TIMESTAMP(MICROS) read natively and need no conversion — we detect which
# case we got from the resolved read schema.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

# Per-process memo of each table path's RESOLVED read schema (metadata
# only, never data): the first load in a session pays the dynamic
# parquet-footer schema resolution once, every later load passes the
# recorded schema explicitly — measured 0.109 s -> 0.011 s per
# spark.read.parquet on the driver (pure plan-construction latency,
# ~1.5 loads per query x 259 queries per sweep). The testdata under one
# path is immutable for the life of a process, and a FRESH process
# (the driver's verify, a production job against a catalog) re-derives
# it from the files — nothing about query RESULTS is memoized. Every
# consumer gets the explicit-schema relation (the miss path discovers
# the schema with a throwaway dynamic read, then rebuilds through the
# same explicit path), so plan-equality caching sees one relation shape.
_SCHEMA_MEMO: dict[str, "object"] = {}


def _resolve_read_schema(spark: SparkSession, path: str):
    """Dynamic-read schema discovery (the pre-memo load_table behavior):
    resolve the file schema under the session confs load_table pins."""
    return spark.read.parquet(path).schema


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (parquet), normalizing ns-timestamps."""
    # Callers (the driver) may hand us a session we didn't configure; pin the
    # session timezone so timestamp-literal comparisons are tz-independent
    # and match the (naive-timestamp) DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Read naive parquet timestamps as TimestampType (not NTZ): with the
    # session pinned to UTC the internal value equals the naive value the
    # DuckDB oracle sees, and epoch casts/arithmetic stay legal.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    nanos_cols = _NANOS_TS_COLS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = _SCHEMA_MEMO.get(path)
    if schema is None:
        schema = _resolve_read_schema(spark, path)
        _SCHEMA_MEMO[path] = schema
    df = spark.read.schema(schema).parquet(path)
    for c in nanos_cols:
        # Only NANOS columns surface as LongType under nanosAsLong; MICROS
        # columns are already TimestampType and must not be re-converted.
        if not isinstance(df.schema[c].dataType, LongType):
            continue
        # integer div (not /): nanos exceed 2^53, double math would lose bits
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    # Spark-written parquet (e.g. tools/make_sfN.py output) embeds its row
    # metadata, which declares TIMESTAMP_NTZ and OVERRIDES the
    # inferTimestampNTZ conf above. Normalize: with the session pinned to
    # UTC the NTZ->TIMESTAMP cast is the identity on the naive value, so
    # epoch casts stay legal and match the DuckDB oracle's epoch(naive).
    for field in df.schema.fields:
        if field.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def table_row_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Exact row count of a testdata table from parquet FOOTER metadata —
    driver-side, zero Spark jobs. Operators that size themselves from the
    input (packing shard counts, IDF denominators) need n_rows before the
    query runs; a ``df.count()`` action launches a cluster-wide scan job
    per invocation, which on a 100 TB filtered input is a full pass.
    Footer ``num_rows`` is the same number ``count(*)`` returns for the
    unfiltered table (so count-based oracles stay exact). Falls back to
    ``df.count()`` for non-parquet or unreadable inputs."""
    import glob as _glob

    import pyarrow.parquet as _pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        files = (
            [path]
            if os.path.isfile(path)
            else sorted(_glob.glob(os.path.join(path, "*.parquet")))
        )
        if files:
            return sum(_pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        pass
    return load_table(spark, sf_dir, name).count()


def table_uncompressed_bytes(sf_dir: str, name: str) -> int:
    """Total UNCOMPRESSED byte size of a testdata table from parquet
    FOOTER metadata (sum of row-group ``total_byte_size``) — driver-side,
    zero Spark jobs. Operators that must decide broadcast-vs-shuffle
    before the plan runs (the decontam family's eval-gram side) size the
    decision from this instead of assuming "the bench set is tiny".
    Returns -1 when the size cannot be read (non-parquet input) — callers
    must treat unknown as TOO BIG and keep the shuffle join: a wrongly
    skipped broadcast costs one exchange, a wrongly taken one OOMs the
    executors."""
    import glob as _glob

    import pyarrow.parquet as _pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        files = (
            [path]
            if os.path.isfile(path)
            else sorted(_glob.glob(os.path.join(path, "*.parquet")))
        )
        if not files:
            return -1
        total = 0
        for f in files:
            md = _pq.ParquetFile(f).metadata
            total += sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))
        return total
    except Exception:
        return -1


def register_views(spark: SparkSession, sf_dir: str, tables=ALL_TABLES) -> None:
    """Register each table as a temp view for spark.sql() queries."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    """CSV batch scan. An explicit schema skips the inference pass (which
    reads the data twice — never acceptable at scale)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Newline-JSON batch scan; same schema-or-inference contract."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table: joins and
    aggregations on the bucket column then run WITHOUT a shuffle (and
    without a sort, if sorted) — the storage-level answer to repeated
    co-located joins at scale. Bucket counts should match across tables
    that join together."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Hive-style partitioned layout: filters on the partition columns
    prune whole directories at planning time (zero IO for excluded
    partitions) — the first-order scan optimization at 100TB. Partition
    columns should be low-cardinality (date, region), never high-
    cardinality ids (small-file explosion)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)


def write_range_sorted(
    df: DataFrame, path: str, col: str, num_partitions: int = 8
) -> None:
    """Range-partitioned, sorted-within-partition parquet layout: each
    output file holds a DISJOINT value range of ``col``, so its footer
    min/max statistics let readers skip whole files/row-groups for range
    predicates — the sort-based data-skipping complement to directory
    partitioning (use for high-cardinality ordering keys like event
    time, where Hive partitioning would explode into small files).
    The range exchange samples split points, so files are also
    size-balanced — no manual bucket math."""
    (
        df.repartitionByRange(num_partitions, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def read_json_stream_dir(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-based streaming source (newline-JSON dir) — broker-free stand-in
    for the Kafka source in tests; same downstream program either way."""
    return spark.readStream.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC batch scan — same DSv2 pushdown/pruning properties as parquet
    (vectorized reader, predicate pushdown, column projection)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Whole-line text scan (one `value` string column) — the raw-corpus
    entry point for the text-analysis operators: read_text → quality
    filter → dedup is the canonical LLM data path."""
    return spark.read.text(path)


def write_text(df: DataFrame, path: str) -> None:
    """Write a single string column as raw lines."""
    df.write.mode("overwrite").text(path)


def avro_available(spark: SparkSession) -> bool:
    """Avro is an external Spark module (spark-avro jar). True iff the
    runtime has it on the classpath; callers gate avro IO on this rather
    than failing mid-pipeline."""
    try:
        # the authoritative check is Spark's own data-source registry —
        # stray avro *classes* can be on the classpath (via connect/
        # protobuf deps) without the spark-avro module being deployed
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro batch scan (requires the spark-avro module; see
    ``avro_available``)."""
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").format("avro").save(path)
