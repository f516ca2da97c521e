"""Typed schemas.

Replaces the reference's POJO + Jackson serde layer (reference:
SolarModuleData.java:23-25, SolarModuleKey.java:27-28,
SolarModuleAggregator.java:26-30, SolarPanelAggregator.java:26-33,
JsonPojoSerializer.java:36-45, JsonPojoDeserializer.java:40-52 — ~240 LoC)
with declarative StructTypes: `from_json(value, SCHEMA)` on ingest,
`to_json(struct(...))` on egress.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The reference's Kafka input record {power, name, panel}
# (reference: SolarModuleData.java:23-25) plus an explicit event-time column:
# the reference windows on the Kafka *record* timestamp (nothing custom at
# SolarConsumer.java:203-212), which Spark's Kafka source exposes as a
# `timestamp` column; batch fixtures materialize it as `ts`.
SOLAR_MODULE_DATA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("panel", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("power", T.DoubleType(), False),
    ]
)

# Wire schema (no ts — event time comes from the Kafka record timestamp).
SOLAR_MODULE_DATA_WIRE = T.StructType(
    [
        T.StructField("panel", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("power", T.DoubleType(), False),
    ]
)

# Driver testdata tables (repo: TESTDATA.md / FIXTURES.md §3).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

ALL_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")
