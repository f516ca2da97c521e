"""kafka_streams_example_spark — a PySpark-native analytics engine with the
query & data-processing capabilities of thingsboard/kafka-streams-example.

The reference (see /root/reference, Apache-2.0) is a single Kafka Streams
topology doing windowed anomaly detection on solar telemetry
(reference: SolarConsumer.java:97-188). This package re-expresses those
capabilities — and a superset needed by large-scale data pipelines — as
idiomatic Spark DataFrame / SQL / Structured Streaming programs:

- ``session``     SparkSession factory tuned for scale (AQE, partitions).
- ``schemas``     Typed schemas replacing the reference's POJO+Jackson serdes.
- ``sources``     Batch (parquet/csv/json) and streaming (Kafka, files) IO.
- ``plans``       End-to-end query plans (the solar pipeline, analytics).
- ``operators``   Reusable operator library: windowed aggs, joins, dedup,
                  similarity search, text analysis, multimodal columns.
- ``functions``   Column-level helpers (stable hashing, stats math).
- ``streaming``   Structured Streaming wrappers of the same plans.

Design stance: one declarative DataFrame program per query; batch and
streaming share it. No hand-built state stores, repartition topics or serdes —
Catalyst/Tungsten handle optimization and execution.
"""

__version__ = "0.1.0"

from kafka_streams_example_spark.session import get_spark  # noqa: F401
