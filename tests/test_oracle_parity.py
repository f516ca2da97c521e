"""Every registered query must match its DuckDB oracle exactly — this is a
local replica of the driver's t2 correctness gate (repo: BASELINE.json)."""

from __future__ import annotations

import pytest

from kafka_streams_example_spark import registry
from tests.conftest import SF_CORRECT
from tests.parity import compare, duck_connection, run_query_pair



@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_CORRECT)
    yield con
    con.close()


@pytest.mark.smoke
@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_parity(spark, duck, name):
    fn = registry.QUERIES[name]
    sql = registry.ORACLES[name]
    spark_pdf, duck_pdf = run_query_pair(spark, duck, fn, sql, SF_CORRECT)
    problems = compare(spark_pdf, duck_pdf)
    assert not problems, f"{name}: " + "; ".join(problems[:5])
    assert len(spark_pdf) > 0 or name.endswith("_empty_ok"), f"{name}: empty result"


@pytest.mark.parametrize("name", sorted(set(registry.QUERIES) - set(registry.ORACLES)))
@pytest.mark.smoke
def test_rows_only_queries_run(spark, name):
    df = registry.QUERIES[name](spark, SF_CORRECT)
    assert df.count() >= 0


@pytest.fixture(scope="module")
def unicode_sf_dir(spark, tmp_path_factory):
    """sf0.001 with non-ASCII words (2-4 byte UTF-8, several scripts,
    an emoji) injected into half the documents — plus a vertical tab
    (\\x0B), the one character Java's \\s matches but RE2's does not,
    to pin the explicit whitespace class used on both engines
    (ADVICE r03)."""
    import pyspark.sql.functions as F

    from kafka_streams_example_spark.schemas import ALL_TABLES
    from kafka_streams_example_spark.sources.files import load_table

    out = str(tmp_path_factory.mktemp("sf_unicode"))
    docs = load_table(spark, SF_CORRECT, "documents")
    uni = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("héllo wörld\x0bvtab 你好 мир καλημέρα 🎉 "), F.col("text")),
    ).otherwise(F.col("text"))
    docs.withColumn("text", uni).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    for t in ALL_TABLES:
        if t != "documents":
            load_table(spark, SF_CORRECT, t).write.mode("overwrite").parquet(
                f"{out}/{t}.parquet"
            )
    return out


_TEXT_QUERIES = sorted(
    n
    for n, sql in registry.ORACLES.items()
    if "documents" in sql or "text" in sql
)


@pytest.mark.slow  # second full text-family parity sweep on the unicode fixture
@pytest.mark.parametrize("name", _TEXT_QUERIES)
def test_oracle_parity_on_unicode_corpus(spark, unicode_sf_dir, name):
    """Every text-touching oracle must stay value-exact when the corpus
    contains multi-byte UTF-8 — the class of divergence the
    multimodal_byte_features code-point bug (ADVICE r02) belonged to.
    DuckDB views are rebuilt over the modified corpus."""
    con = duck_connection(unicode_sf_dir)
    try:
        spark_pdf, duck_pdf = run_query_pair(
            spark, con, registry.QUERIES[name], registry.ORACLES[name], unicode_sf_dir
        )
        problems = compare(spark_pdf, duck_pdf)
        assert not problems, f"{name}: " + "; ".join(problems[:5])
    finally:
        con.close()


@pytest.mark.slow  # exhaustive all-query schema audit (~54s)
def test_no_query_emits_decimal_columns(spark):
    """No registered query may emit a DecimalType column, at any nesting
    depth. The driver hashes stringified values against the DuckDB
    oracle, and a Decimal('0.368000000') never string-equals the
    oracle's float 0.368 — the bug class behind the
    quality_filter_threshold_sweep mismatch (r06): Spark SQL parses a
    bare literal like 1000000.0 inside selectExpr/spark.sql as
    DECIMAL(8,1), silently re-typing LONG/DECIMAL arithmetic to DECIMAL.
    Plan-only (schemas resolve without executing jobs)."""
    from pyspark.sql import types as T

    def decimal_paths(dt, path):
        if isinstance(dt, T.DecimalType):
            yield path
        elif isinstance(dt, T.StructType):
            for f in dt.fields:
                yield from decimal_paths(f.dataType, f"{path}.{f.name}")
        elif isinstance(dt, T.ArrayType):
            yield from decimal_paths(dt.elementType, path + "[]")
        elif isinstance(dt, T.MapType):
            yield from decimal_paths(dt.keyType, path + "{key}")
            yield from decimal_paths(dt.valueType, path + "{value}")

    offenders = {}
    for name, fn in registry.QUERIES.items():
        hits = list(decimal_paths(fn(spark, SF_CORRECT).schema, name))
        if hits:
            offenders[name] = hits
    assert not offenders, offenders
