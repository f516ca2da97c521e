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


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_parity(spark, duck, name):
    fn = registry.QUERIES[name]
    sql = registry.ORACLES[name]
    spark_pdf, duck_pdf = run_query_pair(spark, duck, fn, sql, SF_CORRECT)
    problems = compare(spark_pdf, duck_pdf)
    assert not problems, f"{name}: " + "; ".join(problems[:5])
    assert len(spark_pdf) > 0 or name.endswith("_empty_ok"), f"{name}: empty result"


@pytest.mark.parametrize("name", sorted(set(registry.QUERIES) - set(registry.ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = registry.QUERIES[name](spark, SF_CORRECT)
    assert df.count() >= 0
