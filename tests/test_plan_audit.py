"""Physical-plan audits — the 100TB design gate (SURVEY.md 'optimize for
scale'). Correctness tests prove the small-SF answer; these prove the PLAN
is the one we'd want on a 1000-executor cluster: no accidental cross
products anywhere, dimensions broadcast, filters pushed into scans.

Planning only — nothing here executes a query (AQE may re-plan at runtime,
but a cartesian/bad-broadcast in the initial plan is already a bug)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_example_spark import registry
from kafka_streams_example_spark.sources.files import load_table
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_no_cartesian_product(spark, name):
    """No registry query may plan a CartesianProduct. Broadcast nested
    loop against a 1-row aggregate (scalar subquery) is fine — a true
    cartesian between scaling tables is never fine at 100TB."""
    df = registry.QUERIES[name](spark, SF_SMOKE)
    assert "CartesianProduct" not in _plan(df), name


@pytest.mark.parametrize(
    "name",
    [
        "q5_region_revenue",
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "q10_returned_items",
        "q16_supplier_variety",
        "q21_waiting_suppliers",
    ],
)
def test_dimension_joins_are_broadcast(spark, name):
    """Multi-way TPC-H-shape joins must attach dimensions via
    BroadcastHashJoin — a sort-merge against nation/supplier/filtered
    part would shuffle the fact table once per dimension."""
    plan = _plan(registry.QUERIES[name](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan, name


def test_anti_join_is_broadcast(spark):
    """NOT IN / NOT EXISTS rewrites must be broadcast anti-joins, not
    shuffled ones, when the exclusion side is small."""
    plan = _plan(registry.QUERIES["q16_supplier_variety"](spark, SF_SMOKE))
    assert "LeftAnti, BuildRight" in plan or (
        "BroadcastHashJoin" in plan and "LeftAnti" in plan
    )


def test_selective_filters_pushed_to_scan(spark):
    """q19's brand/size predicates must reach the part parquet scan as
    PushedFilters, not run post-scan only."""
    plan = _plan(registry.QUERIES["q19_disjunctive_filter"](spark, SF_SMOKE))
    pushed = [seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]]
    assert any("p_brand" in p or "p_size" in p for p in pushed), pushed


def test_q1_scan_prunes_columns(spark):
    """q1 touches 7 of lineitem's 11 columns — the scan must not read
    the rest (l_partkey/l_suppkey/l_orderkey/l_linenumber)."""
    plan = _plan(registry.QUERIES["q1_pricing_summary"](spark, SF_SMOKE))
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_returnflag" in read_schema
    assert "l_partkey" not in read_schema and "l_orderkey" not in read_schema


def test_solar_panel_stats_single_shuffle_no_join(spark):
    """The reference's A2+J1+A3 stage chain (two repartition topics + a
    co-partitioned join, SURVEY.md §3.2) must collapse to window
    functions over ONE hash-partitioning — zero joins, one Exchange."""
    df = registry.QUERIES["solar_panel_stats"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "Join" not in plan
    # exactly one exchange introduced above the scan (module agg), whose
    # partitioning the panel-level window functions then reuse
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"{n_exchanges} exchanges:\n{plan[:2000]}"


def test_asof_join_avoids_range_explosion(spark):
    """The as-of join must be a union+window last-value plan (linear),
    not a range join that explodes into a cross product per key."""
    plan = _plan(registry.QUERIES["asof_join_orders"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_broadcast_hint_respected_under_stats_absence(spark):
    """Explicit F.broadcast() must survive planning even when the dim
    side is a derived (stats-free) aggregate — the scalar-subquery
    pattern used across the registry."""
    cust = load_table(spark, SF_SMOKE, "customer")
    one_row = cust.agg(F.avg("c_acctbal").alias("a"))
    plan = _plan(cust.join(F.broadcast(one_row)))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
