"""Semantic tests for the twentieth tranche (data-contract validation,
PSI drift, nDCG retrieval eval, context budget, corpus snapshot diff,
last-touch attribution). Oracle parity runs via test_oracle_parity;
these pin the operational semantics — including that the contract
checks actually DETECT corruption — via Python replays and a corrupted
fixture copy."""

from __future__ import annotations

import math
import os
import shutil
from collections import defaultdict

import pyspark.sql.functions as F
import pytest

from kafka_streams_example_spark import registry
from kafka_streams_example_spark.queries.events import _ATTR_WINDOW_S
from kafka_streams_example_spark.queries.operational import (
    _CTX_LENGTHS,
    _CVD_CLONE_OFFSET,
    _CVD_MOD,
    _CVD_SHARDS,
    _PSI_ALERT,
    _PSI_BIN_WIDTH,
    _PSI_BINS,
    _PSI_EPS,
)
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# data_contract_validation
# --------------------------------------------------------------------------


def test_contract_checks_pass_and_reconcile_on_clean_fixture(spark):
    out = {r.check_name: r for r in registry.QUERIES["data_contract_validation"](spark, SF_SMOKE).collect()}
    assert len(out) == 8
    assert all(r.n_violations == 0 for r in out.values())
    n_orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    assert out["pk_unique_orders"].n_rows == n_orders
    assert out["fk_orders_customer"].n_rows == n_orders


def test_contract_checks_detect_seeded_corruption(spark, tmp_path):
    """Corrupt a copy of the fixture (duplicate PK, orphan FK, bad enum,
    negative price) and require each check to count EXACTLY the seeded
    violations — detection, not just green-path accounting."""
    corrupt = tmp_path / "sf_corrupt"
    corrupt.mkdir()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "lineitem", "events", "documents", "embeddings",
    ]:
        os.symlink(f"{SF_SMOKE}/{t}.parquet", corrupt / f"{t}.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    first = orders.limit(1)
    bad = first.select(
        F.col("o_orderkey"),  # duplicate PK (1 extra occurrence)
        F.lit(999999999).alias("o_custkey"),  # orphan FK
        F.lit("X").alias("o_orderstatus"),  # out-of-domain enum
        F.lit(-1.0).alias("o_totalprice"),  # range violation
        F.col("o_orderdate"),
        F.col("o_orderpriority"),
    )
    orders.unionByName(bad).coalesce(1).write.parquet(
        str(corrupt / "orders.parquet")
    )
    out = {
        r.check_name: r
        for r in registry.QUERIES["data_contract_validation"](
            spark, str(corrupt)
        ).collect()
    }
    assert out["pk_unique_orders"].n_violations == 1
    assert out["fk_orders_customer"].n_violations == 1
    assert out["enum_orderstatus"].n_violations == 1
    assert out["range_totalprice_positive"].n_violations == 1
    # untouched tables stay green
    assert out["pk_unique_customer"].n_violations == 0
    assert out["fk_lineitem_orders"].n_violations == 0


def test_contract_fk_joins_are_broadcast(spark):
    """On dim-sized parents the FK probes must be broadcast joins and
    the whole suite must stay cartesian-free."""
    plan = _plan(registry.QUERIES["data_contract_validation"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# psi_value_drift
# --------------------------------------------------------------------------


def test_psi_matches_python_replay_and_is_nonnegative(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_type", F.col("ts").cast("long").alias("sec"), "value"
    ).collect()
    lo = min(r.sec for r in ev)
    hi = max(r.sec for r in ev)
    mid = math.floor((lo + hi) / 2.0)
    cells = defaultdict(lambda: [0] * _PSI_BINS)  # (type, half) -> bins
    for r in ev:
        half = 0 if r.sec <= mid else 1
        b = min(int(r.value // _PSI_BIN_WIDTH), _PSI_BINS - 1)
        cells[(r.event_type, half)][b] += 1
    out = registry.QUERIES["psi_value_drift"](spark, SF_SMOKE).collect()
    for r in out:
        nb = cells[(r.event_type, 0)]
        na = cells[(r.event_type, 1)]
        tnb, tna = sum(nb), sum(na)
        assert (r.n_before, r.n_after) == (tnb, tna)
        psi = sum(
            ((nb[i] + _PSI_EPS) / (tnb + _PSI_EPS * _PSI_BINS)
             - (na[i] + _PSI_EPS) / (tna + _PSI_EPS * _PSI_BINS))
            * math.log(
                ((nb[i] + _PSI_EPS) / (tnb + _PSI_EPS * _PSI_BINS))
                / ((na[i] + _PSI_EPS) / (tna + _PSI_EPS * _PSI_BINS))
            )
            for i in range(_PSI_BINS)
        )
        assert abs(r.psi - psi) < 1e-5, (r.event_type, r.psi, psi)
        assert r.psi >= 0.0  # each (p-q)ln(p/q) term is nonnegative
        assert r.drifted == (round(psi, 6) > _PSI_ALERT)


# --------------------------------------------------------------------------
# ndcg_retrieval_eval
# --------------------------------------------------------------------------


def test_ndcg_matches_python_replay(spark):
    topk = registry.QUERIES["similarity_cosine_topk"](spark, SF_SMOKE).collect()
    labels = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    per_q = defaultdict(list)
    for r in topk:
        per_q[r.q_id].append((r.rnk, 1 if labels[r.vec_id] == labels[r.q_id] else 0))
    n_rel = defaultdict(int)
    for v, l in labels.items():
        for q in per_q:
            if v != q and l == labels[q]:
                n_rel[q] += 1
    out = registry.QUERIES["ndcg_retrieval_eval"](spark, SF_SMOKE).collect()
    assert {r.q_id for r in out} == set(per_q)
    for r in out:
        dcg = sum(rel / math.log2(rnk + 1) for rnk, rel in sorted(per_q[r.q_id]))
        idcg = sum(
            1.0 / math.log2(i + 1) for i in range(1, min(10, n_rel[r.q_id]) + 1)
        )
        assert r.n_relevant == n_rel[r.q_id]
        assert abs(r.dcg - dcg) < 1e-5
        assert abs(r.idcg - idcg) < 1e-5
        assert abs(r.ndcg - dcg / idcg) < 1e-5
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9
        assert r.dcg <= r.idcg + 1e-9


# --------------------------------------------------------------------------
# context_budget_report
# --------------------------------------------------------------------------


def test_context_budget_monotonic_and_reconciles(spark):
    from kafka_streams_example_spark.operators import text as tx

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    toks = [
        r.t
        for r in docs.select(tx.token_count(F.col("text")).alias("t")).collect()
    ]
    out = sorted(
        registry.QUERIES["context_budget_report"](spark, SF_SMOKE).collect(),
        key=lambda r: r.context_len,
    )
    assert [r.context_len for r in out] == sorted(_CTX_LENGTHS)
    for r in out:
        L = r.context_len
        assert r.n_docs == len(toks)
        assert r.n_fit == sum(1 for t in toks if t <= L)
        assert r.tokens_kept == sum(min(t, L) for t in toks)
        assert r.tokens_truncated == sum(max(t - L, 0) for t in toks)
        bins = math.ceil(r.tokens_kept / L)
        assert abs(r.util_lower_bound - r.tokens_kept / (bins * L)) < 1e-6
        assert 0.0 < r.util_lower_bound <= 1.0
    for a, b in zip(out, out[1:]):
        assert a.n_fit <= b.n_fit
        assert a.tokens_kept <= b.tokens_kept
        assert a.tokens_truncated >= b.tokens_truncated


# --------------------------------------------------------------------------
# corpus_version_diff
# --------------------------------------------------------------------------


def test_version_diff_totals_match_slot_arithmetic(spark):
    """The per-shard diff must reconcile with the deterministic v2
    transform: slot 0 removed, slot 1 changed, slot 2 cloned as added,
    the rest unchanged."""
    from kafka_streams_example_spark.functions.hashing import fingerprint_md5

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    slots = docs.select(
        "doc_id",
        (
            F.conv(F.substring(fingerprint_md5(F.col("text")), 1, 15), 16, 10)
            .cast("long")
            % _CVD_MOD
        ).alias("slot"),
    ).collect()
    by_slot = defaultdict(int)
    for r in slots:
        by_slot[r.slot] += 1
    out = registry.QUERIES["corpus_version_diff"](spark, SF_SMOKE).collect()
    assert len(out) <= _CVD_SHARDS
    assert sum(r.n_removed for r in out) == by_slot[0]
    assert sum(r.n_changed for r in out) == by_slot[1]
    assert sum(r.n_added for r in out) == by_slot[2]
    assert sum(r.n_unchanged for r in out) == len(slots) - by_slot[0] - by_slot[1]
    # clones land in the shard of their NEW id
    clone_shards = {
        (r.doc_id + _CVD_CLONE_OFFSET) % _CVD_SHARDS
        for r in slots
        if r.slot == 2
    }
    for r in out:
        if r.n_added:
            assert r.shard in clone_shards


# --------------------------------------------------------------------------
# sessionized_attribution
# --------------------------------------------------------------------------


def test_attribution_matches_python_replay(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "user_id", "event_type", F.col("ts").cast("long").alias("sec"),
        "event_id", "value",
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    expect = defaultdict(lambda: [0, 0])  # channel -> [count, cents]
    for recs in by_user.values():
        recs.sort(key=lambda r: (r.sec, r.event_id))
        last_touch = None
        for r in recs:
            if r.event_type == "purchase":
                if last_touch and r.sec - last_touch[0] <= _ATTR_WINDOW_S:
                    ch = last_touch[1]
                else:
                    ch = "direct"
                expect[ch][0] += 1
                expect[ch][1] += math.floor(r.value * 100.0 + 0.5)
            else:
                last_touch = (r.sec, r.event_type)
    out = registry.QUERIES["sessionized_attribution"](spark, SF_SMOKE).collect()
    got = {r.channel: (r.n_purchases, r.revenue_cents) for r in out}
    assert got == {ch: tuple(v) for ch, v in expect.items()}
    # purchases can never attribute to the purchase channel itself
    assert "purchase" not in got


def test_attribution_is_single_window_no_join(spark):
    plan = _plan(registry.QUERIES["sessionized_attribution"](spark, SF_SMOKE))
    assert "Join" not in plan
    assert plan.count("Window") == 1
