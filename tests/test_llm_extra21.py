"""Semantic tests for the twenty-second tranche (Kaplan-Meier survival,
Mann-Whitney U, b-bit MinHash audit). Oracle parity runs via
test_oracle_parity; these replay each statistic in plain Python over
the same SF_SMOKE data."""

from __future__ import annotations

import hashlib
import math
import random
from collections import defaultdict

import pyspark.sql.functions as F

from kafka_streams_example_spark import registry
from kafka_streams_example_spark.queries.dedup import (
    _BB_HASHES,
    _BB_SEED,
    _MERSENNE,
    _bb_params,
)
from tests.conftest import SF_SMOKE


def _events(spark):
    from kafka_streams_example_spark.sources.files import load_table

    return (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "user_id", "event_type", F.col("ts").cast("long").alias("sec")
        )
        .collect()
    )


# --------------------------------------------------------------------------
# kaplan_meier_conversion
# --------------------------------------------------------------------------


def _km_replay(rows):
    s0 = {}
    for r in rows:
        if r.event_type == "signup":
            s0[r.user_id] = min(s0.get(r.user_id, r.sec), r.sec)
    p0 = {}
    for r in rows:
        if r.event_type == "purchase" and r.user_id in s0 and r.sec > s0[r.user_id]:
            p0[r.user_id] = min(p0.get(r.user_id, r.sec), r.sec)
    horizon = max(r.sec for r in rows)
    byday = defaultdict(lambda: [0, 0])  # day -> [events, censored]
    for u, s in s0.items():
        if u in p0:
            byday[(p0[u] - s) // 86400][0] += 1
        else:
            byday[(horizon - s) // 86400][1] += 1
    n = len(s0)
    out = {}
    lsum = 0.0
    at_risk = n
    absorbed = False
    for day in sorted(byday):
        d, c = byday[day]
        if d >= at_risk:
            absorbed = True
        elif d > 0:
            lsum += math.log(1.0 - d / at_risk)
        s = 0.0 if absorbed else round(math.exp(lsum), 6)
        out[day] = (at_risk, d, c, s)
        at_risk -= d + c
    return out


def test_kaplan_meier_matches_python_replay(spark):
    rows = _events(spark)
    expect = _km_replay(rows)
    got = {
        r.day: (r.n_risk, r.n_events, r.n_censored, r.survival)
        for r in registry.QUERIES["kaplan_meier_conversion"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(expect)
    for day in expect:
        g, e = got[day], expect[day]
        assert g[:3] == e[:3], (day, g, e)
        assert abs(g[3] - e[3]) < 1e-6, (day, g, e)


def test_kaplan_meier_curve_invariants(spark):
    out = sorted(
        registry.QUERIES["kaplan_meier_conversion"](spark, SF_SMOKE).collect(),
        key=lambda r: r.day,
    )
    assert out, "fixture must have signup users"
    assert all(0.0 <= r.survival <= 1.0 for r in out)
    for a, b in zip(out, out[1:]):
        assert b.survival <= a.survival + 1e-9  # non-increasing
        assert b.n_risk <= a.n_risk  # risk set shrinks
    # the risk set starts with every studied user
    n_users = out[0].n_risk
    assert n_users == sum(r.n_events + r.n_censored for r in out)


# --------------------------------------------------------------------------
# mannwhitney_doclen_test
# --------------------------------------------------------------------------


def test_mannwhitney_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "n_chars", "lang"
    ).collect()
    per = defaultdict(lambda: [0, 0])  # n_chars -> [count, en]
    for r in docs:
        per[r.n_chars][0] += 1
        per[r.n_chars][1] += 1 if r.lang == "en" else 0
    before = 0
    r1_2 = 0
    tie3 = 0
    for v in sorted(per):
        c, c1 = per[v]
        midrank2 = 2 * before + c + 1
        r1_2 += c1 * midrank2
        tie3 += c**3 - c
        before += c
    n1 = sum(v[1] for v in per.values())
    nn = sum(v[0] for v in per.values())
    n2 = nn - n1
    u1 = (r1_2 - n1 * (n1 + 1)) / 2.0
    var = n1 * n2 / 12.0 * ((nn + 1) - tie3 / (nn * (nn - 1.0)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    r = registry.QUERIES["mannwhitney_doclen_test"](spark, SF_SMOKE).collect()[0]
    assert (r.n_en, r.n_other) == (n1, n2)
    assert r.u_en == u1  # dyadic — exact equality
    assert abs(r.z_score - z) < 1e-5
    # U is bounded by the comparison-pair count
    assert 0.0 <= r.u_en <= n1 * n2


# --------------------------------------------------------------------------
# bbit_minhash_estimate
# --------------------------------------------------------------------------


def _py_shingle_hashes(text: str) -> set[int]:
    toks = [t for t in text.lower().split() if t]
    grams = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    return {
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
    }


def test_bbit_estimates_match_python_replay(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    hs = {r.doc_id: _py_shingle_hashes(r.text) for r in docs}
    hs = {k: v for k, v in hs.items() if v}
    params = _bb_params()
    sigs = {
        k: [min((a * (x % _MERSENNE) + b) % _MERSENNE for x in v) for a, b in params]
        for k, v in hs.items()
    }
    out = registry.QUERIES["bbit_minhash_estimate"](spark, SF_SMOKE).collect()
    assert len(out) > 0
    for r in out:
        sa, sb = sigs[r.id_a], sigs[r.id_b]
        ha, hb = hs[r.id_a], hs[r.id_b]
        jac = len(ha & hb) / len(ha | hb)
        k_full = sum(1 for x, y in zip(sa, sb) if x == y)
        k_bit = sum(1 for x, y in zip(sa, sb) if x % 2 == y % 2)
        assert abs(r.jac_exact - jac) < 1e-6
        assert r.est_full == k_full / _BB_HASHES
        assert r.est_1bit == max(2.0 * k_bit / _BB_HASHES - 1.0, 0.0)
        assert 0.0 <= r.est_1bit <= 1.0


def test_bbit_candidate_set_matches_banded_minhash(spark):
    """The audit runs over exactly the LSH candidate pairs the
    registered near-dup tier generates (same seed, same banding) —
    verified against a Python replay of the banding."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    hs = {r.doc_id: _py_shingle_hashes(r.text) for r in docs}
    hs = {k: v for k, v in hs.items() if v}
    params = _bb_params()
    sigs = {
        k: [min((a * (x % _MERSENNE) + b) % _MERSENNE for x in v) for a, b in params]
        for k, v in hs.items()
    }
    rows = _BB_HASHES // 8
    buckets = defaultdict(set)
    for k, sig in sigs.items():
        for band in range(8):
            key = (band, ",".join(map(str, sig[band * rows : band * rows + rows])))
            buckets[key].add(k)
    expect = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                expect.add((a, b))
    got = {
        (r.id_a, r.id_b)
        for r in registry.QUERIES["bbit_minhash_estimate"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == expect


def test_bbit_one_bit_is_noisier_but_unbiased_direction(spark):
    """Aggregate sanity: the 1-bit estimator's mean absolute error must
    exceed the full-signature estimator's (information loss), while both
    stay finite and bounded."""
    out = registry.QUERIES["bbit_minhash_estimate"](spark, SF_SMOKE).collect()
    if len(out) < 3:
        return  # too few candidate pairs to compare error statistics
    err_full = sum(abs(r.est_full - r.jac_exact) for r in out) / len(out)
    err_bit = sum(abs(r.est_1bit - r.jac_exact) for r in out) / len(out)
    assert err_bit >= err_full - 0.02  # 1 bit can't beat 31 more bits (noise margin)
