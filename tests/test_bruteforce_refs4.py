"""Fourth tranche of definition-level brute-force references: the
record-linkage/privacy family (sorted-neighborhood SimHash pairs,
simplified-soundex phonetic blocking, k-anonymity equivalence classes).
Each DuckDB oracle shares its construction with the Spark plan (the
lead-window neighbor arms, the translate+run-collapse code chain, the
QI-tuple cascade), so cross-engine agreement could mirror a conceptual
bug; these replay the textbook definitions in plain Python — on the
REAL sf0.001 tables, since these operators' edge cases (block
boundaries, vowel-only name tails, singleton QI classes) occur
naturally there."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from itertools import combinations

from kafka_streams_example_spark import registry
from tests.conftest import SF_SMOKE

# slow tier (r12): definition-level brute-force/property replays —
# the builder's pre-commit gate (SPARK_GRAFT_SLOW=1) runs them; the
# driver's bounded default window keeps the oracle/streaming gates.
import pytest

pytestmark = pytest.mark.slow



def _norm(text: str) -> str:
    return " ".join(text.lower().split())


def test_sorted_neighborhood_matches_bruteforce(spark):
    """Definition: 60-bit SimHash (per-bit majority over md5-60bit hashes
    of distinct word 3-grams; tie -> 0), block by the 12-char normalized
    prefix, sort by (norm, doc_id) within each block, compare each record
    with the next w=3 in order, report Hamming <= 8."""
    from kafka_streams_example_spark.queries.dedup import (
        _SN_BLOCK_CHARS,
        _SN_HAM,
        _SN_WINDOW,
    )
    from kafka_streams_example_spark.sources.files import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()

    def grams(text):
        t = _norm(text).split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    def simhash(gs):
        votes = [0] * 60
        for g in gs:
            h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
            for j in range(60):
                votes[j] += 1 if (h >> j) & 1 else -1
        f = 0
        for j in range(60):
            if votes[j] > 0:
                f |= 1 << j
        return f

    recs = []
    for r in docs:
        gs = grams(r.text)
        if gs:
            n = _norm(r.text)
            recs.append((n[:_SN_BLOCK_CHARS], n, r.doc_id, simhash(gs)))
    by_block = defaultdict(list)
    for blk, n, did, f in recs:
        by_block[blk].append((n, did, f))
    want = set()
    for blk, rows in by_block.items():
        rows.sort()
        for i, (_, id_l, f_l) in enumerate(rows):
            for o in range(1, _SN_WINDOW + 1):
                if i + o >= len(rows):
                    break
                _, id_r, f_r = rows[i + o]
                ham = bin(f_l ^ f_r).count("1")
                if ham <= _SN_HAM:
                    want.add((min(id_l, id_r), max(id_l, id_r), ham))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in registry.QUERIES["sorted_neighborhood_neardup"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == want
    assert want, "corpus produced no neighborhood pairs — nothing proven"
    # at least one multi-record block exists (the windows actually slide)
    assert any(len(v) > _SN_WINDOW for v in by_block.values())


def test_phonetic_blocking_matches_bruteforce(spark):
    """Definition: simplified soundex (first letter + first 3 consonant-
    class digits, runs collapsed, zeros dropped) over the two leading
    words; the dirty registry re-lists every 7th part with vowels
    dropped after each word's first letter; output is the name-level
    census self-join within signatures."""
    from kafka_streams_example_spark.queries.dedup import (
        _PH_ALPHA,
        _PH_DIGITS,
        _PH_TYPO_MOD,
    )
    from kafka_streams_example_spark.sources.files import load_table

    cls = dict(zip(_PH_ALPHA, _PH_DIGITS))

    def code(tok):
        d = "".join(cls.get(ch, ch) for ch in tok[1:])
        for digit in "123456":
            while digit * 2 in d:
                d = d.replace(digit * 2, digit)
        d = d.replace("0", "")
        return tok[:1].upper() + (d + "000")[:3]

    part = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_name").collect()
    names = [r.p_name for r in part]
    for r in part:
        if r.p_partkey % _PH_TYPO_MOD == 0:
            names.append(
                " ".join(w[:1] + "".join(c for c in w[1:] if c not in "aeiou")
                         for w in r.p_name.split(" "))
            )
    census = defaultdict(lambda: defaultdict(int))
    for nm in names:
        w = nm.split(" ")
        if len(w) >= 2:
            census[f"{code(w[0])}-{code(w[1])}"][nm] += 1
    want = set()
    for sig, byname in census.items():
        for na, nb in combinations(sorted(byname), 2):
            want.add((sig, na, nb, byname[na], byname[nb], byname[na] * byname[nb]))
    got = {
        (r.signature, r.name_a, r.name_b, r.n_a, r.n_b, r.candidate_pairs)
        for r in registry.QUERIES["phonetic_blocking_pairs"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == want
    assert want
    # the typo transform must be phonetically invariant: every typo variant
    # shares a signature with its original (the recall property)
    for r in part:
        if r.p_partkey % _PH_TYPO_MOD == 0 and len(r.p_name.split(" ")) >= 2:
            w = r.p_name.split(" ")
            t = " ".join(
                x[:1] + "".join(c for c in x[1:] if c not in "aeiou") for x in w
            ).split(" ")
            assert f"{code(w[0])}-{code(w[1])}" == f"{code(t[0])}-{code(t[1])}", r.p_name


def test_k_anonymity_matches_bruteforce(spark):
    """Definition: equivalence classes of the QI tuple (event_type,
    epoch-day-of-week, value decade band); per event_type the class
    count, min k, singleton count, and at-risk (k < 5) row share."""
    from kafka_streams_example_spark.queries.operational import _KA_RISK_K
    from kafka_streams_example_spark.sources.files import load_table

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "ts", "value"
    ).collect()
    classes = defaultdict(int)
    for r in ev:
        sec = int(r.ts.timestamp()) if hasattr(r.ts, "timestamp") else int(r.ts)
        qi = (r.event_type, (sec // 86400) % 7, math.floor(r.value / 10.0))
        classes[qi] += 1
    per_type = defaultdict(list)
    for (et, _d, _b), k in classes.items():
        per_type[et].append(k)
    got = {
        r.event_type: r
        for r in registry.QUERIES["k_anonymity_audit"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(per_type)
    for et, ks in per_type.items():
        r = got[et]
        risk = sum(k for k in ks if k < _KA_RISK_K)
        assert r.n_rows == sum(ks), et
        assert r.n_groups == len(ks), et
        assert r.min_k == min(ks), et
        assert r.groups_k1 == sum(1 for k in ks if k == 1), et
        assert r.rows_at_risk == risk, et
        assert abs(r.risk_share - risk / sum(ks)) <= 1e-6, et
    # the audit must see both safe and at-risk classes to prove anything
    all_ks = [k for ks in per_type.values() for k in ks]
    assert any(k < _KA_RISK_K for k in all_ks) and any(
        k >= _KA_RISK_K for k in all_ks
    )
