"""Property-based tests for the engine-portable SQL helper GENERATORS
(round-6 tranches): the DuckDB flavor of each generated expression must
agree with an independent Python reference on randomized inputs. The
Spark flavor is pinned to the DuckDB flavor by the oracle-parity suite
on the shared fixtures, so duck==python here closes the triangle on
inputs the fixtures never contain (unicode, digits, empty-ish tokens,
adversarial bit patterns)."""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_example_spark.queries.operational import _z_interleave_sql
from kafka_streams_example_spark.queries.dedup import (
    _PH_ALPHA,
    _PH_DIGITS,
    _phonetic_sql,
)

# slow tier (r12): definition-level brute-force/property replays —
# the builder's pre-commit gate (SPARK_GRAFT_SLOW=1) runs them; the
# driver's bounded default window keeps the oracle/streaming gates.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


# --------------------------------------------------------------------------
# phonetic code generator
# --------------------------------------------------------------------------


def _phonetic_py(tok: str) -> str:
    table = str.maketrans(_PH_ALPHA, _PH_DIGITS)
    d = tok[1:].translate(table)
    for digit in "123456":
        d = re.sub(digit + "+", digit, d)
    d = d.replace("0", "")
    return tok[0].upper() + (d + "000")[:3]


# ASCII lowercase + digits: the helper's documented domain (product /
# registry names). Hypothesis on full unicode found a REAL cross-engine
# hazard outside it: upper('ᾀ') is the full case mapping 'ἈΙ' in
# Python/Java but the simple mapping 'ᾈ' in DuckDB — so the phonetic
# code must never be applied to unnormalized unicode names without an
# ASCII-fold first (recorded in SCALE.md; the fixture domain is ASCII).
_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
    min_size=1,
    max_size=16,
)


@settings(max_examples=150, deadline=None)
@given(_word)
def test_phonetic_duck_matches_python(duck, tok):
    got = duck.execute(
        f"SELECT {_phonetic_sql('t', 'duck')} FROM (SELECT ? AS t)", [tok]
    ).fetchone()[0]
    assert got == _phonetic_py(tok), tok


@settings(max_examples=60, deadline=None)
@given(_word)
def test_phonetic_is_vowel_drop_invariant_for_consonant_leads(duck, tok):
    """The seeded-typo transform contract: dropping vowels after the
    first letter never changes the code when no two same-class
    consonants are separated ONLY by dropped vowels. Rather than
    encode that side condition, assert the weaker always-true direction
    the ER flow relies on: codes are equal whenever the Python
    reference says they are (duck agrees on both the original and the
    typo'd form)."""
    typo = tok[0] + re.sub("[aeiou]", "", tok[1:])
    a, b = duck.execute(
        f"SELECT {_phonetic_sql('a', 'duck')}, {_phonetic_sql('b', 'duck')}"
        " FROM (SELECT ? AS a, ? AS b)",
        [tok, typo],
    ).fetchone()
    assert a == _phonetic_py(tok)
    assert b == _phonetic_py(typo)


# --------------------------------------------------------------------------
# Z-order interleave generator
# --------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 255), st.integers(0, 255))
def test_z_interleave_duck_matches_python(duck, x, y):
    got = duck.execute(
        f"SELECT {_z_interleave_sql('x', 'y')} FROM (SELECT {x} AS x, {y} AS y)"
    ).fetchone()[0]
    expect = 0
    for i in range(8):
        expect |= ((x >> i) & 1) << (2 * i)
        expect |= ((y >> i) & 1) << (2 * i + 1)
    assert got == expect


@settings(max_examples=100, deadline=None)
@given(
    st.integers(0, 255),
    st.integers(0, 255),
    st.integers(0, 255),
    st.integers(0, 255),
)
def test_z_interleave_is_injective(duck, x1, y1, x2, y2):
    """Distinct (x, y) points must get distinct curve positions — the
    property block pruning depends on."""
    z1, z2 = duck.execute(
        f"SELECT {_z_interleave_sql('x1', 'y1')}, {_z_interleave_sql('x2', 'y2')}"
        f" FROM (SELECT {x1} AS x1, {y1} AS y1, {x2} AS x2, {y2} AS y2)"
    ).fetchone()
    if (x1, y1) != (x2, y2):
        assert z1 != z2
    else:
        assert z1 == z2


# --------------------------------------------------------------------------
# Hamilton apportionment arithmetic (pure-SQL fragment semantics)
# --------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(1, 10_000), min_size=1, max_size=12),
    st.integers(1, 500),
)
def test_hamilton_apportionment_sums_to_budget(duck, sizes, budget):
    """The largest-remainder arithmetic used by
    proportional_allocation_sample: integer base quotas + bonus seats by
    (N*n_g mod n) must always sum exactly to N and never deviate from
    the exact share by a full seat."""
    n = sum(sizes)
    base = [(budget * g) // n for g in sizes]
    rem = [(budget * g) % n for g in sizes]
    leftover = budget - sum(base)
    order = sorted(range(len(sizes)), key=lambda i: (-rem[i], i))
    quota = list(base)
    for i in order[:leftover]:
        quota[i] += 1
    assert sum(quota) == budget
    for g, q in zip(sizes, quota):
        exact = budget * g / n
        assert q in (int(exact) if exact == int(exact) else None, *range(0, budget + 1))
        assert abs(q - exact) < 1.0  # quota property of largest remainder
