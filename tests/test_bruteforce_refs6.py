"""Brute-force definition references, tranche 6 (round 10): the JPEG
entropy layer, the dHash perceptual fingerprint, and the quality gate's
threshold solve — each replayed from its public definition on
seeded/random inputs, independent of the engine's own formulations.

The program exists because oracle parity cannot catch a defect both
engines share, or one the Spark side hits before producing rows
(NOTES_r09's winnowing boundary bug); these tests re-derive expected
values from first principles instead.
"""

from __future__ import annotations

import random

from kafka_streams_example_spark.functions import codecs as cx

# slow tier (r12): definition-level brute-force/property replays —
# the builder's pre-commit gate (SPARK_GRAFT_SLOW=1) runs them; the
# driver's bounded default window keeps the oracle/streaming gates.
import pytest

pytestmark = pytest.mark.slow



# ---------------------------------------------------------------------------
# JPEG canonical Huffman construction (ITU-T T.81 Annex C)
# ---------------------------------------------------------------------------


def _codes_by_definition(bits, vals):
    """Annex C, replayed literally: list all code lengths in table order
    (HUFFSIZE), then assign consecutive code values per length with a
    left shift at each length boundary (HUFFCODE)."""
    sizes = []
    for length in range(1, 17):
        sizes.extend([length] * bits[length - 1])
    codes, code, k, si = {}, 0, 0, sizes[0] if sizes else 0
    for idx, size in enumerate(sizes):
        while si < size:
            code <<= 1
            si += 1
        codes[vals[idx]] = (code, size)
        code += 1
    return codes


def test_jpeg_canonical_codes_match_annex_c_replay():
    for bits, vals in (
        (cx._JPG_DC_BITS, cx._JPG_DC_VALS),
        (cx._JPG_AC_BITS, cx._JPG_AC_VALS),
    ):
        got = cx._jpg_canonical_codes(bits, vals)
        want = _codes_by_definition(bits, vals)
        assert got == want


def test_jpeg_huffman_codes_are_prefix_free_and_fit():
    """Definition property: no code is a prefix of another (decode is
    unambiguous) and every code fits its declared bit length."""
    for bits, vals in (
        (cx._JPG_DC_BITS, cx._JPG_DC_VALS),
        (cx._JPG_AC_BITS, cx._JPG_AC_VALS),
    ):
        codes = cx._jpg_canonical_codes(bits, vals)
        assert len(codes) == len(vals)  # all symbols coded, none clobbered
        as_bits = {}
        for sym, (code, length) in codes.items():
            assert 0 <= code < (1 << length)
            as_bits[sym] = format(code, f"0{length}b")
        seq = sorted(as_bits.values())
        for a, b in zip(seq, seq[1:]):
            assert not b.startswith(a), f"{a} prefixes {b}"


def test_jpeg_bit_layer_roundtrip_with_stuffing():
    """Write random (code, length) tokens through the encoder's bit
    writer, read them back bit-for-bit through the decoder's bit reader
    — the 0xFF byte-stuffing and the 1-padding flush are the wire rules
    (spec F.1.2.3); a stuffing bug corrupts everything downstream."""
    rng = random.Random(1234)
    for _ in range(20):
        tokens = [
            (rng.randrange(1 << L), L)
            for L in (rng.randrange(1, 17) for _ in range(rng.randrange(1, 60)))
        ]
        w = cx._JpgBitWriter()
        for code, length in tokens:
            w.write(code, length)
        data = w.flush()
        # stuffing invariant: every 0xFF inside the stream is followed by 0x00
        for i, byte in enumerate(data[:-1]):
            if byte == 0xFF:
                assert data[i + 1] == 0x00
        r = cx._JpgBitReader(data)
        for code, length in tokens:
            assert r.bits(length) == code


def test_jpeg_magnitude_coding_roundtrip():
    """Category/EXTEND coding (spec F.1.2.1/F.2.2.1): every int16-range
    value survives category -> magnitude-bits -> EXTEND."""
    for v in list(range(-300, 301)) + [-2047, 2047, -1024, 1023]:
        s = cx._jpg_category(v)
        assert (v == 0) == (s == 0)
        if s:
            assert (1 << (s - 1)) <= abs(v) < (1 << s)
            raw = v if v >= 0 else v + (1 << s) - 1  # encoder's mapping
            assert cx._jpg_extend(raw, s) == v


# ---------------------------------------------------------------------------
# dHash — definition replay on RANDOM images (not the fixture device)
# ---------------------------------------------------------------------------


def test_dhash_definition_replay_on_random_images():
    """dhash60 == the literal definition (nearest-neighbor thumbnail, one
    bit per horizontal neighbor pair) on seeded random images of random
    dims, replayed with independent index arithmetic."""
    rng = random.Random(77)
    for _ in range(25):
        w, h = rng.randrange(11, 40), rng.randrange(6, 40)
        px = bytes(rng.randrange(256) for _ in range(w * h))
        want = 0
        for oy in range(6):
            sy = min(oy * h // 6, h - 1)
            row = [
                px[sy * w + min(ox * w // 11, w - 1)] for ox in range(11)
            ]
            for ox in range(10):
                if row[ox] > row[ox + 1]:
                    want |= 1 << (oy * 10 + ox)
        assert cx.dhash60(px, w, h) == want


# ---------------------------------------------------------------------------
# quality gate threshold solve — histogram-CDF replayed in Python
# ---------------------------------------------------------------------------


def test_quality_gate_threshold_solve_replay(spark, tmp_path):
    """The seeding-time token-budget solve == a literal Python replay
    (per-doc in-vocab avg-neg-logp, 6dp HALF_UP, floor(score*100)
    integer bins, cumulative
    token mass, smallest bin covering keep_tokens) on a seeded random
    corpus — not the hand-sized case the unit test pins."""
    import json as _json
    import math as _math
    import os as _os
    from collections import Counter

    from kafka_streams_example_spark.streaming.contract import (
        streaming_quality_gate,
    )

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, "en", " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 25))))
        for i in range(60)
    ]

    def half_up(x, s):
        p = 10.0 ** s
        return _math.floor(x * p + 0.5) / p

    lm = Counter(t for _, _, txt in docs for t in txt.lower().split())
    n = sum(lm.values())
    mass = Counter()
    for _, _, txt in docs:
        toks = txt.lower().split()
        score = half_up(-sum(_math.log(lm[t] / n) for t in toks) / len(toks), 6)
        mass[_math.floor(score * 100.0)] += len(toks)
    total, cum, want = sum(mass.values()), 0, None
    for b in sorted(mass):
        cum += mass[b]
        if cum >= 0.75 * total:
            want = b
            break

    seed = spark.createDataFrame(docs, "doc_id LONG, lang STRING, text STRING")
    state_dir = str(tmp_path / "qsolve_state")
    _os.makedirs(tmp_path / "qsolve_unused")
    stream = spark.readStream.schema(
        "doc_id LONG, lang STRING, text STRING"
    ).json(str(tmp_path / "qsolve_unused"))
    streaming_quality_gate(stream, seed, state_dir=state_dir)
    with open(_os.path.join(state_dir, "threshold.json")) as fh:
        art = _json.load(fh)
    assert art["n_total"] == n
    assert art["t_bin"] == want
    assert art["threshold"] == (want + 1) / 100.0
