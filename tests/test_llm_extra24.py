"""Semantic tests for the perceptual image near-dup tier
(image_phash_neardup): dHash invariance under re-encoding — the case
byte-level dedup provably misses — robustness to tiny pixel
perturbations vs separation of unrelated images, and the planted
near-identical-image pair surfacing through the banded-Hamming path on
a Spark corpus. Oracle parity runs via test_oracle_parity."""

from __future__ import annotations

import hashlib

from kafka_streams_example_spark import registry
from kafka_streams_example_spark.functions import codecs as cx

_DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"


def _image(doc_id: int, text: str) -> tuple[int, int, bytes]:
    """The with_png_payload fixture image: dims from the id, pixels =
    md5(text) digest repeated row-major."""
    w, h = 16 + doc_id % 17, 16 + doc_id % 13
    digest = hashlib.md5(text.encode("utf-8")).digest()
    return w, h, (digest * (w * h // 16 + 1))[: w * h]


def test_dhash_reencode_invariance():
    """Re-encoding the same pixels (different scanline filter, different
    zlib level) yields byte-DIFFERENT blobs — exact/byte dedup misses the
    duplicate — while the dHash over DECODED pixels is identical."""
    w, h, px = _image(5, "the quick brown fox jumps over the lazy dog")
    base = cx.encode_png_gray8(w, h, px)
    variants = [
        cx.encode_png_gray8(w, h, px, filter_type=1),
        cx.encode_png_gray8(w, h, px, filter_type=2),
        cx.encode_png_gray8(w, h, px, zlevel=9),
        cx.encode_png_gray8(w, h, px, filter_type=1, zlevel=1),
    ]
    ref = cx.dhash60(px, w, h)
    blobs = {hashlib.md5(base).hexdigest()}
    for blob in variants:
        assert blob != base  # byte-level dedup would NOT pair these
        blobs.add(hashlib.md5(blob).hexdigest())
        d = cx.decode_png(blob)
        assert d["pixels"] == px  # decode is exact for every filter
        assert cx.dhash60(d["pixels"], d["width"], d["height"]) == ref
    assert len(blobs) >= 4  # genuinely distinct wire bytes


def test_dhash_perturbation_near_and_unrelated_far():
    """A 1-pixel brightness nudge stays within the near-dup Hamming cut;
    an unrelated image lands far outside it."""
    w, h, px = _image(9, "alpha beta gamma delta epsilon zeta")
    ref = cx.dhash60(px, w, h)
    nudged = bytearray(px)
    nudged[(h // 2) * w + w // 2] = (nudged[(h // 2) * w + w // 2] + 1) % 256
    near = cx.dhash60(bytes(nudged), w, h)
    assert bin(ref ^ near).count("1") <= 6
    w2, h2, px2 = _image(9, "one two three four five six seven eight")
    far = cx.dhash60(px2, w2, h2)  # same dims, unrelated content
    assert bin(ref ^ far).count("1") > 6


def test_image_phash_neardup_planted_pair(spark, tmp_path):
    """Planted corpus: two docs with identical text and ids congruent mod
    lcm(17,13)=221 produce byte-different parquet rows but IDENTICAL
    images — the query must report them as Hamming-0 near-dups of each
    other, and nobody else as a near-dup."""
    texts = [" ".join(f"tok{i}w{j}" for j in range(30)) for i in range(20)]
    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    rows.append((221, texts[0], "en", "s0", len(texts[0])))  # dims == doc 0's
    sf = tmp_path / "phash"
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(sf / "documents.parquet")
    )
    out = {
        r.doc_id: r
        for r in registry.QUERIES["image_phash_neardup"](spark, str(sf)).collect()
    }
    assert set(out) == {r[0] for r in rows}
    assert out[0].dhash == out[221].dhash
    for i in (0, 221):
        assert out[i].min_hamming == 0
        assert out[i].n_neardups >= 1
    for i in out:
        if i not in (0, 221):
            assert out[i].n_neardups == 0


# ---------------------------------------------------------------------------
# decontam bench broadcast size guard (batch + streaming gate)
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontam_bench_broadcast_size_guard(spark, monkeypatch):
    """The eval-gram side broadcasts when the footer estimate proves it
    small, and degrades to a plain shuffle join when forced oversized —
    with IDENTICAL output either way. Auto-broadcast is disabled for the
    duration so the HINT (the guard's decision) alone decides the
    strategy — at real scale the bench side's size estimate exceeds the
    auto threshold anyway, which is exactly when the guard matters."""
    from kafka_streams_example_spark.queries import dedup as dq
    from tests.conftest import SF_SMOKE

    fn = registry.QUERIES["decontam_ngram_overlap"]
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        small = fn(spark, SF_SMOKE)
        assert "BroadcastHashJoin" in _plan(small)  # guard passes → broadcast
        small_rows = sorted(map(tuple, small.collect()))

        monkeypatch.setattr(dq, "_BENCH_BCAST_MAX_BYTES", -1)  # force "too big"
        big = fn(spark, SF_SMOKE)
        plan = _plan(big)
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert sorted(map(tuple, big.collect())) == small_rows
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_decontam_unknown_size_keeps_shuffle_join(spark, tmp_path):
    """Footer stats unreadable (non-parquet layout) → est = -1 → the safe
    direction is NO broadcast hint."""
    from kafka_streams_example_spark.queries import dedup as dq
    from kafka_streams_example_spark.sources.files import table_uncompressed_bytes

    assert table_uncompressed_bytes(str(tmp_path), "documents") == -1
    bench = spark.range(3).selectExpr("CAST(id AS STRING) AS g")
    out = dq._maybe_broadcast_bench(str(tmp_path), bench)
    assert out is bench  # un-hinted frame returned as-is


def test_streaming_gate_index_guard_shuffle_parity(spark, tmp_path, monkeypatch):
    """Forcing the standing decontam gate's static index oversized flips
    the probe to a shuffle join with byte-identical totals/quarantine."""
    import json as _json
    import os as _os

    from kafka_streams_example_spark.streaming import contract as ct

    bench_text = " ".join(f"ev{i}" for i in range(12))
    docs = [
        (1, "en", bench_text),  # fully contaminated
        (2, "en", " ".join(f"cl{i}" for i in range(12))),  # clean
        (3, "de", f"{' '.join(f'x{i}' for i in range(7))} {bench_text}"),
    ]

    def run_once(tag):
        seed = spark.createDataFrame(
            [(0, "en", bench_text)], "doc_id LONG, lang STRING, text STRING"
        )
        src = tmp_path / f"in_{tag}"
        _os.makedirs(src)
        stream = spark.readStream.schema(
            "doc_id LONG, lang STRING, text STRING"
        ).json(str(src))
        _, publish = ct.streaming_decontam_gate(
            stream, seed, state_dir=str(tmp_path / f"state_{tag}")
        )
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(publish)
            .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
            .start()
        )
        with open(src / "b0.json", "w") as f:
            for did, lang, text in docs:
                f.write(_json.dumps({"doc_id": did, "lang": lang, "text": text}) + "\n")
        q.processAllAvailable()
        q.stop()
        totals = sorted(
            map(tuple, spark.sql("SELECT * FROM decontam_totals").collect())
        )
        quar = sorted(
            map(
                tuple,
                spark.read.parquet(
                    str(tmp_path / f"state_{tag}" / "quarantine")
                ).collect(),
            )
        )
        return totals, quar

    base = run_once("bcast")
    monkeypatch.setattr(ct, "_BENCH_IDX_BCAST_MAX_ROWS", -1)
    forced = run_once("shuffle")
    assert forced == base
    assert base[0]  # non-degenerate: some totals rows
    assert base[1]  # planted contamination quarantined


# ---------------------------------------------------------------------------
# baseline JPEG codec (multimodal_decode_real_jpeg)
# ---------------------------------------------------------------------------


def test_jpeg_dct_matches_matrix_reference():
    """_jpg_fdct/_jpg_idct agree with an INDEPENDENT matrix-form DCT-II
    (numpy, C @ X @ C.T) on random blocks, and compose to the identity."""
    import numpy as np

    from kafka_streams_example_spark.functions import codecs as cx

    C = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            C[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    rng = np.random.default_rng(42)
    for _ in range(5):
        block = rng.integers(-128, 128, size=(8, 8))
        ref = C @ block @ C.T
        got = np.array(cx._jpg_fdct([int(v) for v in block.flatten()])).reshape(8, 8)
        assert np.allclose(got, ref, atol=1e-9)
        back = np.array(
            cx._jpg_idct([float(v) for v in got.flatten()])
        ).reshape(8, 8)
        assert np.allclose(back, block, atol=1e-9)


def test_jpeg_roundtrip_exact_on_block_constant_and_bounded_elsewhere():
    """Per-block-constant images roundtrip bit-exactly (the oracle
    device); arbitrary content is within quantization error (≤1 at Q=1) —
    the honest lossy bound. Non-multiple-of-8 dims pad with edge
    replication and crop back."""
    import random

    from kafka_streams_example_spark.functions import codecs as cx

    random.seed(3)
    w, h = 24, 16
    px = bytearray(w * h)
    for by in range(2):
        for bx in range(3):
            v = random.randrange(256)
            for y in range(8):
                row = (by * 8 + y) * w + bx * 8
                px[row : row + 8] = bytes([v]) * 8
    d = cx.decode_jpeg(cx.encode_jpeg_gray8(w, h, bytes(px)))
    assert d["pixels"] == bytes(px)
    assert (d["width"], d["height"]) == (w, h)

    noisy = bytes(random.randrange(256) for _ in range(w * h))
    d2 = cx.decode_jpeg(cx.encode_jpeg_gray8(w, h, noisy))
    assert max(abs(a - b) for a, b in zip(noisy, d2["pixels"])) <= 1

    odd = bytes((i * 11) % 256 for i in range(20 * 12))
    d3 = cx.decode_jpeg(cx.encode_jpeg_gray8(20, 12, odd))
    assert (d3["width"], d3["height"]) == (20, 12)
    assert len(d3["pixels"]) == 240
    assert max(abs(a - b) for a, b in zip(odd, d3["pixels"])) <= 1


def test_jpeg_ac_path_and_quant_table():
    """A non-trivial quant table exercises dequantization, and a
    single-gradient block forces genuine AC coefficients through the
    Huffman run-length path (not just DC+EOB)."""
    from kafka_streams_example_spark.functions import codecs as cx

    w = h = 8
    px = bytes(min(255, x * 30) for y in range(8) for x in range(8))
    q = [1] * 64
    q[1] = 2  # non-uniform: dequant must multiply back
    d = cx.decode_jpeg(cx.encode_jpeg_gray8(w, h, px, quant=q))
    # lossy but tightly bounded: only coefficient (0,1) was coarsened
    assert max(abs(a - b) for a, b in zip(px, d["pixels"])) <= 2


def test_jpeg_rejects_and_degrades():
    """Corrupt/foreign bytes raise (the exception types decode_jpegs
    catches per-row) at the codec layer — one bad blob never kills the
    task because the Spark stage maps them to ok=False rows."""
    import struct as _struct

    import pytest as _pytest

    from kafka_streams_example_spark.functions import codecs as cx

    with _pytest.raises(ValueError):
        cx.decode_jpeg(b"not a jpeg at all")
    good = cx.encode_jpeg_gray8(8, 8, bytes(range(64)))
    with _pytest.raises((ValueError, IndexError, _struct.error)):
        cx.decode_jpeg(good[: len(good) // 2])


def test_jpeg_fill_bytes_and_standalone_markers_in_header():
    """Spec-legal streams from OTHER encoders decode identically: any
    number of 0xFF fill bytes may pad before a marker (T.81 B.1.1.2) and
    TEM/RSTn are standalone markers with no length field (B.1.1.3) — a
    walk that read a fill byte as marker 0xFF would misparse two payload
    bytes as a segment length and fail on conformant input."""
    from kafka_streams_example_spark.functions import codecs as cx

    px = bytes((x * 7 + y * 11) % 256 for y in range(16) for x in range(16))
    good = cx.encode_jpeg_gray8(16, 16, px)
    want = cx.decode_jpeg(good)["pixels"]

    sof = good.index(b"\xff\xc0")
    assert sof > 2
    # fill byte right after SOI, then TEM + RST0 + another fill before SOF
    padded = (
        good[:2] + b"\xff" + good[2:sof] + b"\xff\x01\xff\xd0\xff" + good[sof:]
    )
    d = cx.decode_jpeg(padded)
    assert (d["width"], d["height"]) == (16, 16)
    assert d["pixels"] == want


def test_jpeg_decode_stage_per_row_degradation(spark):
    """Non-JPEG payloads (utf-8 text bytes) through decode_jpegs yield
    ok=False rows; real JPEG payloads decode to their true dims — the
    test_decode_real_path_stdlib_png pattern for the JPEG stage."""
    from kafka_streams_example_spark.operators import multimodal as mm

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(12)
    good = mm.decode_jpegs(mm.with_jpeg_payload(docs)).collect()
    assert len(good) == 12
    for r in good:
        assert r.ok, r
        assert r.width == 8 * (1 + r.doc_id % 3)
        assert r.height == 8 * (1 + r.doc_id % 2)
        assert r.n_pixels == r.width * r.height
    bad = mm.decode_jpegs(mm.with_binary_payload(docs)).collect()
    assert len(bad) == 12
    assert all((not r.ok) and r.width is None and r.pixel_sum is None for r in bad)


# ---------------------------------------------------------------------------
# semdedup two-level assignment (the r10 x100 superlinearity fix)
# ---------------------------------------------------------------------------


def test_semdedup_bucket_count_and_assignment_cost_linear():
    """The two-level assignment's per-vector work is CONSTANT (16 sign
    bits + <=16 local-centroid cosines) because bucket count scales with
    corpus size; the flat form's per-vector work grew with the corpus
    (nearest of N/128 centroids — the measured x100 exponent-1.141
    pathology this rewrite removed)."""
    from kafka_streams_example_spark.queries.dedup import (
        sd_bucket_count,
        sd_cell_count,
    )

    assert sd_bucket_count(2_000) == 1  # floor: identical to the old cells
    assert sd_bucket_count(200_000) == 97
    assert sd_bucket_count(5_000_000_000) == 2_441_406
    for n in (10_000, 1_000_000, 100_000_000):
        # per-vector candidate centroids bounded by 16 regardless of n;
        # expected in-cell occupancy stays ~128
        assert n / sd_cell_count(n) <= 130
        # expected bucket size ~2048; integer flooring of cells//16 can
        # push it toward 2x the design point, never beyond
        assert n / sd_bucket_count(n) <= 4096


def test_semdedup_sign_buckets_balanced_and_neardups_colocated(spark, tmp_path):
    """On a sign-balanced corpus (centered embeddings — the realistic
    shape) the coarse buckets stay bounded: max occupancy within a small
    factor of the mean, so the rank window and the in-bucket join never
    see a corpus-sized partition. True near-dups (cosine ~ 1) share the
    sign pattern, hence the bucket, hence the cell — they are still
    caught after the rewrite."""
    import random

    from kafka_streams_example_spark.queries.dedup import semdedup_prune

    random.seed(11)
    rows = []
    for i in range(4096):
        v = [random.uniform(-1, 1) for _ in range(64)]
        rows.append((i, v))
    # planted twin: 5000 is vec 40 with tiny jitter -> cosine ~ 1
    twin = [x + 1e-4 for x in rows[40][1]]
    rows.append((5000, twin))
    spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>").write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = {r.vec_id: r for r in semdedup_prune(spark, str(tmp_path)).collect()}
    assert len(out) == 4097
    assert out[40].keep is True
    assert out[5000].keep is False  # junior twin dropped
    assert out[5000].centroid_id == out[40].centroid_id
    # bucket occupancy: reconstruct buckets the way the query does
    from kafka_streams_example_spark.queries.dedup import (
        _SD_SIGN_BITS,
        sd_bucket_count,
    )

    n_b = sd_bucket_count(4097)
    assert n_b == 2
    occ = [0] * n_b
    for _, v in rows:
        pattern = sum((1 << j) for j in range(_SD_SIGN_BITS) if v[j] > 0)
        occ[pattern % n_b] += 1
    assert max(occ) <= 2 * (sum(occ) / n_b)  # balanced within 2x of mean


# ---------------------------------------------------------------------------
# audio_features_real + image_phash_dedup_cut
# ---------------------------------------------------------------------------


def test_audio_features_definition_replay(spark):
    """Energy/peak/zero-crossings replayed from the recurrence definition
    in plain Python for a handful of docs — independent of both engines'
    SQL formulations."""
    rows = {
        r.doc_id: r
        for r in registry.QUERIES["audio_features_real"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        if r.doc_id < 8
    }
    for i, r in rows.items():
        n = 64 + i % 64
        smp = [(i * 31 + j * 17) % 65536 - 32768 for j in range(n)]
        assert r.ok and r.n_samples == n
        assert r.energy == sum(x * x for x in smp)
        assert r.peak_abs == max(abs(x) for x in smp)
        assert r.zero_crossings == sum(
            1 for a, b in zip(smp, smp[1:]) if (a >= 0) != (b >= 0)
        )


def test_image_phash_dedup_cut_planted_group(spark, tmp_path):
    """Re-encoded/identical images collapse to one keeper (lowest id);
    singletons keep themselves."""
    texts = [" ".join(f"cut{i}w{j}" for j in range(25)) for i in range(10)]
    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    rows.append((221, texts[0], "en", "s0", len(texts[0])))  # image twin of 0
    sf = tmp_path / "cut"
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(sf / "documents.parquet")
    )
    out = {
        r.doc_id: r
        for r in registry.QUERIES["image_phash_dedup_cut"](spark, str(sf)).collect()
    }
    assert out[0].keep is True and out[0].n_members == 2
    assert out[221].keep is False and out[221].keeper_id == 0
    for i in out:
        if i not in (0, 221):
            assert out[i].keep is True and out[i].n_members == 1


def test_crossformat_png_jpeg_identical_pixels_and_dhash():
    """The same block-constant image through the PNG codec and the JPEG
    codec: wire-incompatible blobs, bit-identical decoded pixels, one
    dHash — the cross-format duplicate only perceptual dedup can see."""
    import random

    from kafka_streams_example_spark.functions import codecs as cxx

    random.seed(21)
    w, h = 24, 16
    px = bytearray(w * h)
    for by in range(2):
        for bx in range(3):
            v = random.randrange(256)
            for y in range(8):
                row = (by * 8 + y) * w + bx * 8
                px[row : row + 8] = bytes([v]) * 8
    px = bytes(px)
    png = cxx.encode_png_gray8(w, h, px)
    jpg = cxx.encode_jpeg_gray8(w, h, px)
    assert png[:8] != jpg[:8]  # different formats entirely
    dp, dj = cxx.decode_png(png), cxx.decode_jpeg(jpg)
    assert dp["pixels"] == dj["pixels"] == px
    assert cxx.dhash60(dp["pixels"], w, h) == cxx.dhash60(dj["pixels"], w, h)
