"""Semantic invariants for the training-data-pipeline extras
(kafka_streams_example_spark/llm_extra.py) beyond the DuckDB oracle
hash-match: decontamination split discipline, repetition-signal bounds,
stratified-sampling hash discipline, vocabulary consistency, and range-join
partition totality."""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import functions as F

from conftest import SF_SMOKE
from kafka_streams_example_spark import registry
from kafka_streams_example_spark.queries.events import _TIERS
from kafka_streams_example_spark.queries.operational import _LANG_RATES


def test_decontam_split_and_bounds(spark):
    rows = registry.QUERIES["decontam_ngram_overlap"](spark, SF_SMOKE).collect()
    assert rows, "training split must be non-empty"
    for r in rows:
        # benchmark docs never appear in the scored training output
        assert r.doc_id % 17 != 0
        assert 0 <= r.n_overlap <= r.n_ngrams
        assert r.contaminated == (1 if r.n_overlap > 0 else 0)
    # the synthetic word-salad corpus shares a tiny vocabulary, so some
    # contamination must exist — the query is not vacuously all-zero
    assert any(r.contaminated for r in rows)
    assert any(not r.contaminated for r in rows)


def test_repetition_signal_bounds(spark):
    rows = registry.QUERIES["repetition_quality_stats"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r.n_words == 0:
            assert r.distinct_ratio == r.top_unigram_frac == 0.0
            continue
        assert 0.0 < r.distinct_ratio <= 1.0
        # the top unigram claims at least 1/n and at least its "fair share"
        # under the distinct count
        # tolerance: the frac is rounded to 6 decimals in the query output
        assert r.top_unigram_frac >= 1.0 / r.n_words - 1e-6
        assert r.top_unigram_frac <= 1.0
        if r.n_words >= 2:
            assert 0.0 < r.top_bigram_frac <= 1.0
    # repetition exists in the synthetic corpus: some doc repeats a word
    assert any(r.distinct_ratio < 1.0 for r in rows if r.n_words > 1)


def test_stratified_sample_hash_discipline(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    kept = {
        r.doc_id: r.lang
        for r in registry.QUERIES["stratified_sample_by_lang"](spark, SF_SMOKE).collect()
    }

    def bucket(text: str) -> int:
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        return int(hashlib.md5(norm.encode()).hexdigest()[:15], 16) % 100

    for d in docs:
        rate = _LANG_RATES.get(d.lang, 100)
        assert (d.doc_id in kept) == (bucket(d.text) < rate), d.doc_id
    # the en stratum is actually downsampled relative to zh (rate 100)
    n_en_all = sum(1 for d in docs if d.lang == "en")
    n_en_kept = sum(1 for lang in kept.values() if lang == "en")
    assert n_en_kept < n_en_all


def test_vocab_stats_consistency(spark):
    rows = registry.QUERIES["vocab_stats_by_lang"](spark, SF_SMOKE).collect()
    langs = {r.lang for r in rows}
    assert langs == set(_LANG_RATES)
    for r in rows:
        assert 0 < r.vocab_size <= r.total_tokens
        assert abs(r.ttr - round(r.vocab_size / r.total_tokens, 6)) < 1e-12


def test_embedding_quantization_quality(spark):
    rows = registry.QUERIES["embedding_quantize_int8"](spark, SF_SMOKE).collect()
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    assert set(r.vec_id for r in rows) == set(emb)  # no zero vectors dropped
    for r in rows:
        v = emb[r.vec_id]
        assert r.scale > 0
        max_abs = max(abs(x) for x in v)
        assert abs(r.scale - max_abs / 127.0) < 1e-12
        # half-away-from-zero to match Spark/DuckDB round (python round()
        # is half-to-even)
        q = [
            int(math.copysign(math.floor(abs(x / r.scale) + 0.5), x)) for x in v
        ]
        # int8 range respected by construction of the symmetric scale
        assert all(-127 <= qi <= 127 for qi in q)
        assert r.q_sum == sum(q)
        # reconstruction error bounded by (scale/2)^2 per element
        assert r.mse <= (r.scale / 2) ** 2 + 1e-12


def test_multimodal_resize_contract(spark):
    rows = registry.QUERIES["multimodal_resize_fake"](spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == n_docs  # 1:1 row mapping
    for r in rows:
        assert r.ok
        assert (r.out_width, r.out_height) == (32, 32)
        assert r.n_resized_bytes == 32 * 32  # fixed-size output blobs
        assert 64 <= r.width < 256 and 64 <= r.height < 256


def test_resize_real_path_stdlib_png(spark):
    """Real resize: PNG in → decoded, nearest-neighbor resampled,
    re-encoded PNG out at the target dims; output pixels match a local
    reference resample of the same source pixels."""
    from kafka_streams_example_spark.functions import codecs as cx
    from kafka_streams_example_spark.operators import multimodal as mm

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(8)
    png = mm.with_png_payload(docs)
    src = {r.doc_id: bytes(r.payload) for r in png.collect()}
    rows = mm.resize_images(png, out_width=12, out_height=10, fake=False).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.ok, r
        assert (r.out_width, r.out_height) == (12, 10)
        out = cx.decode_png(bytes(r.resized))
        assert (out["width"], out["height"]) == (12, 10)
        d = cx.decode_png(src[r.doc_id])
        assert (r.width, r.height) == (d["width"], d["height"])
        assert out["pixels"] == cx.resize_gray8_nearest(
            d["pixels"], d["width"], d["height"], 12, 10
        )
    # non-PNG input degrades per-row
    bad = mm.resize_images(mm.with_binary_payload(docs), fake=False).collect()
    assert all(not r.ok and r.resized is None for r in bad)


def test_user_event_timeline_totals(spark):
    out = registry.QUERIES["user_event_timeline"](spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert sum(r.n_events for r in out) == ev.count()
    for r in out:
        assert r.n_events >= 1
        assert r.path8.startswith(r.first_event)
        steps = r.path8.split("->")
        assert len(steps) == min(r.n_events, 8)
        if r.n_events <= 8:
            assert steps[-1] == r.last_event


def test_quantized_topk_recall(spark):
    exact = registry.QUERIES["similarity_cosine_topk"](spark, SF_SMOKE).collect()
    quant = registry.QUERIES["similarity_quantized_topk"](spark, SF_SMOKE).collect()

    def by_query(rows):
        out = {}
        for r in rows:
            out.setdefault(r.q_id, set()).add(r.vec_id)
        return out

    e, q = by_query(exact), by_query(quant)
    assert set(e) == set(q)
    recalls = [len(e[k] & q[k]) / len(e[k]) for k in e]
    # int8 quantization barely perturbs cosine ranking
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_vectorized_topk_matches_jvm_fold(spark):
    exact = registry.QUERIES["similarity_cosine_topk"](spark, SF_SMOKE).collect()
    vect = registry.QUERIES["similarity_cosine_topk_vectorized"](spark, SF_SMOKE).collect()
    key = lambda r: (r.q_id, r.rnk)  # noqa: E731
    e = {key(r): (r.vec_id, r.score) for r in exact}
    v = {key(r): (r.vec_id, r.score) for r in vect}
    assert set(e) == set(v)
    for kk in e:
        assert e[kk][0] == v[kk][0], kk  # identical ranking
        assert abs(e[kk][1] - v[kk][1]) < 1e-9  # scores equal after rounding


def test_bpe_pair_candidates_shape(spark):
    rows = registry.QUERIES["bpe_pair_candidates"](spark, SF_SMOKE).collect()
    assert len(rows) == 20
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    for r in rows:
        assert len(r.pair) == 2 and " " not in r.pair


def test_sft_pairs_context_discipline(spark):
    rows = registry.QUERIES["sft_next_event_pairs"](spark, SF_SMOKE).collect()
    from kafka_streams_example_spark.sources.files import load_table

    ev = load_table(spark, SF_SMOKE, "events").collect()
    assert len(rows) == len(ev)  # one training pair per event
    for r in rows:
        steps = [s for s in r.context.split("->") if s]
        assert len(steps) <= 3
    # each user's (ts, event_id)-earliest event has an empty context
    first_eid = {}
    for e in ev:
        cur = first_eid.get(e.user_id)
        if cur is None or (e.ts, e.event_id) < cur[0]:
            first_eid[e.user_id] = ((e.ts, e.event_id), e.event_id)
    firsts = {eid for _, eid in first_eid.values()}
    ctx = {r.event_id: r.context for r in rows}
    assert all(ctx[eid] == "" for eid in firsts)


def test_frame_sample_fanout_bounded(spark):
    rows = registry.QUERIES["multimodal_frame_sample"](spark, SF_SMOKE).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert r.byte_offset == r.frame_no * 1024
    for frames in by_doc.values():
        assert 1 <= len(frames) <= 8
        assert len({f.frame_md5 for f in frames}) == 1


def test_range_join_partitions_all_events(spark):
    out = registry.QUERIES["range_join_value_tiers"](spark, SF_SMOKE)
    n_binned = out.agg(F.sum("n_events")).collect()[0][0]
    n_events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    # tiers cover the whole value domain with disjoint [lo, hi) bands
    assert n_binned == n_events
    los = sorted(lo for _, lo, _ in _TIERS)
    his = sorted(hi for _, _, hi in _TIERS)
    assert los[1:] == his[:-1], "bands must tile without gaps or overlap"


def test_round_half_up_matches_duckdb_floor_twin_on_boundaries(spark):
    """round_half_up and its SQL twin floor(x*10^s+0.5)/10^s must agree
    bit-for-bit on decimal-boundary values — the cases where Spark's
    F.round (decimal-repr HALF_UP) and DuckDB's round() (binary) DO
    diverge (observed at sf0.1: quality 0.53575 -> .5358 vs .5357,
    cume 41/640 -> .064063 vs .064062)."""
    import duckdb

    from kafka_streams_example_spark.operators.text import round_half_up

    vals = [0.53575, 0.0640625, 0.49824999999999997, 0.65375,
            0.48424999999999996, 0.38275, 0.0, 1.0, 0.99995]
    df = spark.createDataFrame([(v,) for v in vals], "v DOUBLE")
    got4 = [r[0] for r in df.select(round_half_up(F.col("v"), 4)).collect()]
    got6 = [r[0] for r in df.select(round_half_up(F.col("v"), 6)).collect()]
    con = duckdb.connect()
    for v, g4, g6 in zip(vals, got4, got6):
        d4, d6 = con.execute(
            "SELECT floor(? * 10000.0 + 0.5) / 10000.0,"
            " floor(? * 1000000.0 + 0.5) / 1000000.0", [v, v]
        ).fetchone()
        assert g4 == d4 and g6 == d6, (v, g4, d4, g6, d6)
    con.close()
