"""Semantic tests for the thirteenth tranche (llm_extra12) — oracle
parity is covered by test_oracle_parity; these pin operator semantics on
hand-checkable fixtures."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

_DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"


def _split_of(doc_id: int) -> str:
    """Python replica of the deterministic 80/10/10 hash split."""
    b = int(hashlib.md5(f"{doc_id}:split".encode()).hexdigest()[:15], 16) % 100
    return "train" if b < 80 else ("valid" if b < 90 else "test")


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_leakage_pairs_are_cross_split_subset_of_all_pairs(spark, tmp_path):
    """The leakage audit must report EXACTLY the near-dup pairs whose
    sides fall in different splits — verified against a Python replica
    of the split hash over the full pair set."""
    from kafka_streams_example_spark.queries.dedup import (
        _neardup_pairs,
        cross_split_leakage_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # 30 near-identical docs: every pair is a near-dup; ids spread over
    # the hash so some pairs cross splits
    rows = [(i, f"{base} tail{i}", "en", "w", 60) for i in range(30)]
    d = _write_docs(spark, tmp_path, rows)

    all_pairs = {
        (r.id_a, r.id_b)
        for r in _neardup_pairs(spark, d).select("id_a", "id_b").collect()
    }
    expected = {
        (a, b) for a, b in all_pairs if _split_of(a) != _split_of(b)
    }
    got = {
        (r.id_a, r.id_b, r.split_a, r.split_b)
        for r in cross_split_leakage_pairs(spark, d).collect()
    }
    assert {(a, b) for a, b, *_ in got} == expected and expected
    for a, b, sa, sb in got:
        assert sa == _split_of(a) and sb == _split_of(b) and sa != sb


def test_band_tuning_scurve_matches_formula_and_orders_configs(spark, tmp_path):
    """Per config, mean_p_detect must equal the Python-evaluated S-curve
    over the measured Jaccards, and at J ~ 0.5 fewer rows per band must
    detect MORE (the S-curve moves right as r grows)."""
    from kafka_streams_example_spark.queries.dedup import (
        _neardup_pairs,
        minhash_band_tuning_report,
    )

    base = "one two three four five six seven eight nine ten eleven twelve"
    rows = [(i, f"{base} x{i}", "en", "w", 60) for i in range(12)]
    d = _write_docs(spark, tmp_path, rows)

    jacs = [r.jaccard for r in _neardup_pairs(spark, d).collect()]
    assert jacs
    out = {
        (r.n_bands, r.rows_per_band): r
        for r in minhash_band_tuning_report(spark, d).collect()
    }
    for (b, r), row in out.items():
        ps = [1.0 - (1.0 - j**r) ** b for j in jacs]
        assert row.n_pairs == len(jacs)
        assert abs(row.mean_p_detect - sum(ps) / len(ps)) < 1e-5
        assert abs(row.expected_detected - sum(ps)) < 1e-4
    # 32x1 banding catches near-everything; 4x8 is the strictest
    assert out[(32, 1)].mean_p_detect > out[(8, 4)].mean_p_detect
    assert out[(8, 4)].mean_p_detect >= out[(4, 8)].mean_p_detect


def test_hard_negatives_exclude_own_label_and_rank_by_score(spark):
    from kafka_streams_example_spark.queries.retrieval import hard_negative_mining

    rows = hard_negative_mining(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert r.neg_label != r.q_label
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_fertility_exact_on_planted_doc(spark, tmp_path):
    from kafka_streams_example_spark.queries.text import tokenizer_fertility_by_lang

    # "hello, world" -> words: [hello,, world]=2; BPE-ish tokens:
    # [hello][,][world] = 3; chars = 12
    d = _write_docs(spark, tmp_path, [(1, "hello, world", "en", "w", 12)])
    (r,) = tokenizer_fertility_by_lang(spark, d).collect()
    assert (r.n_docs, r.n_words, r.n_tokens_bpe) == (1, 2, 3)
    assert r.fertility == 1.5
    assert r.chars_per_token == 4.0


def test_cluster_size_histogram_counts_planted_clusters(spark, tmp_path):
    """One exact-dup triple + one near-dup pair -> histogram
    {3: 1, 2: 1} (same blocking/thresholds as dedup_clusters)."""
    from kafka_streams_example_spark.queries.dedup import dedup_cluster_size_histogram

    trip = "identical content repeated verbatim in three documents here"
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, trip, "en", "w", 60),
        (2, trip, "en", "w", 60),
        (3, trip, "en", "w", 60),
        (4, a + " one", "en", "w", 66),
        (5, a + " two", "en", "w", 66),
        (6, "completely unrelated text about solar panel telemetry", "en", "w", 54),
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {
        r.cluster_size: r.n_clusters
        for r in dedup_cluster_size_histogram(spark, d).collect()
    }
    assert got == {3: 1, 2: 1}


def test_norm_outliers_flags_planted_extreme_vector(spark, tmp_path):
    from kafka_streams_example_spark.queries.retrieval import embedding_norm_outliers

    # label 0: 9 unit-ish vectors + 1 extreme-norm vector
    rows = [(i, [1.0 + 0.01 * i] + [0.0] * 63, 0) for i in range(9)]
    rows.append((9, [50.0] + [0.0] * 63, 0))
    spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    (r,) = embedding_norm_outliers(spark, str(tmp_path)).collect()
    assert r.n_vecs == 10 and r.n_outliers == 1


def test_mixture_entropy_uniform_cells_is_log2_k(spark, tmp_path):
    from kafka_streams_example_spark.queries.operational import corpus_mixture_entropy

    # 2 langs x 2 sources, 5 docs per cell -> both entropies exact
    rows = [
        (i * 100 + j, f"text {i} {j}", lang, src, 8)
        for i, lang in enumerate(["en", "de"])
        for j, src in enumerate(["s1", "s2"])
        for j2 in range(5)
        for i2, j in [(0, j * 10 + j2)]
    ]
    d = _write_docs(spark, tmp_path, rows)
    (r,) = corpus_mixture_entropy(spark, d).collect()
    assert (r.n_langs, r.n_sources, r.n_cells) == (2, 2, 4)
    assert r.entropy_lang_bits == 1.0
    assert r.entropy_cell_bits == 2.0
    assert r.max_cell_share == 0.25


def test_threshold_sweep_is_monotone_and_shares_consistent(spark):
    from kafka_streams_example_spark.queries.eval import quality_filter_threshold_sweep

    rows = sorted(
        quality_filter_threshold_sweep(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) == 4
    kept = [r.n_kept for r in rows]
    assert kept == sorted(kept)  # looser threshold keeps >= docs
    for r in rows:
        assert 0.0 <= r.share_kept <= 1.0


def test_semdedup_drops_junior_in_cell_twin_keeps_cross_cell(spark, tmp_path):
    """A vector nearly identical to a lower-id vector in the SAME cell is
    dropped; the lowest-id twin survives; vectors without an in-cell
    senior twin survive — and every drop has an in-cell senior."""
    from kafka_streams_example_spark.queries.dedup import semdedup_prune

    def vec(*vals):
        v = [0.0] * 64
        for i, x in enumerate(vals):
            v[i] = x
        return v

    # ids < 16 are the centroids themselves (orthogonal) — corpus vectors
    # too, so they act as the most-senior member of their own cell
    rows = [(i, vec(*([0.0] * i + [1.0])), 0) for i in range(16)]
    # 100/101: cell 0 (near-parallel to e0) — both have senior 0 above
    # tau, and 101 additionally has senior 100
    rows.append((100, vec(10.0, 0.05), 1))
    rows.append((101, vec(10.0, 0.06), 1))
    # 300: spread evenly over 9 centroid directions — lands in cell 0
    # (tie -> lowest id) but its cosine to EVERY cell-0 senior is < 0.35
    rows.append((300, vec(*([1.0] * 9)), 2))
    spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    out = {r.vec_id: r for r in semdedup_prune(spark, str(tmp_path)).collect()}
    # centroid vectors have no senior -> all keep
    assert all(out[i].keep for i in range(16))
    assert out[100].keep is False and out[101].keep is False
    assert out[100].centroid_id == out[101].centroid_id == 0
    assert out[300].keep is True and out[300].centroid_id == 0


def test_semdedup_cell_count_scales_with_corpus():
    """Fixed k makes in-cell pair work quadratic in corpus size (r06
    scale sweep measured 14.6x time for 10x rows before the fix); the
    cell count must grow ~linearly with vectors above the floor."""
    from kafka_streams_example_spark.queries.dedup import sd_cell_count

    assert sd_cell_count(0) == 16
    assert sd_cell_count(200) == 16     # sf0.01 — floor
    assert sd_cell_count(2000) == 16    # sf0.1 — floor (recorded hashes keep)
    assert sd_cell_count(20_000) == 156     # sf1
    assert sd_cell_count(2_000_000) == 15_625
    # per-cell occupancy stays bounded => pair work linear in rows
    for n in (10_000, 1_000_000, 100_000_000):
        assert n / sd_cell_count(n) <= 130


def test_cross_lingual_pairs_only_cross_language(spark, tmp_path):
    from kafka_streams_example_spark.queries.dedup import cross_lingual_neardup_pairs

    base = "shared boilerplate text common to both language labels here today"
    rows = [
        (1, base + " en one", "en", "w", 64),
        (2, base + " de one", "de", "w", 64),
        (3, base + " en two", "en", "w", 64),
        (4, "unrelated german text entirely different words", "de", "w", 46),
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {
        (r.id_a, r.id_b): (r.lang_a, r.lang_b)
        for r in cross_lingual_neardup_pairs(spark, d).collect()
    }
    # 1~2 and 2~3 cross languages; 1~3 is en-en and must be absent
    assert set(got) == {(1, 2), (2, 3)}
    assert got[(1, 2)] == ("en", "de") and got[(2, 3)] == ("de", "en")


def test_fertility_zero_token_lang_yields_null_not_error(spark, tmp_path):
    """A language whose docs all tokenize empty must produce NULL
    ratios (matching DuckDB's x/0 -> NULL), not an ANSI divide error
    (code-review r04 finding)."""
    from kafka_streams_example_spark.queries.text import tokenizer_fertility_by_lang

    rows = [(1, "   ", "zz", "w", 3), (2, "hello world", "en", "w", 11)]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.lang: r for r in tokenizer_fertility_by_lang(spark, d).collect()}
    assert out["zz"].n_words == 0
    assert out["zz"].fertility is None and out["zz"].chars_per_token is None
    assert out["en"].fertility == 1.0
