"""Semantic tests for the eleventh tranche (llm_extra10) — oracle parity
is covered by test_oracle_parity; these pin operator semantics on
hand-checkable fixtures."""

from __future__ import annotations

_DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"


def test_confusion_matrix_diagonal_is_recall(spark, tmp_path):
    from kafka_streams_example_spark.queries.eval import langid_confusion_matrix

    # 3 docs labeled 'en' with English stopwords, 1 labeled 'en' with
    # German text (misclassified), 2 labeled 'de' with German text
    rows = [
        (1, "the cat and the dog in a house", "en", "w", 30),
        (2, "a man is the king of the hill", "en", "w", 29),
        (3, "the quick fox and the hen", "en", "w", 25),
        (4, "der hund und die katze ist das", "en", "w", 30),  # wrong label
        (5, "die frau und der mann ist ein", "de", "w", 29),
        (6, "das kind und der vater mit dem", "de", "w", 30),
    ]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {(r.actual, r.predicted): r for r in
           langid_confusion_matrix(spark, str(tmp_path)).collect()}
    assert out[("en", "en")].n == 3 and out[("en", "en")].share_of_actual == 0.75
    assert out[("en", "de")].n == 1 and out[("en", "de")].share_of_actual == 0.25
    assert out[("de", "de")].share_of_actual == 1.0


def test_ablation_stages_are_monotone_and_attributable(spark, tmp_path):
    from kafka_streams_example_spark.queries.eval import filter_ablation_report

    long_text = " ".join(["token"] * 20)  # 20 tokens, >50 chars
    rows = [
        (1, "", "en", "w", 0),                      # dies at nonempty
        (2, "short text here", "en", "w", 15),      # dies at min_length
        (3, "x" * 60, "en", "w", 60),               # 1 token -> dies at min_tokens
        (4, long_text, "en", "w", len(long_text)),  # survives all
        (5, long_text, "en", "w", len(long_text)),  # exact dup -> dies at dedup
    ]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r.stage: r for r in filter_ablation_report(spark, str(tmp_path)).collect()}
    assert out["raw"].n_docs == 5
    assert out["nonempty"].n_docs == 4
    assert out["min_length"].n_docs == 3
    assert out["min_tokens"].n_docs == 2
    assert out["exact_dedup"].n_docs == 1
    assert out["exact_dedup"].total_chars == len(long_text)
    ns = [out[s].n_docs for s in
          ("raw", "nonempty", "min_length", "min_tokens", "exact_dedup")]
    assert ns == sorted(ns, reverse=True)


def test_transitivity_flags_open_wedges(spark, tmp_path):
    from kafka_streams_example_spark.queries.dedup import neardup_transitivity_audit

    # b is a||c, so J(a,b)=J(b,c)=3/8=0.375 >= 0.3 but J(a,c)=0: open wedge.
    a = "alpha beta gamma delta epsilon"
    c = "zeta eta theta iota kappa"
    b = a + " " + c
    rows = [(1, a, "en", "w", len(a)), (2, b, "en", "w", len(b)),
            (3, c, "en", "w", len(c))]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    (r,) = neardup_transitivity_audit(spark, str(tmp_path)).collect()
    assert r.n_edges == 2          # a~b and b~c, but NOT a~c
    assert r.n_wedges == 1 and r.n_closed == 0
    assert r.transitivity == 0.0


def test_shard_balance_spreads_salted_hash(spark, tmp_path):
    from kafka_streams_example_spark.queries.operational import output_shard_balance

    rows = [(i, "t", "en", "w", 10) for i in range(6400)]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    (r,) = output_shard_balance(spark, str(tmp_path)).collect()
    assert r.n_shards == 64
    assert r.mean_docs == 100.0
    # salted md5 spreads ~uniformly: no shard more than 2x the mean
    assert r.doc_imbalance < 2.0
    assert r.min_docs > 0
    assert r.max_shard_chars == r.max_docs * 10
