"""Semantic tests for the fourteenth tranche (llm_extra13) — oracle
parity is covered by test_oracle_parity; these pin operator semantics on
hand-checkable fixtures."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

_DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_minhash_recall_identities(spark):
    """detected + missed bookkeeping must be internally consistent and
    detected must be a subset of exact (banding only PRUNES candidates;
    the verify stage enforces the same threshold)."""
    from kafka_streams_example_spark.queries.dedup import minhash_recall_report

    (r,) = minhash_recall_report(spark, "/root/testdata/sf0.001").collect()
    assert r.n_exact >= r.n_detected >= 0
    assert r.n_missed == r.n_exact - r.n_detected
    if r.n_exact:
        assert r.recall == round((r.n_exact - r.n_missed) / r.n_exact, 6)


def test_pagerank_sums_to_one_and_hub_wins(spark, tmp_path):
    """On a star graph (hub co-occurring with every spoke, spokes only
    with the hub) the hub must rank first, and total rank mass must be
    ~1 (PageRank is a probability distribution)."""
    from kafka_streams_example_spark.queries.text import token_pagerank_centrality

    # 12 docs: each contains hub + one distinct spoke pair, repeated so
    # every (hub, spoke) pair passes the support floor of 10
    rows = []
    i = 0
    for spoke in ("aa", "bb", "cc"):
        for _ in range(12):
            rows.append((i, f"hub {spoke}", "en", "w", 10))
            i += 1
    d = _write_docs(spark, tmp_path, rows)
    out = token_pagerank_centrality(spark, d).collect()
    ranks = {r.tok: r["rank"] for r in out}
    assert set(ranks) == {"hub", "aa", "bb", "cc"}
    assert max(ranks, key=ranks.get) == "hub"
    assert abs(sum(ranks.values()) - 1.0) < 1e-4


def test_islands_merge_overlaps_and_split_gaps(spark, tmp_path):
    from kafka_streams_example_spark.queries.events import user_activity_islands

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        # user 1: two events 100s apart (overlap -> one island of 400s),
        # then one event 1000s later (own island of 300s)
        (1, base, 1, "click", 1.0, None),
        (2, base + dt.timedelta(seconds=100), 1, "click", 1.0, None),
        (3, base + dt.timedelta(seconds=1400), 1, "click", 1.0, None),
        # user 2: single event
        (4, base, 2, "view", 1.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.user_id: r for r in user_activity_islands(spark, str(tmp_path)).collect()}
    assert out[1].n_islands == 2
    assert out[1].total_active_secs == 400 + 300
    assert out[1].max_island_secs == 400
    assert out[2].n_islands == 1 and out[2].total_active_secs == 300


def test_bm25_matches_python_reference(spark, tmp_path):
    """Spark BM25 must equal a straight Python implementation of the
    same formula on a small corpus."""
    from kafka_streams_example_spark.queries.retrieval import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        bm25_topk_docs,
    )

    texts = {
        1: "slow batch hash slow",
        2: "batch other words here",
        3: "hash hash hash hash hash",
        4: "nothing relevant at all",
    }
    d = _write_docs(
        spark, tmp_path, [(i, t, "en", "w", len(t)) for i, t in texts.items()]
    )
    toks = {i: t.split() for i, t in texts.items()}
    N = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / N
    df = {
        t: sum(1 for v in toks.values() if t in v) for t in _BM25_TERMS
    }

    def score(i):
        s = 0.0
        for t in _BM25_TERMS:
            tf = toks[i].count(t)
            idf = math.log(1.0 + (N - df[t] + 0.5) / (df[t] + 0.5))
            s += (
                idf
                * tf
                * (_BM25_K1 + 1.0)
                / (tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * len(toks[i]) / avgdl))
            )
        return round(s, 6)

    got = {r.doc_id: r.score for r in bm25_topk_docs(spark, d).collect()}
    assert got == {i: score(i) for i in texts}


def test_blocklist_rates_count_planted_phrases(spark, tmp_path):
    from kafka_streams_example_spark.queries.text import phrase_blocklist_rates

    rows = [
        (1, "a very slow scan indeed", "en", "s1", 23),
        (2, "nothing to see", "en", "s1", 14),
        (3, "the HASH JOIN strategy", "en", "s2", 22),  # case-insensitive
        (4, None, "en", "s2", 0),                        # NULL-safe
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in phrase_blocklist_rates(spark, d).collect()}
    assert out["s1"].n_flagged == 1 and out["s1"].flagged_rate == 0.5
    assert out["s2"].n_flagged == 1 and out["s2"].flagged_rate == 0.5


def test_dedup_reduction_counts_planted_dups(spark, tmp_path):
    from kafka_streams_example_spark.queries.dedup import dedup_reduction_report

    dup = "same text here"
    rows = [
        (1, dup, "en", "w", 14),
        (2, dup, "en", "w", 14),
        (3, "  SAME   text here ", "en", "w", 19),  # normalizes equal
        (4, "unique text", "en", "w", 11),
    ]
    d = _write_docs(spark, tmp_path, rows)
    (r,) = dedup_reduction_report(spark, d).collect()
    assert r.n_docs == 4 and r.n_keepers == 2 and r.n_removed == 2
    assert r.tokens_total == 3 * 3 + 2  # three 3-token docs + one 2-token
    assert r.tokens_kept == 3 + 2
    assert r.doc_reduction == 0.5
