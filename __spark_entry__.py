"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``kafka_streams_example_spark`` (see
kafka_streams_example_spark/registry.py for the query surface).
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from kafka_streams_example_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's full anomaly-detection topology
    (reference: SolarConsumer.java:97-188) over sf0.001 events."""
    return registry.QUERIES["solar_anomalies"](spark, "/root/testdata/sf0.001")


def _row_is_green(name: str, row: dict) -> bool:
    """A recorded CORRECTNESS row counts as 'checked' only when it passed.

    Full-oracle queries need rows+schema+hash all true with no error. A
    query with no DuckDB oracle registered (declared rows-only) passes its
    weaker check when the driver recorded a row count without a hard error.
    Anything else — hash mismatch, exception, or a ``no_oracle`` row for a
    query that HAS since gained an oracle — is NOT green and must rotate to
    the front of the verification window, not out of it.
    """
    if name in registry.ORACLES:
        return (
            row.get("err") is None
            and row.get("rows_match") is True
            and row.get("schema_match") is True
            and row.get("hash_match") is True
        )
    return row.get("err") in (None, "no_oracle") and row.get("spark_rows") is not None


def _rotated(names: list[str]) -> list[str]:
    """Order queries so the driver's bounded per-round window (first ~50
    registrations) verifies the most urgent queries first:

    1. queries with a recorded-but-NOT-green row (mismatch / error / stale
       ``no_oracle`` row for a query that now has an oracle) — re-verified
       before anything else so defects can't rotate out of the window;
    2. queries never recorded in any CORRECTNESS_r*.json;
    3. green queries, STALEST first: ordered by the round of their most
       recent green record (then by how often they've been verified).
       Recency, not count, is the staleness signal — a flagship verified
       twice by r04 has gone unchecked for longer than a query verified
       once in r09, and under a count-first policy the early cohort's
       high counts would keep it out of the window indefinitely (found
       in r10 when the r04/r05 solar rows sorted to positions 55+).

    Stable registration order within each group.
    """
    green_counts = dict.fromkeys(names, 0)
    last_green: dict[str, bool] = {}
    last_green_round = dict.fromkeys(names, -1)
    for rnd, path in enumerate(
        sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")))
    ):
        try:
            with open(path) as fh:
                seen = json.load(fh)
        except (OSError, ValueError):
            continue
        for n, row in seen.items():
            if n not in green_counts or not isinstance(row, dict):
                continue
            ok = _row_is_green(n, row)
            # rounds iterate in filename order, so this ends up holding
            # each query's MOST RECENT recorded status
            last_green[n] = ok
            if ok:
                green_counts[n] += 1
                last_green_round[n] = rnd
    order = {n: i for i, n in enumerate(names)}

    def group(n: str) -> int:
        # A query whose latest recorded row is non-green goes first —
        # including a regression after earlier green rounds; being green
        # once must not let a later mismatch rotate out of the window.
        if last_green.get(n) is False:
            return 0
        if green_counts[n] == 0:
            return 1
        if n in _TOUCHED_THIS_ROUND:
            return 2
        if n in _REVERIFY_THIS_ROUND:
            return 3
        return 4

    return sorted(
        names,
        key=lambda n: (group(n), last_green_round[n], green_counts[n], order[n]),
    )


# Queries whose plan or oracle changed since their last recorded green
# row (maintained per round): their old green records are stale, so they
# re-verify ahead of merely least-often-verified greens. r12
# optimization round: the families below had their executing plans
# restructured (SQL-text expression builders in the similarity
# operators, shared vocab/bigram count tables, the pointer-shortcut CC
# loop, cache size-guards, the events parallelism floor) — outputs
# proven identical against the DuckDB oracle at sf0.01, 259/259, before
# each commit; see OPTIMIZATION_r12.md.
_TOUCHED_THIS_ROUND: set[str] = {
    # ANN/similarity family — SQL-text expression construction
    "similarity_cosine_topk",
    "similarity_cosine_topk_vectorized",
    "similarity_lsh_topk",
    "neardup_embeddings",
    "similarity_ivf_topk",
    "similarity_ivf_trained_topk",
    "similarity_pq_topk",
    "kmeans_centroids",
    "ann_recall_at_k",
    "ann_recall_trained_vs_fixed",
    "ann_recall_pq_vs_ivf",
    "hard_negative_mining",
    "embedding_norm_outliers",
    "rrf_hybrid_retrieval",
    # CC family — pointer-shortcut batched-round label propagation +
    # budgeted edge cache
    "dedup_clusters",
    "cluster_aware_split",
    "dedup_cluster_size_histogram",
    "corpus_curation_pipeline",
    # unigram/bigram LM family — shared vocabulary & bigram count tables
    "doc_perplexity_proxy",
    "quality_filter_threshold_sweep",
    "quality_threshold_for_budget",
    "token_frequencies",
    "ccnet_perplexity_buckets",
    "bigram_lm_probs",
    "kneser_ney_bigram",
    "bigram_crossentropy_eval",
    "heaps_law_fit",
    # pair-table family — budgeted session caches
    "neardup_ngram_pairs",
    "neardup_minhash_pairs",
    "neardup_transitivity_audit",
    "cross_split_leakage_pairs",
    "cross_lingual_neardup_pairs",
    "minhash_jaccard_estimate",
    "similarity_pair_histogram",
    "decontam_ngram_overlap",
    "neardup_containment_pairs",
    # events floor restorations
    "events_json_stats",
    "events_variant_extract",
}

# Explicitly pinned re-verification cohort (cleared once recorded):
# empty in r11 — the r10 solar-flagship pinning was recorded green in
# CORRECTNESS_r10, and no family needs unit-pinning this round.
_REVERIFY_THIS_ROUND: set[str] = set()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: registry.QUERIES[n] for n in _rotated(list(registry.QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (where the op is
    SQL-expressible; approximate/streaming ops get the rows-only check)."""
    names = [n for n in _rotated(list(registry.QUERIES)) if n in registry.ORACLES]
    return {n: registry.ORACLES[n] for n in names}
