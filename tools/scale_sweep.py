"""Scale sweep: time headline queries at sf0.1 vs a synthesized larger SF
(tools/make_sfN.py) and record per-query scaling exponents.

exponent = ln(t_big / t_small) / ln(factor); ~1.0 = linear in input
rows, <1 = sublinear (fixed overheads amortizing), >1 = superlinear
(the thing to investigate). Result row counts at both SFs are recorded
so pair-generating queries can be judged against their output growth.

Usage: python tools/scale_sweep.py [big_dir] [factor] [out_json]
                                   [--subset=q1,q2,...] [--merge-key=KEY]

--subset restricts the sweep to the named queries; --merge-key merges the
result into an EXISTING out_json instead of overwriting it — either into
a named sub-record (e.g. ``--merge-key=decade2`` for the sf3 second-decade
sweep of the cost-table top) or, with ``--merge-key=queries``, into the
main per-query map (same factor protocol, used to add newly registered
queries without re-timing the whole surface).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_example_spark import registry
from kafka_streams_example_spark.session import get_spark

SWEEP = [
    "q1_pricing_summary",
    "q9_product_profit",
    "grouping_sets_revenue",
    "text_quality_stats",
    "dedup_exact_docs",
    "winnowing_fingerprints",
    "pack_sequences_greedy",
    "neardup_minhash_pairs",
    "neardup_ngram_pairs",
    "neardup_simhash_pairs",
    "dedup_clusters",
    "minhash_jaccard_estimate",
    "similarity_cosine_topk",
    "kmeans_centroids",
    "semdedup_prune",
    # round-6 session-3 additions: the new operators with corpus-scale
    # stages, swept to pin their exponents before they meet real data
    "sorted_neighborhood_neardup",
    "bbit_minhash_estimate",
    "trigram_backoff_lm",
    "kneser_ney_bigram",
    "token_clustering_coefficient",
    "corpus_version_diff",
    "zorder_locality_report",
    "sessionized_attribution",
    "kaplan_meier_conversion",
    "er_merge_survivorship",
    # round-7 additions (VERDICT r06 item 4): the unswept heavy tail —
    # the two slowest iterative queries, the sketch queries whose audit
    # twins carry exact-aggregation cost, and the streaming batch-twins'
    # batch queries
    "dedup_cluster_size_histogram",
    "token_pagerank_centrality",
    "approx_distinct_users",
    "countmin_heavy_hitters",
    "theta_sketch_set_ops",
    "data_contract_validation",
    "psi_value_drift",
    # round-8 addition: the new exact-substring pass (stride-1 window
    # hashes; linear-in-corpus by construction, pinned by measurement)
    "substring_exact_spans",
    "substring_dedup_cut",
]


def time_queries(spark, sf_dir: str, n_runs: int = 3, sweep=None) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for name in sweep or SWEEP:
        fn = registry.QUERIES[name]
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        rows = fn(spark, sf_dir).count()
        steady = min(runs[1:]) if len(runs) > 1 else runs[0]
        out[name] = {"steady": round(steady, 3), "cold": round(runs[0], 3), "rows": rows}
        print(f"  {name}: steady={steady:.3f}s rows={rows}", flush=True)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--")
    )
    big_dir = args[0] if len(args) > 0 else "/tmp/spark_graft_sf1"
    factor = float(args[1]) if len(args) > 1 else 10.0
    out_json = args[2] if len(args) > 2 else "SCALE_SWEEP.json"
    sweep = opts["subset"].split(",") if "subset" in opts else list(SWEEP)
    merge_key = opts.get("merge-key")
    spark = get_spark(app_name="scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    print("== sf0.1 ==", flush=True)
    small = time_queries(spark, "/root/testdata/sf0.1", sweep=sweep)
    print(f"== big ({big_dir}, x{factor}) ==", flush=True)
    big = time_queries(spark, big_dir, sweep=sweep)
    report = {}
    for name in sweep:
        ts, tb = small[name]["steady"], big[name]["steady"]
        exp = math.log(max(tb, 1e-3) / max(ts, 1e-3)) / math.log(factor)
        report[name] = {
            "t_small": ts,
            "t_big": tb,
            "ratio": round(tb / max(ts, 1e-3), 2),
            "exponent": round(exp, 3),
            "rows_small": small[name]["rows"],
            "rows_big": big[name]["rows"],
            "rows_ratio": round(big[name]["rows"] / max(small[name]["rows"], 1), 2),
        }
        print(
            f"{name}: {ts:.2f}s -> {tb:.2f}s ratio={report[name]['ratio']} "
            f"exp={report[name]['exponent']} rows x{report[name]['rows_ratio']}",
            flush=True,
        )
    if merge_key:
        # --merge-key against a missing out_json must NOT fall through to
        # the top-level overwrite (that would mislabel a decade sweep as
        # the main sf1 map); merging into an empty doc nests the report
        # under merge_key exactly as it would into an existing file.
        if os.path.exists(out_json):
            with open(out_json) as fh:
                doc = json.load(fh)
        elif merge_key == "queries":
            raise SystemExit(
                f"--merge-key=queries requires an existing {out_json} "
                "(the main map's factor protocol is unknown otherwise)"
            )
        else:
            doc = {}
        merge_report(doc, report, merge_key, factor, big_dir)
    else:
        doc = {"factor": factor, "queries": report}
    with open(out_json, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    spark.stop()


def merge_report(
    doc: dict, report: dict, merge_key: str, factor: float, big_dir: str
) -> None:
    """Merge a (possibly subset) sweep into an existing SCALE_SWEEP doc
    in place: extend the main map or a decade sub-record, never clobber
    one, and never mix factors within a record."""
    if merge_key == "queries":
        assert doc.get("factor") == factor, (
            "merging into the main map requires the same factor protocol"
        )
        doc["queries"].update(report)
    elif merge_key in doc:
        assert doc[merge_key].get("factor") == factor, (
            "extending an existing decade record requires its factor"
        )
        doc[merge_key]["queries"].update(report)
    else:
        doc[merge_key] = {
            "factor": factor,
            "big_dir": big_dir,
            "queries": report,
        }


if __name__ == "__main__":
    main()
