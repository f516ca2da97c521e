"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall seconds.

Queries execute via the noop sink (full plan execution, no driver-side
collect skew). Each query runs once, cold-ish (shared session, so JVM/JIT
warmup lands on the first query — ordering puts a tiny warmup first).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streams_example_spark import registry  # noqa: E402
from kafka_streams_example_spark.session import get_spark  # noqa: E402

# Every registered query is a headline query: the list tracks the
# registry so new tranches are benched the round they land (a static
# list silently under-measured the surface once — 193 vs 206).
HEADLINE = list(registry.QUERIES)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(app_name="kse-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup + Python/Arrow worker pool spin-up on trivial
    # plans, so the first queries aren't charged engine startup cost.
    spark.range(1000).selectExpr("sum(id)").collect()

    def _ident(it):
        yield from it

    spark.range(32).repartition(32).mapInPandas(_ident, "id LONG").count()

    # Three runs per query: the first pays one-time Catalyst planning +
    # whole-stage-codegen JIT (~0.5-3s per novel plan — real for a one-shot
    # query, pure noise for a resident engine). Steady-state = min of the
    # two post-warm runs, and the per-query run-to-run spread is recorded
    # so a machine-state delta can never masquerade as (or mask) a plan
    # regression in the committed record (VERDICT r03 "What's wrong" #1).
    # SWEEP ordering: run the whole surface once per pass (run1 = cold,
    # runs 2..n = steady candidates) instead of n back-to-back runs per
    # query. With 224 registered plans, back-to-back timing measures each
    # query at a POSITION-DEPENDENT JVM heat level — queries late in the
    # list ran 2-2.6x slower than the same plan in a freshly-warmed
    # session (winnowing_fingerprints 1.8s in-list vs 0.9s after a full
    # warm sweep; NOTES_r06 session 3). Sweeping measures every query at
    # the same fully-warmed heat, so per-query numbers stay comparable
    # across rounds as the surface grows. Same total executions.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # escape hatch for one-off cross-round comparisons against pre-r11
    # sweep3 records: disables the per-run pool warm-up and restores the
    # old protocol tag (and with it the worker-reaper lottery — see below)
    pool_warm = os.environ.get("SPARK_GRAFT_BENCH_NO_POOLWARM", "") != "1"
    # warm exactly one worker per task slot — sizing the warm-up to the
    # session's parallelism keeps its untimed cost ~50-80ms
    n_slots = int(cpus) if cpus.isdigit() else 32
    warm_df = spark.range(n_slots).repartition(n_slots)
    all_runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(n_runs):
        for name in HEADLINE:
            fn = registry.QUERIES[name]
            # Untimed Python-worker-pool re-warm before EVERY timed run:
            # Spark's PythonWorkerFactory reaps idle daemon workers after
            # a hardcoded ~1 minute (cleanupIdleWorkers), so in a
            # multi-minute sweep a query's Arrow stage pays a full pool
            # re-fork (~0.5-0.7s) iff the PREVIOUS Python stage ran >1 min
            # earlier — a wall-clock-position lottery that made
            # byte-identical plans swing 2.3x across rounds (the r08-r10
            # multimodal_decode_real adjudication; root-caused in
            # NOTES_r11 with a 75s-idle A/B). A resident engine's pool
            # does not idle out mid-pipeline, so warm-pool numbers are
            # the representative ones. No-op cost (~60-80ms, untimed) for
            # JVM-only queries; protocol tag bumped to sweep3w because
            # Python-stage numbers are not comparable with sweep3 records.
            if pool_warm:
                warm_df.mapInPandas(_ident, "id LONG").count()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            all_runs[name].append(time.perf_counter() - t0)
    # CACHE-NEUTRAL sweeps (r11 VERDICT "Next round" #2): ~20 registered
    # queries share session-level plan-equality caches (ANN winner sets,
    # solar A1, unigram-LM score table, CC edge list, …), so after sweep 1
    # their steady run times an InMemoryTableScan read, not the query.
    # These extra sweeps clear the SQL cache FIRST, so each one measures
    # one shared build (paid by the first consumer in registry order) plus
    # cache reads for the other consumers — the materialized-view
    # accounting a resident engine actually amortizes at, without letting
    # a cache built in a previous sweep hide the build cost entirely.
    # The steady sweeps above are untouched (same sweep3w semantics, so
    # per-query continuity with r11 records holds); cache_neutral is the
    # number to quote first in round-over-round comparisons.
    # Default 1 extra sweep: the cc number is a per-query accounting
    # signal, not the headline (cold already bounds it from above), and
    # the driver's bench window has to fit n_runs + cc_runs full sweeps.
    # Committed BENCH_DETAIL records use SPARK_GRAFT_BENCH_CC_RUNS=2.
    cc_runs = int(os.environ.get("SPARK_GRAFT_BENCH_CC_RUNS", "1"))
    cc_all: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(cc_runs):
        spark.catalog.clearCache()
        for name in HEADLINE:
            fn = registry.QUERIES[name]
            if pool_warm:
                warm_df.mapInPandas(_ident, "id LONG").count()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cc_all[name].append(time.perf_counter() - t0)
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    spread: dict[str, float] = {}
    cache_neutral: dict[str, float] = {}
    for name, runs in all_runs.items():
        steady_runs = runs[1:] if len(runs) > 1 else runs
        cold[name] = round(runs[0], 3)
        timings[name] = round(min(steady_runs), 3)
        spread[name] = round(max(steady_runs) - min(steady_runs), 3)
        if cc_all[name]:
            cache_neutral[name] = round(min(cc_all[name]), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full per-query map (steady + cold) goes to a file: the driver keeps
    # only a ~2KB tail of stdout, so the printed line must stay small or
    # BENCH_r{N}.json records parsed=null (round-1 failure mode). The
    # single stdout line carries totals + the slowest queries and fits the
    # tail whole; BENCH_DETAIL.json carries everything.
    # Protocol tag: per-query numbers are only comparable within the same
    # timing protocol (the r5 back-to-back -> r6 sweep change shifted the
    # per-query mean ~1.1x with zero plan changes; tools/compare_bench.py
    # refuses cross-protocol per-query diffs).
    protocol = f"sweep{n_runs}w" if pool_warm else f"sweep{n_runs}"  # w = per-run Python-worker-pool warm-up
    detail = {
        "metric": "headline_queries_total_wall_steady",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "cold": cold,
        "spread": spread,
        "cold_total": round(sum(cold.values()), 3),
        "n_queries": len(timings),
        "n_runs": n_runs,
        "protocol": protocol,
        "sf": sf_val,
    }
    if cache_neutral:
        # min over the clearCache'd sweeps — the cache-neutral signal;
        # kept under its own protocol tag so compare_bench.py's steady
        # diffs stay valid against pre-cc records (steady semantics are
        # untouched: cc sweeps run after every steady sweep finished).
        detail["cache_neutral"] = cache_neutral
        detail["cache_neutral_total"] = round(sum(cache_neutral.values()), 3)
        detail["cc_protocol"] = f"clearcache-sweep{cc_runs}w"
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:12])
    line_payload = {
        "metric": "headline_queries_total_wall_steady",
        "value": detail["value"],
        "unit": "sec",
        "queries": slowest,
        "cold_total": detail["cold_total"],
        "n_queries": len(timings),
        "protocol": protocol,
        "sf": sf_val,
        "detail": "BENCH_DETAIL.json",
    }
    if cache_neutral:
        line_payload["cache_neutral_total"] = detail["cache_neutral_total"]
    line = json.dumps(line_payload, separators=(",", ":"))
    # The driver records only a ~2KB tail of the run's output; the line
    # must survive that window whole or BENCH_r{N}.json gets parsed=null
    # (r06 failure mode — progress bars plus a long line cut the JSON).
    assert len(line) < 1900, f"bench stdout line too long: {len(line)}B"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
