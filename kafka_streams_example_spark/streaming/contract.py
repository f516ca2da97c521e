"""Streaming ingest contract gate — the data-contract validation suite
(queries/operational.py:data_contract_validation) as a standing Structured
Streaming program. Violation counts are plain sums, so they aggregate
incrementally in update mode and the cumulative stream state always
equals the batch suite run over the union of everything ingested —
exactly the "run the contract per ingest batch, merge counts as sums"
scale story SCALE.md §14 claims, here proven by the batch/stream parity
test.

FK integrity uses a stream-static join against the parent dimension
(Spark re-plans the static side per micro-batch, so a slowly-changing
parent is picked up without restarting the query).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Shared commit-state machinery for standing ingest jobs (exact-fp dedup and
# MinHash-band near-dup below): an append-only parquet index extended per
# micro-batch, running counters in alternating parquet generation slots, and
# a committed.json high-watermark renamed into place AFTER a batch's writes
# land — the exactly-once foreachBatch recipe, factored once.
# ---------------------------------------------------------------------------


def _load_commit_state(root: str) -> dict:
    """Resume a standing job's durable commit state: generation + last
    committed batch id from committed.json (``resumed`` False means a
    fresh state_dir whose index seed still needs writing)."""
    state = {"gen": 0, "last": -1, "resumed": False}
    marker = os.path.join(root, "committed.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            m = json.load(fh)
        state.update(gen=m["gen"], last=m["batch_id"], resumed=True)
    return state


def _is_replay(state: dict, root: str, batch_id: int) -> bool:
    """True when ``batch_id`` IS the committed watermark — a
    same-checkpoint crash replay whose writes are already durable
    (re-publish, skip re-merging). A batch id STRICTLY below the
    watermark is impossible under same-checkpoint replay semantics
    (Spark re-delivers at most the last batch its own commit log hasn't
    sealed, never earlier ones), so it proves the query was restarted
    with a fresh/rewound checkpoint against this ``state_dir``; silently
    treating those as replays would drop every future batch while the
    job looks healthy — fail loudly instead."""
    if batch_id < state["last"]:
        raise RuntimeError(
            f"ingest state at {root!r} has committed batch "
            f"{state['last']} but received batch {batch_id}: the "
            "streaming checkpoint was reset/rewound while state_dir "
            "was kept. Resume from the original checkpoint, or point "
            "the restarted query at a fresh state_dir."
        )
    return batch_id == state["last"]


def _commit_marker(root: str, state: dict, batch_id: int) -> None:
    """Atomic commit: the batch's totals + index writes are durable, now
    advance the high-watermark (tmp + rename)."""
    marker = os.path.join(root, "committed.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"gen": state["gen"] + 1, "batch_id": batch_id}, fh)
    os.replace(tmp, marker)
    state["gen"] += 1
    state["last"] = batch_id


def _merge_running_totals(
    owner: SparkSession,
    prev_path: str | None,
    batch_counts: DataFrame,
    sum_cols: list[str],
) -> DataFrame:
    """Fold a batch's per-lang counters into the previous generation's
    running totals (full-outer on lang, counters merge as sums)."""
    if prev_path is None:
        return batch_counts
    prev = owner.read.parquet(prev_path)
    c, d = prev.alias("c"), batch_counts.alias("d")
    return c.join(d, F.col("c.lang") == F.col("d.lang"), "full_outer").select(
        F.coalesce("d.lang", "c.lang").alias("lang"),
        *[
            (F.coalesce(f"d.{col}", F.lit(0)) + F.coalesce(f"c.{col}", F.lit(0))).alias(col)
            for col in sum_cols
        ],
    )


def streaming_contract_gate(orders_stream: DataFrame, customer: DataFrame) -> DataFrame:
    """Cumulative contract-violation counters over an orders stream:
    one output row per check with running (n_rows, n_violations) —
    update mode emits refreshed counters each micro-batch.

    Checks mirror the batch suite's orders rows: FK orders→customer
    (stream-static left join), enum domain on o_orderstatus, and the
    o_totalprice positivity range check. (PK uniqueness needs
    cross-batch distinct state and belongs to the dedup tier —
    dedup_stream_within_watermark — not a counter gate.)"""
    probed = orders_stream.join(
        F.broadcast(customer.select("c_custkey")),
        orders_stream["o_custkey"] == customer["c_custkey"],
        "left",
    )
    checks = probed.select(
        F.col("c_custkey").isNull().cast("long").alias("fk_orders_customer"),
        (
            ~F.col("o_orderstatus").isin("O", "F", "P")
            | F.col("o_orderstatus").isNull()
        )
        .cast("long")
        .alias("enum_orderstatus"),
        (F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0.0))
        .cast("long")
        .alias("range_totalprice_positive"),
    )
    stacked = checks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check_name"),
                        F.col(name).alias("v"),
                    )
                    for name in (
                        "fk_orders_customer",
                        "enum_orderstatus",
                        "range_totalprice_positive",
                    )
                ]
            )
        ).alias("c")
    ).select("c.check_name", "c.v")
    return stacked.groupBy("check_name").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("v").cast("long").alias("n_violations"),
    )


def streaming_psi_monitor(
    events_stream: DataFrame,
    reference_cells: DataFrame,
    state_dir: str | None = None,
) -> tuple[DataFrame, "callable"]:
    """The PSI drift monitor (queries/operational.py:psi_value_drift) as a
    standing stream: the reference window is a STATIC per-(type, bin)
    count table (computed once, never rescanned); the current window is
    the stream's cumulative (type, bin) counts in update mode. Returns
    the aggregated cell stream plus a foreachBatch function that joins
    the refreshed cells against the broadcast reference grid and
    publishes the per-type PSI to a ``psi_live`` view backed by a real
    parquet table under ``state_dir`` — the alerting surface a monitor
    would publish. The running cell table is likewise published as
    ``psi_cells``; both views are registered on the session the monitor
    was BUILT on (foreachBatch runs under a cloned session whose temp
    views the caller cannot see).

    This is the incremental shape SCALE.md §14 describes: cell counts
    merge as sums, so the monitor's per-batch work is the micro-batch
    aggregation + a bins×types-sized PSI evaluation.

    Concurrency note (holds for every published view here and in
    ``streaming_ingest_dedup``): the views are lazy scans of the
    alternating generation slot most recently committed, and a slot is
    overwritten two generations later. A reader that captures a view's
    plan and executes it concurrently with that overwrite (i.e. holds a
    stale plan across >= 2 micro-batches) can transiently fail on
    missing files. The published views are a same-session alerting
    surface — query them afresh per read (plans resolved at read time
    always see the committed slot); an EXTERNAL multi-reader surface
    should instead read the committed marker and scan the named slot,
    or publish to append-only storage."""
    from kafka_streams_example_spark.queries.operational import (
        _PSI_ALERT,
        _PSI_BIN_WIDTH,
        _PSI_BINS,
        _PSI_EPS,
    )

    cells = (
        events_stream.select(
            "event_type",
            F.least(
                F.floor(F.col("value") / _PSI_BIN_WIDTH).cast("long"),
                F.lit(_PSI_BINS - 1),
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("na"))
    )
    ref = reference_cells.withColumnRenamed("c", "nb")

    # Standing-monitor state is a REAL table, not a per-batch cache chain
    # (ADVICE r06: the old cache()-per-batch design grew one FULL OUTER
    # JOIN deeper per micro-batch, pinned every generation in storage, and
    # probed the catalog with a full listTables() per batch). Each batch
    # writes the merged (type, bin) counts to an alternating parquet
    # generation path — lineage depth stays O(1) forever, old state is
    # deleted by the next overwrite of that slot, nothing depends on the
    # engine-owned batch_df staying valid, and the published state would
    # survive a driver restart if state_dir is durable. Views are
    # registered through the OWNER session (the one the monitor was built
    # on): foreachBatch hands the function a CLONED session, and temp
    # views created there are invisible to the caller.
    import os
    import tempfile

    owner = reference_cells.sparkSession
    gen_root = state_dir or tempfile.mkdtemp(prefix="psi_monitor_state_")
    state: dict[str, object] = {"cells": None, "gen": 0}
    # restart resume: the durable slots are only useful if a rebuilt
    # monitor actually RELOADS them — the commit marker names the newest
    # generation, so a restarted query continues its running cell counts
    # instead of starting from zero. (Replay of the last micro-batch is
    # already idempotent: update-mode deltas REPLACE per-cell counts, so
    # re-merging identical deltas lands on identical cells.)
    import json as _json

    _marker = os.path.join(gen_root, "committed.json")
    if os.path.exists(_marker):
        with open(_marker) as _fh:
            _gen = _json.load(_fh)["gen"]
        state["cells"] = owner.read.parquet(
            os.path.join(gen_root, f"cells_gen{(_gen - 1) % 2}")
        )
        state["gen"] = _gen

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        # Spark 4 validates that foreachBatch consumes EVERY partition of
        # a stateful batch (state-store commit tracking) — materialize
        # fully before any lazy/partial use of the delta.
        batch_df.persist()
        batch_df.count()
        # update-mode batches carry only CHANGED cells; merge into the
        # running picture (newer counts replace older for the same cell)
        prev: DataFrame | None = state["cells"]  # type: ignore[assignment]
        if prev is None:
            merged = batch_df
        else:
            c, d = prev.alias("c"), batch_df.alias("d")
            merged = c.join(
                d,
                (F.col("c.event_type") == F.col("d.event_type"))
                & (F.col("c.bin") == F.col("d.bin")),
                "full_outer",
            ).select(
                F.coalesce("d.event_type", "c.event_type").alias("event_type"),
                F.coalesce("d.bin", "c.bin").alias("bin"),
                F.coalesce("d.na", "c.na").alias("na"),
            )
        # alternate between two generation slots so the slot being written
        # is never the slot the previous generation is read from
        gen = int(state["gen"])  # type: ignore[arg-type]
        path = os.path.join(gen_root, f"cells_gen{gen % 2}")
        merged.write.mode("overwrite").parquet(path)
        batch_df.unpersist()
        cells_now = owner.read.parquet(path)
        state["cells"] = cells_now
        state["gen"] = gen + 1
        cells_now.createOrReplaceTempView("psi_cells")
        denom = float(_PSI_EPS * _PSI_BINS)
        types = ref.select("event_type").distinct()
        grid = (
            types.join(
                F.broadcast(
                    owner.range(_PSI_BINS).select(F.col("id").alias("bin"))
                )
            )
            .join(ref, ["event_type", "bin"], "left")
            .join(cells_now, ["event_type", "bin"], "left")
            .fillna(0, subset=["nb", "na"])
        )
        from pyspark.sql import Window as W

        wt = W.partitionBy("event_type")
        p = (F.col("nb") + _PSI_EPS) / (F.sum("nb").over(wt) + denom)
        q = (F.col("na") + _PSI_EPS) / (F.sum("na").over(wt) + denom)
        psi = F.round(F.sum((p - q) * F.log(p / q)).over(wt), 6)
        out = grid.select(
            "event_type", psi.alias("psi"), (psi > _PSI_ALERT).alias("drifted")
        ).distinct()
        live_path = os.path.join(gen_root, f"live_gen{gen % 2}")
        out.write.mode("overwrite").parquet(live_path)
        owner.read.parquet(live_path).createOrReplaceTempView("psi_live")
        # commit marker last (tmp + rename): a rebuilt monitor resumes
        # from the newest fully-written generation
        _tmp = _marker + ".tmp"
        with open(_tmp, "w") as _fh:
            _json.dump({"gen": gen + 1}, _fh)
        os.replace(_tmp, _marker)

    return cells, publish


def streaming_shard_manifest(docs_stream: DataFrame) -> DataFrame:
    """The reproducible shard manifest (queries/operational.py:shard_manifest)
    as a streaming accumulator: because the content checksum is a
    COMMUTATIVE mod-sum, it aggregates incrementally in update mode and
    the cumulative stream state equals the batch manifest over
    everything ingested — regardless of arrival order, micro-batch
    boundaries or shuffle placement. This is the manifest an ingest
    pipeline publishes continuously so any training run can pin the
    corpus version without a batch rescan; the batch/stream parity test
    delivers the fixture out of order and still matches exactly.

    Expects columns: doc_id LONG, text STRING, n_chars LONG. The wide
    sum runs in DECIMAL(38,0) before the final modulus (fingerprints
    are < 2^60; a long sum would wrap)."""
    from kafka_streams_example_spark.functions.hashing import (
        normalize_text,
        stable_long,
    )
    from kafka_streams_example_spark import registry  # noqa: F401 — query
    # modules bootstrap through the registry; importing queries.operational
    # directly before registry loads would hit a partial ORACLES table
    from kafka_streams_example_spark.queries.operational import _MAN_MOD, _MAN_SHARDS

    t = docs_stream.select(
        (stable_long(F.col("doc_id").cast("string")) % _MAN_SHARDS).alias(
            "shard"
        ),
        "n_chars",
        stable_long(normalize_text(F.col("text"))).alias("fph"),
    )
    return t.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        (F.sum(F.col("fph").cast("decimal(38,0)")) % _MAN_MOD)
        .cast("long")
        .alias("content_checksum"),
    )


def streaming_ingest_dedup(
    docs_stream: DataFrame,
    index_seed: DataFrame,
    state_dir: str | None = None,
) -> tuple[DataFrame, "callable"]:
    """Incremental ingest dedup (queries/dedup.py:incremental_ingest_dedup)
    as a STANDING job — operationally the most important continuous dedup
    shape: each arriving micro-batch of documents probes the persisted
    corpus fingerprint index, is classified duplicate-vs-new per language,
    and the batch's NOVEL fingerprints join the index so later batches
    dedup against everything already ingested.

    Returns ``(stream_df, publish)``: attach ``publish`` via foreachBatch
    in append mode (batches are raw incoming docs with columns
    ``doc_id, lang, text``).

    State (all under ``state_dir``; a restarted query resuming from the
    SAME checkpoint continues exactly where it left off):

    - ``fp_index/batch=<id>/``: APPEND-ONLY parquet fingerprint index,
      partitioned by the micro-batch that contributed each fingerprint
      (seed = ``batch=-1``); each batch writes one O(batch)-sized
      partition holding only its novel fingerprints — never a rewrite of
      the index (the PSI monitor's alternating-overwrite slots would be
      O(index) write amplification per batch here; production compacts
      small files periodically, which is an offline concern).
    - ``totals_gen{0,1}/``: running per-lang counters in two alternating
      parquet generation slots (counters merge as sums, so the cumulative
      state is exact regardless of batch boundaries).
    - ``committed.json``: the commit high-watermark (generation +
      batch_id), renamed into place AFTER a batch's writes land.

    Counters are EXACTLY-ONCE under crash-replay (the documented
    foreachBatch idempotence recipe): a replayed ``batch_id`` AT the
    high-watermark re-publishes and returns without re-merging (a batch
    id strictly below it proves a reset/rewound checkpoint reusing this
    ``state_dir`` — batch ids would restart at 0 and every batch would
    silently classify as a replay — so publish raises instead); the
    index write goes to the deterministic ``batch=<id>`` partition with
    overwrite, so a replay rewrites the same files; and the probe filters
    ``batch < batch_id`` (partition-pruned), so a crashed attempt's own
    half-written partition can never flip its replay's classifications.

    Plan depth stays O(1) forever: every batch's work is one parquet scan
    of the index + the batch join + two bounded writes — no join chain,
    no pinned cache generations, nothing retains the engine-owned
    ``batch_df`` past its batch. The published ``ingest_dedup_totals``
    view (registered on the OWNER session — foreachBatch runs under a
    cloned session) is a lineage-free parquet scan; see
    ``streaming_psi_monitor`` for the shared single-reader concurrency
    note on generation-slot views.
    """
    import tempfile

    from kafka_streams_example_spark.functions.hashing import fingerprint_md5

    owner = index_seed.sparkSession
    root = state_dir or tempfile.mkdtemp(prefix="ingest_dedup_state_")
    idx_dir = os.path.join(root, "fp_index")
    # resume from durable state: the marker is the commit high-watermark
    # (written atomically AFTER a batch's totals + index writes land), so
    # a restarted query continues its counters instead of wiping them
    state = _load_commit_state(root)
    if not state["resumed"]:
        # seed partition: batch=-1, so the batch<batch_id probe filter
        # always includes it
        index_seed.select(
            fingerprint_md5(F.col("text")).alias("fp")
        ).distinct().write.mode("overwrite").parquet(
            os.path.join(idx_dir, "batch=-1")
        )

    def _republish() -> None:
        if state["gen"] > 0:
            committed = os.path.join(
                root, f"totals_gen{(state['gen'] - 1) % 2}"
            )
            owner.read.parquet(committed).createOrReplaceTempView(
                "ingest_dedup_totals"
            )

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        # Spark 4 validates that foreachBatch consumes EVERY partition of
        # the batch — materialize fully before partial/lazy use.
        batch_df.persist()
        batch_df.count()
        # Exactly-once counters under crash-replay (the documented
        # foreachBatch idempotence recipe): a replayed batch_id AT the
        # commit high-watermark is a no-op re-publish; one BELOW it
        # proves a rewound checkpoint and raises (see _is_replay).
        try:
            replay = _is_replay(state, root, batch_id)
        except RuntimeError:
            batch_df.unpersist()
            raise
        if replay:
            batch_df.unpersist()
            _republish()
            return
        # The probe reads only index partitions from STRICTLY EARLIER
        # batches (partition-pruned) — a crashed attempt's own half-written
        # batch=<id> partition can never flip its replay's classifications.
        index = (
            owner.read.parquet(idx_dir)
            .filter(F.col("batch") < batch_id)
            .select("fp")
            .withColumn("hit", F.lit(1))
        )
        probed = (
            batch_df.select(
                "lang", fingerprint_md5(F.col("text")).alias("fp")
            )
            .join(index, "fp", "left")
        )
        batch_counts = probed.groupBy("lang").agg(
            F.count("*").alias("n_incoming"),
            F.count(F.when(F.col("hit").isNotNull(), 1)).alias("n_dup_vs_index"),
            F.count(F.when(F.col("hit").isNull(), 1)).alias("n_new"),
        )
        gen = state["gen"]
        merged = _merge_running_totals(
            owner,
            None if gen == 0 else os.path.join(root, f"totals_gen{(gen - 1) % 2}"),
            batch_counts,
            ["n_incoming", "n_dup_vs_index", "n_new"],
        )
        # totals write runs BEFORE the index append so its index scan sees
        # the pre-batch snapshot (probe-then-extend semantics: a batch's
        # own fingerprints never count as index hits for that batch).
        totals_path = os.path.join(root, f"totals_gen{gen % 2}")
        merged.write.mode("overwrite").parquet(totals_path)
        # novel fingerprints: distinct within the batch, absent from the
        # index snapshot — written to the DETERMINISTIC partition
        # batch=<id> with overwrite, so a crash-replay rewrites the same
        # files instead of appending duplicates (idempotent), and the
        # probe's batch<id filter partition-prunes the scan.
        new_fps = probed.filter(F.col("hit").isNull()).select("fp").distinct()
        new_fps.write.mode("overwrite").parquet(
            os.path.join(idx_dir, f"batch={batch_id}")
        )
        batch_df.unpersist()
        _commit_marker(root, state, batch_id)
        owner.read.parquet(totals_path).createOrReplaceTempView(
            "ingest_dedup_totals"
        )

    return docs_stream, publish


def streaming_ingest_neardup(
    docs_stream: DataFrame,
    index_seed: DataFrame,
    state_dir: str | None = None,
    ngram: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> tuple[DataFrame, "callable"]:
    """NEAR-duplicate ingest dedup as a STANDING job — the fuzzy twin of
    ``streaming_ingest_dedup``: each arriving micro-batch of documents is
    MinHash-signed and LSH-banded (the batch machinery of
    operators/dedup.py:minhash_pairs, same shingling/signature/band
    constants as queries/dedup.py:neardup_minhash_pairs), probes the
    persisted BAND-HASH index for any band collision with an
    already-ingested document, is classified near-dup-vs-new per
    language, and the batch's NOVEL documents' band hashes join the
    index so later batches fuzzy-dedup against everything already
    ingested.

    Classification is at LSH-candidate granularity — a shared band is
    the standard high-recall ingest gate (two docs with Jaccard s
    collide on some band with prob 1-(1-s^r)^b); the exact-Jaccard
    verify tier stays a batch job over the flagged pairs because it
    needs shingle sets, which never enter this index. Documents too
    short to shingle (< ngram tokens) carry no band hashes and classify
    as new.

    State layout, exactly-once counters, replay/rewind handling, restart
    resume, O(1) plan depth, and the published-view concurrency caveat
    are all shared with ``streaming_ingest_dedup`` (same commit-state
    machinery above); differences only:

    - ``band_index/batch=<id>/``: APPEND-ONLY parquet of DISTINCT
      (band, bhash) rows contributed by each batch's novel docs (seed =
      ``batch=-1``). Only 16-byte band hashes persist — never text,
      shingles, or signatures — so the index is a few dozen bytes per
      ingested doc and the probe join's key cardinality grows with the
      corpus (unskewed).
    - probe-then-extend semantics match the exact twin: a batch probes
      the strictly-earlier index only, so within-batch near-dups do not
      count (they are the batch minhash_pairs job's concern).
    - the published view is ``ingest_neardup_totals`` with counters
      (lang, n_incoming, n_neardup_vs_index, n_new).
    """
    import tempfile

    from kafka_streams_example_spark.operators.dedup import (
        hashed_shingles,
        minhash_band_hashes,
        minhash_signature,
    )
    from kafka_streams_example_spark.operators.text import word_ngrams

    owner = index_seed.sparkSession
    root = state_dir or tempfile.mkdtemp(prefix="ingest_neardup_state_")
    idx_dir = os.path.join(root, "band_index")

    def _bands_of(df: DataFrame) -> DataFrame:
        """(doc_id, text, ...) → exploded (id, band, bhash); docs too
        short to shingle drop out here (no bands → classified new)."""
        signed = (
            df.select(F.col("doc_id").alias("id"), F.col("text").alias("txt"))
            .withColumn("shingles", word_ngrams(F.col("txt"), ngram))
            .drop("txt")
            .filter(F.size("shingles") > 0)
            .withColumn("hsh", F.array_distinct(hashed_shingles(F.col("shingles"))))
            .drop("shingles")
            .withColumn("sig", minhash_signature(F.col("hsh"), num_hashes, seed))
        )
        return minhash_band_hashes(signed, num_hashes=num_hashes, bands=bands)

    state = _load_commit_state(root)
    if not state["resumed"]:
        _bands_of(index_seed).select("band", "bhash").distinct().write.mode(
            "overwrite"
        ).parquet(os.path.join(idx_dir, "batch=-1"))

    def _republish() -> None:
        if state["gen"] > 0:
            committed = os.path.join(root, f"totals_gen{(state['gen'] - 1) % 2}")
            owner.read.parquet(committed).createOrReplaceTempView(
                "ingest_neardup_totals"
            )

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        # Spark 4 validates that foreachBatch consumes EVERY partition —
        # materialize fully before partial/lazy use.
        batch_df.persist()
        batch_df.count()
        try:
            replay = _is_replay(state, root, batch_id)
        except RuntimeError:
            batch_df.unpersist()
            raise
        if replay:
            batch_df.unpersist()
            _republish()
            return
        # probe: any band collision against STRICTLY EARLIER batches'
        # novel docs (partition-pruned; a crashed attempt's half-written
        # batch=<id> partition can never flip its replay's classes)
        index = (
            owner.read.parquet(idx_dir)
            .filter(F.col("batch") < batch_id)
            .select("band", "bhash")
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        batch_bands = _bands_of(batch_df)
        hit_ids = (
            batch_bands.join(index, ["band", "bhash"])
            .select("id")
            .distinct()
            .withColumn("dup", F.lit(1))
        )
        probed = batch_df.select(F.col("doc_id").alias("id"), "lang").join(
            hit_ids, "id", "left"
        )
        batch_counts = probed.groupBy("lang").agg(
            F.count("*").alias("n_incoming"),
            F.count(F.when(F.col("dup").isNotNull(), 1)).alias(
                "n_neardup_vs_index"
            ),
            F.count(F.when(F.col("dup").isNull(), 1)).alias("n_new"),
        )
        gen = state["gen"]
        merged = _merge_running_totals(
            owner,
            None if gen == 0 else os.path.join(root, f"totals_gen{(gen - 1) % 2}"),
            batch_counts,
            ["n_incoming", "n_neardup_vs_index", "n_new"],
        )
        # totals before index append: probe-then-extend (a batch's own
        # bands never count as hits for that batch)
        totals_path = os.path.join(root, f"totals_gen{gen % 2}")
        merged.write.mode("overwrite").parquet(totals_path)
        # novel docs' band hashes extend the index — DETERMINISTIC
        # batch=<id> partition with overwrite, so a crash-replay rewrites
        # the same files (idempotent)
        new_bands = (
            batch_bands.join(hit_ids, "id", "left_anti")
            .select("band", "bhash")
            .distinct()
        )
        new_bands.write.mode("overwrite").parquet(
            os.path.join(idx_dir, f"batch={batch_id}")
        )
        batch_df.unpersist()
        _commit_marker(root, state, batch_id)
        owner.read.parquet(totals_path).createOrReplaceTempView(
            "ingest_neardup_totals"
        )

    return docs_stream, publish


# Static bench-index rows above which the decontam gate's per-batch probe
# stops broadcasting the index (8-byte hashes; 32M rows ~ 256 MB on the
# wire — the same safety rationale as queries/dedup.py's
# _BENCH_BCAST_MAX_BYTES guard).
_BENCH_IDX_BCAST_MAX_ROWS = 32_000_000


def _parquet_dir_rows(path: str) -> float:
    """Row count of a parquet directory from FOOTER metadata — driver-side,
    zero jobs. Unknown/unreadable reads as +inf so callers treat it as too
    big to broadcast (the safe direction)."""
    import glob as _glob

    import pyarrow.parquet as _pq

    try:
        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            return float("inf")
        return float(sum(_pq.ParquetFile(f).metadata.num_rows for f in files))
    except Exception:
        return float("inf")


def streaming_decontam_gate(
    docs_stream: DataFrame,
    bench_seed: DataFrame,
    state_dir: str | None = None,
    ngram: int = 5,
) -> tuple[DataFrame, "callable"]:
    """Benchmark decontamination as a STANDING ingest gate — the streaming
    twin of ``queries/dedup.py:decontam_ngram_overlap``: each arriving
    micro-batch of documents probes a STATIC eval-set n-gram index, is
    classified contaminated-vs-clean per language, and contaminated doc
    ids land in an append-only quarantine the packing stage excludes —
    so benchmark text is stopped at ingest instead of being discovered in
    a post-hoc sweep over the accumulated corpus.

    Differences from the two ingest-dedup twins (same commit-state
    machinery, exactly-once counters, replay/rewind handling, restart
    resume, O(1) plan depth):

    - the probe index is STATIC: ``bench_ngrams/`` is written ONCE from
      the eval corpus at state-dir creation (distinct 64-bit xxhash64
      gram hashes — never benchmark text). Real held-out sets are small
      enough to broadcast, which makes the per-batch probe a map-side
      join — but the broadcast is SIZE-GUARDED by the index's parquet
      footer row count (_parquet_dir_rows vs _BENCH_IDX_BCAST_MAX_ROWS),
      so an oversized seed degrades to a shuffle join, never an OOM.
      There is no extend step — ingested documents must never widen the
      blocklist.
    - ``quarantine/batch=<id>/``: APPEND-ONLY parquet of
      (doc_id, n_overlap) for the batch's contaminated docs — the
      actionable exclusion list, partitioned by contributing batch with
      deterministic overwrite (crash-replay rewrites the same files).
    - the published view is ``decontam_totals`` with per-lang counters
      (lang, n_incoming, n_contaminated, n_clean, n_overlap_grams).

    Gram granularity is the 64-bit hash, not the string: a false
    collision (~n*m*2^-64) can only OVER-count contamination — the safe
    direction for a gate — and the index stays 8 bytes per distinct
    eval gram. Docs shorter than ``ngram`` tokens carry no grams and
    classify clean, matching the batch query's explode_outer semantics.
    """
    import tempfile

    from kafka_streams_example_spark.operators.text import word_ngrams

    owner = bench_seed.sparkSession
    root = state_dir or tempfile.mkdtemp(prefix="decontam_state_")
    idx_path = os.path.join(root, "bench_ngrams")

    def _grams_of(df: DataFrame) -> DataFrame:
        """(doc_id, text, ...) → exploded DISTINCT (id, gh) gram hashes."""
        return (
            df.select(F.col("doc_id").alias("id"), F.col("text").alias("txt"))
            .select("id", F.explode(word_ngrams(F.col("txt"), ngram)).alias("g"))
            .select("id", F.xxhash64("g").alias("gh"))
            .distinct()
        )

    state = _load_commit_state(root)
    if not state["resumed"]:
        _grams_of(bench_seed).select("gh").distinct().write.mode(
            "overwrite"
        ).parquet(idx_path)

    def _republish() -> None:
        if state["gen"] > 0:
            committed = os.path.join(root, f"totals_gen{(state['gen'] - 1) % 2}")
            owner.read.parquet(committed).createOrReplaceTempView(
                "decontam_totals"
            )

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        # Spark 4 validates that foreachBatch consumes EVERY partition —
        # materialize fully before partial/lazy use.
        batch_df.persist()
        batch_df.count()
        try:
            replay = _is_replay(state, root, batch_id)
        except RuntimeError:
            batch_df.unpersist()
            raise
        if replay:
            batch_df.unpersist()
            _republish()
            return
        bench = owner.read.parquet(idx_path).withColumn("hit", F.lit(1))
        if _parquet_dir_rows(idx_path) <= _BENCH_IDX_BCAST_MAX_ROWS:
            # real eval suites are MBs of gram hashes — broadcast; an
            # oversized (or unreadable, rows = +inf) seed degrades to a
            # shuffle join instead of OOMing every executor
            bench = F.broadcast(bench)
        overlaps = (
            _grams_of(batch_df)
            .join(bench, "gh", "left")
            .groupBy("id")
            .agg(F.count("hit").alias("n_overlap"))
        )
        probed = batch_df.select(F.col("doc_id").alias("id"), "lang").join(
            overlaps, "id", "left"
        ).select(
            "id", "lang", F.coalesce("n_overlap", F.lit(0)).alias("n_overlap")
        )
        batch_counts = probed.groupBy("lang").agg(
            F.count("*").alias("n_incoming"),
            F.count(F.when(F.col("n_overlap") > 0, 1)).alias("n_contaminated"),
            F.count(F.when(F.col("n_overlap") == 0, 1)).alias("n_clean"),
            F.sum("n_overlap").alias("n_overlap_grams"),
        )
        gen = state["gen"]
        merged = _merge_running_totals(
            owner,
            None if gen == 0 else os.path.join(root, f"totals_gen{(gen - 1) % 2}"),
            batch_counts,
            ["n_incoming", "n_contaminated", "n_clean", "n_overlap_grams"],
        )
        totals_path = os.path.join(root, f"totals_gen{gen % 2}")
        merged.write.mode("overwrite").parquet(totals_path)
        # quarantine the batch's contaminated ids — DETERMINISTIC
        # batch=<id> partition with overwrite (idempotent under replay)
        probed.filter(F.col("n_overlap") > 0).select(
            F.col("id").alias("doc_id"), "n_overlap"
        ).write.mode("overwrite").parquet(
            os.path.join(root, f"quarantine/batch={batch_id}")
        )
        batch_df.unpersist()
        _commit_marker(root, state, batch_id)
        owner.read.parquet(totals_path).createOrReplaceTempView(
            "decontam_totals"
        )

    return docs_stream, publish


def compact_ingest_index(
    owner: SparkSession, state_dir: str, index_name: str = "fp_index"
) -> dict:
    """Offline small-file maintenance for the standing ingest twins'
    APPEND-ONLY parquet indexes (``fp_index`` for the exact twin,
    ``band_index`` for the near-dup twin): fold every committed
    ``batch=<id>`` partition into ONE consolidated partition, so a job
    that has ingested tens of thousands of micro-batches probes one
    well-sized partition instead of tens of thousands of small files.
    The per-batch publish path deliberately never does this (it would be
    O(index) write amplification per batch — see streaming_ingest_dedup);
    this is the periodic offline pass those docstrings defer to.

    Contract: run ONLY while the standing job is quiesced (stopped or
    between batches — the publishers and this function share no locks).
    Probe semantics are preserved exactly: the consolidated partition id
    is ``min(existing ids) - 1`` (strictly below every possible future
    batch id, so the publishers' ``batch < batch_id`` partition-pruned
    probe always includes it), only partitions AT OR BELOW the committed
    high-watermark are absorbed (a crashed attempt's half-written
    ``batch=watermark+1`` partition is left alone for its replay to
    overwrite), and rows pass through ``distinct()`` — preserving the
    global distinctness invariant the probe joins rely on.

    Crash-recoverable in the repo's exactly-once style: an intent marker
    (``compact.json``: absorbed ids + target id) is written BEFORE the
    consolidated partition, and absorbed partitions are deleted only
    AFTER the target's ``_SUCCESS`` lands. Re-running after a crash
    completes the swap (marker + _SUCCESS present) or discards the
    partial target and starts over (marker without _SUCCESS) — at no
    point can rows be lost, and a duplicate-visible window exists only
    between target-_SUCCESS and absorb-deletion, which the quiesced-job
    contract keeps outside any probe.

    Returns a summary dict (absorbed partition count, rows written,
    consolidated id) for the caller's operational logs.
    """
    import shutil

    idx_dir = os.path.join(state_dir, index_name)
    marker = os.path.join(state_dir, "compact.json")
    state = _load_commit_state(state_dir)

    def _ids() -> list[int]:
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(idx_dir)
            if d.startswith("batch=")
        )

    # resume a crashed compaction first
    if os.path.exists(marker):
        with open(marker) as fh:
            intent = json.load(fh)
        tgt = os.path.join(idx_dir, f"batch={intent['new_id']}")
        if os.path.exists(os.path.join(tgt, "_SUCCESS")):
            for k in intent["absorbed"]:
                path = os.path.join(idx_dir, f"batch={k}")
                if os.path.exists(path):
                    shutil.rmtree(path)
            os.remove(marker)
        else:
            if os.path.exists(tgt):
                shutil.rmtree(tgt)
            os.remove(marker)

    ids = _ids()
    absorb = [k for k in ids if k <= state["last"]]
    if len(absorb) <= 1:
        return {"absorbed": 0, "rows": None, "new_id": None}
    new_id = ids[0] - 1
    intent = {"new_id": new_id, "absorbed": absorb}
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(intent, fh)
    os.replace(tmp, marker)
    consolidated = (
        owner.read.parquet(idx_dir)
        .filter(F.col("batch").isin(absorb))
        .drop("batch")
        .distinct()
    )
    consolidated.write.mode("overwrite").parquet(
        os.path.join(idx_dir, f"batch={new_id}")
    )
    n_rows = owner.read.parquet(os.path.join(idx_dir, f"batch={new_id}")).count()
    for k in absorb:
        shutil.rmtree(os.path.join(idx_dir, f"batch={k}"))
    os.remove(marker)
    return {"absorbed": len(absorb), "rows": n_rows, "new_id": new_id}


def compact_quality_state(owner: SparkSession, state_dir: str) -> dict:
    """Offline maintenance for the QUALITY twin's state
    (streaming_quality_gate) — the two artifact families the generic
    batch-partition compactor alone doesn't fully cover:

    - ``rejects/``: append-only per-batch exclusion-list partitions —
      folded by :func:`compact_ingest_index` (the layout is the same
      ``batch=<id>`` scheme; per-row batch provenance collapses into the
      consolidated partition id, the standard log-compaction trade — the
      downstream consumer reads rejects as a doc_id exclusion SET).
    - ``lm_freq/``: the static unigram LM, written ONCE at seeding under
      the session's shuffle parallelism (up to ``shuffle.partitions``
      small files for a vocab-sized table) and re-read by EVERY batch's
      probe. Rewritten to a single file with the same two-phase-marker
      protocol (``lm_compact.json`` intent → ``lm_freq__new`` +
      _SUCCESS → swap → marker removed), so either crash window
      recovers: a complete new dir finishes the swap, a partial one is
      discarded and the original stays authoritative. Row set is
      unchanged — only file count drops — so scores, the threshold
      artifact and classification are bit-identical.

    Same contract as compact_ingest_index: run only while the standing
    job is quiesced. Returns a combined summary dict."""
    import shutil

    lm_path = os.path.join(state_dir, "lm_freq")
    lm_new = lm_path + "__new"
    marker = os.path.join(state_dir, "lm_compact.json")

    # resume a crashed LM rewrite first
    if os.path.exists(marker):
        if os.path.exists(os.path.join(lm_new, "_SUCCESS")):
            if os.path.exists(lm_path):
                shutil.rmtree(lm_path)
            os.replace(lm_new, lm_path)
        elif os.path.exists(lm_new):  # partial write: original untouched
            shutil.rmtree(lm_new)
        os.remove(marker)

    rejects_dir = os.path.join(state_dir, "rejects")
    rejects = (
        compact_ingest_index(owner, state_dir, "rejects")
        if os.path.isdir(rejects_dir)
        else {"absorbed": 0, "rows": None, "new_id": None}
    )

    lm_files_before = sum(
        1 for f in os.listdir(lm_path) if f.endswith(".parquet")
    )
    if lm_files_before > 1:
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"target": lm_new}, fh)
        os.replace(tmp, marker)
        owner.read.parquet(lm_path).coalesce(1).write.mode("overwrite").parquet(
            lm_new
        )
        shutil.rmtree(lm_path)
        os.replace(lm_new, lm_path)
        os.remove(marker)
    lm_files_after = sum(
        1 for f in os.listdir(lm_path) if f.endswith(".parquet")
    )
    return {
        "rejects": rejects,
        "lm_files_before": lm_files_before,
        "lm_files_after": lm_files_after,
    }


def streaming_quality_gate(
    docs_stream: DataFrame,
    seed_corpus: DataFrame,
    state_dir: str | None = None,
    keep_tokens: float = 0.75,
    threshold: float | None = None,
) -> tuple[DataFrame, "callable"]:
    """Quality filtering as a STANDING ingest gate — the fourth ingest
    twin: the batch quality cutoff (``doc_perplexity_proxy`` scoring +
    ``quality_threshold_for_budget``'s token-budget threshold solve) as a
    per-micro-batch keep/drop decision on the shared commit-state
    machinery (exactly-once counters, replay/rewind handling, restart
    resume, O(1) plan depth).

    Static artifacts, written ONCE at state-dir creation from the seed
    corpus (the gate must be deterministic across its lifetime — a score
    model that drifts with ingest would reclassify the same document
    differently on different days):

    - ``lm_freq/``: the unigram LM as a (token, c) parquet — vocab-sized,
      broadcast into the per-batch probe when its parquet footer row
      count is small (_parquet_dir_rows, same guard as the decontam
      index), shuffle join otherwise;
    - ``threshold.json``: the total seed token count (the LM's
      denominator) and the score cutoff. An explicit ``threshold`` is
      taken as-is (keep iff score <= threshold); otherwise it is SOLVED
      from the seed at seeding time with the histogram-CDF device
      (``floor(score*100)`` integer bins, cumulative token mass,
      smallest bin covering ``keep_tokens`` of seed tokens — exactly
      ``quality_threshold_for_budget``'s formulation) and the keep
      predicate is the SAME binning, ``floor(score*100) <= t_bin``, so
      the admitted token mass matches the CDF solve bin-exactly (a
      center-valued ``score <= bin`` cut would reject the upper half of
      the threshold bin and systematically undershoot the budget).

    Per batch: tokenize, score avg-neg-logp over IN-VOCAB tokens
    (rounded 6dp, the batch query's discipline), keep docs passing the
    cutoff predicate above. Docs with ZERO in-vocab tokens are unscorable
    and REJECTED — the safe direction for a quality gate (and the
    correct reading of the proxy: a doc sharing no vocabulary with the
    reference corpus is exactly what the filter exists to stop).
    Rejected ids land in append-only ``rejects/batch=<id>/`` parquet
    (doc_id, score — score NULL when unscorable), the exclusion list
    downstream packing consumes. Published view: ``quality_totals`` with
    per-lang (lang, n_incoming, n_kept, n_rejected, n_unscorable).
    """
    import tempfile

    from kafka_streams_example_spark.operators.text import tokens

    owner = seed_corpus.sparkSession
    root = state_dir or tempfile.mkdtemp(prefix="quality_state_")
    lm_path = os.path.join(root, "lm_freq")
    thr_path = os.path.join(root, "threshold.json")

    def _doc_tokens(df: DataFrame) -> DataFrame:
        return df.select(
            F.col("doc_id").alias("id"), F.col("text").alias("txt")
        ).select("id", F.explode(tokens(F.lower(F.col("txt")))).alias("token"))

    def _scores(tok_df: DataFrame, freq: DataFrame, n_total: int) -> DataFrame:
        """(id, token) ⨝ LM → (id, score) over in-vocab tokens, 6dp."""
        return (
            tok_df.join(freq, "token")
            .withColumn(
                "logp", F.log(F.col("c").cast("double") / F.lit(float(n_total)))
            )
            .groupBy("id")
            .agg(F.round(-F.sum("logp") / F.count("*"), 6).alias("score"))
        )

    state = _load_commit_state(root)
    if not state["resumed"]:
        seed_toks = _doc_tokens(seed_corpus)
        seed_toks.groupBy("token").agg(F.count("*").alias("c")).write.mode(
            "overwrite"
        ).parquet(lm_path)
        freq = owner.read.parquet(lm_path)
        n_total = freq.agg(F.sum("c")).first()[0] or 0
        t_bin: int | None = None
        if threshold is None:
            # histogram-CDF token-budget solve on the SEED
            # (floor(score*100) integer bins — quality_threshold_for_
            # budget's binning — bins-bounded frame, no corpus sort)
            sc = _scores(seed_toks, freq, n_total)
            mass = (
                _doc_tokens(seed_corpus)
                .groupBy("id")
                .agg(F.count("*").alias("nt"))
                .join(sc, "id")
                .groupBy(
                    F.floor(F.col("score") * 100.0).cast("bigint").alias("bin")
                )
                .agg(F.sum("nt").alias("m"))
            )
            from pyspark.sql.window import Window as _W

            cum = mass.withColumn(
                "cm", F.sum("m").over(_W.orderBy("bin").rowsBetween(
                    _W.unboundedPreceding, _W.currentRow))
            )
            total_m = mass.agg(F.sum("m")).first()[0] or 0
            row = (
                cum.filter(F.col("cm") >= keep_tokens * total_m)
                .agg(F.min("bin"))
                .first()
            )
            if row and row[0] is not None:
                t_bin = int(row[0])
                threshold = (t_bin + 1) / 100.0  # bin's upper edge
            else:
                threshold = float("inf")
        tmp = thr_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"threshold": threshold, "t_bin": t_bin,
                 "n_total": int(n_total), "keep_tokens": keep_tokens}, fh,
            )
        os.replace(tmp, thr_path)
    with open(thr_path) as fh:
        art = json.load(fh)
    thr, n_total = art["threshold"], art["n_total"]
    # solved cutoffs keep by bin (floor(score*100) <= t_bin) so admitted
    # mass matches the solve; explicit cutoffs (t_bin None, including
    # pre-existing state dirs) keep by score <= threshold as documented
    art_bin = art.get("t_bin")

    def _keep_pred(score_col):
        if art_bin is not None:
            return (
                F.floor(score_col * 100.0).cast("bigint") <= F.lit(int(art_bin))
            )
        return score_col <= F.lit(thr)

    def _republish() -> None:
        if state["gen"] > 0:
            committed = os.path.join(root, f"totals_gen{(state['gen'] - 1) % 2}")
            owner.read.parquet(committed).createOrReplaceTempView("quality_totals")

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        batch_df.count()
        try:
            replay = _is_replay(state, root, batch_id)
        except RuntimeError:
            batch_df.unpersist()
            raise
        if replay:
            batch_df.unpersist()
            _republish()
            return
        freq = owner.read.parquet(lm_path)
        if _parquet_dir_rows(lm_path) <= _BENCH_IDX_BCAST_MAX_ROWS:
            freq = F.broadcast(freq)
        sc = _scores(_doc_tokens(batch_df), freq, n_total)
        probed = (
            batch_df.select(F.col("doc_id").alias("id"), "lang")
            .join(sc, "id", "left")
            .withColumn(
                "kept",
                F.col("score").isNotNull() & _keep_pred(F.col("score")),
            )
        )
        batch_counts = probed.groupBy("lang").agg(
            F.count("*").alias("n_incoming"),
            F.count(F.when(F.col("kept"), 1)).alias("n_kept"),
            F.count(F.when(~F.col("kept"), 1)).alias("n_rejected"),
            F.count(F.when(F.col("score").isNull(), 1)).alias("n_unscorable"),
        )
        gen = state["gen"]
        merged = _merge_running_totals(
            owner,
            None if gen == 0 else os.path.join(root, f"totals_gen{(gen - 1) % 2}"),
            batch_counts,
            ["n_incoming", "n_kept", "n_rejected", "n_unscorable"],
        )
        totals_path = os.path.join(root, f"totals_gen{gen % 2}")
        merged.write.mode("overwrite").parquet(totals_path)
        probed.filter(~F.col("kept")).select(
            F.col("id").alias("doc_id"), "score"
        ).write.mode("overwrite").parquet(
            os.path.join(root, f"rejects/batch={batch_id}")
        )
        batch_df.unpersist()
        _commit_marker(root, state, batch_id)
        owner.read.parquet(totals_path).createOrReplaceTempView("quality_totals")

    return docs_stream, publish


def streaming_ingest_phash(
    docs_stream: DataFrame,
    index_seed: DataFrame,
    state_dir: str | None = None,
    max_hamming: int = 6,
    max_probe_bucket: int | None = None,
) -> tuple[DataFrame, "callable"]:
    """PERCEPTUAL image ingest dedup as a STANDING job — the fifth ingest
    twin, closing the modality set (exact text, MinHash near-dup text,
    benchmark decontam, quality, now images): each arriving micro-batch's
    images are DECODED through the real PNG codec and dHashed
    (functions/codecs.py:dhash60, the batch machinery of
    queries/multimodal.py:image_phash_neardup — same 60-bit hash, same
    4×15-bit banding), probe the persisted index for band collisions
    with already-ingested images, VERIFY candidates by exact Hamming
    distance (≤ ``max_hamming``), classify near-dup-vs-new per language,
    and extend the index with the batch's novel images.

    Unlike the MinHash twin (whose exact-Jaccard verify needs shingle
    sets that never enter its index), the phash verify tier lives INSIDE
    the gate: the index carries each image's full 8-byte hash next to
    its band rows, so a band collision is confirmed or refuted by one
    xor+popcount — band-only classification would degrade as the index
    grows (15-bit collisions accumulate), verified classification does
    not. Still only hashes persist: no pixels, no blobs, ~40 bytes per
    ingested image.

    State layout, exactly-once counters, replay/rewind handling, restart
    resume, and O(1) plan depth are the shared commit-state machinery's;
    the published view is ``ingest_phash_totals`` with per-lang
    (n_incoming, n_neardup_vs_index, n_new). The stream carries
    (doc_id, lang, text) and the image payload is the deterministic
    fixture blob built in-kernel (the batch query's device); a
    production stream carries binary payloads and the kernel decodes
    those instead — schema, banding, probe and index are identical.

    ``max_probe_bucket`` (default None = probe everything) is the
    LSH skew guard for crawl-scale indexes: band values held by more
    than that many DISTINCT index hashes are skipped at PROBE time, so
    one degenerate bucket (near-constant textures hash to a handful of
    alternating-bit band values — measured at ×100 in NOTES_r11) cannot
    multiply every colliding batch row into a quadratic join. The
    trade, explicit and deliberate: an image whose ONLY collisions live
    in degenerate buckets classifies as new and re-enters the index —
    never a false near-dup (the verify tier is untouched), only
    duplicate index rows for the common-texture population that the
    exact-hash dedup-cut tier collapses without pair work anyway. The
    cap is applied to the strictly-earlier-batch view the probe already
    uses, so replay determinism is unchanged.
    """
    import hashlib as _hashlib
    import tempfile

    import pandas as _pd

    from kafka_streams_example_spark.operators.multimodal import _ship_codecs
    from kafka_streams_example_spark.queries.multimodal import (
        _DH_BANDS,
        _DH_BITS,
        _DH_GRID_H,
        _DH_GRID_W,
    )

    owner = index_seed.sparkSession
    root = state_dir or tempfile.mkdtemp(prefix="ingest_phash_state_")
    idx_dir = os.path.join(root, "phash_index")
    cx = _ship_codecs()

    def _hashes_of(df: DataFrame) -> DataFrame:
        """(doc_id, text, ...) → (id, band, bv, dhash): decode + dHash in
        one Arrow kernel, then the 4×15-bit band explode (JVM-side)."""

        def batches(it):
            for pdf in it:
                ids, hashes = [], []
                for i, t in zip(pdf["doc_id"], pdf["text"]):
                    w, h = 16 + int(i) % 17, 16 + int(i) % 13
                    digest = _hashlib.md5(str(t).encode("utf-8")).digest()
                    px = (digest * (w * h // 16 + 1))[: w * h]
                    d = cx.decode_png(cx.encode_png_gray8(w, h, px))
                    ids.append(int(i))
                    hashes.append(
                        cx.dhash60(d["pixels"], d["width"], d["height"],
                                   _DH_GRID_W, _DH_GRID_H)
                    )
                yield _pd.DataFrame({"id": ids, "dhash": hashes})

        fp = df.select("doc_id", "text").mapInPandas(
            batches, "id LONG, dhash LONG"
        )
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("dhash"), b * _DH_BITS)
                    .bitwiseAND(F.lit((1 << _DH_BITS) - 1))
                    .alias("bv"),
                )
                for b in range(_DH_BANDS)
            ]
        )
        return fp.select(
            "id", "dhash", F.explode(band_structs).alias("bk")
        ).select("id", "dhash", F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"))

    state = _load_commit_state(root)
    if not state["resumed"]:
        _hashes_of(index_seed).select("band", "bv", "dhash").distinct().write.mode(
            "overwrite"
        ).parquet(os.path.join(idx_dir, "batch=-1"))

    def _republish() -> None:
        if state["gen"] > 0:
            committed = os.path.join(root, f"totals_gen{(state['gen'] - 1) % 2}")
            owner.read.parquet(committed).createOrReplaceTempView(
                "ingest_phash_totals"
            )

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        batch_df.count()
        try:
            replay = _is_replay(state, root, batch_id)
        except RuntimeError:
            batch_df.unpersist()
            raise
        if replay:
            batch_df.unpersist()
            _republish()
            return
        # probe strictly-earlier batches: band collision proposes, exact
        # Hamming on the stored full hashes confirms
        index = (
            owner.read.parquet(idx_dir)
            .filter(F.col("batch") < batch_id)
            .select("band", "bv", F.col("dhash").alias("idx_dhash"))
            .distinct()
        )
        if max_probe_bucket is not None:
            # skew guard: skip degenerate-hot band values (see docstring)
            ok_buckets = (
                index.groupBy("band", "bv")
                .count()
                .filter(F.col("count") <= max_probe_bucket)
                .select("band", "bv")
            )
            index = index.join(ok_buckets, ["band", "bv"])
        batch_bands = _hashes_of(batch_df)
        hit_ids = (
            batch_bands.join(index, ["band", "bv"])
            .filter(
                F.bit_count(F.col("dhash").bitwiseXOR(F.col("idx_dhash")))
                <= max_hamming
            )
            .select("id")
            .distinct()
            .withColumn("dup", F.lit(1))
        )
        probed = batch_df.select(F.col("doc_id").alias("id"), "lang").join(
            hit_ids, "id", "left"
        )
        batch_counts = probed.groupBy("lang").agg(
            F.count("*").alias("n_incoming"),
            F.count(F.when(F.col("dup").isNotNull(), 1)).alias(
                "n_neardup_vs_index"
            ),
            F.count(F.when(F.col("dup").isNull(), 1)).alias("n_new"),
        )
        gen = state["gen"]
        merged = _merge_running_totals(
            owner,
            None if gen == 0 else os.path.join(root, f"totals_gen{(gen - 1) % 2}"),
            batch_counts,
            ["n_incoming", "n_neardup_vs_index", "n_new"],
        )
        totals_path = os.path.join(root, f"totals_gen{gen % 2}")
        merged.write.mode("overwrite").parquet(totals_path)
        # novel images extend the index (deterministic partition —
        # crash-replay rewrites the same files)
        (
            batch_bands.join(hit_ids, "id", "left_anti")
            .select("band", "bv", "dhash")
            .distinct()
            .write.mode("overwrite")
            .parquet(os.path.join(idx_dir, f"batch={batch_id}"))
        )
        batch_df.unpersist()
        _commit_marker(root, state, batch_id)
        owner.read.parquet(totals_path).createOrReplaceTempView(
            "ingest_phash_totals"
        )

    return docs_stream, publish
