"""Twentieth query tranche: the operational queries wrapped around a
100 TB training-data pipeline — a dbt-style data-contract validation
suite (PK uniqueness, FK integrity, enum domains, range/null checks,
each with violation counts), a population-stability-index drift monitor
between time halves, nDCG@10 of the cosine retrieval arm against the
embedding labels, a context-length budget report (fit/truncation/
packing-utilization bound per candidate context size), a corpus
snapshot diff (added/removed/changed per shard between two corpus
versions), and last-touch session attribution of purchase revenue.

Counts, cents and ranks stay integral end-to-end; the PSI/nDCG
transcendental sums follow the chisq precedent (small bounded term
sets, native 6dp round on both engines); k/n ratios round through the
portable half-up twins.

Reference parity note: the reference engine (Kafka Streams DSL,
SolarConsumer.java) has no analogue — these extend the engine toward
the LLM-data-pipeline north star (SURVEY.md §2, beyond-reference
table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.functions.hashing import (
    fingerprint_md5,
    stable_long,
)
from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.registry import (
    ORACLES,
    QUERIES,
    _duck_round_half_up,
    _load_parallel,
    register,
)

# --------------------------------------------------------------------------
# data_contract_validation — dbt-style contract checks with violation counts
# --------------------------------------------------------------------------


@register(
    "data_contract_validation",
    """
SELECT 'pk_unique_orders' AS check_name, 'orders' AS table_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'pk_unique_customer', 'customer', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
FROM customer
UNION ALL
SELECT 'fk_orders_customer', 'orders', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'fk_lineitem_orders', 'lineitem', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'enum_orderstatus', 'orders', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                      OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'range_totalprice_positive', 'orders', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0.0
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'nonnull_event_ts', 'events', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'range_event_value', 'events', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN value IS NULL OR value < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
FROM events
""",
)
def data_contract_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract validation suite — the dbt-test shapes every
    ingest gate runs: primary-key uniqueness, referential integrity,
    enum domain membership, range and null checks, one row per check
    with the exact violation count (not just a boolean, so triage can
    rank by blast radius).

    100 TB shape: uniqueness is count-vs-distinct inside one aggregate
    (map-side partials; no row-level distinct materialization); FK
    checks are left joins that Spark turns into broadcast probes when
    the parent side is dim-sized, shuffle joins otherwise — either way
    the output is one long per check. Row-level checks ride a single
    scan each. At scale you run this suite per ingest batch, not per
    corpus, and the counts merge across batches as plain sums."""
    orders = _load_parallel(spark, sf_dir, "orders")
    customer = _load_parallel(spark, sf_dir, "customer")
    lineitem = _load_parallel(spark, sf_dir, "lineitem")
    events = _load_parallel(spark, sf_dir, "events")

    def row(name, table, n_viol):
        return n_viol.select(
            F.lit(name).alias("check_name"),
            F.lit(table).alias("table_name"),
            F.col("n").cast("long").alias("n_rows"),
            F.col("v").cast("long").alias("n_violations"),
        )

    pk_orders = orders.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("v"),
    )
    pk_cust = customer.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("c_custkey")).alias("v"),
    )
    cust_keys = customer.select("c_custkey")
    fk_oc = (
        orders.join(
            cust_keys, orders["o_custkey"] == cust_keys["c_custkey"], "left"
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.col("c_custkey").isNull().cast("int")).alias("v"),
        )
    )
    order_keys = orders.select("o_orderkey")
    fk_lo = (
        lineitem.join(
            order_keys, lineitem["l_orderkey"] == order_keys["o_orderkey"], "left"
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_orderkey").isNull().cast("int")).alias("v"),
        )
    )
    enum_os = orders.agg(
        F.count("*").alias("n"),
        F.sum(
            (
                ~F.col("o_orderstatus").isin("O", "F", "P")
                | F.col("o_orderstatus").isNull()
            ).cast("int")
        ).alias("v"),
    )
    rng_tp = orders.agg(
        F.count("*").alias("n"),
        F.sum(
            (F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0.0)).cast(
                "int"
            )
        ).alias("v"),
    )
    nn_ts = events.agg(
        F.count("*").alias("n"),
        F.sum(F.col("ts").isNull().cast("int")).alias("v"),
    )
    rng_val = events.agg(
        F.count("*").alias("n"),
        F.sum(
            (F.col("value").isNull() | (F.col("value") < 0.0)).cast("int")
        ).alias("v"),
    )
    checks = [
        row("pk_unique_orders", "orders", pk_orders),
        row("pk_unique_customer", "customer", pk_cust),
        row("fk_orders_customer", "orders", fk_oc),
        row("fk_lineitem_orders", "lineitem", fk_lo),
        row("enum_orderstatus", "orders", enum_os),
        row("range_totalprice_positive", "orders", rng_tp),
        row("nonnull_event_ts", "events", nn_ts),
        row("range_event_value", "events", rng_val),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# --------------------------------------------------------------------------
# psi_value_drift — population stability index between time halves
# --------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_BIN_WIDTH = 50.0  # value domain [0, 500) -> 10 fixed bins
_PSI_EPS = 0.5  # Laplace smoothing so empty bins stay finite
_PSI_ALERT = 0.25  # industry-standard "significant shift" threshold


@register(
    "psi_value_drift",
    f"""
WITH mid AS (
    SELECT CAST(floor((min(floor(epoch(ts))) + max(floor(epoch(ts)))) / 2.0)
           AS BIGINT) AS m
    FROM events
),
b AS (
    SELECT event_type,
           CASE WHEN floor(epoch(ts)) <= (SELECT m FROM mid) THEN 0 ELSE 1 END AS half,
           least(CAST(floor(value / {_PSI_BIN_WIDTH}) AS BIGINT), {_PSI_BINS - 1}) AS bin
    FROM events
),
cells AS (
    SELECT event_type, half, bin, count(*) AS c FROM b GROUP BY 1, 2, 3
),
grid AS (
    SELECT t.event_type, g.bin,
           coalesce(b0.c, 0) AS nb, coalesce(b1.c, 0) AS na
    FROM (SELECT DISTINCT event_type FROM cells) t
    CROSS JOIN (SELECT unnest(generate_series(0, {_PSI_BINS - 1})) AS bin) g
    LEFT JOIN cells b0 ON b0.event_type = t.event_type AND b0.bin = g.bin AND b0.half = 0
    LEFT JOIN cells b1 ON b1.event_type = t.event_type AND b1.bin = g.bin AND b1.half = 1
),
tot AS (
    SELECT event_type, sum(nb) AS tnb, sum(na) AS tna FROM grid GROUP BY 1
),
terms AS (
    SELECT g.event_type, tnb, tna,
           ((nb + {_PSI_EPS}) / (tnb + {_PSI_EPS * _PSI_BINS})
            - (na + {_PSI_EPS}) / (tna + {_PSI_EPS * _PSI_BINS}))
           * ln(((nb + {_PSI_EPS}) / (tnb + {_PSI_EPS * _PSI_BINS}))
                / ((na + {_PSI_EPS}) / (tna + {_PSI_EPS * _PSI_BINS}))) AS term
    FROM grid g JOIN tot USING (event_type)
)
SELECT event_type,
       CAST(max(tnb) AS BIGINT) AS n_before,
       CAST(max(tna) AS BIGINT) AS n_after,
       round(sum(term), 6) AS psi,
       round(sum(term), 6) > {_PSI_ALERT} AS drifted
FROM terms GROUP BY 1
""",
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the value distribution per event
    type, between the first and second time halves (split at the epoch
    midpoint, so the monitor is self-calibrating): PSI = sum over fixed
    bins of (p-q)·ln(p/q) with Laplace-smoothed shares. PSI > 0.25 is
    the standard retrain/investigate alarm. The drift boolean compares
    the ROUNDED value so both engines threshold the same number.

    100 TB shape: one scan into (type, half, bin) counts — map-side
    combinable, cells bounded by types×2×bins — then all PSI math runs
    on the bounded cell grid. This is the standing weekly monitor shape:
    the two halves generalize to (reference window, current window) and
    the cell counts merge across days as plain sums, so the reference
    never rescans."""
    ev = _load_parallel(spark, sf_dir, "events")
    mid = ev.agg(
        F.floor(
            (
                F.min(F.col("ts").cast("long"))
                + F.max(F.col("ts").cast("long"))
            )
            / 2.0
        )
        .cast("long")
        .alias("m")
    )
    b = ev.join(F.broadcast(mid)).select(
        "event_type",
        F.when(F.col("ts").cast("long") <= F.col("m"), 0).otherwise(1).alias("half"),
        F.least(
            F.floor(F.col("value") / _PSI_BIN_WIDTH).cast("long"),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
    )
    cells = b.groupBy("event_type", "half", "bin").agg(F.count("*").alias("c"))
    types = cells.select("event_type").distinct()
    grid_keys = types.join(
        F.broadcast(
            types.sparkSession.range(_PSI_BINS).select(F.col("id").alias("bin"))
        )
    )
    b0 = cells.filter(F.col("half") == 0).select(
        "event_type", "bin", F.col("c").alias("nb")
    )
    b1 = cells.filter(F.col("half") == 1).select(
        "event_type", "bin", F.col("c").alias("na")
    )
    grid = (
        grid_keys.join(b0, ["event_type", "bin"], "left")
        .join(b1, ["event_type", "bin"], "left")
        .fillna(0, subset=["nb", "na"])
    )
    w_tot = Window.partitionBy("event_type")
    denom = float(_PSI_EPS * _PSI_BINS)
    p = (F.col("nb") + _PSI_EPS) / (F.sum("nb").over(w_tot) + denom)
    q = (F.col("na") + _PSI_EPS) / (F.sum("na").over(w_tot) + denom)
    terms = grid.select(
        "event_type",
        F.sum("nb").over(w_tot).alias("tnb"),
        F.sum("na").over(w_tot).alias("tna"),
        ((p - q) * F.log(p / q)).alias("term"),
    )
    psi = F.round(F.sum("term"), 6)
    return terms.groupBy("event_type").agg(
        F.max("tnb").cast("long").alias("n_before"),
        F.max("tna").cast("long").alias("n_after"),
        psi.alias("psi"),
        (psi > _PSI_ALERT).alias("drifted"),
    )


# --------------------------------------------------------------------------
# ndcg_retrieval_eval — nDCG@10 of the cosine arm against embedding labels
# --------------------------------------------------------------------------

_NDCG_K = 10

# ordered folds so the discounted sums are bit-identical on both engines
_NDCG_DCG_DUCK = (
    "list_aggregate(list_transform("
    "list_sort(list(struct_pack(rnk := rnk, rel := rel))),"
    " r -> CAST(r.rel AS DOUBLE) / (ln(r.rnk + 1) / ln(2.0))), 'sum')"
)
_NDCG_IDCG_DUCK = (
    f"list_aggregate(list_transform(generate_series(1, least({_NDCG_K}, n_rel)),"
    " i -> 1.0 / (ln(i + 1) / ln(2.0))), 'sum')"
)


@register(
    "ndcg_retrieval_eval",
    f"""
WITH topk AS ({{topk}}),
lab AS (
    SELECT t.q_id, t.rnk,
           CASE WHEN ql.label = cl.label THEN 1 ELSE 0 END AS rel
    FROM topk t
    JOIN embeddings ql ON ql.vec_id = t.q_id
    JOIN embeddings cl ON cl.vec_id = t.vec_id
),
nrel AS (
    SELECT q.vec_id AS q_id, count(*) AS n_rel
    FROM embeddings q JOIN embeddings c
      ON q.label = c.label AND c.vec_id <> q.vec_id
    WHERE q.vec_id < 8
    GROUP BY 1
),
dcg AS (
    SELECT q_id, {_NDCG_DCG_DUCK} AS dcg
    FROM lab GROUP BY q_id
)
SELECT d.q_id,
       CAST(n.n_rel AS BIGINT) AS n_relevant,
       round(d.dcg, 6) AS dcg,
       round({_NDCG_IDCG_DUCK}, 6) AS idcg,
       round(d.dcg / {_NDCG_IDCG_DUCK}, 6) AS ndcg
FROM dcg d JOIN nrel n USING (q_id)
""",
)
def ndcg_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the exact cosine retrieval arm, graded against the
    embedding cluster labels (rel = 1 when the candidate shares the
    query's label): DCG folds rel/log2(rank+1) in rank order, IDCG is
    the ideal prefix over min(k, total relevant), both as ORDERED list
    folds so the discounted sums are bit-identical across engines.
    This closes the retrieval-quality loop the same way ann_recall_at_k
    closes the index-accuracy loop — recall says "did the candidates
    come back", nDCG says "in the right order".

    100 TB shape: rides similarity_cosine_topk's plan (corpus never
    collected, query set broadcast); the eval adds two label joins on
    the k·|Q| result rows and a label-count aggregate — all bounded by
    the query set, not the corpus."""
    topk = QUERIES["similarity_cosine_topk"](spark, sf_dir)
    emb = _load_parallel(spark, sf_dir, "embeddings").select("vec_id", "label")
    lab = (
        topk.join(
            emb.select(F.col("vec_id").alias("q_id"), F.col("label").alias("ql")),
            "q_id",
        )
        .join(emb.select("vec_id", F.col("label").alias("cl")), "vec_id")
        .select(
            "q_id", "rnk", F.when(F.col("ql") == F.col("cl"), 1).otherwise(0).alias("rel")
        )
    )
    dcg = lab.groupBy("q_id").agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(rnk, rel))),"
            " 0.0D, (a, r) -> a + CAST(r.rel AS DOUBLE) / (ln(r.rnk + 1) / ln(2.0D)))"
        ).alias("dcg")
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("ql")
    )
    nrel = (
        q.join(emb, emb["label"] == q["ql"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id")
        .agg(F.count("*").alias("n_rel"))
    )
    idcg = F.expr(
        f"aggregate(transform(sequence(1, int(least({_NDCG_K}, n_rel))),"
        " i -> 1.0D / (ln(i + 1) / ln(2.0D))), 0.0D, (a, x) -> a + x)"
    )
    return dcg.join(nrel, "q_id").select(
        "q_id",
        F.col("n_rel").cast("long").alias("n_relevant"),
        F.round("dcg", 6).alias("dcg"),
        F.round(idcg, 6).alias("idcg"),
        F.round(F.col("dcg") / idcg, 6).alias("ndcg"),
    )


# --------------------------------------------------------------------------
# context_budget_report — fit/truncation/utilization per context length
# --------------------------------------------------------------------------

_CTX_LENGTHS = (512, 1024, 2048, 4096)


@register(
    "context_budget_report",
    f"""
WITH t AS (
    SELECT CAST(len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]')) AS BIGINT) AS toks
    FROM documents
),
l AS (SELECT unnest([{", ".join(str(c) for c in _CTX_LENGTHS)}]) AS context_len)
SELECT context_len,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN toks <= context_len THEN 1 ELSE 0 END) AS BIGINT) AS n_fit,
       CAST(sum(least(toks, context_len)) AS BIGINT) AS tokens_kept,
       CAST(sum(greatest(toks - context_len, 0)) AS BIGINT) AS tokens_truncated,
       {_duck_round_half_up(
           "CAST(sum(least(toks, context_len)) AS DOUBLE)"
           " / (ceil(CAST(sum(least(toks, context_len)) AS DOUBLE)"
           " / context_len) * context_len)", 6)} AS util_lower_bound
FROM t CROSS JOIN l
GROUP BY context_len
""",
)
def context_budget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length budgeting: for each candidate training context
    size, how many documents fit whole, how many tokens survive
    truncation, and the best-case packing utilization (kept tokens over
    ceil(kept/L) bins of L — the bin-covering lower bound any packer,
    including pack_sequences_greedy, is graded against). The BPE-ish
    regex token count is the same counter token_frequencies uses.

    100 TB shape: the token count is computed once per document on a
    map-only scan; the 4 context lengths explode JVM-side into an
    aggregate whose output is 4 rows. You run this BEFORE committing a
    context length for a training run — the util bound times the bin
    count is the GPU-hours bill."""
    docs = _load_parallel(spark, sf_dir, "documents")
    t = docs.select(tx.token_count(F.col("text")).cast("long").alias("toks"))
    lens = F.array(*[F.lit(c) for c in _CTX_LENGTHS])
    exploded = t.select("toks", F.explode(lens).alias("context_len"))
    kept = F.sum(F.least(F.col("toks"), F.col("context_len")))
    return exploded.groupBy("context_len").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("toks") <= F.col("context_len")).cast("int"))
        .cast("long")
        .alias("n_fit"),
        kept.cast("long").alias("tokens_kept"),
        F.sum(F.greatest(F.col("toks") - F.col("context_len"), F.lit(0)))
        .cast("long")
        .alias("tokens_truncated"),
        tx.round_half_up(
            kept.cast("double")
            / (
                F.ceil(kept.cast("double") / F.col("context_len"))
                * F.col("context_len")
            ),
            6,
        ).alias("util_lower_bound"),
    )


# --------------------------------------------------------------------------
# corpus_version_diff — snapshot manifest diff between two corpus versions
# --------------------------------------------------------------------------

_CVD_MOD = 19  # deterministic v2 transform: %0 dropped, %1 edited, %2 cloned
_CVD_SHARDS = 8
_CVD_CLONE_OFFSET = 1_000_000

# both versions derive deterministically from `documents`, so the diff —
# like every query here — is a pure function of the input tables
_CVD_DUCK_V1 = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS fp,
       CAST(('0x' || substr(md5(trim(regexp_replace(lower(text),
            '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))), 1, 15)) AS BIGINT) % {mod} AS slot
FROM documents
"""


@register(
    "corpus_version_diff",
    f"""
WITH v1 AS ({_CVD_DUCK_V1.format(mod=_CVD_MOD)}),
v2 AS (
    SELECT doc_id,
           CASE WHEN slot = 1
                THEN md5(trim(regexp_replace(lower(text || ' v2'),
                     '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))
                ELSE fp END AS fp
    FROM v1 JOIN documents USING (doc_id)
    WHERE slot <> 0
    UNION ALL
    SELECT doc_id + {_CVD_CLONE_OFFSET}, fp
    FROM v1 WHERE slot = 2
),
j AS (
    SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.doc_id IS NULL THEN 'added'
                WHEN a.fp <> b.fp THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
)
SELECT doc_id % {_CVD_SHARDS} AS shard,
       CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
FROM j GROUP BY 1
""",
)
def corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two corpus versions: v2 is a deterministic
    transform of the documents table (content-hash slot 0 dropped,
    slot 1 edited, slot 2 cloned under a new id), and the diff is a
    full-outer join of the two (doc_id, content fingerprint) manifests
    classifying every id as added / removed / changed / unchanged,
    rolled up per shard. This is the audit you publish with every
    corpus release — what changed since the version the last model
    trained on.

    100 TB shape: the manifests carry (id, 32-byte fingerprint) only —
    text never transits the diff join — and the full-outer join shuffles
    on doc_id, the same key both manifests are naturally bucketed by at
    rest, so with bucketed manifest tables the diff is shuffle-free.
    Diff output is shard-granular, merged by plain sums."""
    docs = _load_parallel(spark, sf_dir, "documents")
    v1 = docs.select(
        "doc_id",
        fingerprint_md5(F.col("text")).alias("fp"),
        (
            F.conv(F.substring(fingerprint_md5(F.col("text")), 1, 15), 16, 10)
            .cast("long")
            % _CVD_MOD
        ).alias("slot"),
    )
    edited = fingerprint_md5(F.concat(F.col("text"), F.lit(" v2")))
    v2 = (
        v1.join(docs.select("doc_id", "text"), "doc_id")
        .filter(F.col("slot") != 0)
        .select(
            "doc_id",
            F.when(F.col("slot") == 1, edited).otherwise(F.col("fp")).alias("fp"),
        )
        .unionByName(
            v1.filter(F.col("slot") == 2).select(
                (F.col("doc_id") + _CVD_CLONE_OFFSET).alias("doc_id"), "fp"
            )
        )
    )
    j = (
        v1.select("doc_id", F.col("fp").alias("fp_a"))
        .join(
            v2.select(F.col("doc_id"), F.col("fp").alias("fp_b")),
            "doc_id",
            "full_outer",
        )
        .select(
            "doc_id",
            F.when(F.col("fp_b").isNull(), "removed")
            .when(F.col("fp_a").isNull(), "added")
            .when(F.col("fp_a") != F.col("fp_b"), "changed")
            .otherwise("unchanged")
            .alias("status"),
        )
    )
    return j.groupBy((F.col("doc_id") % _CVD_SHARDS).alias("shard")).agg(
        F.sum((F.col("status") == "added").cast("int")).cast("long").alias("n_added"),
        F.sum((F.col("status") == "removed").cast("int"))
        .cast("long")
        .alias("n_removed"),
        F.sum((F.col("status") == "changed").cast("int"))
        .cast("long")
        .alias("n_changed"),
        F.sum((F.col("status") == "unchanged").cast("int"))
        .cast("long")
        .alias("n_unchanged"),
    )


# --------------------------------------------------------------------------
# sessionized_attribution — last-touch revenue attribution
# --------------------------------------------------------------------------

_ATTR_WINDOW_S = 1800  # last-touch lookback


@register(
    "sessionized_attribution",
    f"""
WITH e AS (
    SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
           event_id, value
    FROM events
),
marked AS (
    SELECT *,
           last_value(CASE WHEN event_type <> 'purchase'
                           THEN struct_pack(sec := sec, event_type := event_type)
                      END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY sec, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
    FROM e
),
attributed AS (
    SELECT CASE WHEN prev IS NOT NULL AND sec - prev.sec <= {_ATTR_WINDOW_S}
                THEN prev.event_type ELSE 'direct' END AS channel,
           CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
    FROM marked WHERE event_type = 'purchase'
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM attributed GROUP BY 1
""",
)
def sessionized_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the most recent
    non-purchase event by the same user within a 30-minute lookback
    ('direct' when none). Revenue goes through the half-up cents cast
    first, so per-channel sums are exact integers on both engines.

    100 TB shape: one window pass partitioned by user (the same
    user-partitioned sort every sessionization query here shares — at
    rest this is the natural bucketing for the events table), then a
    channel-count aggregate over purchases only. last_value(... IGNORE
    NULLS) keeps the state one struct per row; no self-join against the
    event history."""
    ev = _load_parallel(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("sec"),
        "event_id",
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.last(
        F.when(
            F.col("event_type") != "purchase",
            F.struct(F.col("sec").alias("sec"), F.col("event_type").alias("event_type")),
        ),
        ignorenulls=True,
    ).over(w)
    marked = e.select("*", prev.alias("prev"))
    attributed = marked.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("prev").isNotNull()
            & ((F.col("sec") - F.col("prev.sec")) <= _ATTR_WINDOW_S),
            F.col("prev.event_type"),
        )
        .otherwise("direct")
        .alias("channel"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    return attributed.groupBy("channel").agg(
        F.count("*").cast("long").alias("n_purchases"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


ORACLES["ndcg_retrieval_eval"] = ORACLES["ndcg_retrieval_eval"].format(
    topk=ORACLES["similarity_cosine_topk"]
)
