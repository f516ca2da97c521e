"""Nineteenth query tranche: data-layout and pipeline-hygiene operators a
100 TB corpus store runs continuously — blocked sorted-neighborhood
near-dup (the sort-based alternative to LSH banding), a Z-order-curve
locality audit that measures read amplification of range scans under
two physical layouts, a k-anonymity re-identification risk audit, an
epsilon-differential-privacy noisy-count release with seeded
(hash-derived, reproducible) Laplace noise, an incremental-view-
maintenance proof (partial agg states merged across a base/delta split
must equal the full recompute — integer cents, so equality is exact),
a leave-one-source-out influence report on corpus mean token length,
and an interpolated Kneser-Ney bigram LM (absolute discounting +
continuation probabilities — the smoothing actually used for n-gram
corpus scoring, vs bigram_lm_probs' add-k).

All heavy math stays integral (counts, cents, ppm deltas, bit
interleaves) until a final double division; the k/n-shaped ratios round
through the portable half-up twins. Seeded randomness derives from md5
(functions/hashing.py:stable_long) so both engines draw the same noise.

Reference parity note: the reference engine (Kafka Streams DSL,
SolarConsumer.java) has no analogue — these extend the engine toward
the LLM-data-pipeline north star (SURVEY.md §2, beyond-reference
table). Sorted-neighborhood is the classic record-linkage alternative
to the MinHash/SimHash banding families already registered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.functions.hashing import (
    normalize_text,
    stable_long,
)
from kafka_streams_example_spark.llm_extra2 import _NGRAMS3
from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.registry import (
    _TOKS,
    ORACLES,
    _duck_round_half_up,
    _load_parallel,
    register,
)

# --------------------------------------------------------------------------
# sorted_neighborhood_neardup — blocked sorted-neighborhood near-dup pairs
# --------------------------------------------------------------------------

_SN_WINDOW = 3  # compare each doc with the next w records in sort order
_SN_BLOCK_CHARS = 12  # blocking key: normalized-text prefix
_SN_HAM = 8  # max SimHash Hamming distance to report

# DuckDB twin of the 60-bit SimHash fingerprint (same votes/majority CTE
# shape as neardup_simhash_pairs' oracle, llm_extra2.py) + the
# window-lead neighborhood scan.
_SN_LEAD_ARMS = "\nUNION ALL\n".join(
    f"""SELECT doc_id AS id_l, f AS f_l,
       lead(doc_id, {o}) OVER (PARTITION BY blk ORDER BY norm, doc_id) AS id_r,
       lead(f, {o}) OVER (PARTITION BY blk ORDER BY norm, doc_id) AS f_r
FROM s"""
    for o in range(1, _SN_WINDOW + 1)
)


@register(
    "sorted_neighborhood_neardup",
    f"""
WITH d AS (
    SELECT doc_id, {_NGRAMS3} AS ng
    FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
),
nz AS (SELECT * FROM d WHERE len(ng) > 0),
h AS (
    SELECT doc_id,
           list_transform(ng, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS hs
    FROM nz
),
votes AS (
    SELECT doc_id, j, sum(CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
    FROM h, unnest(hs) AS u(x), unnest(generate_series(0, 59)) AS b(j)
    GROUP BY 1, 2
),
fp AS (
    SELECT doc_id,
           sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END) AS f
    FROM votes GROUP BY 1
),
s AS (
    SELECT fp.doc_id, fp.f,
           trim(regexp_replace(lower(doc.text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS norm,
           substr(trim(regexp_replace(lower(doc.text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')),
                  1, {_SN_BLOCK_CHARS}) AS blk
    FROM fp JOIN documents doc ON fp.doc_id = doc.doc_id
),
led AS (
{_SN_LEAD_ARMS}
)
SELECT least(id_l, id_r) AS id_a,
       greatest(id_l, id_r) AS id_b,
       CAST(bit_count(xor(f_l, f_r)) AS INT) AS hamming
FROM led
WHERE id_r IS NOT NULL AND bit_count(xor(f_l, f_r)) <= {_SN_HAM}
""",
)
def sorted_neighborhood_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked sorted-neighborhood near-duplicate detection — the
    sort-based record-linkage classic: records sort by a canonical key
    (normalized text; doc_id tiebreak) inside coarse blocks (the
    12-char normalized prefix), and each record compares only against
    the next w=3 records in sort order. The comparator is the 60-bit
    SimHash Hamming distance (<= 8), so the verify is one xor+popcount.

    100 TB shape: the blocking prefix bounds every sort partition (no
    global single-partition window — Spark range-partitions by block),
    the per-record work is O(w) leads instead of O(n) candidates, and
    only (doc_id, 8-byte fingerprint, sort key) transit the shuffle —
    never text. This is the layout-driven complement to the
    neardup_simhash_pairs banding tier: same fingerprints, different
    candidate generation, so the two queries cross-check each other's
    recall."""
    from kafka_streams_example_spark.operators.dedup import simhash64
    from kafka_streams_example_spark.operators.text import word_ngrams

    docs = _load_parallel(spark, sf_dir, "documents")
    s = (
        docs.select(
            "doc_id",
            normalize_text(F.col("text")).alias("norm"),
            word_ngrams(F.col("text"), 3).alias("ng"),
        )
        .filter(F.size("ng") > 0)
        .select(
            "doc_id",
            "norm",
            F.substring("norm", 1, _SN_BLOCK_CHARS).alias("blk"),
            simhash64(F.col("ng")).alias("f"),
        )
    )
    w = Window.partitionBy("blk").orderBy("norm", "doc_id")
    # window expressions can't sit inside a generator: materialize the w
    # lead columns in one window pass, THEN explode the neighbor structs
    with_leads = s.select(
        F.col("doc_id").alias("id_l"),
        F.col("f").alias("f_l"),
        *[
            c
            for o in range(1, _SN_WINDOW + 1)
            for c in (
                F.lead("doc_id", o).over(w).alias(f"id_r{o}"),
                F.lead("f", o).over(w).alias(f"f_r{o}"),
            )
        ],
    )
    neighbors = F.array(
        *[
            F.struct(
                F.col(f"id_r{o}").alias("id_r"), F.col(f"f_r{o}").alias("f_r")
            )
            for o in range(1, _SN_WINDOW + 1)
        ]
    )
    led = with_leads.select(
        "id_l", "f_l", F.explode(neighbors).alias("nb")
    ).select("id_l", "f_l", F.col("nb.id_r").alias("id_r"), F.col("nb.f_r").alias("f_r"))
    ham = F.bit_count(F.col("f_l").bitwiseXOR(F.col("f_r")))
    return (
        led.filter(F.col("id_r").isNotNull() & (ham <= _SN_HAM))
        .select(
            F.least("id_l", "id_r").alias("id_a"),
            F.greatest("id_l", "id_r").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
    )


# --------------------------------------------------------------------------
# zorder_locality_report — read amplification of a range scan under
# Z-order vs row-major physical layout
# --------------------------------------------------------------------------

_Z_BITS = 8  # 8 bits per dimension -> 16-bit curve
_Z_BLOCK_SHIFT = 6  # 64 curve positions per storage block
# query rectangle (inclusive) on the two normalized dimensions
_Z_X0, _Z_X1 = 64, 191
_Z_Y0, _Z_Y1 = 32, 159


def _z_interleave_spark(x: Column, y: Column) -> Column:
    """Bit-interleave two _Z_BITS-bit ints: x bit i -> position 2i,
    y bit i -> 2i+1. Literal shift widths keep everything integral."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _z_interleave_sql(x: str, y: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@register(
    "zorder_locality_report",
    f"""
WITH base AS (
    SELECT o_custkey % 256 AS x,
           CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) % 256 AS y
    FROM orders
),
keyed AS (
    SELECT x, y,
           ({_z_interleave_sql('x', 'y')}) AS z,
           x * 256 + y AS r,
           CASE WHEN x BETWEEN {_Z_X0} AND {_Z_X1}
                 AND y BETWEEN {_Z_Y0} AND {_Z_Y1} THEN 1 ELSE 0 END AS m
    FROM base
),
layouts AS (
    SELECT 'zorder' AS layout, z >> {_Z_BLOCK_SHIFT} AS block, m FROM keyed
    UNION ALL
    SELECT 'rowmajor' AS layout, r >> {_Z_BLOCK_SHIFT} AS block, m FROM keyed
),
per AS (
    SELECT layout, block,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(m) AS BIGINT) AS n_match
    FROM layouts GROUP BY 1, 2
)
SELECT layout,
       CAST(count(*) AS BIGINT) AS blocks_total,
       CAST(sum(CASE WHEN n_match > 0 THEN 1 ELSE 0 END) AS BIGINT) AS blocks_touched,
       CAST(sum(n_match) AS BIGINT) AS rows_matched,
       CAST(sum(CASE WHEN n_match > 0 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       {_duck_round_half_up(
           "CAST(sum(CASE WHEN n_match > 0 THEN n_rows ELSE 0 END) AS DOUBLE)"
           " / sum(n_match)", 6)} AS read_amp
FROM per GROUP BY 1
""",
)
def zorder_locality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order-curve locality audit: map orders onto two 8-bit
    dimensions (customer-key and order-day residues), lay the rows out
    in 64-position storage blocks under (a) the Z-order interleave and
    (b) the row-major key, and measure how many blocks — and how many
    rows — a 128x128 rectangular range scan must touch under each
    layout. ``read_amp = rows_scanned / rows_matched`` is the number a
    lakehouse data-skipping layer (min/max zone maps over clustered
    files) actually pays; Z-order's bounded curve fragmentation keeps
    it low for multi-dimensional predicates where row-major degrades to
    full stripes.

    100 TB shape: one map-only pass computes both keys from integer
    bit-arithmetic (no shuffle until the block-granular aggregate,
    whose cardinality is the BLOCK count, not the row count), so the
    audit costs one scan regardless of corpus size — exactly how you'd
    validate a CLUSTER BY choice before rewriting 100 TB of parquet."""
    orders = _load_parallel(spark, sf_dir, "orders")
    x = F.col("o_custkey") % 256
    y = (F.col("o_orderdate").cast("long") / F.lit(86400)).cast("long") % 256
    base = orders.select(x.alias("x"), y.alias("y"))
    keyed = base.select(
        "x",
        "y",
        _z_interleave_spark(F.col("x"), F.col("y")).alias("z"),
        (F.col("x") * 256 + F.col("y")).alias("r"),
        F.when(
            F.col("x").between(_Z_X0, _Z_X1)
            & F.col("y").between(_Z_Y0, _Z_Y1),
            1,
        )
        .otherwise(0)
        .alias("m"),
    )
    layouts = keyed.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftright(F.col("z"), _Z_BLOCK_SHIFT).alias("block"),
                ),
                F.struct(
                    F.lit("rowmajor").alias("layout"),
                    F.shiftright(F.col("r"), _Z_BLOCK_SHIFT).alias("block"),
                ),
            )
        ).alias("lb"),
        "m",
    ).select(F.col("lb.layout").alias("layout"), F.col("lb.block").alias("block"), "m")
    per = layouts.groupBy("layout", "block").agg(
        F.count("*").alias("n_rows"), F.sum("m").alias("n_match")
    )
    touched = F.when(F.col("n_match") > 0, F.col("n_rows")).otherwise(F.lit(0))
    return per.groupBy("layout").agg(
        F.count("*").cast("long").alias("blocks_total"),
        F.sum((F.col("n_match") > 0).cast("int")).cast("long").alias("blocks_touched"),
        F.sum("n_match").cast("long").alias("rows_matched"),
        F.sum(touched).cast("long").alias("rows_scanned"),
        tx.round_half_up(
            F.sum(touched).cast("double") / F.sum("n_match"), 6
        ).alias("read_amp"),
    )


# --------------------------------------------------------------------------
# k_anonymity_audit — re-identification risk of a quasi-identifier tuple
# --------------------------------------------------------------------------

_KA_RISK_K = 5  # groups smaller than this count as at-risk


@register(
    "k_anonymity_audit",
    f"""
WITH qi AS (
    SELECT event_type,
           CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7 AS dow_idx,
           CAST(floor(value / 10.0) AS BIGINT) AS value_band,
           count(*) AS k
    FROM events GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(sum(k) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS groups_k1,
       CAST(sum(CASE WHEN k < {_KA_RISK_K} THEN k ELSE 0 END) AS BIGINT) AS rows_at_risk,
       {_duck_round_half_up(
           f"CAST(sum(CASE WHEN k < {_KA_RISK_K} THEN k ELSE 0 END) AS DOUBLE)"
           " / sum(k)", 6)} AS risk_share
FROM qi GROUP BY 1
""",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the quasi-identifier tuple (event_type,
    tz-independent epoch-day-of-week, value decade band): group sizes k
    are the re-identification resistance of each equivalence class;
    rows in classes with k < 5 are publishable only after further
    generalization. Reported per event_type: class count, minimum k,
    singleton classes, and the at-risk row share.

    100 TB shape: two cascaded hash aggregations — the first keyed on
    the QI tuple (map-side partials absorb the volume), the second on
    event_type (5 rows). Nothing but small integer tuples shuffles, and
    the epoch-day arithmetic avoids session-timezone coupling on both
    engines."""
    ev = _load_parallel(spark, sf_dir, "events")
    qi = ev.groupBy(
        "event_type",
        (F.floor(F.col("ts").cast("long") / 86400) % 7).alias("dow_idx"),
        F.floor(F.col("value") / 10.0).cast("long").alias("value_band"),
    ).agg(F.count("*").alias("k"))
    risk = F.when(F.col("k") < _KA_RISK_K, F.col("k")).otherwise(F.lit(0))
    return qi.groupBy("event_type").agg(
        F.sum("k").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_groups"),
        F.min("k").cast("long").alias("min_k"),
        F.sum((F.col("k") == 1).cast("int")).cast("long").alias("groups_k1"),
        F.sum(risk).cast("long").alias("rows_at_risk"),
        tx.round_half_up(
            F.sum(risk).cast("double") / F.sum("k"), 6
        ).alias("risk_share"),
    )


# --------------------------------------------------------------------------
# dp_noisy_counts — epsilon-DP count release with seeded Laplace noise
# --------------------------------------------------------------------------

_DP_EPSILON = 0.5  # per-release privacy budget; sensitivity 1 -> b = 2.0
_DP_SEED = "|dp-2026-r6"
_DP_B = 1.0 / _DP_EPSILON


@register(
    "dp_noisy_counts",
    f"""
WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
u AS (
    SELECT event_type, n,
           CAST(('0x' || substr(md5(event_type || '{_DP_SEED}'), 1, 15)) AS BIGINT)
               / 1152921504606846976.0 - 0.5 AS uc
    FROM c
)
SELECT event_type,
       CAST(floor(n + {_duck_round_half_up(
           f"(-{_DP_B}) * sign(uc) * ln(1.0 - 2.0 * abs(uc))", 6
       )} + 0.5)
            AS BIGINT) AS noisy_count,
       {_DP_EPSILON} AS epsilon
FROM u
""",
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release: per-event-type counts plus
    Laplace(b = 1/epsilon) noise drawn by inverse-CDF from an
    md5-derived uniform (functions/hashing.py:stable_long — the same
    seeded-randomness device the MinHash permutations use), so the
    release is reproducible AND engine-exact: noise = -b * sign(u-1/2) *
    ln(1 - 2|u-1/2|). Counts have L1 sensitivity 1 under neighboring
    datasets, so this is the textbook epsilon-DP mechanism — with the
    caveat, deliberate here, that a FIXED seed makes it a regression
    fixture, not a production privacy release (production would draw
    fresh noise per release and track the budget across releases).

    100 TB shape: one hash aggregate to 5 rows; the noise math is
    per-group scalar arithmetic on the aggregate output."""
    ev = _load_parallel(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    uc = (
        stable_long(F.concat(F.col("event_type"), F.lit(_DP_SEED))).cast("double")
        / F.lit(float(1 << 60))
        - F.lit(0.5)
    )
    noise = (
        F.lit(-_DP_B)
        * F.signum(uc)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(uc))
    )
    # ln() is 1-ulp, not correctly-rounded: pre-round the noise to 6dp on
    # BOTH engines before the integer floor so a noise value within 1 ulp
    # of an integer boundary can't flip noisy_count cross-engine (ADVICE
    # r06). round_half_up's non-negative caveat is a don't-care here: the
    # identical floor(x*1e6+0.5) double ops run on both sides, and
    # half-toward-+inf at a 6dp boundary is immaterial for DP noise.
    return c.select(
        "event_type",
        F.floor(F.col("n") + tx.round_half_up(noise, 6) + F.lit(0.5))
        .cast("long")
        .alias("noisy_count"),
        F.lit(_DP_EPSILON).alias("epsilon"),
    )


# --------------------------------------------------------------------------
# merge_incremental_aggs — incremental view maintenance: base+delta
# partial states merge exactly to the full recompute
# --------------------------------------------------------------------------

_IVM_CUT_EPOCH = 946684800  # 2000-01-01T00:00:00Z


@register(
    "merge_incremental_aggs",
    f"""
WITH o AS (
    SELECT o_orderpriority AS pri,
           CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
           CASE WHEN floor(epoch(o_orderdate)) >= {_IVM_CUT_EPOCH}
                THEN 1 ELSE 0 END AS is_delta
    FROM orders
),
part AS (
    SELECT pri, is_delta,
           count(*) AS cnt, sum(cents) AS s,
           min(cents) AS mn, max(cents) AS mx
    FROM o GROUP BY 1, 2
),
merged AS (
    SELECT pri,
           sum(cnt) AS cnt, sum(s) AS s, min(mn) AS mn, max(mx) AS mx,
           sum(CASE WHEN is_delta = 1 THEN cnt ELSE 0 END) AS delta_cnt
    FROM part GROUP BY 1
),
full_ AS (
    SELECT pri, count(*) AS cnt, sum(cents) AS s,
           min(cents) AS mn, max(cents) AS mx
    FROM o GROUP BY 1
)
SELECT m.pri AS o_orderpriority,
       CAST(m.cnt AS BIGINT) AS n_orders,
       CAST(m.s AS BIGINT) AS total_cents,
       CAST(m.mn AS BIGINT) AS min_cents,
       CAST(m.mx AS BIGINT) AS max_cents,
       {_duck_round_half_up("CAST(m.delta_cnt AS DOUBLE) / m.cnt", 6)} AS delta_share,
       (m.cnt = f.cnt AND m.s = f.s AND m.mn = f.mn AND m.mx = f.mx)
           AS merge_consistent
FROM merged m JOIN full_ f USING (pri)
""",
)
def merge_incremental_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance audit: orders split at a fixed epoch
    into base and delta, per-priority partial aggregation STATES
    (count / sum / min / max over integer cents) computed on each side
    independently, merged with the algebraic combine (sum-of-sums,
    min-of-mins), and proven equal to the full recompute —
    ``merge_consistent`` must be TRUE on every row. Prices go through
    the half-up cents cast first, so every state is a BIGINT and the
    merge equality is exact, not epsilon-tolerant.

    100 TB shape: this is THE pattern that avoids rescanning 100 TB of
    base data when a day of delta lands — partial states are tiny
    (groups x 4 longs), the merge is a group-key join of two aggregate
    outputs, and commutative/associative states mean executor-side
    partial aggregation already does the same algebra inside each side.
    (sumsq/variance states would join the same merge at DECIMAL(38)
    width — left out here to keep int64 exactness at every SF.)"""
    orders = _load_parallel(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_orderpriority").alias("pri"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents"),
        (F.col("o_orderdate").cast("long") >= _IVM_CUT_EPOCH)
        .cast("int")
        .alias("is_delta"),
    )
    part = o.groupBy("pri", "is_delta").agg(
        F.count("*").alias("cnt"),
        F.sum("cents").alias("s"),
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
    )
    merged = part.groupBy("pri").agg(
        F.sum("cnt").alias("cnt"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.sum(
            F.when(F.col("is_delta") == 1, F.col("cnt")).otherwise(F.lit(0))
        ).alias("delta_cnt"),
    )
    full = o.groupBy("pri").agg(
        F.count("*").alias("f_cnt"),
        F.sum("cents").alias("f_s"),
        F.min("cents").alias("f_mn"),
        F.max("cents").alias("f_mx"),
    )
    return (
        merged.join(full, "pri")
        .select(
            F.col("pri").alias("o_orderpriority"),
            F.col("cnt").cast("long").alias("n_orders"),
            F.col("s").cast("long").alias("total_cents"),
            F.col("mn").cast("long").alias("min_cents"),
            F.col("mx").cast("long").alias("max_cents"),
            tx.round_half_up(
                F.col("delta_cnt").cast("double") / F.col("cnt"), 6
            ).alias("delta_share"),
            (
                (F.col("cnt") == F.col("f_cnt"))
                & (F.col("s") == F.col("f_s"))
                & (F.col("mn") == F.col("f_mn"))
                & (F.col("mx") == F.col("f_mx"))
            ).alias("merge_consistent"),
        )
    )


# --------------------------------------------------------------------------
# loo_group_influence — leave-one-source-out influence on corpus mean
# --------------------------------------------------------------------------


@register(
    "loo_group_influence",
    f"""
WITH t AS (
    SELECT source, CAST(len({_TOKS}) AS BIGINT) AS s
    FROM documents
),
g AS (SELECT source, count(*) AS n_g, sum(s) AS s_g FROM t GROUP BY 1),
tot AS (SELECT count(*) AS n, sum(s) AS s FROM t)
SELECT source,
       CAST(n_g AS BIGINT) AS n_docs,
       {_duck_round_half_up("CAST(s AS DOUBLE) / n", 6)} AS mean_tokens_all,
       {_duck_round_half_up("CAST(s - s_g AS DOUBLE) / (n - n_g)", 6)} AS mean_tokens_excl,
       CAST(CASE WHEN (CAST(s - s_g AS DOUBLE) / (n - n_g)
                       - CAST(s AS DOUBLE) / n) < 0 THEN -1 ELSE 1 END
            * floor(abs(CAST(s - s_g AS DOUBLE) / (n - n_g)
                        - CAST(s AS DOUBLE) / n) * 1000000.0 + 0.5)
            AS BIGINT) AS delta_ppm
FROM g CROSS JOIN tot
""",
)
def loo_group_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out influence: how much would the corpus mean
    token count move if source g were dropped? Computed algebraically —
    mean_excl = (S - S_g) / (N - N_g) from one aggregation pass, NOT by
    re-scanning the corpus per group (the naive leave-one-out is
    O(groups x corpus); this is O(corpus)). ``delta_ppm`` is the signed
    micro-token shift, kept integral (both means are ratios of exact
    BIGINTs, so both engines compute bit-identical doubles and the
    signed half-up micros cast is exact).

    100 TB shape: one corpus scan to per-source sufficient statistics,
    one broadcast of the 1-row grand total — the influence of every
    group falls out of the same pass that computes the mean. This is
    the cheap first rung of data-valuation (Shapley-lite) used to rank
    sources before expensive per-source ablation training runs."""
    docs = _load_parallel(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.size(tx.tokens(F.lower(F.col("text")))).cast("long").alias("s")
    )
    g = t.groupBy("source").agg(
        F.count("*").alias("n_g"), F.sum("s").alias("s_g")
    )
    tot = t.agg(F.count("*").alias("n"), F.sum("s").alias("s"))
    mean_all = F.col("s").cast("double") / F.col("n")
    mean_excl = (F.col("s") - F.col("s_g")).cast("double") / (
        F.col("n") - F.col("n_g")
    )
    diff = mean_excl - mean_all
    return g.join(F.broadcast(tot)).select(
        "source",
        F.col("n_g").cast("long").alias("n_docs"),
        tx.round_half_up(mean_all, 6).alias("mean_tokens_all"),
        tx.round_half_up(mean_excl, 6).alias("mean_tokens_excl"),
        (
            F.when(diff < 0, F.lit(-1)).otherwise(F.lit(1))
            * F.floor(F.abs(diff) * 1000000.0 + 0.5)
        )
        .cast("long")
        .alias("delta_ppm"),
    )


# --------------------------------------------------------------------------
# kneser_ney_bigram — interpolated Kneser-Ney bigram LM
# --------------------------------------------------------------------------

_KN_D = 0.75  # absolute discount (exactly representable)
_KN_MIN_COUNT = 8  # report bigrams at/above this raw count

# identical formula text on both engines: discounted count + D-weighted
# continuation mass, one division by the prefix total
_KN_EXPR = (
    f"(greatest(CAST(n_ab AS DOUBLE) - {_KN_D}, 0.0)"
    f" + {_KN_D} * n1_fwd * (CAST(n1_back AS DOUBLE) / n_types))"
    " / CAST(c_a AS DOUBLE)"
)


@register(
    "kneser_ney_bigram",
    f"""
WITH d AS (SELECT {_TOKS} AS t FROM documents),
bg AS (
    SELECT t[i] AS tok_a, t[i + 1] AS tok_b
    FROM d, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS g(i)
),
pair AS (SELECT tok_a, tok_b, count(*) AS n_ab FROM bg GROUP BY 1, 2),
pre AS (
    SELECT tok_a, sum(n_ab) AS c_a, count(*) AS n1_fwd
    FROM pair GROUP BY 1
),
back AS (SELECT tok_b, count(*) AS n1_back FROM pair GROUP BY 1),
types AS (SELECT count(*) AS n_types FROM pair)
SELECT pair.tok_a, pair.tok_b,
       CAST(n_ab AS BIGINT) AS n_ab,
       {_duck_round_half_up(_KN_EXPR, 6)} AS p_kn
FROM pair
JOIN pre USING (tok_a)
JOIN back USING (tok_b)
CROSS JOIN types
WHERE n_ab >= {_KN_MIN_COUNT}
""",
)
def kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities — the smoothing
    n-gram corpus scorers actually use (absolute discount D=0.75 plus
    continuation probability), vs bigram_lm_probs' add-k:
    P_kn(b|a) = (max(c(ab)-D, 0) + D * N1+(a.) * N1+(.b)/N1+(..)) / c(a.).
    Every statistic (pair counts, prefix totals, forward/backward type
    counts, total bigram types) is an exact integer; the formula text is
    byte-identical on both engines so the IEEE evaluation order — and
    therefore the 6dp half-up rounding — matches bit-for-bit. Stats
    come from the UNFILTERED pair table; the >= 8 count filter applies
    only to the reported rows.

    100 TB shape: bigrams come from a per-document JVM zip_with (no
    self-join, no Python); after the one corpus-wide pair aggregation,
    everything is vocabulary-bounded — pre/back/types are broadcast
    joins. Reference: Kneser & Ney (1995); Chen & Goodman (1999) for
    the interpolated form."""
    docs = _load_parallel(spark, sf_dir, "documents")
    t = docs.select(tx.tokens(F.lower(F.col("text"))).alias("t"))
    bg = t.select(
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, greatest(size(t) - 1, 0)),"
                " slice(t, 2, greatest(size(t) - 1, 0)),"
                " (x, y) -> struct(x AS tok_a, y AS tok_b))"
            )
        ).alias("b")
    ).select("b.tok_a", "b.tok_b")
    pair = bg.groupBy("tok_a", "tok_b").agg(F.count("*").alias("n_ab"))
    pre = pair.groupBy("tok_a").agg(
        F.sum("n_ab").alias("c_a"), F.count("*").alias("n1_fwd")
    )
    back = pair.groupBy("tok_b").agg(F.count("*").alias("n1_back"))
    types = pair.agg(F.count("*").alias("n_types"))
    return (
        pair.filter(F.col("n_ab") >= _KN_MIN_COUNT)
        .join(F.broadcast(pre), "tok_a")
        .join(F.broadcast(back), "tok_b")
        .join(F.broadcast(types))
        .select(
            "tok_a",
            "tok_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            tx.round_half_up(F.expr(_KN_EXPR), 6).alias("p_kn"),
        )
    )
