"""Eighteenth query tranche: evaluation statistics a 100 TB pipeline
computes about itself — an exact ROC-AUC for the quality classifier
(integer rank-sum, not a sampled approximation), per-nation weekly
order-volume OLS trends from integer sufficient statistics, Cohen's
kappa for the language-id heuristic against labels, a chi-square
independence screen of event type vs day-of-week, eval-split
cross-entropy under the add-1 train bigram LM, and a batch replay of
streaming watermark semantics (per-key high-water-mark lateness audit).

Every query keeps its heavy math on integers (counts, epoch seconds,
midranks doubled to stay integral) until one final double division, so
the outputs reproduce bit-exactly on both engines; the k/n-shaped
ratios round through the portable half-up twins (ADVICE r04).

Reference parity note: the reference engine (Kafka Streams DSL,
SolarConsumer.java) has no analogue — these extend the engine toward the
LLM-data-pipeline north star (SURVEY.md §2, beyond-reference table).
The watermark audit is the batch twin of the suppression/watermark
mapping documented for E1 (SolarConsumer.java:114,129,156).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.llm_extra3 import split_case_sql, split_col
from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.registry import (
    _TOKS,
    ORACLES,
    QUERIES,
    _duck_lang_sql,
    _duck_round_half_up,
    _load_parallel,
    register,
)

# --------------------------------------------------------------------------
# roc_auc_quality — exact ROC-AUC of the quality classifier vs is_en
# --------------------------------------------------------------------------

_AUC_EXPR = (
    "CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)"
    " / nullif(2.0 * n_pos * n_neg, 0.0)"
)


@register(
    "roc_auc_quality",
    f"""
WITH logreg AS ({{logreg}}),
lab AS (
    SELECT l.quality_prob AS s,
           CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
    FROM logreg l JOIN documents d USING (doc_id)
),
per AS (
    SELECT s, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS np
    FROM lab GROUP BY s
),
ranked AS (
    SELECT np,
           2 * CAST(coalesce(sum(n) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) + n + 1 AS midrank2
    FROM per
),
tot AS (
    SELECT CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(n) - sum(np) AS BIGINT) AS n_neg
    FROM per
),
num AS (SELECT CAST(sum(np * midrank2) AS BIGINT) AS s2 FROM ranked)
SELECT n_pos, n_neg,
       {_duck_round_half_up(_AUC_EXPR, 6)} AS auc
FROM tot, num
""",
)
def roc_auc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of quality_logreg_score's probability against the
    is-English label, via the Mann–Whitney rank-sum identity with
    midranks for ties. The 6dp-rounded probability (already the
    classifier's published output) is the rank key; midranks are kept
    DOUBLED so every quantity stays an exact BIGINT until the single
    final division, which rounds through the portable half-up twin —
    AUC is a rational with denominator 2·n_pos·n_neg and CAN land on
    6dp half-boundaries.

    100 TB shape: one corpus-scale groupBy on the score, then the
    cumulative-rank window runs on the DISTINCT-SCORE table, which is
    bounded at 10^6+1 rows by the 6dp quantization — a deliberate
    single-partition window over bounded data, not over the corpus.
    (At trillion-doc scale the BIGINT rank products would move to
    DECIMAL(38,0); documented in SCALE.md.)"""
    q = QUERIES["quality_logreg_score"](spark, sf_dir).select(
        "doc_id", "quality_prob"
    )
    docs = _load_parallel(spark, sf_dir, "documents").select("doc_id", "lang")
    lab = q.join(docs, "doc_id").select(
        F.col("quality_prob").alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
    )
    per = lab.groupBy("s").agg(
        F.count("*").alias("n"), F.sum("y").alias("np")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per.select(
        "np",
        (
            2 * F.coalesce(F.sum("n").over(w), F.lit(0).cast("long"))
            + F.col("n")
            + 1
        ).alias("midrank2"),
    )
    num = ranked.agg(F.sum(F.col("np") * F.col("midrank2")).alias("s2"))
    tot = per.agg(
        F.sum("np").cast("long").alias("n_pos"),
        (F.sum("n") - F.sum("np")).cast("long").alias("n_neg"),
    )
    joined = tot.crossJoin(F.broadcast(num))  # 1-row x 1-row
    auc = (
        (F.col("s2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
    ) / F.nullif(2.0 * F.col("n_pos") * F.col("n_neg"), F.lit(0.0))
    return joined.select(
        "n_pos", "n_neg", tx.round_half_up(auc, 6).alias("auc")
    )


ORACLES["roc_auc_quality"] = ORACLES["roc_auc_quality"].format(
    logreg=ORACLES["quality_logreg_score"]
)

# --------------------------------------------------------------------------
# ols_trend_nation_orders — per-nation weekly order-volume OLS
# --------------------------------------------------------------------------

_OLS_SLOPE_NUM = "CAST(n * sxy - sx * sy AS DOUBLE)"
_OLS_SLOPE_DEN = "nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0.0)"
_OLS_SLOPE = f"({_OLS_SLOPE_NUM} / {_OLS_SLOPE_DEN})"
_OLS_INTERCEPT = (
    f"((CAST(sy AS DOUBLE) - {_OLS_SLOPE} * CAST(sx AS DOUBLE))"
    " / CAST(n AS DOUBLE))"
)
_OLS_R2 = (
    f"(({_OLS_SLOPE_NUM}) * ({_OLS_SLOPE_NUM})"
    f" / nullif(CAST(n * sxx - sx * sx AS DOUBLE)"
    f" * CAST(n * syy - sy * sy AS DOUBLE), 0.0))"
)


@register(
    "ols_trend_nation_orders",
    f"""
WITH wk AS (
    SELECT nat.n_name AS nation,
           CAST(floor(floor(epoch(o.o_orderdate)) / 604800.0) AS BIGINT) AS w,
           CAST(count(*) AS BIGINT) AS c
    FROM orders o
    JOIN customer cu ON o.o_custkey = cu.c_custkey
    JOIN nation nat ON cu.c_nationkey = nat.n_nationkey
    GROUP BY 1, 2
),
s AS (
    SELECT nation,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(w) AS BIGINT) AS sx,
           CAST(sum(c) AS BIGINT) AS sy,
           CAST(sum(w * c) AS BIGINT) AS sxy,
           CAST(sum(w * w) AS BIGINT) AS sxx,
           CAST(sum(c * c) AS BIGINT) AS syy
    FROM wk GROUP BY 1
)
SELECT nation, n AS n_weeks,
       {_duck_round_half_up(_OLS_SLOPE, 6)} AS slope,
       {_duck_round_half_up(_OLS_INTERCEPT, 6)} AS intercept,
       {_duck_round_half_up(_OLS_R2, 6)} AS r2
FROM s
""",
)
def ols_trend_nation_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation ordinary-least-squares trend of weekly order volume:
    x = tz-independent epoch week, y = order count. Slope, intercept
    and r² come from the five integer sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²) — the classic one-pass distributed
    regression: the wide data reduces map-side to a (nation, week)
    count, then to one 25-row stats table; the float math runs once per
    nation on exact BIGINT inputs, so both engines produce identical
    IEEE doubles. (Squared differences are cast to DOUBLE before
    multiplying so r²'s numerator can't overflow BIGINT.)

    100 TB shape: two shuffles total — the (nation, week) count with
    full map-side combine, then the per-nation fold; nation is a
    25-row broadcast. At petabyte row counts the sufficient statistics
    would widen to DECIMAL(38,0) (SCALE.md)."""
    o = _load_parallel(spark, sf_dir, "orders")
    cu = _load_parallel(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    week = F.floor(
        F.floor(F.col("o_orderdate").cast("double")) / F.lit(604800.0)
    ).cast("long")
    wk = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(nat), cu.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), week.alias("w"))
        .agg(F.count("*").alias("c"))
    )
    s = wk.groupBy("nation").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("w").cast("long").alias("sx"),
        F.sum("c").cast("long").alias("sy"),
        F.sum(F.col("w") * F.col("c")).cast("long").alias("sxy"),
        F.sum(F.col("w") * F.col("w")).cast("long").alias("sxx"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = F.nullif(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        ),
        F.lit(0.0),
    )
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    r2 = (num * num) / F.nullif(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (
            F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
        ).cast("double"),
        F.lit(0.0),
    )
    return s.select(
        "nation",
        F.col("n").alias("n_weeks"),
        tx.round_half_up(slope, 6).alias("slope"),
        tx.round_half_up(intercept, 6).alias("intercept"),
        tx.round_half_up(r2, 6).alias("r2"),
    )


# --------------------------------------------------------------------------
# cohens_kappa_langid — chance-corrected lang-id agreement
# --------------------------------------------------------------------------


@register(
    "cohens_kappa_langid",
    f"""
WITH pred AS ({_duck_lang_sql()}),
cells AS (
    SELECT lang AS actual, lang_pred AS predicted,
           CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2
),
tot AS (
    SELECT CAST(sum(n) AS BIGINT) AS nn,
           CAST(coalesce(sum(n) FILTER (WHERE actual = predicted), 0)
               AS BIGINT) AS diag
    FROM cells
),
marg AS (
    SELECT CAST(coalesce(sum(ra.rn * ca.cn), 0) AS BIGINT) AS s
    FROM (SELECT actual AS k, CAST(sum(n) AS BIGINT) AS rn
          FROM cells GROUP BY 1) ra
    JOIN (SELECT predicted AS k, CAST(sum(n) AS BIGINT) AS cn
          FROM cells GROUP BY 1) ca USING (k)
)
SELECT nn AS n_docs,
       {_duck_round_half_up("CAST(diag AS DOUBLE) / nn", 6)} AS po,
       {_duck_round_half_up(
           "CAST(s AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))", 6
       )} AS pe,
       {_duck_round_half_up(
           "CAST(diag * nn - s AS DOUBLE)"
           " / nullif(CAST(nn * nn - s AS DOUBLE), 0.0)",
           6,
       )} AS kappa
FROM tot, marg
""",
)
def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the stopword-ratio language identifier and
    the labeled lang column — the chance-corrected agreement score that
    says whether the heuristic beats marginal guessing. Exploits that
    kappa = (diag·N − Σ row·col) / (N² − Σ row·col) is a ratio of exact
    BIGINTs, so both engines divide the same integers; po and pe are
    k/n rationals and round through the portable half-up twin.

    100 TB shape: the lang_id scan collapses to a (langs × langs) cell
    table; marginals, diagonal and the kappa algebra all run on those
    few dozen rows. (N² would widen to DECIMAL(38,0) past ~3B docs.)"""
    docs = _load_parallel(spark, sf_dir, "documents")
    cells = (
        docs.select(
            F.col("lang").alias("actual"),
            tx.lang_id(F.col("text")).alias("predicted"),
        )
        .groupBy("actual", "predicted")
        .agg(F.count("*").alias("n"))
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("nn"),
        F.coalesce(
            F.sum(F.when(F.col("actual") == F.col("predicted"), F.col("n"))),
            F.lit(0),
        )
        .cast("long")
        .alias("diag"),
    )
    ra = cells.groupBy(F.col("actual").alias("k")).agg(
        F.sum("n").cast("long").alias("rn")
    )
    ca = cells.groupBy(F.col("predicted").alias("k")).agg(
        F.sum("n").cast("long").alias("cn")
    )
    marg = (
        ra.join(ca, "k")
        .agg(
            F.coalesce(F.sum(F.col("rn") * F.col("cn")), F.lit(0))
            .cast("long")
            .alias("s")
        )
    )
    j = tot.crossJoin(F.broadcast(marg))  # 1-row x 1-row
    nn_d = F.col("nn").cast("double")
    po = F.col("diag").cast("double") / nn_d
    pe = F.col("s").cast("double") / (nn_d * nn_d)
    kappa = (F.col("diag") * F.col("nn") - F.col("s")).cast(
        "double"
    ) / F.nullif(
        (F.col("nn") * F.col("nn") - F.col("s")).cast("double"), F.lit(0.0)
    )
    return j.select(
        F.col("nn").alias("n_docs"),
        tx.round_half_up(po, 6).alias("po"),
        tx.round_half_up(pe, 6).alias("pe"),
        tx.round_half_up(kappa, 6).alias("kappa"),
    )


# --------------------------------------------------------------------------
# chisq_eventtype_dow — chi-square independence screen
# --------------------------------------------------------------------------


@register(
    "chisq_eventtype_dow",
    """
WITH e AS (
    SELECT event_type,
           CAST(floor(floor(epoch(ts)) / 86400.0) AS BIGINT) % 7 AS dow
    FROM events WHERE ts IS NOT NULL
),
cells AS (
    SELECT event_type, dow, CAST(count(*) AS BIGINT) AS o
    FROM e GROUP BY 1, 2
),
rm AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
cm AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells),
grid AS (
    SELECT rm.event_type, cm.dow, rm.rt, cm.ct,
           coalesce(c.o, 0) AS o
    FROM rm CROSS JOIN cm
    LEFT JOIN cells c ON rm.event_type = c.event_type AND cm.dow = c.dow
),
terms AS (
    SELECT (CAST(o AS DOUBLE)
            - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE))
           * (CAST(o AS DOUBLE)
              - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE))
           / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE))
               AS term
    FROM grid, tot
)
SELECT (SELECT nn FROM tot) AS n_events,
       (SELECT CAST(count(*) AS BIGINT) FROM rm) AS n_types,
       (SELECT CAST(count(*) AS BIGINT) FROM cm) AS n_dows,
       (SELECT CAST((count(*) - 1) AS BIGINT) FROM rm)
           * (SELECT CAST((count(*) - 1) AS BIGINT) FROM cm) AS df,
       round(sum(term), 6) AS chi2
FROM terms
""",
)
def chisq_eventtype_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and
    (tz-independent epoch) day-of-week — the drift screen that says
    whether traffic mix depends on weekday. The full r×c expected grid
    is materialized (absent cells count as observed 0), expected counts
    are the identical double expression rt·ct/N on both engines, and
    the statistic sums a few dozen cell terms before one 6dp round.

    100 TB shape: one corpus-scale (type, dow) count with map-side
    combine; marginals, the cross-joined grid (bounded: types × 7) and
    the statistic all run broadcast-scale."""
    ev = (
        _load_parallel(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            (
                F.floor(
                    F.floor(F.col("ts").cast("double")) / F.lit(86400.0)
                ).cast("long")
                % 7
            ).alias("dow"),
        )
    )
    cells = ev.groupBy("event_type", "dow").agg(F.count("*").alias("o"))
    rm = cells.groupBy("event_type").agg(F.sum("o").cast("long").alias("rt"))
    cm = cells.groupBy("dow").agg(F.sum("o").cast("long").alias("ct"))
    tot = cells.agg(F.sum("o").cast("long").alias("nn"))
    grid = (
        rm.crossJoin(F.broadcast(cm))  # bounded: event types x 7 dows
        .join(F.broadcast(cells), ["event_type", "dow"], "left")
        .select(
            "rt", "ct", F.coalesce(F.col("o"), F.lit(0)).alias("o")
        )
        .crossJoin(F.broadcast(tot))  # 1-row total
    )
    exp = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("nn").cast("double")
    )
    term = (F.col("o").cast("double") - exp) * (
        F.col("o").cast("double") - exp
    ) / exp
    stats = grid.agg(F.round(F.sum(term), 6).alias("chi2"))
    counts = (
        tot.crossJoin(
            F.broadcast(rm.agg(F.count("*").cast("long").alias("n_types")))
        )
        .crossJoin(
            F.broadcast(cm.agg(F.count("*").cast("long").alias("n_dows")))
        )
    )
    return counts.crossJoin(F.broadcast(stats)).select(
        F.col("nn").alias("n_events"),
        "n_types",
        "n_dows",
        ((F.col("n_types") - 1) * (F.col("n_dows") - 1)).alias("df"),
        "chi2",
    )


# --------------------------------------------------------------------------
# bigram_crossentropy_eval — eval-split cross-entropy under the train LM
# --------------------------------------------------------------------------

_XE_UNSEEN = (
    "CAST(sum(CASE WHEN c_tr = 0 THEN c_ev ELSE 0 END) AS DOUBLE)"
    " / CAST(sum(c_ev) AS DOUBLE)"
)


@register(
    "bigram_crossentropy_eval",
    f"""
WITH d AS (
    SELECT lang,
           CASE WHEN {split_case_sql("doc_id")} = 'train'
                THEN 'train' ELSE 'eval' END AS split,
           {_TOKS} AS t
    FROM documents
),
bg AS (
    SELECT lang, split, t[i] AS a, t[i + 1] AS b
    FROM d, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS g(i)
),
tokv AS (
    SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS vocab
    FROM (SELECT lang, unnest(t) AS tok FROM d WHERE split = 'train')
    GROUP BY 1
),
tr_pair AS (
    SELECT lang, a, b, CAST(count(*) AS BIGINT) AS c_tr
    FROM bg WHERE split = 'train' GROUP BY 1, 2, 3
),
tr_pre AS (
    SELECT lang, a, CAST(count(*) AS BIGINT) AS n_a
    FROM bg WHERE split = 'train' GROUP BY 1, 2
),
ev AS (
    SELECT lang, a, b, CAST(count(*) AS BIGINT) AS c_ev
    FROM bg WHERE split = 'eval' GROUP BY 1, 2, 3
),
j AS (
    SELECT ev.lang, ev.c_ev,
           coalesce(tp.c_tr, 0) AS c_tr,
           coalesce(pre.n_a, 0) AS n_a,
           v.vocab
    FROM ev
    LEFT JOIN tr_pair tp
        ON ev.lang = tp.lang AND ev.a = tp.a AND ev.b = tp.b
    LEFT JOIN tr_pre pre ON ev.lang = pre.lang AND ev.a = pre.a
    JOIN tokv v ON ev.lang = v.lang
)
SELECT lang, vocab,
       CAST(sum(c_ev) AS BIGINT) AS n_eval_bigrams,
       round(-sum(c_ev * log2((c_tr + 1.0) / (n_a + vocab)))
             / CAST(sum(c_ev) AS DOUBLE), 6) AS cross_entropy,
       {_duck_round_half_up(_XE_UNSEEN, 6)} AS unseen_rate
FROM j GROUP BY lang, vocab
""",
)
def bigram_crossentropy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language cross-entropy (bits/bigram) of the eval split under
    the add-1-smoothed bigram LM fitted on the train split — the
    held-out LM readout behind perplexity-based quality gates, using
    the canonical split_col assignment so it can never measure a
    different split than train_eval_split. unseen_rate (eval bigram
    mass never seen in train) is a k/n rational → portable rounding.

    100 TB shape: bigrams come from a per-document JVM zip_with (no
    self-join, no Python); everything after the first groupBy lives on
    vocabulary-bounded tables — train pair/prefix counts, the per-lang
    vocab row — joined on (lang, token) keys; raw text never shuffles."""
    docs = _load_parallel(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.when(split_col(F.col("doc_id")) == "train", "train")
        .otherwise("eval")
        .alias("split"),
        tx.tokens(F.lower(F.col("text"))).alias("t"),
    )
    bg = d.select(
        "lang",
        "split",
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, greatest(size(t) - 1, 0)),"
                " slice(t, 2, greatest(size(t) - 1, 0)),"
                " (x, y) -> struct(x AS a, y AS b))"
            )
        ).alias("p"),
    ).select("lang", "split", "p.a", "p.b")
    tokv = (
        d.filter(F.col("split") == "train")
        .select("lang", F.explode("t").alias("tok"))
        .groupBy("lang")
        .agg(F.countDistinct("tok").cast("long").alias("vocab"))
    )
    tr = bg.filter(F.col("split") == "train")
    tr_pair = tr.groupBy("lang", "a", "b").agg(
        F.count("*").cast("long").alias("c_tr")
    )
    tr_pre = tr.groupBy("lang", "a").agg(
        F.count("*").cast("long").alias("n_a")
    )
    ev = bg.filter(F.col("split") == "eval").groupBy("lang", "a", "b").agg(
        F.count("*").cast("long").alias("c_ev")
    )
    j = (
        ev.join(tr_pair, ["lang", "a", "b"], "left")
        .join(F.broadcast(tr_pre), ["lang", "a"], "left")
        .join(F.broadcast(tokv), "lang")
        .select(
            "lang",
            "vocab",
            "c_ev",
            F.coalesce(F.col("c_tr"), F.lit(0).cast("long")).alias("c_tr"),
            F.coalesce(F.col("n_a"), F.lit(0).cast("long")).alias("n_a"),
        )
    )
    p = (F.col("c_tr") + F.lit(1.0)) / (F.col("n_a") + F.col("vocab"))
    unseen = F.sum(
        F.when(F.col("c_tr") == 0, F.col("c_ev")).otherwise(
            F.lit(0).cast("long")
        )
    ).cast("double") / F.sum("c_ev").cast("double")
    return j.groupBy("lang", "vocab").agg(
        F.sum("c_ev").cast("long").alias("n_eval_bigrams"),
        F.round(
            -F.sum(F.col("c_ev") * F.log2(p)) / F.sum("c_ev").cast("double"),
            6,
        ).alias("cross_entropy"),
        tx.round_half_up(unseen, 6).alias("unseen_rate"),
    )


# --------------------------------------------------------------------------
# watermark_late_event_audit — batch replay of streaming watermark drops
# --------------------------------------------------------------------------

_WM_DELAY_S = 600  # watermark delay: 10 minutes


@register(
    "watermark_late_event_audit",
    f"""
WITH seq AS (
    SELECT event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS e,
           max(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
    FROM events WHERE ts IS NOT NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE hwm - e > 0) AS BIGINT) AS n_out_of_order,
       CAST(count(*) FILTER (WHERE hwm - e > {_WM_DELAY_S}) AS BIGINT)
           AS n_late_dropped,
       CAST(coalesce(max(CASE WHEN hwm > e THEN hwm - e ELSE 0 END), 0)
           AS BIGINT) AS max_disorder_s,
       {_duck_round_half_up(
           "CAST(count(*) FILTER (WHERE hwm - e > " + str(_WM_DELAY_S)
           + ") AS DOUBLE) / count(*)",
           6,
       )} AS late_share
FROM seq GROUP BY 1
""",
)
def watermark_late_event_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of Structured Streaming's watermark semantics over
    the recorded event log: per user (the stream key), the event-time
    high-water-mark advances in arrival order (event_id = the Kafka
    offset analogue), and an event arriving more than the 10-minute
    watermark delay behind the per-key high-water-mark would have been
    dropped by a `withWatermark("ts", "10 minutes")` aggregation. Per
    event type: how many events are out-of-order at all, how many the
    watermark would drop, and the worst disorder in seconds — the audit
    that sizes the delay BEFORE a streaming job silently sheds data
    (the batch twin of streaming/solar_stream.py's E1 mapping;
    reference: SolarConsumer.java:114,129,156 suppression).

    100 TB shape: one window function partitioned by the stream key —
    exactly the state layout the streaming engine itself would hold —
    then a per-type fold; late_share is k/n → portable rounding."""
    ev = (
        _load_parallel(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            "user_id",
            "event_id",
            F.col("ts").cast("long").alias("e"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "event_type", "e", F.max("e").over(w).alias("hwm")
    )
    late = F.col("hwm") - F.col("e") > _WM_DELAY_S
    ooo = F.col("hwm") - F.col("e") > 0
    disorder = F.when(
        F.col("hwm") > F.col("e"), F.col("hwm") - F.col("e")
    ).otherwise(F.lit(0).cast("long"))
    n_late = F.sum(F.when(late, 1).otherwise(0))
    return seq.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.when(ooo, 1).otherwise(0)).cast("long").alias(
            "n_out_of_order"
        ),
        n_late.cast("long").alias("n_late_dropped"),
        F.coalesce(F.max(disorder), F.lit(0).cast("long")).alias(
            "max_disorder_s"
        ),
        tx.round_half_up(
            n_late.cast("double") / F.count("*"), 6
        ).alias("late_share"),
    )
