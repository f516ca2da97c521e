"""Twenty-first query tranche: sampling, blocking and feature-scoring
operators — exact-size stratified sampling by largest-remainder
(Hamilton) apportionment with a deterministic per-stratum id checksum,
phonetic (soundex-style) blocking pairs for entity resolution on part
names, per-token local clustering coefficients on the co-occurrence
graph (the node-level refinement of cooccurrence_triangles),
weight-of-evidence / information-value feature scoring of document
length against the is-English label, and a stupid-backoff trigram LM
(the Brants et al. web-scale smoothing, next to the Kneser-Ney and
add-k bigram tiers).

Quotas, ranks, degrees and counts stay integral; every reported ratio
is a division of exact integers (bit-identical on both engines) rounded
through the portable half-up twins; the WOE logs follow the chisq
precedent (bounded term sets, native 6dp round).

Reference parity note: the reference engine (Kafka Streams DSL,
SolarConsumer.java) has no analogue — these extend the engine toward
the LLM-data-pipeline north star (SURVEY.md §2, beyond-reference
table). Stupid backoff: Brants et al., "Large Language Models in
Machine Translation" (2007).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.registry import (
    _TOKS,
    _duck_round_half_up,
    _load_parallel,
    register,
)

# --------------------------------------------------------------------------
# proportional_allocation_sample — Hamilton apportionment stratified sample
# --------------------------------------------------------------------------

_PA_N = 100  # total sample size, apportioned across lang strata
_PA_SALT = ":pasample"


@register(
    "proportional_allocation_sample",
    f"""
WITH g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_g FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n FROM g),
q AS (
    SELECT lang, n_g,
           ({_PA_N} * n_g) // n AS base,
           ({_PA_N} * n_g) % n AS rem
    FROM g CROSS JOIN tot
),
lo AS (SELECT {_PA_N} - sum(base) AS leftover FROM q),
quota AS (
    SELECT lang, n_g,
           base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
                       <= (SELECT leftover FROM lo) THEN 1 ELSE 0 END AS quota
    FROM q
),
keyed AS (
    SELECT d.doc_id, d.lang, quota.quota,
           row_number() OVER (
               PARTITION BY d.lang
               ORDER BY CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
                       || '{_PA_SALT}'), 1, 15)) AS BIGINT), d.doc_id
           ) AS rk
    FROM documents d JOIN quota ON d.lang = quota.lang
)
SELECT lang,
       CAST(max(quota) AS BIGINT) AS quota,
       CAST(sum(CASE WHEN rk <= quota THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(sum(CASE WHEN rk <= quota THEN doc_id ELSE 0 END) AS BIGINT)
           AS id_checksum
FROM keyed GROUP BY 1
""",
)
def proportional_allocation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size stratified sample: the total budget of 100 documents
    is apportioned across language strata by the largest-remainder
    (Hamilton) method — floor quotas plus one bonus seat per largest
    integer remainder (100·n_g mod n, so the comparison is exact
    integer arithmetic, never a float tie) — then each stratum takes
    its quota by deterministic hash priority. ``id_checksum`` (sum of
    selected ids) pins the EXACT selected set, not just its size, and
    ``n_sampled == quota`` holds whenever the stratum is large enough.

    100 TB shape: quotas come from a stratum-count aggregate (stratum-
    cardinality rows); selection is one per-stratum window over
    (hash, id) — the same bounded-partition sort every stratified
    sampler here uses — with nothing but (id, lang, 8-byte hash) in the
    shuffle. Unlike fraction-based sampleBy, the output size is exactly
    N by construction, which is what a fixed eval-set budget needs."""
    docs = _load_parallel(spark, sf_dir, "documents")
    g = docs.groupBy("lang").agg(F.count("*").alias("n_g"))
    tot = g.agg(F.sum("n_g").alias("n"))
    q = g.join(F.broadcast(tot)).select(
        "lang",
        "n_g",
        F.expr(f"({_PA_N} * n_g) div n").alias("base"),
        ((_PA_N * F.col("n_g")) % F.col("n")).alias("rem"),
    )
    lo = q.agg((F.lit(_PA_N) - F.sum("base")).alias("leftover"))
    w_rem = Window.orderBy(F.col("rem").desc(), F.col("lang"))
    quota = q.join(F.broadcast(lo)).select(
        "lang",
        "n_g",
        (
            F.col("base")
            + F.when(F.row_number().over(w_rem) <= F.col("leftover"), 1).otherwise(0)
        ).alias("quota"),
    )
    pri = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_PA_SALT))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    w_sel = Window.partitionBy("lang").orderBy(pri, F.col("doc_id"))
    keyed = (
        docs.select("doc_id", "lang")
        .join(F.broadcast(quota.select("lang", "quota")), "lang")
        .select("doc_id", "lang", "quota", F.row_number().over(w_sel).alias("rk"))
    )
    sel = F.when(F.col("rk") <= F.col("quota"), 1).otherwise(0)
    return keyed.groupBy("lang").agg(
        F.max("quota").cast("long").alias("quota"),
        F.sum(sel).cast("long").alias("n_sampled"),
        F.sum(
            F.when(F.col("rk") <= F.col("quota"), F.col("doc_id")).otherwise(0)
        )
        .cast("long")
        .alias("id_checksum"),
    )


# --------------------------------------------------------------------------
# phonetic_blocking_pairs — soundex-style blocking for entity resolution
# --------------------------------------------------------------------------

_PH_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_PH_DIGITS = "01230120022455012623010202"  # classic soundex consonant classes


def _phonetic_sql(tok: str, flavor: str = "spark") -> str:
    """Engine-portable simplified-soundex code: first letter + first 3
    consonant-class digits of the rest (runs collapsed, zeros dropped).
    Built from translate + per-digit run collapses because RE2 (DuckDB)
    has no backreferences — the SAME chain runs on both engines.
    DuckDB's regexp_replace is first-match-only by default, so the duck
    flavor passes the 'g' flag Spark applies implicitly.

    Domain: ASCII names (the part registry). Property testing found a
    real cross-engine hazard outside it: upper() applies the FULL
    unicode case mapping in Java/Python (one char can become two) but
    the SIMPLE mapping in DuckDB, so unnormalized unicode names must be
    ASCII-folded before phonetic coding (tests/test_property2.py)."""
    g = ", 'g'" if flavor == "duck" else ""
    d = f"translate(substr({tok}, 2), '{_PH_ALPHA}', '{_PH_DIGITS}')"
    for digit in "123456":
        d = f"regexp_replace({d}, '{digit}+', '{digit}'{g})"
    d = f"regexp_replace({d}, '0', ''{g})"
    return f"upper(substr({tok}, 1, 1)) || substr({d} || '000', 1, 3)"


_PH_TYPO_MOD = 7  # parts with p_partkey % 7 == 0 also appear as a typo variant

# the typo transform (drop vowels after each word's first letter) is
# phonetically INVARIANT under the consonant-class code by construction
# (vowels map to class 0 and are discarded), so blocking must reunite
# every typo with its original — that's the recall property the tests pin
_PH_TYPO_DUCK = (
    "list_aggregate(list_transform(string_split(p_name, ' '),"
    " x -> substr(x, 1, 1) || regexp_replace(substr(x, 2), '[aeiou]', '', 'g')),"
    " 'string_agg', ' ')"
)


@register(
    "phonetic_blocking_pairs",
    f"""
WITH dirty AS (
    SELECT p_partkey, p_name FROM part
    UNION ALL
    SELECT p_partkey + 1000000, {_PH_TYPO_DUCK} AS p_name
    FROM part WHERE p_partkey % {_PH_TYPO_MOD} = 0
),
t AS (
    SELECT p_partkey, p_name, string_split(p_name, ' ') AS w FROM dirty
),
sig AS (
    SELECT p_name,
           {_phonetic_sql("w[1]", "duck")} || '-' || {_phonetic_sql("w[2]", "duck")} AS signature,
           count(*) AS n
    FROM t WHERE len(w) >= 2
    GROUP BY 1, 2
)
SELECT a.signature,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       CAST(a.n * b.n AS BIGINT) AS candidate_pairs
FROM sig a JOIN sig b
  ON a.signature = b.signature AND a.p_name < b.p_name
""",
)
def phonetic_blocking_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking for entity resolution: the part registry plus
    deterministic typo variants (every 7th part re-listed with vowels
    dropped after each word's first letter — the transform is invariant
    under the consonant-class code, so it models exactly the
    spelling-noise soundex blocking exists to catch). Records key by
    the two-word phonetic signature; the output is the NAME-level
    blocking census — distinct surface-form pairs sharing a signature
    with their instance counts and candidate-pair volume — i.e. the
    match-scorer workload estimate, bounded by the name vocabulary
    rather than the record count.

    100 TB shape: signatures are map-only string arithmetic (translate
    + bounded regex chain, JVM-side, no Python, RE2-safe: no
    backreferences); the census aggregates to name-vocabulary size
    BEFORE the self-join, so the join is broadcast-small however many
    records share a name — the same collapse-then-pair discipline as
    the AllPairs prefix filter."""
    part = _load_parallel(spark, sf_dir, "part")
    typo = F.array_join(
        F.expr(
            "transform(split(p_name, ' '),"
            " x -> substring(x, 1, 1) || regexp_replace(substring(x, 2),"
            " '[aeiou]', ''))"
        ),
        " ",
    )
    dirty = part.select("p_partkey", "p_name").unionByName(
        part.filter(F.col("p_partkey") % _PH_TYPO_MOD == 0).select(
            (F.col("p_partkey") + 1000000).alias("p_partkey"),
            typo.alias("p_name"),
        )
    )
    t = dirty.select(
        "p_name", F.split(F.col("p_name"), " ").alias("w")
    ).filter(F.size("w") >= 2)
    sig = t.groupBy(
        "p_name",
        F.expr(
            f"{_phonetic_sql('w[0]')} || '-' || {_phonetic_sql('w[1]')}"
        ).alias("signature"),
    ).agg(F.count("*").alias("n"))
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.signature") == F.col("b.signature"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.signature").alias("signature"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("a.n").cast("long").alias("n_a"),
            F.col("b.n").cast("long").alias("n_b"),
            (F.col("a.n") * F.col("b.n")).cast("long").alias("candidate_pairs"),
        )
    )


# --------------------------------------------------------------------------
# token_clustering_coefficient — local clustering on the co-occurrence graph
# --------------------------------------------------------------------------

_TCC_SUPPORT = 10  # same edge support floor as cooccurrence_triangles


@register(
    "token_clustering_coefficient",
    f"""
WITH t AS (
    SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents
),
e AS (
    SELECT a.tok AS u, b.tok AS v
    FROM t a JOIN t b USING (doc_id)
    WHERE a.tok < b.tok
    GROUP BY 1, 2
    HAVING count(*) >= {_TCC_SUPPORT}
),
deg AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS degree
    FROM (SELECT u AS tok FROM e UNION ALL SELECT v FROM e)
    GROUP BY 1
),
tri AS (
    SELECT unnest([e1.u, e1.v, e2.v]) AS tok
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
tcnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_triangles FROM tri GROUP BY 1)
SELECT d.tok, d.degree,
       CAST(coalesce(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
       {_duck_round_half_up(
           "CAST(2 * coalesce(tc.n_triangles, 0) AS DOUBLE)"
           " / (d.degree * (d.degree - 1))", 6)} AS clustering_coeff
FROM deg d LEFT JOIN tcnt tc USING (tok)
WHERE d.degree >= 2
""",
)
def token_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per token on the co-occurrence
    graph (same edges as cooccurrence_triangles): C(v) = 2·T(v) /
    (deg(v)·(deg(v)−1)) — how close each token's neighborhood is to a
    clique, the community-structure signal that separates topical hub
    words (low C) from fixed-phrase members (high C). Triangles are
    enumerated once in a<b<c orientation and credited to all three
    vertices; both ratio operands are exact integers.

    100 TB shape: identical to the triangles query — the only
    corpus-scale stage is the per-document pair count; the vocabulary
    graph is tiny, so the triangle joins broadcast and the degree/
    triangle-count aggregates are vocabulary-sized."""
    docs = _load_parallel(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.array_sort(F.array_distinct(tx.tokens(F.lower(F.col("text"))))).alias("ts"),
    )
    pairs = t.select(
        F.explode(
            F.expr(
                "flatten(transform(ts, (x, i) ->"
                " transform(slice(ts, i + 2, size(ts)),"
                " y -> struct(x AS u, y AS v))))"
            )
        ).alias("p")
    ).select("p.u", "p.v")
    e = (
        pairs.groupBy("u", "v")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _TCC_SUPPORT)
        .select("u", "v")
    )
    deg = (
        e.select(F.col("u").alias("tok"))
        .unionByName(e.select(F.col("v").alias("tok")))
        .groupBy("tok")
        .agg(F.count("*").alias("degree"))
    )
    e1 = e.select(F.col("u").alias("ta"), F.col("v").alias("tb"))
    e2 = e.select(F.col("u").alias("tb"), F.col("v").alias("tc"))
    e3 = e.select(F.col("u").alias("ta"), F.col("v").alias("tc"))
    tri = (
        e1.join(F.broadcast(e2), "tb")
        .join(F.broadcast(e3), ["ta", "tc"])
        .select(F.explode(F.array("ta", "tb", "tc")).alias("tok"))
    )
    tcnt = tri.groupBy("tok").agg(F.count("*").alias("n_triangles"))
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tcnt, "tok", "left")
        .select(
            "tok",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("long")
            .alias("n_triangles"),
            tx.round_half_up(
                (2 * F.coalesce(F.col("n_triangles"), F.lit(0))).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("clustering_coeff"),
        )
    )


# --------------------------------------------------------------------------
# woe_information_value — WOE/IV feature scoring of length vs is-English
# --------------------------------------------------------------------------

_WOE_BINS = 10
_WOE_EPS = 0.5


@register(
    "woe_information_value",
    f"""
WITH t AS (
    SELECT n_chars, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
    FROM documents
),
lc AS (
    SELECT n_chars, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS g
    FROM t GROUP BY 1
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM lc),
cum AS (
    SELECT n_chars, c, g,
           CAST(coalesce(sum(c) OVER (ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS before
    FROM lc
),
cell AS (
    SELECT (before * {_WOE_BINS}) // (SELECT n FROM tot) AS bin,
           sum(g) AS ng, sum(c) - sum(g) AS nb
    FROM cum GROUP BY 1
),
gt AS (SELECT sum(ng) AS gg, sum(nb) AS bb FROM cell)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(ng AS BIGINT) AS n_good,
       CAST(nb AS BIGINT) AS n_bad,
       round(ln(((ng + {_WOE_EPS}) / (gg + {_WOE_EPS * _WOE_BINS}))
                / ((nb + {_WOE_EPS}) / (bb + {_WOE_EPS * _WOE_BINS}))), 6) AS woe,
       round(((ng + {_WOE_EPS}) / (gg + {_WOE_EPS * _WOE_BINS})
              - (nb + {_WOE_EPS}) / (bb + {_WOE_EPS * _WOE_BINS}))
             * ln(((ng + {_WOE_EPS}) / (gg + {_WOE_EPS * _WOE_BINS}))
                  / ((nb + {_WOE_EPS}) / (bb + {_WOE_EPS * _WOE_BINS}))), 6)
           AS iv_term
FROM cell CROSS JOIN gt
""",
)
def woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value scoring of document
    length against the is-English label: equal-depth bins with
    ties-in-one-bin semantics (bin = cumulative-count-before ·
    BINS // N over the DISTINCT-length table, so binning is exact
    integer arithmetic and timezone/engine-proof), Laplace-smoothed
    WOE = ln((g/G)/(b/B)) and per-bin IV terms — the classic
    feature-screening pair; sum(iv_term) is the feature's IV.

    100 TB shape: the corpus collapses to the distinct-value table in
    one map-side-combined aggregate; the cumulative window runs over
    DISTINCT lengths (bounded by the value domain, same device as
    roc_auc_quality), never over rows. The per-bin log math follows the
    chisq precedent (bounded cells, native 6dp round)."""
    docs = _load_parallel(spark, sf_dir, "documents")
    t = docs.select(
        "n_chars", F.when(F.col("lang") == "en", 1).otherwise(0).alias("y")
    )
    lc = t.groupBy("n_chars").agg(
        F.count("*").alias("c"), F.sum("y").alias("g")
    )
    tot = lc.agg(F.sum("c").alias("n"))
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    cum = lc.select(
        "n_chars",
        "c",
        "g",
        F.coalesce(F.sum("c").over(w), F.lit(0).cast("long")).alias("before"),
    )
    cell = (
        cum.join(F.broadcast(tot))
        .groupBy(F.expr(f"(before * {_WOE_BINS}) div n").alias("bin"))
        .agg(F.sum("g").alias("ng"), (F.sum("c") - F.sum("g")).alias("nb"))
    )
    gt = cell.agg(F.sum("ng").alias("gg"), F.sum("nb").alias("bb"))
    denom_g = F.col("gg") + _WOE_EPS * _WOE_BINS
    denom_b = F.col("bb") + _WOE_EPS * _WOE_BINS
    pg = (F.col("ng") + _WOE_EPS) / denom_g
    pb = (F.col("nb") + _WOE_EPS) / denom_b
    return cell.join(F.broadcast(gt)).select(
        F.col("bin").cast("long").alias("bin"),
        F.col("ng").cast("long").alias("n_good"),
        F.col("nb").cast("long").alias("n_bad"),
        F.round(F.log(pg / pb), 6).alias("woe"),
        F.round((pg - pb) * F.log(pg / pb), 6).alias("iv_term"),
    )


# --------------------------------------------------------------------------
# trigram_backoff_lm — stupid-backoff trigram scores
# --------------------------------------------------------------------------

_SB_ALPHA = 0.4  # Brants et al. backoff weight (exactly representable? 0.4
# is not a dyadic rational, but the PARSED double literal is identical on
# both engines, and multiplication is IEEE-exact on identical operands)
_SB_MIN_COUNT = 5


@register(
    "trigram_backoff_lm",
    f"""
WITH d AS (SELECT {_TOKS} AS t FROM documents),
tg AS (
    SELECT t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
    FROM d, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS g(i)
),
c3 AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS n_123 FROM tg GROUP BY 1, 2, 3),
c12 AS (SELECT w1, w2, CAST(sum(n_123) AS BIGINT) AS n_12 FROM c3 GROUP BY 1, 2),
c23 AS (SELECT w2, w3, CAST(sum(n_123) AS BIGINT) AS n_23 FROM c3 GROUP BY 1, 2),
c2 AS (SELECT w2, CAST(sum(n_123) AS BIGINT) AS n_2 FROM c3 GROUP BY 1)
SELECT c3.w1, c3.w2, c3.w3, n_123,
       {_duck_round_half_up("CAST(n_123 AS DOUBLE) / n_12", 6)} AS s_ml,
       {_duck_round_half_up(
           f"{_SB_ALPHA} * (CAST(n_23 AS DOUBLE) / n_2)", 6)} AS s_backoff
FROM c3
JOIN c12 USING (w1, w2)
JOIN c23 USING (w2, w3)
JOIN c2 USING (w2)
WHERE n_123 >= {_SB_MIN_COUNT}
""",
)
def trigram_backoff_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram scores (Brants et al. 2007): for each
    frequent trigram, the ML trigram score c(w1w2w3)/c(w1w2·) and the
    alpha-weighted bigram backoff 0.4·c(·w2w3)/c(·w2·) it would fall
    back to — the smoothing used at web scale precisely because every
    statistic is a plain count ratio that distributes as map-side-
    combinable aggregation (no normalization pass, unlike Kneser-Ney).
    All context counts derive from the ONE trigram-event table, so the
    score algebra is self-consistent and every ratio divides exact
    integers.

    100 TB shape: trigrams come from per-document JVM zip_with slices
    (no self-join, no Python); after the corpus-wide trigram count,
    c12/c23/c2 are vocabulary-bounded broadcast joins — the same
    topology as the bigram tiers, one order deeper."""
    docs = _load_parallel(spark, sf_dir, "documents")
    t = docs.select(tx.tokens(F.lower(F.col("text"))).alias("t"))
    tg = t.select(
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, greatest(size(t) - 2, 0)),"
                " zip_with(slice(t, 2, greatest(size(t) - 2, 0)),"
                "          slice(t, 3, greatest(size(t) - 2, 0)),"
                "          (y, z) -> struct(y AS w2, z AS w3)),"
                " (x, p) -> struct(x AS w1, p.w2 AS w2, p.w3 AS w3))"
            )
        ).alias("g")
    ).select("g.w1", "g.w2", "g.w3")
    c3 = tg.groupBy("w1", "w2", "w3").agg(F.count("*").alias("n_123"))
    c12 = c3.groupBy("w1", "w2").agg(F.sum("n_123").alias("n_12"))
    c23 = c3.groupBy("w2", "w3").agg(F.sum("n_123").alias("n_23"))
    c2 = c3.groupBy("w2").agg(F.sum("n_123").alias("n_2"))
    return (
        c3.filter(F.col("n_123") >= _SB_MIN_COUNT)
        .join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(c23), ["w2", "w3"])
        .join(F.broadcast(c2), "w2")
        .select(
            "w1",
            "w2",
            "w3",
            F.col("n_123").cast("long").alias("n_123"),
            tx.round_half_up(
                F.col("n_123").cast("double") / F.col("n_12"), 6
            ).alias("s_ml"),
            tx.round_half_up(
                _SB_ALPHA * (F.col("n_23").cast("double") / F.col("n_2")), 6
            ).alias("s_backoff"),
        )
    )
