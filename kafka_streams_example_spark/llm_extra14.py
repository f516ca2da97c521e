"""Real-codec multimodal queries: PNG and WAV encode→decode roundtrips
whose decoded content is cross-checked by a DuckDB oracle.

The blobs are REAL media (spec-conformant PNG with CRC-checked chunks and
zlib scanlines; canonical RIFF PCM16 WAV) built deterministically from
the documents table, so every decoded field the oracle can recompute
arithmetically — dims from the id, pixel/sample sums from the md5 digest
or the sample recurrence — is hash-verified end to end THROUGH the codec:
a broken filter, CRC, inflate, or struct parse flips ``roundtrip_ok`` or
shifts ``pixel_sum``/``sample_sum`` and the driver catches it.

Scale shape: both queries are single map-only mapInPandas stages (Arrow
batches in, no shuffle, no collect); blob bytes never leave the worker.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_example_spark.llm_extra3 import split_case_sql, split_col
from kafka_streams_example_spark.operators import similarity as sim
from kafka_streams_example_spark.operators import text as tx
from kafka_streams_example_spark.operators.multimodal import _ship_codecs
from kafka_streams_example_spark.registry import (
    _TOKS,
    _duck_cosine,
    _load_parallel,
    register,
)

# hex-pair -> byte value, replicated in DuckDB over md5()'s hex output
_HEXVAL = "strpos('0123456789abcdef', substr(hx, {i}, 1)) - 1"


def _hex_byte(k: int) -> str:
    """DuckDB expression for byte ``k`` (0-based) of the md5 digest."""
    hi = _HEXVAL.format(i=2 * k + 1)
    lo = _HEXVAL.format(i=2 * k + 2)
    return f"(16 * ({hi}) + ({lo}))"


@register(
    "multimodal_decode_real",
    f"""
WITH d AS (
    SELECT doc_id,
           16 + doc_id % 17 AS w,
           16 + doc_id % 13 AS h,
           md5(text) AS hx
    FROM documents
),
b AS (
    SELECT doc_id, w, h,
           list_transform(generate_series(0, 15), k ->
               16 * (strpos('0123456789abcdef', substr(hx, 2*k + 1, 1)) - 1)
                  + (strpos('0123456789abcdef', substr(hx, 2*k + 2, 1)) - 1)
           ) AS db
    FROM d
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(8 AS INT) AS bit_depth,
       CAST(0 AS INT) AS color_type,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST((w * h // 16) * list_aggregate(db, 'sum')
            + coalesce(list_aggregate(db[1:(w * h % 16)], 'sum'), 0)
            AS BIGINT) AS pixel_sum,
       TRUE AS roundtrip_ok
FROM b
""",
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG codec roundtrip over the documents corpus: build an 8-bit
    grayscale PNG per doc (dims ``16+id%17 × 16+id%13``, pixels = md5(text)
    digest repeated), then fully decode it — signature, CRC-verified chunk
    walk, IDAT inflate, scanline unfilter — and emit the DECODED dims and
    pixel sum. The oracle recomputes dims and pixel sum arithmetically
    from doc_id and md5(text) in SQL, so the hash check passes only if the
    codec reproduced every pixel bit-exactly (functions/codecs.py)."""
    cx = _ship_codecs()
    docs = _load_parallel(spark, sf_dir, "documents")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "width", "height", "bit_depth", "color_type",
                "n_pixels", "pixel_sum", "roundtrip_ok",
            )}
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                w, h = 16 + int(i) % 17, 16 + int(i) % 13
                digest = hashlib.md5(str(t).encode("utf-8")).digest()
                px = (digest * (w * h // 16 + 1))[: w * h]
                d = cx.decode_png(cx.encode_png_gray8(w, h, px))
                out["doc_id"].append(int(i))
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["bit_depth"].append(d["bit_depth"])
                out["color_type"].append(d["color_type"])
                out["n_pixels"].append(len(d["pixels"]))
                out["pixel_sum"].append(sum(d["pixels"]))
                out["roundtrip_ok"].append(d["pixels"] == px)
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        batches,
        "doc_id LONG, width INT, height INT, bit_depth INT, color_type INT, "
        "n_pixels LONG, pixel_sum LONG, roundtrip_ok BOOLEAN",
    )


@register(
    "multimodal_wav_roundtrip",
    """
SELECT doc_id,
       CAST(1 AS INT) AS n_channels,
       CAST(16000 AS INT) AS sample_rate,
       CAST(16 AS INT) AS bits_per_sample,
       CAST(64 + doc_id % 64 AS BIGINT) AS n_samples,
       CAST(list_aggregate(
                list_transform(generate_series(0, 63 + doc_id % 64),
                               i -> (doc_id * 31 + i * 17) % 65536 - 32768),
                'sum') AS BIGINT) AS sample_sum,
       CAST((64 + doc_id % 64) * 1000000 // 16000 AS BIGINT) AS duration_us,
       TRUE AS roundtrip_ok
FROM documents
""",
)
def multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV codec roundtrip: per doc, synthesize ``64+id%64`` PCM16
    samples from a fixed recurrence, write a canonical RIFF/WAVE blob
    (struct-packed fmt/data chunks), parse it back (chunk walk, length
    checks), and emit the DECODED stream properties and sample sum. The
    oracle replays the recurrence in SQL — a byte-order, alignment, or
    length-accounting bug in either direction breaks the hash match."""
    cx = _ship_codecs()
    docs = _load_parallel(spark, sf_dir, "documents")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "n_channels", "sample_rate", "bits_per_sample",
                "n_samples", "sample_sum", "duration_us", "roundtrip_ok",
            )}
            for i in pdf["doc_id"]:
                i = int(i)
                n = 64 + i % 64
                samples = [(i * 31 + j * 17) % 65536 - 32768 for j in range(n)]
                d = cx.decode_wav(cx.encode_wav_pcm16(16000, samples))
                out["doc_id"].append(i)
                out["n_channels"].append(d["n_channels"])
                out["sample_rate"].append(d["sample_rate"])
                out["bits_per_sample"].append(d["bits_per_sample"])
                out["n_samples"].append(d["n_samples"])
                out["sample_sum"].append(sum(d["samples"]))
                out["duration_us"].append(d["n_samples"] * 1_000_000 // d["sample_rate"])
                out["roundtrip_ok"].append(d["samples"] == samples)
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(
        batches,
        "doc_id LONG, n_channels INT, sample_rate INT, bits_per_sample INT, "
        "n_samples LONG, sample_sum LONG, duration_us LONG, roundtrip_ok BOOLEAN",
    )


# --------------------------------------------------------------------------
# rrf_hybrid_retrieval — lexical + semantic rank fusion
# --------------------------------------------------------------------------

_RRF_TERMS = ["slow", "batch", "hash"]  # same fixed query as bm25_topk_docs
_RRF_K = 60  # the standard RRF damping constant (Cormack et al. 2009)
_RRF_TOP = 10


def _duck_tf(term: str) -> str:
    return f"len(list_filter(t, x -> x = '{term}'))"


@register(
    "rrf_hybrid_retrieval",
    f"""
WITH base AS (
    SELECT d.doc_id, {_TOKS} AS t, e.embedding
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE e.vec_id > 0
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
n AS (SELECT count(*) AS n_docs FROM base),
dfreq AS (
    SELECT {", ".join(
        f"count(*) FILTER (WHERE {_duck_tf(t)} > 0) AS df_{i}"
        for i, t in enumerate(_RRF_TERMS))}
    FROM base
),
scored AS (
    SELECT doc_id,
           round({" + ".join(
               f"{_duck_tf(t)} * ln((n_docs + 1.0) / (df_{i} + 1.0))"
               for i, t in enumerate(_RRF_TERMS))}, 6) AS s_lex,
           round({_duck_cosine("base.embedding", "q.qv")}, 6) AS s_sem
    FROM base, q, n, dfreq
),
ranked AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY s_lex DESC, doc_id) AS rank_lex,
           row_number() OVER (ORDER BY s_sem DESC, doc_id) AS rank_sem
    FROM scored
)
SELECT doc_id,
       CAST(rank_lex AS BIGINT) AS rank_lex,
       CAST(rank_sem AS BIGINT) AS rank_sem,
       round(1.0 / ({_RRF_K} + rank_lex) + 1.0 / ({_RRF_K} + rank_sem), 6)
           AS rrf_score
FROM ranked
ORDER BY round(1.0 / ({_RRF_K} + rank_lex) + 1.0 / ({_RRF_K} + rank_sem), 6) DESC,
         doc_id
LIMIT {_RRF_TOP}
""",
)
def rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009,
    public method): a lexical arm (smoothed tf·idf over the fixed query
    terms) and a semantic arm (cosine to the vec_id-0 query embedding)
    each rank the embedded subset of the corpus; RRF fuses the two rank
    lists — 1/(60+r_lex) + 1/(60+r_sem) — and the top-10 fused docs come
    out. The production RAG/hard-negative shape: sparse and dense
    retrieval disagree productively, and rank fusion needs no score
    calibration between them.

    Scale shape: the lexical arm is one scan + a broadcast (df, N) row;
    the semantic arm reuses the broadcast-query cosine; both ranks are
    full-order windows over the CANDIDATE subset (already bounded — at
    100 TB the arms each emit their own top-R via TakeOrdered first and
    RRF fuses R-sized lists, the standard two-stage layout). Ordering is
    on 6dp-rounded scores with doc_id tiebreaks on both engines."""
    docs = _load_parallel(spark, sf_dir, "documents")
    emb = _load_parallel(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"),
        sim.norm(F.col("embedding"), 64).alias("qn"),
    )
    base = (
        docs.join(
            emb.filter(F.col("vec_id") > 0),
            docs["doc_id"] == emb["vec_id"],
        )
        .select(
            "doc_id",
            tx.tokens(F.lower(F.col("text"))).alias("t"),
            "embedding",
        )
    )
    def _tf(term: str):
        # one-arg lambda: a second parameter would be read as the index
        return F.size(F.filter(F.col("t"), lambda x: x == F.lit(term)))

    tf = base.select(
        "doc_id",
        "embedding",
        *[_tf(term).alias(f"tf_{i}") for i, term in enumerate(_RRF_TERMS)],
    )
    stats = tf.agg(
        F.count("*").alias("n_docs"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(_RRF_TERMS))
        ],
    )
    s_lex = None
    for i in range(len(_RRF_TERMS)):
        term = F.col(f"tf_{i}") * F.log(
            (F.col("n_docs") + F.lit(1.0)) / (F.col(f"df_{i}") + F.lit(1.0))
        )
        s_lex = term if s_lex is None else s_lex + term
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            F.round(s_lex, 6).alias("s_lex"),
            F.round(
                sim.dot(F.col("embedding"), F.col("qv"), 64)
                / F.nullif(sim.norm(F.col("embedding"), 64) * F.col("qn"), F.lit(0.0)),
                6,
            ).alias("s_sem"),
        )
    )
    ranked = scored.select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.desc("s_lex"), "doc_id")).alias("rank_lex"),
        F.row_number().over(Window.orderBy(F.desc("s_sem"), "doc_id")).alias("rank_sem"),
    )
    rrf = F.round(
        1.0 / (F.lit(_RRF_K) + F.col("rank_lex"))
        + 1.0 / (F.lit(_RRF_K) + F.col("rank_sem")),
        6,
    )
    return (
        ranked.select(
            "doc_id",
            F.col("rank_lex").cast("long").alias("rank_lex"),
            F.col("rank_sem").cast("long").alias("rank_sem"),
            rrf.alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(_RRF_TOP)
    )


# --------------------------------------------------------------------------
# split_token_kl — train/eval token-distribution drift
# --------------------------------------------------------------------------


@register(
    "split_token_kl",
    f"""
WITH toks AS (
    SELECT lang,
           CASE WHEN {split_case_sql("doc_id")} = 'train'
                THEN 'train' ELSE 'eval' END AS split,
           unnest({_TOKS}) AS tok
    FROM documents
),
cnt AS (
    SELECT lang, tok,
           count(*) FILTER (WHERE split = 'train') AS c_tr,
           count(*) FILTER (WHERE split = 'eval') AS c_ev
    FROM toks
    GROUP BY lang, tok
),
tot AS (
    SELECT lang,
           CAST(sum(c_tr) AS BIGINT) AS n_tr,
           CAST(sum(c_ev) AS BIGINT) AS n_ev,
           CAST(count(*) AS BIGINT) AS vocab
    FROM cnt
    GROUP BY lang
)
SELECT c.lang,
       t.vocab,
       t.n_tr AS n_train_tokens,
       t.n_ev AS n_eval_tokens,
       round(sum(((c.c_tr + 1.0) / (t.n_tr + t.vocab))
                 * ln(((c.c_tr + 1.0) / (t.n_tr + t.vocab))
                      / ((c.c_ev + 1.0) / (t.n_ev + t.vocab)))), 6)
           AS kl_train_eval,
       round(sum(((c.c_ev + 1.0) / (t.n_ev + t.vocab))
                 * ln(((c.c_ev + 1.0) / (t.n_ev + t.vocab))
                      / ((c.c_tr + 1.0) / (t.n_tr + t.vocab)))), 6)
           AS kl_eval_train
FROM cnt c JOIN tot t ON c.lang = t.lang
GROUP BY c.lang, t.vocab, t.n_tr, t.n_ev
""",
)
def split_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval token-distribution drift per language: add-1-smoothed
    KL divergence (both directions) between the train split's and the
    eval (valid+test) split's unigram distributions over their shared
    vocabulary, using THE canonical split assignment (llm_extra3.
    split_col). High KL = the eval set is not distributionally
    representative of training data — the check to run before trusting
    held-out loss as a proxy for training quality.

    Scale shape: one explode + one (lang, token) count (map-side
    combine, vocabulary-bounded output), per-lang totals broadcast back,
    and a vocabulary-sized sum — no shuffle ever carries raw text. Sums
    of ~vocab ln-terms are rounded to 6dp on both engines (absolute
    summation error ~1e-12, far inside the rounding)."""
    docs = _load_parallel(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.when(split_col(F.col("doc_id")) == "train", "train")
        .otherwise("eval")
        .alias("split"),
        F.explode(tx.tokens(F.lower(F.col("text")))).alias("tok"),
    )
    cnt = toks.groupBy("lang", "tok").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("c_tr"),
        F.sum(F.when(F.col("split") == "eval", 1).otherwise(0)).alias("c_ev"),
    )
    tot = cnt.groupBy("lang").agg(
        F.sum("c_tr").alias("n_tr"),
        F.sum("c_ev").alias("n_ev"),
        F.count("*").alias("vocab"),
    )
    j = cnt.join(F.broadcast(tot), "lang")
    p = (F.col("c_tr") + F.lit(1.0)) / (F.col("n_tr") + F.col("vocab"))
    q = (F.col("c_ev") + F.lit(1.0)) / (F.col("n_ev") + F.col("vocab"))
    return (
        j.groupBy("lang", "vocab", "n_tr", "n_ev")
        .agg(
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_train_eval"),
            F.round(F.sum(q * F.log(q / p)), 6).alias("kl_eval_train"),
        )
        .select(
            "lang",
            "vocab",
            F.col("n_tr").alias("n_train_tokens"),
            F.col("n_ev").alias("n_eval_tokens"),
            "kl_train_eval",
            "kl_eval_train",
        )
    )
