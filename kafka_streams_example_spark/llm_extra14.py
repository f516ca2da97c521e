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

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_example_spark.operators.multimodal import _ship_codecs
from kafka_streams_example_spark.registry import _load_parallel, register

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
