"""Multimodal (image/audio/video) column handling.

Design: media are opaque ``binary`` columns with typed metadata alongside —
the pattern that scales to 100TB because Spark never interprets the bytes
except inside explicitly vectorized stages:

- metadata (sizes, fingerprints, format sniffing) = JVM-side expressions;
- decode / feature-extract / resize / frame-sample = Arrow-batched
  ``mapInPandas`` stages, one Python process per partition, zero-copy
  batch transfer.

This container has no image/audio libraries, so the codec-dependent steps
are STUBS behind ``_require_codec`` (NotImplementedError) with a
deterministic fake path (``fake=True``) that exercises the full Spark-side
plumbing — schema, batching, partitioning — with real execution. The
byte-level feature extractor (entropy, byte stats) is NOT a stub: it
computes real values with numpy and stands in for any per-blob vectorized
feature pass.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id LONG, width INT, height INT, channels INT, ok BOOLEAN"
)
FEATURES_SCHEMA = (
    "doc_id LONG, n_bytes LONG, byte_entropy DOUBLE, mean_byte DOUBLE"
)


def _require_codec(name: str):
    try:
        import importlib

        return importlib.import_module(name)
    except ImportError as exc:  # pragma: no cover - no codecs in container
        raise NotImplementedError(
            f"media codec path requires '{name}' which is not installed; "
            "use fake=True for the deterministic stub"
        ) from exc


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column + metadata struct. In production the
    binary arrives from the source (parquet BINARY / object store); here it
    derives from text so the testdata exercises the same plumbing."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
            F.lit("application/octet-stream").alias("mime"),
        ),
    )


def decode_images(
    df: DataFrame, fake: bool = False, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """Decode stage: binary → (width, height, channels). Real path uses PIL
    (not installed here → NotImplementedError); fake path derives dims
    deterministically from the content hash, so schema/partitioning/batch
    shape are exercised for real."""
    if not fake:
        _require_codec("PIL")  # raises with a clear message

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            h = pdf[bin_col].map(
                lambda b: hashlib.md5(bytes(b)).digest() if b is not None else b"\0" * 16
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": h.map(lambda d: 64 + d[0] % 192).astype("int32"),
                    "height": h.map(lambda d: 64 + d[1] % 192).astype("int32"),
                    "channels": h.map(lambda d: 1 + d[2] % 4).astype("int32"),
                    "ok": pdf[bin_col].notna(),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(batches, DECODED_SCHEMA)


def byte_features(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """REAL vectorized per-blob feature extraction (no codec needed):
    byte-histogram entropy and mean byte value via numpy. The template for
    any embed/score/transform pass over media bytes."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ents, means, sizes = [], [], []
            for b in pdf[bin_col]:
                if b is None:
                    # NULL payload: NULL size, zeroed features — matches
                    # the SQL oracle (octet_length(NULL)=NULL; the entropy
                    # coalesce yields 0.0 with no byte rows)
                    sizes.append(None)
                    ents.append(0.0)
                    means.append(0.0)
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                sizes.append(len(arr))
                if len(arr) == 0:
                    ents.append(0.0)
                    means.append(0.0)
                    continue
                counts = np.bincount(arr, minlength=256)
                p = counts[counts > 0] / len(arr)
                ents.append(float(-(p * np.log2(p)).sum()))
                means.append(float(arr.mean()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pd.Series(sizes, dtype="Int64"),
                    "byte_entropy": ents,
                    "mean_byte": means,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(batches, FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Frame-sampling stage shape (video → frames): emits one row per
    sampled offset. Real decoders replace the offset arithmetic; the
    explode-to-frames dataflow (1 blob row → N frame rows) is the part that
    matters for partitioning and it is fully real."""
    n = F.octet_length(F.col(bin_col))
    offsets = F.sequence(F.lit(0), F.least(F.lit(max_frames - 1), n / every_n_bytes).cast("int"))
    return (
        df.select(id_col, bin_col, F.explode(offsets).alias("frame_no"))
        .withColumn("byte_offset", F.col("frame_no") * every_n_bytes)
        .withColumn(
            "frame_md5",
            F.md5(
                F.substring(
                    F.col(bin_col).cast("string"), 1, 32
                )
            ),
        )
        .drop(bin_col)
    )


RESIZED_SCHEMA = (
    "doc_id LONG, width INT, height INT, out_width INT, out_height INT, "
    "resized BINARY, ok BOOLEAN"
)


def resize_images(
    df: DataFrame,
    out_width: int = 224,
    out_height: int = 224,
    fake: bool = False,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Resize stage: binary image → fixed-dims binary (the normalize-to-
    model-input pass). Real path needs PIL (not installed here →
    NotImplementedError); the fake path emits a deterministic
    hash-derived pseudo-image of exactly ``out_width*out_height`` bytes so
    the Spark-side contract — schema, output blob sizing, Arrow batch
    shape, 1:1 row mapping — is exercised for real.

    Scale: mapInPandas keeps this a map-only stage (no shuffle); output
    blobs are bounded (out_width*out_height*channels) so downstream
    partition sizing is predictable regardless of input image sizes.
    """
    if not fake:
        _require_codec("PIL")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            h = pdf[bin_col].map(
                lambda b: hashlib.md5(bytes(b)).digest() if b is not None else b"\0" * 16
            )
            n_out = out_width * out_height
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": h.map(lambda d: 64 + d[0] % 192).astype("int32"),
                    "height": h.map(lambda d: 64 + d[1] % 192).astype("int32"),
                    "out_width": pd.Series([out_width] * len(pdf), dtype="int32"),
                    "out_height": pd.Series([out_height] * len(pdf), dtype="int32"),
                    # deterministic pseudo-pixels: repeat the digest to size
                    "resized": h.map(
                        lambda d: (d * (n_out // len(d) + 1))[:n_out]
                    ),
                    "ok": pdf[bin_col].notna(),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(batches, RESIZED_SCHEMA)


def multimodal_meta(docs: DataFrame) -> DataFrame:
    """Oracle-checkable metadata pass: sizes + content fingerprints of the
    binary payload — pure JVM expressions."""
    with_bin = with_binary_payload(docs)
    return with_bin.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.content_md5").alias("content_md5"),
        F.col("media_meta.mime").alias("mime"),
    )


def byte_features_arrow(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """``mapInArrow`` flavor of byte_features: RecordBatch in, RecordBatch
    out, no pandas materialization — the lowest-overhead Python interop
    Spark offers and the right default for byte-level media passes at
    scale. Values are identical to byte_features (same numpy math)."""
    import numpy as np
    import pyarrow as pa

    def batches(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in it:
            ids = batch.column(0)
            payloads = batch.column(1)
            ents, means, sizes = [], [], []
            for buf in payloads:
                raw = buf.as_py()
                if raw is None:  # NULL payload — same contract as pandas path
                    sizes.append(None)
                    ents.append(0.0)
                    means.append(0.0)
                    continue
                arr = np.frombuffer(raw, dtype=np.uint8)
                sizes.append(len(arr))
                if len(arr) == 0:
                    ents.append(0.0)
                    means.append(0.0)
                    continue
                counts = np.bincount(arr, minlength=256)
                p = counts[counts > 0] / len(arr)
                ents.append(float(-(p * np.log2(p)).sum()))
                means.append(float(arr.mean()))
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(sizes, type=pa.int64()),
                    pa.array(ents, type=pa.float64()),
                    pa.array(means, type=pa.float64()),
                ],
                names=["doc_id", "n_bytes", "byte_entropy", "mean_byte"],
            )

    return df.select(id_col, bin_col).mapInArrow(batches, FEATURES_SCHEMA)
