"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched Pandas UDFs.

The Spark-side architecture here is real and tested — schema, partitioning,
``mapInPandas`` batch shape, metadata extraction — while the actual
codec work (JPEG decode, audio resample, video frame-sample) is STUBBED:
the container deliberately ships no image/audio libraries, so the decode
step raises ``NotImplementedError`` unless ``fake=True``, which substitutes
a deterministic fake decoder (byte-statistics features) that exercises the
identical plumbing.

100 TB design notes:
- payloads stay in the executor: no collect, no driver round-trip; the
  UDF sees Arrow record batches whose size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low (e.g. 64)
  for multi-MB payload columns so a batch fits in worker memory;
- metadata-only pipelines (routing, filtering, bucketing by media type)
  never touch the payload bytes: Parquet column pruning skips the binary
  column entirely when it is not selected;
- feature extraction fans out per-partition; repartition on a content key
  first if payload sizes are skewed (a few 4K videos among thumbnails).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, byte_mean double, byte_min int, byte_max int, feature_ok boolean"
)


def decode_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract each payload via ``mapInPandas``.

    Real codecs are unavailable in this container: with ``fake=False`` this
    raises ``NotImplementedError`` at execution time (the plumbing is still
    planned/partitioned correctly); ``fake=True`` runs the deterministic
    byte-statistics decoder so tests exercise the full Arrow path."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg/librosa) are not installed in this "
                    "container; pass fake=True for the deterministic stub decoder"
                )
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                arr = bytearray(payload)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "media_type": row["media_type"],
                        "n_bytes": len(arr),
                        "byte_mean": (sum(arr) / len(arr)) if arr else 0.0,
                        "byte_min": min(arr) if arr else 0,
                        "byte_max": max(arr) if arr else 0,
                        "feature_ok": bool(arr),
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(extract, FEATURE_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Metadata-only projection — never reads the payload column, so the
    parquet scan prunes the (huge) binary column entirely."""
    return df.select(
        "media_id",
        "media_type",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/queries: treat each document's UTF-8 bytes as
    an opaque payload (deterministic stand-in for real media blobs)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text-blob").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.col("n_chars").alias("duration_ms"),
        ).alias("meta"),
    )
