"""Multimodal column plumbing: images/audio/video as opaque BINARY columns
with typed metadata, processed through Arrow-batched mapInPandas.

The Spark-side machinery here is real and tested — schemas, partitioning,
UDF signatures, batch shapes. The actual media decode is STUBBED
(``decode_image`` raises NotImplementedError; ``fake_image_features`` is the
deterministic stand-in) because no image/audio libraries exist in this
container. Swapping the stub for Pillow/torchvision/ffmpeg is a body-only
change: the mapInPandas contract does not move.

Scale notes:
- BINARY payloads ride in the same parquet row groups as their metadata;
  column pruning means metadata-only queries never read the bytes.
- mapInPandas streams Arrow batches (spark.sql.execution.arrow.
  maxRecordsPerBatch) — per-batch Python overhead is amortized, memory is
  bounded by batch size, not partition size.
- Feature extraction fans out embarrassingly parallel; repartition by a
  size-aware key first if media sizes are wildly skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal asset schema: opaque bytes + typed metadata
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType()),
        StructField("content_length", LongType()),
        StructField("content_sha256", StringType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", IntegerType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
        # rows in the Arrow batch this row was processed in — lets tests
        # (and ops dashboards) observe the real batch shape
        StructField("batch_rows", IntegerType(), False),
    ]
)


def to_asset_table(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Wrap an arbitrary payload column as a multimodal asset table:
    bytes + hash + length metadata (all JVM-side)."""
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        content.alias("content"),
        F.octet_length(content).cast("long").alias("content_length"),
        F.sha2(content, 256).alias("content_sha256"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        F.lit(None).cast("int").alias("meta_duration_ms"),
    )


def decode_image(content: bytes) -> "object":
    """STUB: real deployments decode with Pillow/torchvision here."""
    raise NotImplementedError(
        "image decoding requires a media library not present in this "
        "environment; use fake_image_features for the pipeline contract"
    )


def fake_image_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature extractor: bytes → dim floats derived
    from a rolling checksum. Same signature/shape as a real encoder."""
    acc = [0] * dim
    for i, byte in enumerate(content or b""):
        acc[i % dim] = (acc[i % dim] * 31 + byte) % 100003
    return [v / 100003.0 for v in acc]


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of assets."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "feature": [fake_image_features(c) for c in pdf["content"]],
                    "batch_rows": len(pdf),
                }
            )

    return assets.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(
    assets: DataFrame, frame_bytes: int = 64, stride: int = 2
) -> DataFrame:
    """Deterministic frame sampling over opaque binary payloads: treat
    ``content`` as a sequence of ``frame_bytes``-sized blocks and emit
    every ``stride``-th block with its byte length and sha256 —
    (asset_id, frame_idx, frame, frame_len, frame_sha256).

    This is the video/audio frame-extraction PLUMBING with the decode
    stubbed out (no media library in this environment): real deployments
    replace the fixed-size blocks with demuxed frames, but the Spark-side
    mechanics — per-asset frame explosion, deterministic sampling grid,
    per-frame metadata, column-pruned scans — are identical and fully
    testable. Pure Column expressions (sequence + substring on binary):
    no UDF, whole-stage codegen, embarrassingly parallel; the frame table
    is O(payload bytes / frame_bytes / stride) rows.
    """
    # exact integer frame count: ceil(content_length / frame_bytes) via div
    n_frames = F.expr(
        f"(content_length + {frame_bytes - 1}) div {frame_bytes}"
    )
    frame = F.expr(f"substring(content, frame_idx * {frame_bytes} + 1, {frame_bytes})")
    return (
        assets.filter(F.col("content_length") > 0)
        .select(
            "asset_id",
            "content",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    n_frames - 1,
                    F.lit(stride).cast("long"),
                )
            ).alias("frame_idx"),
        )
        .select(
            "asset_id",
            "frame_idx",
            frame.alias("frame"),
            F.octet_length(frame).cast("long").alias("frame_len"),
            F.sha2(frame, 256).alias("frame_sha256"),
        )
    )
