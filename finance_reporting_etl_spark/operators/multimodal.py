"""Multimodal column plumbing (BASELINE extension X5).

Images/audio/video ride as opaque ``binary`` columns beside a typed
metadata struct. The Spark-side machinery is real — schema, Arrow batch
shape, ``mapInPandas`` signature, partitioning — while the actual media
decode is stubbed (codec libraries are not in this container): the
default extractor is a deterministic fake; a real one drops in with the
same signature.

Scale notes: media blobs make rows wide, so the decode stage uses
``mapInPandas`` (per-partition Arrow batches, no shuffle), and
``spark.sql.files.maxPartitionBytes`` bounds task size. Feature vectors
come back as ``array<float>`` ready for operators/similarity.py.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def bundle_document(docs: DataFrame, embeddings: DataFrame) -> DataFrame:
    """X5 struct bundling: text + embedding + metadata in one row.

    Join key doc_id = vec_id; embedding side is small relative to media
    payloads, so an AQE broadcast applies at fixture scale while a
    shuffle join takes over at 100 TB (both correct, Catalyst decides).
    """
    e = embeddings.select(F.col("vec_id").alias("doc_id"), "embedding", "label")
    joined = docs.join(e, "doc_id")
    return joined.select(
        "doc_id",
        F.struct(
            F.col("text"), F.col("lang"), F.col("source"), F.col("n_chars")
        ).alias("document"),
        F.struct(F.col("embedding"), F.col("label")).alias("vector"),
    )


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media column: payload = utf-8 of the text head
    (stands in for encoded bytes), metadata derived from doc fields.
    Type rotates by doc_id (image/audio/video) so every downstream
    stage — resize, frame-sample, feature-extract — has material;
    audio/video get a duration derived from n_chars."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    duration = F.when(mt != "image", (F.col("n_chars") % 480 + 1).cast("long") * 100)
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode(F.substring("text", 1, 64), "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            duration.alias("duration_ms"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
    )


def default_feature_extractor(payload: bytes, media_type: str) -> list[float]:
    """STUB decode/feature-extract. A real implementation would decode
    ``payload`` with PIL/librosa/ffmpeg (not installed here) and emit a
    model feature vector. The fake is deterministic: byte histogram
    folded to 8 dims, so the full pipeline is testable end-to-end.

    No rounding: sums of byte values are exact in float64 and the final
    division is a single IEEE op, so an independent SQL re-derivation
    (the DuckDB oracle) reproduces the values bit-for-bit."""
    if payload is None:
        return [0.0] * 8
    feats = [0.0] * 8
    for i, b in enumerate(payload):
        feats[i % 8] += float(b)
    total = sum(feats) or 1.0
    return [f / total for f in feats]


def extract_features(
    media: DataFrame,
    extractor: Callable[[bytes, str], list[float]] = default_feature_extractor,
    out_dim: int = 8,
) -> DataFrame:
    """Decode/feature-extract stage as mapInPandas (Arrow batches).

    Raising ``NotImplementedError`` inside a real extractor for an
    unsupported codec fails the task, not the plan — wrap per-row if
    partial success is wanted.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), True),
            # double, not float: keeps the extractor's float64 values exact
            # end-to-end (oracle parity) at 2x the width of a real model's
            # fp32 embedding — a real extractor can narrow this.
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "features": [
                        extractor(p, m)
                        for p, m in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )

    return media.mapInPandas(batches, schema=out_schema)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage — STUB: real decode isn't available, so this
    validates plumbing by rewriting metadata only. Signature and batch
    shape match what a PIL-backed version would use."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.format").alias("format"),
        ),
    )


def frame_sample(media: DataFrame, fps: float = 1.0, max_frames: int = 16) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp.

    The row-explosion plumbing is real — frame count from duration x
    fps (capped), per-frame timestamps, stable (doc_id, frame_idx)
    keys, all Catalyst (sequence + explode, no Python) — while the
    frame DECODE is the stub boundary: ``frame_payload`` marks where a
    real ffmpeg-backed extractor would emit decoded pixels; feed rows
    through ``extract_features`` with such an extractor to complete
    the pipeline. Filter pushes 'video' down to the scan; the explode
    multiplies rows map-side with no shuffle.
    """
    n_frames = F.least(
        F.ceil(F.col("meta.duration_ms") / F.lit(1000.0) * F.lit(fps)).cast("int"),
        F.lit(max_frames),
    )
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))))
        .select(
            "doc_id",
            "frame_idx",
            (F.col("frame_idx") * F.lit(1000.0 / fps)).cast("long").alias("frame_ts_ms"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.lit(None).cast("binary").alias("frame_payload"),  # decode stub
        )
    )
