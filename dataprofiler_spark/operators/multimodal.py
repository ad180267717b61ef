"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as `binary` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
`mapInPandas` so the heavy bytes never round-trip through per-row Python.
The image/audio codec libraries are NOT in this container, so the decode
kernel is STUBBED: with PIL/soundfile absent it falls back to a
deterministic byte-statistics "decode" (clearly marked). Everything
Spark-side — schema, partitioning, mapInPandas signature, Arrow batch
shape, output schema — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_std", T.DoubleType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def gen_assets(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic asset table: binary payloads built from
    repeated md5 digests (pure expressions — scales like the sequence
    generator). Payload sizes vary per modality."""
    df = spark.range(0, n_rows, 1, max(spark.sparkContext.defaultParallelism, 4))
    modality = (
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
    )
    reps = (
        F.when(F.col("id") % 3 == 0, 64).when(F.col("id") % 3 == 1, 256).otherwise(1024)
    )
    chunk = F.unhex(F.md5(F.concat(F.lit(str(seed)), F.col("id").cast("string"))))
    data = F.aggregate(
        F.sequence(F.lit(1), reps),
        F.lit(b""),
        lambda acc, _i: F.concat(acc, chunk),
    )
    meta = F.struct(
        F.when(modality == "image", (F.col("id") % 64 + 32).cast("int")).alias("width"),
        F.when(modality == "image", (F.col("id") % 48 + 32).cast("int")).alias("height"),
        F.when(modality == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(modality == "video", (F.col("id") % 30 + 1).cast("int")).alias("n_frames"),
    )
    return df.select(
        F.format_string("asset-%09d", F.col("id")).alias("asset_id"),
        modality.alias("modality"),
        data.alias("data"),
        meta.alias("meta"),
    )


def _decode_stub(buf: np.ndarray) -> tuple[float, float, bool]:
    """STUB decode: codec libs absent in this container. The vectorized
    byte statistics stand in for pixel/sample statistics; `decoded=False`
    marks stub output. A real deployment swaps the body for
    PIL.Image.open(io.BytesIO(buf)) / soundfile.read(...) and returns
    pixel/sample stats with decoded=True — until that is wired, the stub
    answer is used even when the library happens to be importable (the
    synthetic payloads are not valid codec streams)."""
    return float(buf.mean()), float(buf.std()), False


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    mapInPandas: each batch arrives as a pandas DataFrame whose `data`
    column holds bytes; numpy consumes the raw buffers — no per-row Python
    beyond the iteration over (rare, large) binary cells."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [
                _decode_stub(np.frombuffer(b, dtype=np.uint8)) for b in pdf["data"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["data"].map(len).astype("int64"),
                    "byte_mean": [s[0] for s in stats],
                    "byte_std": [s[1] for s in stats],
                    "decoded": [s[2] for s in stats],
                }
            )

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10, frame_bytes: int = 16) -> DataFrame:
    """'Video' frame sampling as pure byte-slicing expressions: explode one
    binary slice per sampled frame index. The real decoder would replace
    the slice with a codec call inside mapInPandas; the plumbing (explode
    shape, per-frame rows, lineage columns) is the tested part."""
    frames = F.sequence(F.lit(0), F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)), F.lit(every_n))
    return (
        df.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(frames).alias("frame_idx"),
            F.col("data"),
        )
        .select(
            "asset_id",
            "frame_idx",
            F.expr(f"substring(data, frame_idx * {frame_bytes} + 1, {frame_bytes})").alias("frame_data"),
        )
    )


def profile_assets(df: DataFrame) -> DataFrame:
    """Per-modality asset profile — the data_profiles analog for binary
    columns (size stats instead of value stats)."""
    return df.groupBy("modality").agg(
        F.count(F.lit(1)).alias("asset_count"),
        F.min(F.length("data")).alias("min_bytes"),
        F.max(F.length("data")).alias("max_bytes"),
        F.round(F.avg(F.length("data")), 2).alias("avg_bytes"),
    )
