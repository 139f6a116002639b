"""Multimodal columns for training-data pipelines (SURVEY §7.1 M8).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside. Decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` — the same batch shape as the embedding
stage, so the 100 TB story (partition-parallel, spill-safe, no driver
transfer) is identical.

The decode step itself is STUBBED: image/audio codec libraries are not
in this container. ``decode="fake"`` produces a deterministic
pseudo-decode (so the distributed plumbing — schema, batching,
partitioning — is real and tested); ``decode="real"`` raises
NotImplementedError at the point a codec would be called.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("format", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def synthetic_media(spark, n: int = 100, media_type: str = "image") -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id
    (sha2 of the id string, repeated) — a stand-in for real encoded blobs
    with realistic per-row sizes."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.lit(media_type).alias("media_type"),
            F.encode(
                F.repeat(F.sha2(F.col("id").cast("string"), 256), 8), "utf-8"
            ).cast("binary").alias("payload"),
            F.struct(
                F.lit(64).cast("int").alias("width"),
                F.lit(64).cast("int").alias("height"),
                F.lit(None).cast("int").alias("duration_ms"),
                F.lit("fake/v1").alias("format"),
            ).alias("meta"),
        )
    )


def extract_features(df: DataFrame, decode: str = "fake", dim: int = 16) -> DataFrame:
    """Decode + feature-extract over media rows via ``mapInPandas``.

    ``fake``: deterministic features from payload bytes (mean/spread of
    byte chunks) — exercises the full Arrow batch path. ``real``: where a
    codec (PIL/ffmpeg/torchaudio) would run; raises NotImplementedError.
    """
    if decode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode {decode!r}")

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            if decode == "real":  # pragma: no cover - codec libs absent by design
                raise NotImplementedError(
                    "real media decoding requires codec libraries (PIL/ffmpeg) "
                    "not present in this environment; use decode='fake'"
                )
            feats, sizes = [], []
            for payload in pdf["payload"]:
                raw = np.frombuffer(payload or b"", dtype=np.uint8)
                sizes.append(len(raw))
                if len(raw) == 0:
                    feats.append([0.0] * dim)
                    continue
                chunks = np.array_split(raw.astype(np.float64), dim)
                feats.append([float(c.mean() / 255.0) if len(c) else 0.0 for c in chunks])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": sizes,
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


PAYLOAD_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("byte_sum", LongType(), True),
    ]
)


def payload_stats(df: DataFrame) -> DataFrame:
    """Integer-exact payload statistics via the same Arrow/mapInPandas
    path as :func:`extract_features` — byte length and byte sum per media
    row. Being integer math, the result is bit-reproducible anywhere,
    which makes the binary-column plumbing oracle-checkable end to end."""

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            sizes, sums = [], []
            for payload in pdf["payload"]:
                raw = np.frombuffer(payload or b"", dtype=np.uint8)
                sizes.append(len(raw))
                sums.append(int(raw.sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": sizes,
                    "byte_sum": sums,
                }
            )

    return df.mapInPandas(run, schema=PAYLOAD_STATS_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode per-media sample timestamps
    from metadata (decode stubbed). Output one row per planned frame —
    the shape a real extractor would fill."""
    return (
        df.filter(F.col("media_type") == "video")
        .withColumn(
            "sample_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "sample_ts_ms", "meta")
    )
