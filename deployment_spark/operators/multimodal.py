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


def _default_codec_loader():  # pragma: no cover - codec libs absent by design
    """Production codec: PIL for images. Importing here (not module
    scope) keeps the engine importable without the codec stack; callers
    in this container get NotImplementedError from extract_features'
    driver-side availability check before any job launches."""
    import io

    import numpy as np
    from PIL import Image

    def decode(payload: bytes, media_type: str) -> "np.ndarray":
        if media_type != "image":
            raise NotImplementedError(f"no default codec for {media_type!r}")
        return np.asarray(Image.open(io.BytesIO(payload)).convert("L"), dtype=np.float64)

    return decode


def extract_features(
    df: DataFrame, decode: str = "fake", dim: int = 16, codec_loader=None
) -> DataFrame:
    """Decode + feature-extract over media rows via ``mapInPandas``.

    ``fake``: features straight from payload bytes — exercises the full
    Arrow batch path with zero dependencies. ``real``: a codec decodes
    each payload to a sample array first, then the SAME chunked-mean
    feature math runs on the decoded samples.

    ``codec_loader() -> decode_fn(payload, media_type) -> ndarray``
    defaults to a PIL-backed image decoder; tests inject a fake with the
    same contract so the real-path body — per-task loader amortization,
    per-row decode, shared feature math, empty-payload guard — executes
    in CI without codec libraries (same pattern as
    ``sentence_transformer_embed``'s model_loader, which caught a real
    iterator-contract bug). The loader runs on executors, once per task."""
    if decode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode {decode!r}")
    if decode == "real" and codec_loader is None:
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real media decoding requires codec libraries (PIL/ffmpeg) "
                "not present in this environment; use decode='fake' or pass "
                "codec_loader"
            ) from e
        codec_loader = _default_codec_loader

    def run(batches):
        import numpy as np
        import pandas as pd

        decode_fn = codec_loader() if decode == "real" else None  # once per task
        for pdf in batches:
            if pdf.empty:
                continue
            feats, sizes = [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                n_bytes = len(payload or b"")
                sizes.append(n_bytes)
                if n_bytes == 0:
                    feats.append([0.0] * dim)
                    continue
                if decode_fn is not None:
                    raw = np.asarray(decode_fn(payload, mtype), dtype=np.float64).ravel()
                else:
                    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                if raw.size == 0:
                    feats.append([0.0] * dim)
                    continue
                chunks = np.array_split(raw, dim)
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
