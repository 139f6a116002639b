from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deployment_spark.operators import multimodal


def test_synthetic_media_schema(spark):
    df = multimodal.synthetic_media(spark, 20)
    assert df.count() == 20
    assert dict(df.dtypes)["payload"] == "binary"
    assert df.schema["meta"].dataType.fieldNames() == ["width", "height", "duration_ms", "format"]


def test_extract_features_fake_deterministic(spark):
    df = multimodal.synthetic_media(spark, 30)
    f1 = {r.media_id: r.feature for r in multimodal.extract_features(df).collect()}
    f2 = {r.media_id: r.feature for r in multimodal.extract_features(df).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())
    n_bytes = {r.media_id: r.n_bytes for r in multimodal.extract_features(df).collect()}
    assert all(v == 512 for v in n_bytes.values())  # 64-hex sha2 × 8


def test_extract_features_real_raises(spark):
    df = multimodal.synthetic_media(spark, 2)
    with pytest.raises(Exception) as exc_info:
        multimodal.extract_features(df, decode="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or "real media decoding" in str(exc_info.value)


def _make_fake_codec_loader():
    """Injected stand-in for PIL/ffmpeg with the real contract:
    loader() -> decode(payload, media_type) -> ndarray of samples.
    Deterministic — 'decodes' each byte to byte*2 — so expected features
    are computable driver-side. Built inside a factory (not at module
    scope) so cloudpickle ships it by value; executors cannot import the
    test module."""

    def loader():
        import numpy as np

        def decode(payload: bytes, media_type: str):
            assert media_type == "image"
            return np.frombuffer(payload, dtype=np.uint8).astype(np.float64) * 2.0

        return decode

    return loader


def test_extract_features_real_body_via_injected_codec(spark):
    """decode='real' executes the actual decode body (per-task loader,
    per-row decode, shared chunked-mean feature math) under an injected
    fake codec — the pattern that caught a real Series-contract bug in
    the embed UDF. Features must equal the python reference on the
    decoded samples, and be exactly 2x the fake path's (decode doubles
    every byte)."""
    import numpy as np

    df = multimodal.synthetic_media(spark, 12).repartition(3)
    got = {
        r.media_id: (r.n_bytes, r.feature)
        for r in multimodal.extract_features(
            df, decode="real", codec_loader=_make_fake_codec_loader()
        ).collect()
    }
    fake = {
        r.media_id: r.feature for r in multimodal.extract_features(df).collect()
    }
    import hashlib

    for mid, (n, feat) in got.items():
        payload = (hashlib.sha256(str(mid).encode()).hexdigest() * 8).encode()
        assert n == len(payload) == 512  # n_bytes stays ENCODED size
        decoded = np.frombuffer(payload, dtype=np.uint8).astype(np.float64) * 2.0
        want = [float(c.mean() / 255.0) for c in np.array_split(decoded, 16)]
        assert feat == pytest.approx(want, abs=1e-6)
        assert feat == pytest.approx([2 * x for x in fake[mid]], abs=1e-6)


def test_extract_features_real_empty_payload_guard(spark):
    """NULL/empty payloads bypass the codec (no decode call on zero
    bytes) and produce the zero feature vector."""
    df = multimodal.synthetic_media(spark, 3).withColumn(
        "payload",
        F.when(F.col("media_id") == 1, F.lit(None).cast("binary")).otherwise(
            F.col("payload")
        ),
    )
    rows = {
        r.media_id: (r.n_bytes, r.feature)
        for r in multimodal.extract_features(
            df, decode="real", codec_loader=_make_fake_codec_loader()
        ).collect()
    }
    assert rows[1] == (0, [0.0] * 16)
    assert rows[0][0] == 512 and any(x > 0 for x in rows[0][1])


def test_payload_stats_integer_exact(spark):
    df = multimodal.synthetic_media(spark, 10)
    rows = {r.media_id: (r.n_bytes, r.byte_sum) for r in multimodal.payload_stats(df).collect()}
    assert len(rows) == 10
    # payload = repeat(sha2_hex, 8): 512 utf-8 bytes, sum reproducible driver-side
    import hashlib

    for mid, (n, s) in rows.items():
        expected = (hashlib.sha256(str(mid).encode()).hexdigest() * 8).encode()
        assert n == len(expected) == 512
        assert s == sum(expected)


def test_frame_sample_plan(spark):
    df = multimodal.synthetic_media(spark, 5, media_type="video").withColumn(
        "meta",
        F.struct(
            F.col("meta.width"),
            F.col("meta.height"),
            F.lit(3500).cast("int").alias("duration_ms"),
            F.col("meta.format"),
        ),
    )
    plan = multimodal.frame_sample_plan(df, every_ms=1000)
    per_media = plan.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per_media)  # ts 0,1000,2000,3000
