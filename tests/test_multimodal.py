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
