"""Count-Min sketch (operators/sketch.py): one-sided error, heavy-hitter
accuracy, and merge algebra."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.sketch import cms_build, cms_estimate, cms_merge

W, D = 512, 5


@pytest.fixture(scope="module")
def zipfish(spark):
    # zipf-ish: value v appears ~ 3000/(v+1) times; hot head, long tail
    return spark.range(30000).select(
        (F.floor(3000 / (F.pmod(F.xxhash64("id"), 3000) + 1))).cast("string").alias("v")
    ).cache()


def true_counts(df):
    return {r.v: r.c for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()}


def test_cms_never_undercounts_and_is_tight_for_heavy_hitters(spark, zipfish):
    sketch = cms_build(zipfish, "v", width=W, depth=D)
    truth = true_counts(zipfish)
    probes = zipfish.select("v").distinct()
    est = {
        r.probe: r.est_count
        for r in cms_estimate(sketch, probes, "v", width=W, depth=D).collect()
    }
    n = sum(truth.values())
    eps_bound = 2.71828 / W * n  # classical CMS guarantee
    for v, c in truth.items():
        assert est[v] >= c, (v, est[v], c)  # one-sided
        assert est[v] - c <= eps_bound, (v, est[v], c)
    # heavy hitters (top 5) should be near-exact
    for v in sorted(truth, key=truth.get, reverse=True)[:5]:
        assert est[v] - truth[v] <= 0.02 * truth[v] + 50


def test_cms_merge_equals_whole(spark, zipfish):
    a = zipfish.filter(F.pmod(F.xxhash64("v", F.lit(7)), 2) == 0)
    b = zipfish.filter(F.pmod(F.xxhash64("v", F.lit(7)), 2) == 1)
    merged = cms_merge(
        cms_build(a, "v", width=W, depth=D), cms_build(b, "v", width=W, depth=D)
    )
    whole = cms_build(zipfish, "v", width=W, depth=D)
    ma = {(r.depth, r.cell): r.cnt for r in merged.collect()}
    mw = {(r.depth, r.cell): r.cnt for r in whole.collect()}
    assert ma == mw


def test_cms_unseen_value_estimates_near_zero(spark, zipfish):
    sketch = cms_build(zipfish, "v", width=W, depth=D)
    probes = spark.createDataFrame([("never-seen-xyz",)], ["v"])
    est = cms_estimate(sketch, probes, "v", width=W, depth=D).first().est_count
    n = sum(true_counts(zipfish).values())
    assert est <= 2.71828 / W * n


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    """Continuously-maintained CMS: micro-batch merges produce the SAME
    grid as one batch build over all the data (cell counts are exact
    under merge), and a replayed batch_id is skipped, not double-counted."""
    from deployment_spark.operators.crud import SnapshotStore
    from deployment_spark.operators.sketch import StreamingCMS

    landing = str(tmp_path / "cms_landing")
    rows = [(f"k{i % 17}",) for i in range(2000)]
    df = spark.createDataFrame(rows, ["v"])
    df.limit(1200).coalesce(1).write.mode("append").parquet(landing)
    df.subtract(df.limit(1200))  # (not written yet)

    store = SnapshotStore(spark, str(tmp_path / "cms_store"), key="cms_key")
    cms = StreamingCMS(store, "v", width=W, depth=D)
    q = cms.attach(
        spark.readStream.schema("v STRING").parquet(landing),
        str(tmp_path / "cms_ckpt"),
    )
    q.awaitTermination(120)
    # second chunk lands; resume from checkpoint
    spark.createDataFrame(rows[1200:], ["v"]).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    q2 = cms.attach(
        spark.readStream.schema("v STRING").parquet(landing),
        str(tmp_path / "cms_ckpt"),
    )
    q2.awaitTermination(120)

    got = {(r.depth, r.cell): r.cnt for r in cms.sketch().collect()}
    want = {
        (r.depth, r.cell): r.cnt
        for r in cms_build(spark.createDataFrame(rows, ["v"]), "v", width=W, depth=D).collect()
    }
    assert got == want
    # estimates ride the stored grid; exact for these (collision-light) keys
    probe = spark.createDataFrame([("k3",)], ["v"])
    assert cms.estimate(probe, "v").first().est_count >= 2000 // 17
    # replay of the last committed (run_id, batch_id) is a no-op
    meta = store.commit_meta()
    before = store.current_version()
    cms.refresh(
        spark.createDataFrame(rows[:5], ["v"]),
        batch_id=meta["cms_batch_id"],
        run_id=meta["cms_run_id"],
    )
    assert store.current_version() == before
    # same batch_id under a DIFFERENT run (fresh checkpoint) is NEW data
    cms.refresh(
        spark.createDataFrame([("k0",)], ["v"]),
        batch_id=meta["cms_batch_id"],
        run_id="another-checkpoint",
    )
    assert store.current_version() == before + 1
    probe0 = spark.createDataFrame([("k0",)], ["v"])
    assert cms.estimate(probe0, "v").first().est_count >= 2000 // 17 + 1


def test_cms_portable_matches_xxhash_semantics(spark, zipfish):
    """The portable (md5) grid gives the same guarantees as the prod
    (xxhash64) grid — one-sided error with the classical bound — and the
    two estimate within the same envelope on every probed value (cell
    layouts differ, guarantees don't)."""
    from deployment_spark.operators.sketch import (
        cms_build_portable,
        cms_estimate_portable,
    )

    sketch = cms_build_portable(zipfish, "v", width=W, depth=D)
    truth = true_counts(zipfish)
    probes = zipfish.select("v").distinct()
    est = {
        r.probe: r.est_count
        for r in cms_estimate_portable(sketch, probes, "v", width=W, depth=D).collect()
    }
    n = sum(truth.values())
    eps_bound = 2.71828 / W * n
    for v, c in truth.items():
        assert est[v] >= c, (v, est[v], c)
        assert est[v] - c <= eps_bound, (v, est[v], c)


def test_cms_portable_null_contract(spark):
    """Portable variant EXCLUDES NULLs (md5(NULL) is NULL in both
    engines); the grid's total mass equals the non-null row count."""
    from deployment_spark.operators.sketch import cms_build_portable

    df = spark.createDataFrame([("a",), ("b",), (None,), ("a",)], ["v"])
    grid = cms_build_portable(df, "v", width=64, depth=3)
    total = grid.agg(F.sum("cnt").alias("s")).first().s
    assert total == 3 * 3  # 3 non-null rows × depth
