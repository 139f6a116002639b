"""CRUD snapshot store (C1-C7) — scripted mutation sequences with
straight-line expected state (SURVEY §5.2(3))."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.crud import SnapshotStore, drop_stores_by_prefix


@pytest.fixture()
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "corpus"), key="id")


def mk(spark, rows):
    return spark.createDataFrame(rows, ["id", "payload"])


def test_create_insert_count(spark, store):
    store.create(mk(spark, [(1, "a"), (2, "b")]))
    assert store.count() == 2
    store.insert(mk(spark, [(3, "c"), (3, "c-dup"), (2, "existing")]))
    # incoming dedup on key + existing keys dropped (Milvus pk semantics)
    assert store.count() == 3
    assert store.read().filter(F.col("id") == 2).collect()[0].payload == "b"


def test_delete_ids_and_last_n(spark, store):
    store.create(mk(spark, [(i, f"p{i}") for i in range(10)]))
    store.delete_ids([0, 1])
    assert sorted(r.id for r in store.read().collect()) == list(range(2, 10))
    store.delete_last_n(3)
    assert sorted(r.id for r in store.read().collect()) == [2, 3, 4, 5, 6]


def test_update_delete_reinsert_semantics(spark, store):
    store.create(mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    # reference C3: new vectors get NEW ids; old slots are not preserved
    store.update([2], mk(spark, [(20, "b2")]))
    assert sorted(r.id for r in store.read().collect()) == [1, 3, 20]


def test_upsert_lastwins(spark, store):
    store.create(mk(spark, [(1, "a"), (2, "b")]))
    store.upsert(mk(spark, [(2, "B"), (9, "new")]))
    state = {r.id: r.payload for r in store.read().collect()}
    assert state == {1: "a", 2: "B", 9: "new"}


def test_snapshot_time_travel_and_vacuum(spark, store):
    store.create(mk(spark, [(1, "a")]))
    store.insert(mk(spark, [(2, "b")]))
    assert store.read(version=1).count() == 1
    assert store.read(version=2).count() == 2
    removed = store.vacuum(keep_last=1)
    assert removed == [1]
    assert store.read().count() == 2


def test_exists_drop_prefix(spark, tmp_path):
    root = str(tmp_path)
    s1 = SnapshotStore(spark, os.path.join(root, "bench_model_a"), key="id")
    s2 = SnapshotStore(spark, os.path.join(root, "bench_model_b"), key="id")
    s3 = SnapshotStore(spark, os.path.join(root, "other"), key="id")
    for s in (s1, s2, s3):
        assert not s.exists()
        s.create(mk(spark, [(1, "x")]))
        assert s.exists()
    dropped = drop_stores_by_prefix(root, "bench_")
    assert dropped == ["bench_model_a", "bench_model_b"]
    assert not os.path.exists(s1.root) and os.path.exists(s3.root)
