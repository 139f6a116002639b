"""CRUD maintenance on immutable storage (SURVEY §2.10 C1-C7, §7.3(2)).

The reference mutates a live index (FAISS ``index.add/remove_ids``,
Milvus ``insert/delete/upsert`` + ``flush``). On Spark the equivalent is
**snapshot versioning**: every mutation writes a new immutable parquet
snapshot and atomically repoints a version marker. Readers always see a
complete snapshot — the reference's "Strong" consistency
(``Milvus/stream1.py:115``) falls out of snapshot isolation.

By construction this fixes two documented reference bugs:
- index/payload drift (``FAISS/UI-Demo/pipeline+ui.py:532-534``): vector
  and payload live in one row, they cannot diverge;
- the 16,384-row pk-scan cap (``Milvus/stream1.py:299``): last-N delete
  is a real ORDER BY/LIMIT plan, not a capped client scan.

Scale notes: mutations are joins/unions that shuffle only on the key;
delete is a broadcast anti-join when the id-set is small. Snapshots are
written partitioned when a partition column is configured (e.g.
``cluster_id`` for the IVF layout, §4). Old versions are retained for
time travel until ``vacuum``.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class SnapshotStore:
    """Versioned parquet table with last-wins upsert semantics.

    Layout::

        root/
          _current            # JSON {"version": N, "path": "v000N"}
          v0001/ ... parquet
          v0002/ ... parquet
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key: str = "id",
        partition_by: str | None = None,
    ) -> None:
        self.spark = spark
        self.root = root
        self.key = key
        self.partition_by = partition_by
        os.makedirs(root, exist_ok=True)

    # -- version bookkeeping ------------------------------------------------

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_current")

    def current_version(self) -> int:
        if not os.path.exists(self._pointer):
            return 0
        with open(self._pointer) as f:
            return json.load(f)["version"]

    def _snapshot_path(self, version: int) -> str:
        return os.path.join(self.root, f"v{version:06d}")

    def exists(self) -> bool:
        """C7 — existence check (``utility.has_collection``,
        ``Milvus/stream1.py:105``)."""
        return self.current_version() > 0

    def _commit(self, df: DataFrame) -> int:
        """C5 — flush/persist barrier (``collection.flush()``,
        ``Milvus/stream1.py:226``): write the new snapshot fully, then
        atomically swap the pointer (write-temp + rename)."""
        version = self.current_version() + 1
        path = self._snapshot_path(version)
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(self.partition_by)
        writer.parquet(path)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "path": os.path.basename(path), "ts": time.time()}, f)
        os.replace(tmp, self._pointer)
        return version

    # -- reads --------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        if v == 0:
            raise ValueError(f"snapshot store {self.root} is empty")
        return self.spark.read.parquet(self._snapshot_path(v))

    def count(self) -> int:
        """A6 — ``index.ntotal`` / ``collection.num_entities``."""
        return self.read().count() if self.exists() else 0

    # -- mutations (each returns the new version) ---------------------------

    def create(self, df: DataFrame) -> int:
        return self._commit(df)

    def insert(self, rows: DataFrame, dedup_new: bool = True) -> int:
        """C1 — append (``index.add`` / ``collection.insert``). The Milvus
        path dedups incoming rows on pk first (``stream1.py:215,265``);
        rows whose key already exists in the corpus are dropped, matching
        primary-key insert semantics."""
        if not self.exists():
            base = rows.limit(0)
        else:
            base = self.read()
        new = rows
        if dedup_new:
            new = new.dropDuplicates([self.key])
        new = new.join(base.select(self.key), on=self.key, how="left_anti")
        return self._commit(base.unionByName(new))

    def delete_ids(self, ids: DataFrame | list) -> int:
        """C2/J3 — delete by id-set as a broadcast left_anti join
        (``index.remove_ids``, ``FAISS/PlainDemo/pipeline.py:110-112``)."""
        base = self.read()
        if isinstance(ids, list):
            ids_df = self.spark.createDataFrame(
                [(i,) for i in ids], schema=base.select(self.key).schema
            )
        else:
            ids_df = ids.select(F.col(ids.columns[0]).alias(self.key))
        return self._commit(base.join(F.broadcast(ids_df), on=self.key, how="left_anti"))

    def delete_last_n(self, n: int) -> int:
        """C2 Milvus variant — delete the n largest keys
        (``Milvus/stream1.py:305-315``), WITHOUT the 16,384-row scan cap."""
        base = self.read()
        last_n = base.select(self.key).orderBy(F.desc(self.key)).limit(n)
        return self._commit(base.join(F.broadcast(last_n), on=self.key, how="left_anti"))

    def update(self, ids: DataFrame | list, new_rows: DataFrame) -> int:
        """C3 — update = delete + re-insert
        (``FAISS/PlainDemo/pipeline.py:91-104,114-123``). As in the
        reference, new rows may carry new ids — old id slots are not
        preserved (documented quirk, SURVEY §7.3(3))."""
        self.delete_ids(ids)
        return self.insert(new_rows)

    def upsert(self, rows: DataFrame) -> int:
        """C4/J4 — last-wins merge by pk (``collection.upsert``,
        ``Milvus/stream1.py:370``)."""
        base = self.read()
        merged = rows.withColumn("_prio", F.lit(1)).unionByName(
            base.withColumn("_prio", F.lit(0))
        )
        w = Window.partitionBy(self.key).orderBy(F.desc("_prio"))
        final = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_prio")
        )
        return self._commit(final)

    # -- maintenance --------------------------------------------------------

    def drop(self) -> None:
        """C6 — drop collection (``utility.drop_collection``,
        ``Milvus/stream1.py:516``)."""
        shutil.rmtree(self.root, ignore_errors=True)

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Remove snapshot versions older than the newest ``keep_last``
        (compaction policy for delete-heavy benchmark sequences,
        SURVEY §7.3(2))."""
        current = self.current_version()
        removed = []
        for v in range(1, max(current - keep_last + 1, 1)):
            path = self._snapshot_path(v)
            if os.path.exists(path):
                shutil.rmtree(path)
                removed.append(v)
        return removed


def drop_stores_by_prefix(root_dir: str, prefix: str) -> list[str]:
    """C6 — drop-all by prefix scan (``Milvus/stream1.py:524-536``)."""
    dropped = []
    if not os.path.isdir(root_dir):
        return dropped
    for name in sorted(os.listdir(root_dir)):
        if name.startswith(prefix):
            shutil.rmtree(os.path.join(root_dir, name), ignore_errors=True)
            dropped.append(name)
    return dropped
