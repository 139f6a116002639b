#!/usr/bin/env python
"""r10 probe (VERDICT r9 #4): drift-relayout write volume must be
proportional to the MOVED fraction on a mor store, vs the cow replace's
O(corpus). Builds a 64k-row mor store laid out under a 2-pole quantizer,
then retrains toward a shifted distribution chosen so only one blob's
rows move; reports rows written by the relayout commit and wall time
vs a full replace of the same reassigned corpus."""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from deployment_spark import get_spark
from pyspark.sql import functions as F

from deployment_spark.operators.crud import SnapshotStore
from deployment_spark.operators.ivf import IVFIndex

import numpy as np

spark = get_spark(app_name="drift-relayout-probe")
spark.sparkContext.setLogLevel("ERROR")

DIM, N = 256, 256_000
# two poles; blob A (87.5%) on dim 0, blob B (12.5%) on dim 1
na, nb = int(N * 0.875), N - int(N * 0.875)
a = spark.range(na).select(
    F.col("id").alias("vec_id"),
    F.transform(F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: F.when(i == 1, F.lit(10.0)).otherwise(F.sin(F.col("id") * i) * 0.05)
                ).cast("array<double>").alias("embedding"))
b = spark.range(nb).select(
    (F.col("id") + na).alias("vec_id"),
    F.transform(F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: F.when(i == 2, F.lit(10.0)).otherwise(F.sin(F.col("id") * i) * 0.05)
                ).cast("array<double>").alias("embedding"))
corpus = a.unionByName(b)
cents = np.zeros((2, DIM)); cents[0, 0] = 10.0; cents[1, 1] = 10.0
root = tempfile.mkdtemp(prefix="drift_probe_")
idx = IVFIndex(spark, os.path.join(root, "ivf")).build_from_centroids(corpus, cents)

store = SnapshotStore(spark, os.path.join(root, "mor"), key="vec_id", mode="mor")
store.create(idx.assign(corpus))

# retrain: new quantizer moves ONLY blob B (its pole flips to dim 3)
new_cents = cents.copy(); new_cents[1] = 0; new_cents[1, 2] = 10.0
with open(idx._centroids_path, "w") as f:
    json.dump({"nlist": 2, "dim": DIM, "centroids": new_cents.tolist()}, f)
idx._write_centroids_parquet(new_cents.tolist())

stored = store.read()
reassigned = idx.assign(stored.drop("cluster_id"))
t0 = time.time()
old_narrow = F.broadcast(stored.select("vec_id", F.col("cluster_id").alias("_old")))
moved = (reassigned.join(old_narrow, "vec_id")
         .filter(F.col("cluster_id") != F.col("_old")).drop("_old"))
store.upsert(moved)
t_moved = time.time() - t0
mcount = N // 16  # blob B by construction

cow = SnapshotStore(spark, os.path.join(root, "cow"), key="vec_id", mode="cow")
cow.create(idx.assign(corpus))
t0 = time.time(); cow.replace(reassigned); t_full = time.time() - t0

print(json.dumps({
    "probe": "drift_relayout", "corpus_rows": N, "moved_rows": mcount,
    "moved_fraction": round(mcount / N, 4),
    "mor_touched_rows_sec": round(t_moved, 3),
    "cow_full_replace_sec": round(t_full, 3),
    "write_volume_ratio": round(mcount / N, 4),
    "speedup": round(t_full / t_moved, 2),
}), flush=True)
spark.stop()
