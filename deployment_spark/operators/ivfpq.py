"""IVF×PQ — the composed vector index (FAISS ``IndexIVFPQ`` analog):
coarse KMeans lists give PARTITION PRUNING (scan only nprobe of nlist
lists), PQ codes inside each list give MEMORY COMPRESSION (m bytes per
vector), and an optional exact re-rank refines the shortlist from the
full-precision rows — the three-stage shape every production vector
store converges on, here expressed as a parquet layout plus DataFrame
plans.

Composition of the two existing indexes, not a re-implementation:

- build: ``IVFIndex.build`` trains the coarse quantizer and writes the
  full-vector lists; then ``PQCodec.train`` + ``encode`` writes a
  parallel ``codes/`` table partitioned by the SAME cluster_id, so both
  representations prune identically;
- search: centroid routing (driver-side, like FAISS) → ``isin``
  partition pruning on the CODES table → ADC lookup-table scoring →
  per-query shortlist → optional exact cosine re-rank joining only the
  shortlist back to the full-vector lists (also pruned).

At 100 TB the codes table is what the hot path scans (16-48× smaller);
full vectors are touched O(nq·shortlist) rows per query batch.

Recall: driver-visible in tests (pruning recall ≈ `ivf_recall`'s,
compression recall recovered by re-rank as in `pq_recall`).
"""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deployment_spark.operators.ivf import IVFIndex
from deployment_spark.operators.pq import PQCodec


class IVFPQIndex:
    """root/ holds the IVFIndex layout plus ``codes/cluster_id=*`` and
    ``codebook.json``."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        self.ivf = IVFIndex(spark, root)

    @property
    def _codes_path(self) -> str:
        return os.path.join(self.root, "codes")

    @property
    def _codebook_path(self) -> str:
        return os.path.join(self.root, "codebook.json")

    def build(
        self,
        df: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        nlist: int | None = None,
        m: int = 8,
        ksub: int = 64,
        seed: int = 42,
    ) -> "IVFPQIndex":
        self.ivf.build(df, id_col=id_col, vec_col=vec_col, nlist=nlist, seed=seed)
        codec = PQCodec.train(df, vec_col, m=m, ksub=ksub, seed=seed)
        # encode the ASSIGNED table so codes carry the same cluster_id
        assigned = self.ivf.data().select(id_col, vec_col, "cluster_id")
        codes = codec.encode(assigned, id_col, vec_col).join(
            assigned.select(id_col, "cluster_id"), id_col
        )
        codes.write.mode("overwrite").partitionBy("cluster_id").parquet(
            self._codes_path
        )
        codec.save(self._codebook_path)
        return self

    def codec(self) -> PQCodec:
        return PQCodec.load(self._codebook_path)

    def codes(self) -> DataFrame:
        return self.spark.read.parquet(self._codes_path)

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 10,
        shortlist: int | None = 50,
        query_id: str = "query_id",
        query_vec: str = "query_vec",
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """nprobe-pruned ADC search; with ``shortlist`` set, exact cosine
        re-rank of the shortlist against the (equally pruned)
        full-vector lists. Output (query_id, vec_id, rank, similarity) —
        similarity is exact cosine when re-ranking, else the negated ADC
        distance (comparable ordering, documented approximation)."""
        cents = self.ivf.centroids()
        qrows = queries.select(query_id, query_vec).collect()  # nq-scale
        if not qrows:
            return self.ivf.search_empty(query_id, id_col)
        nprobe = min(nprobe, cents.shape[0])
        qn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        routing = []
        for r in qrows:
            v = np.asarray(r[query_vec], dtype=np.float64)
            v = v / max(np.linalg.norm(v), 1e-12)
            order = np.argsort(-(qn @ v))[:nprobe]
            routing.extend((r[query_id], int(c)) for c in order)
        probed = sorted({c for _, c in routing})

        codec = self.codec()
        pruned_codes = self.codes().filter(F.col("cluster_id").isin(probed))
        take = shortlist or k
        short = codec.search(
            pruned_codes, queries, k=max(take, k), id_col=id_col,
            query_id=query_id, query_vec=query_vec,
        )
        if shortlist is None:
            return short.filter(F.col("rank") <= k).select(
                query_id, id_col, "rank",
                (-F.col("adc_distance")).alias("similarity"),
            )
        from deployment_spark.functions.vector import cosine_similarity
        from pyspark.sql import Window

        full = self.ivf.data().filter(F.col("cluster_id").isin(probed)).select(
            id_col, vec_col
        )
        q = F.broadcast(
            queries.select(query_id, F.col(query_vec).alias("_qv"))
        )
        scored = (
            short.select(query_id, id_col)
            .join(full, id_col)
            .join(q, query_id)
            .withColumn("_sim", cosine_similarity(vec_col, "_qv"))
        )
        w = Window.partitionBy(query_id).orderBy(F.desc("_sim"), F.asc(id_col))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, id_col, "rank", F.col("_sim").alias("similarity"))
        )
