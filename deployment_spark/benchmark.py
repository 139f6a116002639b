"""Reference benchmark grid (SURVEY §2.13 B1-B4).

Reproduces the FAISS PlainDemo benchmark protocol on the Spark engine:
op sizes × {insertion, deletion, update, query} over a corpus store,
emitting the reference's long-format metrics schema
(``FAISS/PlainDemo/README.md:96-99``, ``pipeline.py:135-175``)::

    model_name, operation_type, operation_size, execution_time,
    cpu_usage, memory_usage

B1 timed-execution wrapper → ``_measure``; B2 resource sampling →
psutil deltas on the driver (parity with the reference's process-level
sampling); B3 long-format accumulation; B4 the size grid
(``pipeline.py:325``: 2500…30000, reduced grids for small SF).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deployment_spark.functions.embed import hash_embed
from deployment_spark.functions.text import packet_text_v1
from deployment_spark.operators.crud import SnapshotStore
from deployment_spark.operators.similarity import topk_similarity_join
from deployment_spark.schemas import sample_packet_rows

REFERENCE_GRID = [2500, 5000, 7500, 10000, 20000, 30000]  # pipeline.py:325


def _measure(func):
    """B1 — (result, wall_time, Δcpu%, Δrss_mb), clamped ≥0 like the UI
    variant (pipeline+ui.py:108-111)."""
    try:
        import psutil

        proc = psutil.Process()
        cpu0 = proc.cpu_percent(interval=None)
        rss0 = proc.memory_info().rss / 1024 / 1024
    except ImportError:  # psutil absent: wall time only
        proc = None
        cpu0 = rss0 = 0.0
    t0 = time.perf_counter()
    result = func()
    elapsed = time.perf_counter() - t0
    if proc is not None:
        cpu = max(proc.cpu_percent(interval=None) - cpu0, 0.0)
        mem = max(proc.memory_info().rss / 1024 / 1024 - rss0, 0.0)
    else:
        cpu = mem = 0.0
    return result, elapsed, cpu, mem


def _synthetic_batch(spark: SparkSession, start: int, n: int, dim: int) -> DataFrame:
    """S7 — synthetic packet rows with text + hash-embedding (the
    generator pattern at pipeline.py:329 at any offset)."""
    return (
        sample_packet_rows(spark, start + n)
        .filter(F.col("frame_number").cast("long") >= start)
        .withColumn("frame_number", F.col("frame_number").cast("long"))
        .withColumn("packet_text", packet_text_v1())
        .withColumn("vector", hash_embed("packet_text", dim=dim))
    )


def run_reference_grid(
    spark: SparkSession,
    store_root: str,
    model_name: str = "hash-embedder-64d",
    sizes: list[int] | None = None,
    initial_rows: int = 10000,
    dim: int = 64,
    k: int = 5,
    store_mode: str = "cow",
    compact_every: int | None = None,
    compact_when: int | None = None,
) -> DataFrame:
    """B4 — the benchmark loop (pipeline.py:306-346) on the Spark engine:
    build corpus, then per size: insert synthetic rows, delete a sample,
    update (delete+reinsert), query top-k. Returns the metrics DataFrame
    in the reference's long format.

    ``store_mode="mor"`` runs the grid against the merge-on-read store
    (mutations cost O(batch), reads merge segments). Maintenance either
    way: ``compact_when=N`` hands the store the size-triggered
    auto-compaction policy (recommended — read amplification stays
    bounded no matter what the mutation mix does), while
    ``compact_every=N`` keeps the old fixed cadence of compacting after
    every N grid sizes (its cost shows up as explicit ``compaction``
    rows). With ``compact_when`` the fold runs INSIDE whichever
    mutation trips the threshold; the harness SUBTRACTS the store's own
    fold accounting from that mutation's row and emits the fold as its
    own ``auto_compaction`` row — every row is additive (like
    compact_every's explicit ``compaction`` rows), so summing
    execution_time per size or per round stays meaningful and
    mutation timings stay comparable round-over-round."""
    sizes = sizes or REFERENCE_GRID
    store = SnapshotStore(
        spark, store_root, key="frame_number", mode=store_mode,
        compact_when=compact_when,
    )
    store.create(_synthetic_batch(spark, 0, initial_rows, dim))
    next_id = initial_rows

    metrics: list[tuple] = []

    def record(op: str, size: int, elapsed: float, cpu: float, mem: float) -> None:
        # B3 — long-format row (pipeline.py:135-175)
        metrics.append((model_name, op, size, elapsed, cpu, mem))

    def record_mutation(op: str, size: int, fn) -> None:
        # additive attribution: in-line fold time is measured by the
        # store itself, subtracted from the mutation's wall time, and
        # emitted as its own row — see the docstring
        before = store.auto_compaction_seconds
        _, t, c, m = _measure(fn)
        fold = store.auto_compaction_seconds - before
        record(op, size, max(t - fold, 0.0), c, m)
        if fold > 0:
            record("auto_compaction", size, fold, 0.0, 0.0)

    for i, size in enumerate(sizes):
        if compact_every and i and i % compact_every == 0:
            _, t, c, m = _measure(store.compact)
            record("compaction", size, t, c, m)
        batch = _synthetic_batch(spark, next_id, size, dim)
        record_mutation("insertion", size, lambda: store.insert(batch))
        next_id += size

        # deletion: deterministic sample of current ids (reference uses
        # unseeded np.random.choice, pipeline.py:78; we pin determinism)
        victim_ids = store.read().select("frame_number").filter(
            F.col("frame_number") % 7 == 3
        ).limit(size)
        record_mutation("deletion", size, lambda: store.delete_ids(victim_ids))

        # update = delete + re-insert with new ids (C3 quirk preserved)
        upd_victims = store.read().select("frame_number").filter(
            F.col("frame_number") % 11 == 5
        ).limit(size)
        new_rows = _synthetic_batch(spark, next_id, size, dim)
        record_mutation("update", size, lambda: store.update(upd_victims, new_rows))
        next_id += size

        # query: top-k for 3 sample queries (stream1.py:26 NUM_QUERY_SAMPLES)
        corpus = store.read()
        queries = corpus.limit(3).select(
            F.col("frame_number").alias("query_id"), F.col("vector").alias("query_vec")
        )
        _, t, c, m = _measure(
            lambda: topk_similarity_join(
                corpus, queries, k=k, corpus_id="frame_number", corpus_vec="vector"
            ).count()
        )
        record("query", size, t, c, m)

    return spark.createDataFrame(
        metrics,
        ["model_name", "operation_type", "operation_size", "execution_time", "cpu_usage", "memory_usage"],
    )


def run_model_grid(
    spark: SparkSession,
    root: str,
    models: list[tuple[str, int]] | None = None,
    sizes: list[int] | None = None,
    initial_rows: int = 10000,
    k: int = 5,
    store_mode: str = "cow",
) -> DataFrame:
    """The reference's OUTER per-model loop
    (``FAISS/PlainDemo/pipeline.py:290-307``): run the full CRUD grid
    once per embedding model — each model gets its own store under a
    sanitized directory name (F3, ``pipeline.py:310``) and its own
    vector dimension, exactly as the 7-model list spans 256-768 dims —
    then union the long-format metrics into the combined table
    (``pipeline.py:397-401``). Default model axis: the two hash
    embedders (32 vs 64 dims), the deterministic stand-ins for the
    sentence-transformer grid.

    After each model's CRUD grid, the model's final corpus gets the
    reference's per-model INDEX rebuild (``pipeline.py:310-321``:
    IndexIVFFlat with nlist = min(100, √n)) — here ``IVFIndex.build``
    (KMeans train + cluster-partitioned write) — and a top-k search
    through the pruned index, recorded as ``ivf_build`` / ``ivf_query``
    rows so the model axis covers the index path, not just the store
    path (r4, VERDICT r3 #7)."""
    import re

    from deployment_spark.operators.ivf import IVFIndex

    models = models or [("hash-embedder-32d", 32), ("hash-embedder-64d", 64)]
    combined: DataFrame | None = None
    for model_name, dim in models:
        safe = re.sub(r"[/\-.]", "_", model_name)  # F3 name sanitization
        m = run_reference_grid(
            spark,
            f"{root}/{safe}",
            model_name=model_name,
            sizes=sizes,
            initial_rows=initial_rows,
            dim=dim,
            k=k,
            store_mode=store_mode,
        )
        # per-model index rebuild over the grid's final corpus
        store = SnapshotStore(spark, f"{root}/{safe}", key="frame_number", mode=store_mode)
        corpus = store.read().select("frame_number", "vector")
        n = corpus.count()
        idx = IVFIndex(spark, f"{root}/{safe}_ivf")
        _, t, c, mm = _measure(
            lambda: idx.build(corpus, id_col="frame_number", vec_col="vector")
        )
        ivf_metrics = [(model_name, "ivf_build", n, t, c, mm)]
        queries = corpus.limit(3).select(
            F.col("frame_number").alias("query_id"), F.col("vector").alias("query_vec")
        )
        _, t, c, mm = _measure(
            lambda: idx.search(
                queries, k=k, id_col="frame_number", vec_col="vector"
            ).count()
        )
        ivf_metrics.append((model_name, "ivf_query", n, t, c, mm))
        m = m.unionByName(spark.createDataFrame(ivf_metrics, m.schema))
        combined = m if combined is None else combined.unionByName(m)
    return combined
