from __future__ import annotations

from deployment_spark.benchmark import run_model_grid, run_reference_grid


def test_reference_grid_schema_and_rows(spark, tmp_path):
    metrics = run_reference_grid(
        spark,
        str(tmp_path / "bench_store"),
        sizes=[50, 100],  # reduced grid for tests; real grid in BENCH runs
        initial_rows=200,
        dim=16,
    )
    rows = metrics.collect()
    # reference long-format schema, FAISS/PlainDemo/README.md:96-99
    assert metrics.columns == [
        "model_name",
        "operation_type",
        "operation_size",
        "execution_time",
        "cpu_usage",
        "memory_usage",
    ]
    assert len(rows) == 2 * 4  # sizes × {insertion, deletion, update, query}
    ops = {r.operation_type for r in rows}
    assert ops == {"insertion", "deletion", "update", "query"}
    assert all(r.execution_time > 0 for r in rows)


def test_model_grid_runs_per_model(spark, tmp_path):
    """The reference's outer 7-model loop (pipeline.py:290-307), proven
    end-to-end on a 2-model hash-embedder axis: every model runs the full
    CRUD grid at its own vector dimension into its own store, and the
    combined metrics table carries the model dimension in the reference's
    long format (pipeline.py:397-401)."""
    metrics = run_model_grid(
        spark,
        str(tmp_path / "model_grid"),
        models=[("hash-embedder-16d", 16), ("hash-embedder-32d", 32)],
        sizes=[50, 100],
        initial_rows=200,
    )
    rows = metrics.collect()
    assert metrics.columns[0] == "model_name"
    by_model = {}
    for r in rows:
        by_model.setdefault(r.model_name, set()).add(r.operation_type)
    assert set(by_model) == {"hash-embedder-16d", "hash-embedder-32d"}
    # each model ran the whole op grid PLUS its per-model index rebuild
    # (pipeline.py:310-321 — IVF build + pruned search per model)
    assert all(
        ops == {"insertion", "deletion", "update", "query", "ivf_build", "ivf_query"}
        for ops in by_model.values()
    )
    assert len(rows) == 2 * (2 * 4 + 2)  # models x (sizes x ops + ivf rows)
    # per-model stores really are separate (sanitized dirs)
    assert (tmp_path / "model_grid" / "hash_embedder_16d").exists()
    assert (tmp_path / "model_grid" / "hash_embedder_32d").exists()
    assert (tmp_path / "model_grid" / "hash_embedder_16d_ivf").exists()
    assert (tmp_path / "model_grid" / "hash_embedder_32d_ivf").exists()


def test_bench_headline_maps_onto_registry():
    """Every bench row names a driver-registry entry (VERDICT r4 #4):
    the bench set and the 50-entry catalog must not drift again."""
    import bench
    from deployment_spark.queries import REGISTRY

    assert set(bench.HEADLINE) <= set(REGISTRY)
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
