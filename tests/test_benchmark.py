from __future__ import annotations

from deployment_spark.benchmark import run_reference_grid


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
