"""Profiling operator (operators/profiling.py): sketch form vs exact
form, plus the ORC source/sink roundtrip (sources/io.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deployment_spark.operators.profiling import PROFILE_FIELDS, profile_numeric


def _by_col(rows):
    return {r.column: r.asDict() for r in rows}


def test_profile_sketch_tracks_exact_within_error(spark, sf_dir):
    """The scale-path profile (HLL++ distinct, GK median) must agree
    with the exact profile within its configured error bounds — the
    same self-gating discipline as the recall floors."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    exact = _by_col(profile_numeric(li, cols, exact=True).collect())
    sketch = _by_col(profile_numeric(li, cols, exact=False).collect())
    assert set(exact) == set(sketch) == set(cols)
    for c in cols:
        e, s = exact[c], sketch[c]
        # counts / min / max / mean / stddev are identical either way
        for f in ("rows", "nulls", "min_v", "max_v", "mean_v", "stddev_v"):
            assert s[f] == e[f], (c, f)
        # HLL++ rsd=0.05: allow 3 sigma
        assert abs(s["n_distinct"] - e["n_distinct"]) <= max(
            3 * 0.05 * e["n_distinct"], 2
        ), (c, s["n_distinct"], e["n_distinct"])
        # GK median: within the value span's 2% (rank error 1/10000 on
        # test-sized data collapses to near-exact; span bound is lenient)
        span = e["max_v"] - e["min_v"]
        assert abs(s["median_v"] - e["median_v"]) <= max(0.02 * span, 1e-9), c


def test_profile_schema_and_null_accounting(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (2.0,)], "x DOUBLE"
    )
    out = profile_numeric(df, ["x"], exact=True).collect()
    assert [f.name for f in profile_numeric(df, ["x"]).schema.fields] == [
        "column", *PROFILE_FIELDS
    ]
    r = out[0]
    assert (r.rows, r.nulls, r.n_distinct) == (4, 1, 2)
    assert (r.min_v, r.max_v) == (1.0, 2.0)


def test_profile_mixed_integer_and_double_columns(spark):
    """stack() requires identical types per position across columns;
    min/max must cast to double or a long+double column mix raises
    STACK_COLUMN_DIFF_TYPES (found by review, confirmed by repro)."""
    df = spark.createDataFrame([(1, 1.5), (2, 2.5), (3, 2.5)], "k LONG, x DOUBLE")
    for exact in (True, False):
        out = _by_col(profile_numeric(df, ["k", "x"], exact=exact).collect())
        assert out["k"]["min_v"] == 1.0 and out["k"]["max_v"] == 3.0
        assert out["x"]["n_distinct"] == 2


def test_orc_roundtrip_with_partitions(spark, tmp_path):
    from deployment_spark.sources.io import read_orc, write_orc

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).alias("part"),
        (F.col("id") * 1.5).alias("val"),
    )
    path = str(tmp_path / "orc_rt")
    write_orc(df, path, partition_by=["part"])
    back = read_orc(spark, path)
    assert back.count() == 100
    assert {r.part for r in back.select("part").distinct().collect()} == {0, 1, 2, 3}
    # partition pruning reaches the scan
    pruned = read_orc(spark, path).filter(F.col("part") == 2)
    assert pruned.count() == 25
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "part#" not in plan.split("PushedFilters")[0]
    # values survive bit-exact
    got = {r.id: r.val for r in back.collect()}
    assert got == {i: i * 1.5 for i in range(100)}
