"""Cleaning / projection / predicate wrappers (P1-P11) — direct unit
tests. These wrappers are parity documentation for the reference's
pandas cleaning chain (Milvus/stream1.py:212-220); the catalog oracles
cover the same semantics inline, but the named wrappers themselves must
be exercised too (round-1 verdict: they were dead to the suite).

The dirty-key tests exist because Spark 4 defaults to ANSI mode, where a
plain cast('long') THROWS on garbage — the wrappers must use try_cast to
keep the reference's pd.to_numeric(errors='coerce') null-on-failure
semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.cleaning import (
    clean_packet_frame,
    coerce_long,
    dedup_keep_first,
    drop_null_key,
    fill_empty,
    in_list_filter,
    nonempty_lines,
    point_filter,
    range_filter,
    select_present,
)


@pytest.fixture()
def dirty(spark):
    # the exact dirty shape the Milvus ingest chain sees: string keys with
    # garbage, nulls, dups (stream1.py:212-220)
    rows = [
        ("1", "a"),
        ("2", "b"),
        ("2", "b-dup"),
        ("garbage", "c"),
        (None, "d"),
        ("0003", "e"),
        ("", "f"),
    ]
    return spark.createDataFrame(rows, ["frame_number", "payload"])


def test_coerce_long_nulls_on_garbage(dirty):
    """P3/P9 — unparsable keys become NULL, never a CAST_INVALID_INPUT
    crash (ANSI-mode regression guard)."""
    out = coerce_long(dirty, "frame_number")
    got = {r.payload: r.frame_number for r in out.collect()}
    assert got["a"] == 1 and got["b"] == 2 and got["e"] == 3
    assert got["c"] is None and got["d"] is None and got["f"] is None


def test_clean_packet_frame_survives_garbage_keys(dirty):
    """The full chain on dirty input: garbage/null/empty keys dropped,
    dups collapsed, key is long."""
    out = clean_packet_frame(dirty)
    assert dict(out.dtypes)["frame_number"] == "bigint"
    keys = sorted(r.frame_number for r in out.collect())
    assert keys == [1, 2, 3]


def test_select_present_skips_missing(dirty):
    out = select_present(dirty, ["frame_number", "no_such_col", "payload"])
    assert out.columns == ["frame_number", "payload"]


def test_drop_null_key(dirty):
    assert drop_null_key(dirty, "frame_number").count() == 6


def test_dedup_keep_first_by_order(spark):
    df = spark.createDataFrame(
        [(1, 10, "first"), (1, 20, "later"), (2, 5, "only")], ["k", "ord", "v"]
    )
    out = {r.k: r.v for r in dedup_keep_first(df, "k", "ord").collect()}
    assert out == {1: "first", 2: "only"}


def test_fill_empty(spark):
    df = spark.createDataFrame([(1, None), (2, "x")], ["id", "s"])
    got = {r.id: r.s for r in fill_empty(df, ["s"]).collect()}
    assert got == {1: "", 2: "x"}


def test_point_in_list_range_filters(spark):
    df = spark.createDataFrame([(i, i * 10) for i in range(10)], ["k", "v"])
    assert [r.k for r in point_filter(df, "k", 3).collect()] == [3]
    assert sorted(r.k for r in in_list_filter(df, "k", [1, 5, 99]).collect()) == [1, 5]
    assert sorted(r.k for r in range_filter(df, "k >= 7").collect()) == [7, 8, 9]


def test_nonempty_lines(spark):
    df = spark.createDataFrame([("  x  ",), ("   ",), ("",), ("y",)], ["line"])
    assert sorted(r.line for r in nonempty_lines(df, "line").collect()) == ["x", "y"]


def test_categorical_sort_fixed_order_unknown_last(spark):
    """T4 — the reference's stage ordering (Milvus/stream1.py:548-556):
    rows sort by position in the fixed category list; values outside the
    list go last (pandas unseen-categorical behavior)."""
    from deployment_spark.operators.cleaning import categorical_sort

    df = spark.createDataFrame(
        [("After Update", 4), ("Initial Load", 1), ("Mystery", 9),
         ("After Add", 2), ("After Delete", 3)],
        ["stage", "v"],
    )
    order = ["Initial Load", "After Add", "After Delete", "After Update"]
    got = [r.stage for r in categorical_sort(df, "stage", order).collect()]
    assert got == order + ["Mystery"]


def test_sanitize_name(spark):
    """F3 — model/collection name sanitization (/ - . -> _)."""
    from deployment_spark.functions.text import sanitize_name

    df = spark.createDataFrame([("sentence-transformers/all-MiniLM-L6.v2",)], ["m"])
    assert df.select(sanitize_name("m").alias("s")).first().s == (
        "sentence_transformers_all_MiniLM_L6_v2"
    )


def test_stratified_sample_mix_recipe(spark):
    """Training-mix curation: per-stratum keep rates land near the
    recipe, the kept set is bit-identical across invocations (pure
    function of key+salt — retry/engine stable), and strata outside the
    recipe are dropped entirely."""
    from pyspark.sql import functions as F

    from deployment_spark.operators.cleaning import stratified_sample

    df = spark.range(30000).select(
        F.col("id"),
        F.element_at(
            F.array(F.lit("hi"), F.lit("mid"), F.lit("junk")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("quality"),
    )
    fr = {"hi": 0.8, "mid": 0.2}
    out = stratified_sample(df, "quality", fr, F.col("id").cast("string"))
    rates = {
        r.quality: r.n / 10000
        for r in out.groupBy("quality").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(rates) == {"hi", "mid"}  # junk dropped
    assert abs(rates["hi"] - 0.8) < 0.02 and abs(rates["mid"] - 0.2) < 0.02
    again = stratified_sample(df, "quality", fr, F.col("id").cast("string"))
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0
