"""Skew-safe two-phase top-N (operators/skew.py) and JSONL round-trip
(sources/io.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.skew import salted_topn_per_key, topn_per_key
from deployment_spark.sources.io import read_jsonl, write_jsonl


def rows_of(df):
    return sorted(
        tuple(r) for r in df.select("k", "rank", "v", "tid").collect()
    )


@pytest.fixture()
def skewed(spark):
    # one viral key (0) with 5k rows, 9 normal keys with 50 each;
    # duplicate order values force the tie-break to matter
    big = spark.range(5000).select(
        F.lit(0).alias("k"), (F.col("id") % 97).cast("double").alias("v"),
        F.col("id").alias("tid"),
    )
    small = spark.range(450).select(
        (F.col("id") % 9 + 1).alias("k"), (F.col("id") % 13).cast("double").alias("v"),
        (F.col("id") + 10000).alias("tid"),
    )
    return big.unionByName(small)


def test_salted_equals_plain_window(skewed):
    plain = topn_per_key(skewed, ["k"], "v", 7, tie_cols=["tid"])
    salted = salted_topn_per_key(skewed, ["k"], "v", 7, salt=8, tie_cols=["tid"])
    assert rows_of(plain) == rows_of(salted)


def test_salted_ascending_and_small_n(skewed):
    plain = topn_per_key(skewed, ["k"], "v", 1, ascending=True, tie_cols=["tid"])
    salted = salted_topn_per_key(
        skewed, ["k"], "v", 1, salt=4, ascending=True, tie_cols=["tid"]
    )
    assert rows_of(plain) == rows_of(salted)


def test_salted_phase1_partitions_by_salt(spark, skewed):
    """The first window must partition on (key, salt) — that IS the skew
    fix; assert the plan exchanges on both."""
    from deployment_spark.plans import audit

    df = salted_topn_per_key(skewed, ["k"], "v", 3, salt=8, tie_cols=["tid"])
    plan = audit.physical_plan(df)
    assert "_salt" in plan
    assert audit.count_exchanges(df) >= 2  # (key,salt) then key


def test_jsonl_roundtrip(spark, documents, tmp_path):
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(documents.select("doc_id", "text"), path)
    back = read_jsonl(spark, path, schema="doc_id LONG, text STRING")
    assert back.count() == documents.count()
    a = {(r.doc_id, r.text) for r in back.collect()}
    b = {(r.doc_id, r.text) for r in documents.select("doc_id", "text").collect()}
    assert a == b


def test_jsonl_malformed_lines_survive(spark, tmp_path):
    p = tmp_path / "dirty"
    p.mkdir()
    (p / "part.jsonl").write_text(
        '{"doc_id": 1, "text": "ok"}\nTHIS IS NOT JSON\n{"doc_id": 2, "text": "fine"}\n'
    )
    df = read_jsonl(
        spark, str(p), schema="doc_id LONG, text STRING, _corrupt_record STRING"
    )
    rows = df.collect()
    assert len(rows) == 3  # dirty line is a row, not a job failure
    good = {r.doc_id for r in rows if r._corrupt_record is None}
    bad = [r for r in rows if r._corrupt_record is not None]
    assert good == {1, 2} and len(bad) == 1


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """Co-located join: orders and customer bucketed on custkey with the
    same bucket count must SortMergeJoin with ZERO exchanges — the
    layout that makes a 100 TB fact-fact join feasible."""
    from deployment_spark.plans import audit
    from deployment_spark.schemas import load_table
    from deployment_spark.sources.io import write_bucketed

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "b_orders", ["custkey"], 8, path=str(tmp_path / "b_orders"),
        sort_cols=["custkey"],
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"),
        "b_customer", ["custkey"], 8, path=str(tmp_path / "b_customer"),
        sort_cols=["custkey"],
    )
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_customer"), "custkey")
        plan = audit.physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert audit.count_exchanges(joined) == 0, plan
        # and it actually computes the right thing
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_topn_empty_and_tiny(spark):
    empty = spark.createDataFrame([], "k LONG, v DOUBLE, tid LONG")
    assert salted_topn_per_key(empty, ["k"], "v", 3, tie_cols=["tid"]).count() == 0
    one = spark.createDataFrame([(1, 2.0, 7)], ["k", "v", "tid"])
    rows = salted_topn_per_key(one, ["k"], "v", 3, tie_cols=["tid"]).collect()
    assert len(rows) == 1 and rows[0].rank == 1
