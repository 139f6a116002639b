"""Plan-quality gates (SURVEY §4): pushdown, pruning, broadcast, codegen.
A query that silently regresses to full scans or shuffle joins fails
here even while staying correct."""

from __future__ import annotations

from pyspark.sql import functions as F

from deployment_spark.plans import audit
from deployment_spark.queries import (
    q_point_lookup,
    q_pricing_summary,
    q_revenue_by_nation,
)
from deployment_spark.schemas import load_table


def test_point_lookup_pushes_filter(spark, sf_dir):
    df = q_point_lookup(spark, sf_dir)
    pushed = audit.pushed_filters(df)
    assert any("o_orderkey" in p for p in pushed), pushed


def test_pricing_summary_prunes_columns_and_pushes_date(spark, sf_dir):
    df = q_pricing_summary(spark, sf_dir)
    scans = audit.scan_columns(df)
    assert scans, "expected a file scan"
    # 7 referenced columns out of 11 in lineitem — pruning must hold
    assert all(len(cols) <= 7 for cols in scans), scans
    assert any("l_shipdate" in p for p in audit.pushed_filters(df))


def test_revenue_join_is_broadcast_not_shuffle(spark, sf_dir):
    df = q_revenue_by_nation(spark, sf_dir)
    assert audit.has_broadcast_join(df)
    assert not audit.has_shuffle_join(df)


def test_projection_only_reads_needed_columns(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey").filter(F.col("l_orderkey") % 10 == 0)
    scans = audit.scan_columns(df)
    assert scans == [["l_orderkey"]]


def test_codegen_present_in_agg_pipeline(spark, sf_dir):
    df = q_pricing_summary(spark, sf_dir)
    assert audit.codegen_stage_count(df) >= 1
