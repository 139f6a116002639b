"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)     — flagship query smoke check at sf0.001.
queries()        — one callable per implemented operator (SURVEY §2).
oracle_sql()     — DuckDB-equivalent SQL per query (correctness gate).

Implementations live in deployment_spark.queries.REGISTRY.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from deployment_spark.queries import REGISTRY, q_topk_cosine


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact top-k cosine similarity join (SURVEY §2.5 J1) —
    the reference's core query — on /root/testdata/sf0.001."""
    return q_topk_cosine(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
