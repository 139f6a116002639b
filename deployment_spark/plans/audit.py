"""Physical-plan auditing (SURVEY §4; the "explain and iterate" loop).

Helpers to assert scale-critical plan properties instead of eyeballing
``explain()`` output:

- filters reached the parquet scan (``PushedFilters``);
- scans read only referenced columns (``ReadSchema`` width);
- small dimensions joined via broadcast, not shuffle;
- partition pruning engaged (``PartitionFilters``);
- expressions run inside whole-stage codegen.

Used by tests/test_plans.py to keep plan regressions out of the repo —
a correct query that re-introduces a full-scan or a shuffle join fails
CI, not review.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Output column lists, one per file scan — column-pruning check.

    Parsed from the ``FileScan format [cols]`` header rather than
    ``ReadSchema`` because plan stringification truncates metadata at
    ``spark.sql.maxMetadataStringLength`` (default 100 chars), leaving
    ``ReadSchema`` without a closing ``>`` on wide scans.
    """
    plan = physical_plan(df)
    scans = []
    for m in re.finditer(r"FileScan \w+ \[([^\]]*)\]", plan):
        cols = [re.sub(r"#\d+[A-Z]*$", "", c.strip()) for c in m.group(1).split(",") if c.strip()]
        scans.append(cols)
    return scans


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def has_shuffle_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df) or "ShuffledHashJoin" in physical_plan(df)


def has_partition_filters(df: DataFrame) -> bool:
    """True when ANY scan in the plan carries a non-empty partition
    filter (a plan can mix pruned and unpartitioned scans — the first
    occurrence alone is not representative)."""
    return any(
        m.group(1).strip()
        for m in re.finditer(r"PartitionFilters:\s*\[([^\]]*)\]", physical_plan(df))
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — the scale cost driver."""
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(df).count(
        "Exchange rangepartitioning"
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen stages in the FINAL plan.

    Executes the plan: under AQE the physical plan is finalized (and
    codegen'd) stage-by-stage at runtime, so the pre-execution string
    carries no ``*(N)`` markers. Intended for test-scale data only.
    """
    df.foreach(lambda _: None)
    return len(set(re.findall(r"\*\((\d+)\)", physical_plan(df))))


def audit(df: DataFrame) -> dict:
    """One-call plan summary for notebooks/logs."""
    return {
        "pushed_filters": pushed_filters(df),
        "scan_columns": scan_columns(df),
        "broadcast_join": has_broadcast_join(df),
        "shuffle_join": has_shuffle_join(df),
        "partition_filters": has_partition_filters(df),
        "exchanges": count_exchanges(df),
        "codegen_stages": codegen_stage_count(df),
    }
