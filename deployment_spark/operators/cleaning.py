"""Cleaning / projection / predicate operators (SURVEY §2.2).

These are thin, named wrappers over Catalyst primitives — the point is
parity documentation (each maps to a cited reference behavior), not
abstraction. All stay in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def select_present(df: DataFrame, cols: list[str]) -> DataFrame:
    """P1/P11 — column-presence-tolerant projection
    (``Milvus/stream1.py:221``): silently skip requested columns the
    frame doesn't have. Spark ``select`` is strict, so filter the list."""
    present = [c for c in cols if c in df.columns]
    return df.select(*present)


def coerce_long(df: DataFrame, col: str) -> DataFrame:
    """P3/P9 — ``pd.to_numeric(errors='coerce')`` + int64 cast
    (``Milvus/stream1.py:213,220``). Spark 4 runs ANSI mode by default,
    where a plain ``cast('long')`` THROWS on unparsable input; ``try_cast``
    yields NULL instead — the null-on-failure semantics the reference's
    ``errors='coerce'`` has."""
    return df.withColumn(col, F.col(col).try_cast("long"))


def drop_null_key(df: DataFrame, key: str) -> DataFrame:
    """P2 — ``dropna(subset=[key])`` (``Milvus/stream1.py:212,214``)."""
    return df.na.drop(subset=[key])


def dedup_keep_first(df: DataFrame, key: str, order_col: str | Column | None = None) -> DataFrame:
    """P4 — ``drop_duplicates(subset=[key], keep='first')``
    (``Milvus/stream1.py:215``).

    pandas "first" means file order; distributed frames have no implicit
    order, so "first" is defined by ``order_col`` (ascending). Without an
    order column this falls back to ``dropDuplicates`` (any winner) —
    fine when rows are exact duplicates."""
    if order_col is None:
        return df.dropDuplicates([key])
    w = Window.partitionBy(key).orderBy(F.asc(order_col) if isinstance(order_col, str) else order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def clean_packet_frame(df: DataFrame, key: str = "frame_number") -> DataFrame:
    """The Milvus ingest cleaning chain (``Milvus/stream1.py:212-220``):
    dropna(key) → to_numeric coerce → dropna(key) → dedup keep-first →
    cast int64. Keep-first order = original key string order is not
    defined in pandas either; we dedup on the coerced key."""
    out = drop_null_key(df, key)
    # try_cast, not cast: ANSI mode (Spark 4 default) makes cast throw on
    # garbage keys — the exact dirty input this chain exists to clean.
    out = out.withColumn("_key_long", F.col(key).try_cast("long"))
    out = out.na.drop(subset=["_key_long"])
    out = dedup_keep_first(out, "_key_long")
    return out.drop(key).withColumnRenamed("_key_long", key)


def fill_empty(df: DataFrame, cols: list[str]) -> DataFrame:
    """P5 — ``fillna('')`` (``FAISS/PlainDemo/pipeline.py:281-287``)."""
    return df.na.fill("", subset=cols)


def point_filter(df: DataFrame, key: str, value) -> DataFrame:
    """P6 — equality point lookup (``Milvus/stream1.py:331,340``).
    Catalyst pushes the predicate into the scan (S5 full-rescan fallback
    becomes a pruned scan for free)."""
    return df.filter(F.col(key) == F.lit(value))


def in_list_filter(df: DataFrame, key: str, values: list) -> DataFrame:
    """P8 — ``expr = f"frame_number in {ids}"`` (``Milvus/stream1.py:313``).
    For large id sets use a broadcast semi-join instead (see
    ``crud.delete_ids`` anti-join)."""
    return df.filter(F.col(key).isin(values))


def range_filter(df: DataFrame, predicate: str) -> DataFrame:
    """P7 — expression-string predicate (``Milvus/stream1.py:299``)."""
    return df.filter(predicate)


def nonempty_lines(df: DataFrame, col: str) -> DataFrame:
    """P10 — strip + drop empty lines (``FAISS/UI-Demo/pipeline+ui.py:507``)."""
    return df.withColumn(col, F.trim(F.col(col))).filter(F.col(col) != "")


def categorical_sort_key(col: str, order: list[str]) -> Column:
    """T4 sort key — position of ``col`` in the fixed category list;
    values outside the list AND NULLs sort last (pandas maps both unseen
    categories and NaN to NaN, which sorts last). ``array_position``
    returns 0 for not-found and NULL for NULL input, so both are
    remapped past the end (a bare NULL key would otherwise sort FIRST
    under Spark's default NULLS FIRST)."""
    pos = F.array_position(F.array(*[F.lit(v) for v in order]), F.col(col))
    return F.when(pos.isNull() | (pos == 0), F.lit(len(order) + 1)).otherwise(pos)


def categorical_sort(
    df: DataFrame, col: str, order: list[str], extra_order: list[str] | None = None
) -> DataFrame:
    """T4 — categorical ordered sort (``Milvus/stream1.py:548-556``): the
    reference renders its per-stage metrics view sorted by the fixed
    pipeline order ``["Initial Load", "After Add", "After Delete",
    "After Update"]`` via an ordered ``pd.Categorical`` index. Here the
    category list becomes an ``array_position`` sort key — pure Catalyst,
    no join, stays in codegen. ``extra_order`` breaks ties within a
    category deterministically."""
    keys = [categorical_sort_key(col, order)]
    if extra_order:
        keys += [F.col(c) for c in extra_order]
    return df.orderBy(*keys)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_expr: Column,
    salt: str = "mix",
    resolution: int = 10000,
) -> DataFrame:
    """Deterministic per-stratum sampling — the TRAINING-MIX curation op
    (upsample scarce high-quality strata, downsample boilerplate) that a
    corpus pipeline runs after scoring. Each row's fate is a pure
    function of (key, salt): keep iff
    ``hash(key|salt) % resolution < fraction·resolution``, with the hash
    the portable md5-prefix parse also used by ``cms_build_portable`` —
    so the sample is reproducible across runs, retries, AND engines
    (DuckDB replays it bit-for-bit), unlike ``df.sampleBy`` whose
    per-partition RNG changes under repartitioning. Strata absent from
    ``fractions`` are dropped (explicit mix: what's not in the recipe is
    not in the corpus). Pure Catalyst row-local filter — no shuffle, no
    state; at 100 TB it rides the scan.
    """
    h = (
        F.conv(
            F.substring(F.md5(F.concat(key_expr, F.lit("|" + salt))), 1, 8), 16, 10
        ).cast("long")
        % resolution
    )
    threshold = F.lit(-1)
    for stratum, frac in fractions.items():
        threshold = F.when(
            F.col(strata_col) == F.lit(stratum),
            F.lit(int(round(frac * resolution))),
        ).otherwise(threshold)
    return df.filter(h < threshold)
