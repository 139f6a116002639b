"""Sinks and catalog helpers (SURVEY §2.1 S8-S9, §2.10 C7).

The reference's sinks: per-model metrics CSV (``df.to_csv``,
``FAISS/PlainDemo/pipeline.py:179,400``) and the bulk index load
(``index.add`` / ``collection.insert``). Spark-side: a CSV/parquet
writer pair plus SQL-catalog registration so the whole testdata star
schema is queryable via ``spark.sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from deployment_spark.schemas import TESTDATA_TABLES, load_table


def write_csv(df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite") -> None:
    """S8 — CSV sink. ``single_file=True`` mirrors the reference's one
    ``metrics.csv`` per model (fine for metrics-sized data; distributed
    many-file layout is the default for corpus-sized data)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", "true").csv(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """S9 — bulk load of a queryable artifact; with ``partition_by``
    this is the IVF inverted-list layout (cluster_id) or any hive-style
    pruned layout."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema=None,
    multiline: bool = False,
):
    """JSONL source — the interchange format LLM training-data pipelines
    actually ship (one JSON doc per line, optionally .gz/.zst compressed;
    Spark's text codecs handle compression transparently from the file
    extension). With ``schema`` the reader skips its inference pass —
    ALWAYS pass one at scale: schema inference is a full extra read of
    100 TB. Malformed lines land in ``_corrupt_record`` (PERMISSIVE mode)
    instead of killing the job — dirty lines are data, not errors, in a
    web-scale corpus."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("multiLine", multiline).option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """JSONL sink (one doc per line, many files — the distributed layout
    downstream trainers shard-read). ``compression``: 'gzip', 'bzip2',
    'xz', … per Spark's text codecs."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """ORC source — the other columnar lake format (built into Spark, no
    extra package). Same pushdown/pruning story as parquet: predicate
    pushdown and column pruning reach the ORC reader, partition dirs
    prune. Pass ``schema`` to skip footer-merging on wide layouts."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """ORC sink, mirroring :func:`write_parquet` (hive-style partition
    layout with ``partition_by``)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def register_testdata_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> list[str]:
    """Register the driver testdata tables as temp views so the full SQL
    surface (including grouping sets / cube / rollup — free in Spark SQL,
    SURVEY §2.4 note) is available via ``spark.sql``."""
    registered = []
    for name in names or TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        registered.append(name)
    return registered


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed-table sink — the co-located-join layout (SURVEY §4).

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle: each scan task reads matching bucket files, so the
    exchange that dominates a 100 TB fact-fact join disappears from the
    plan entirely (asserted in tests/test_skew.py). ``sort_cols`` also
    skips the sort inside SortMergeJoin. Bucketing metadata lives in the
    session catalog, so this writes a TABLE (optionally external via
    ``path``), not a bare directory."""
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def table_exists(spark: SparkSession, name: str) -> bool:
    """C7 — existence check (``utility.has_collection``,
    ``Milvus/stream1.py:105``) against the Spark catalog."""
    return spark.catalog.tableExists(name)
