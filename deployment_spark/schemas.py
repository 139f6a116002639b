"""Declared schemas and table loading.

The reference's only base table is an 8-column tshark-style packet export
read all-string (``dtype=str`` at ``FAISS/PlainDemo/pipeline.py:275``,
column names at ``pipeline.py:270-277``). Spark column names cannot
contain ``.`` (column-path syntax), so names are sanitized ``.`` → ``_``
exactly as documented in SURVEY §1.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# FAISS/PlainDemo/pipeline.py:270-277 (tshark export naming, dots sanitized)
PACKET_COLUMNS = [
    "frame_number",
    "frame_time",
    "ip_src",
    "ip_dst",
    "tcp_srcport",
    "tcp_dstport",
    "_ws_col_protocol",
    "frame_len",
]

# Ingested all-string, matching dtype=str (FAISS/PlainDemo/pipeline.py:275).
PACKET_SCHEMA = StructType([StructField(c, StringType(), True) for c in PACKET_COLUMNS])

# Long-format benchmark metrics — FAISS/PlainDemo/README.md:96-99,
# pipeline.py:135-175.
METRICS_SCHEMA = StructType(
    [
        StructField("model_name", StringType(), False),
        StructField("operation_type", StringType(), False),
        StructField("operation_size", StringType(), False),
        StructField("execution_time", StringType(), False),
        StructField("cpu_usage", StringType(), False),
        StructField("memory_usage", StringType(), False),
    ]
)

# Driver-provided TPC-H-ish testdata tables (TESTDATA.md).
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_packet_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 — CSV scan with forced-string 8-column schema.

    Mirrors ``pd.read_csv(path, header=0, names=[...], dtype=str,
    skiprows=1)`` (``FAISS/PlainDemo/pipeline.py:268-277``): declared names
    override whatever header the file has.
    """
    return spark.read.schema(PACKET_SCHEMA).option("header", "true").csv(path)


def probe_csv_schema(spark: SparkSession, path: str):
    """S4 — header-only schema probe (``Milvus/stream1.py:245``)."""
    return spark.read.option("header", "true").csv(path).schema


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an on-disk event-time column to session-tz TIMESTAMP,
    whatever physical form the writer used:

    - ``bigint`` — TIMESTAMP(NANOS) parquet read under
      ``spark.sql.legacy.parquet.nanosAsLong``: integer-divide to µs
      (ns-since-epoch ~1.7e18 overflows double precision, so no float
      math) and rebuild the timestamp;
    - ``timestamp_ntz`` — timestamp[us] without tz info: reinterpret the
      wall-clock in the session zone (UTC per session.py), which is also
      how DuckDB reads the same file, keeping oracle parity;
    - ``timestamp`` — already usable.

    Watermarks/windows require TIMESTAMP (not NTZ), so every event-time
    consumer — batch or streaming — goes through this one function.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fmt: str | None = None
) -> DataFrame:
    """Shared table loader for every catalog entry. ``fmt`` (or the
    ``SPARK_GRAFT_TABLE_FORMAT`` env var) selects the physical source
    format — ``parquet`` (default) or ``orc`` (``{sf_dir}/{name}.orc``)
    — so the oracle replica can prove the hash-matched answers are
    independent of the scan format (``tools/check_oracle.py --format
    orc``); everything downstream of the scan is format-agnostic."""
    import os as _os

    fmt = fmt or _os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")
    if fmt == "orc":
        df = spark.read.orc(f"{sf_dir}/{name}.orc")
    else:
        # TIMESTAMP(NANOS) files are only readable with the legacy conf
        # on; scope it to the schema-resolving read and restore the
        # caller's value (entries must not mutate session state —
        # VERDICT r3 #3).
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
    if name == "events":
        df = normalize_event_time(df, "ts")
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def sample_packet_rows(spark: SparkSession, n: int = 10) -> DataFrame:
    """S6/S7 — literal in-memory packet source.

    The synthetic generator pattern from ``FAISS/PlainDemo/pipeline.py:329``
    (``f"192.168.1.{i} 192.168.1.{i+1} TCP {i*10}"``) expressed as a
    distributed ``spark.range`` — no driver-side list materialization, so
    the same call works for n=10 and n=10^9.
    """
    return spark.range(n).select(
        F.col("id").cast("string").alias("frame_number"),
        F.format_string("%d.000000", F.col("id")).alias("frame_time"),
        F.format_string("192.168.1.%d", F.col("id") % 256).alias("ip_src"),
        F.format_string("192.168.1.%d", (F.col("id") + 1) % 256).alias("ip_dst"),
        F.format_string("%d", (F.col("id") % 64511) + 1024).alias("tcp_srcport"),
        F.lit("80").alias("tcp_dstport"),
        F.lit("TCP").alias("_ws_col_protocol"),
        F.format_string("%d", (F.col("id") * 10) % 1460 + 64).alias("frame_len"),
    )
