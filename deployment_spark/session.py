"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32); the config
choices below are the ones that matter on a real multi-executor cluster:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting) —
  replaces the reference's hand-tuned batch sizes
  (``Milvus/stream1.py:19-22``).
- Arrow execution for the few pandas-UDF stages (embedding, top-k
  pre-reduction) so Python transfer is columnar-batched, mirroring the
  reference's batched ``model.encode(batch_size=32)``
  (``Milvus/stream1.py:93``) but at Arrow speed.
- Session timezone pinned to UTC so timestamp semantics are stable across
  the DuckDB oracle, Spark, and pandas.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "deployment-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cpus`` controls local parallelism only; on a real cluster the master
    URL comes from spark-submit and this arg is ignored by Spark.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # CPU-heavy stages (hashing, shingling, vector math) produce few
        # shuffle BYTES; the 1 MB default floor lets AQE coalesce them to
        # 1-2 partitions and serialize 32 cores' work. 64 KB keeps
        # parallelism; at real scale partitions are byte-bound anyway.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark 4 rejects
        # it unless read as long (converted back in schemas.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
