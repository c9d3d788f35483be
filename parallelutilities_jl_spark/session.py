"""SparkSession builder tuned for this engine.

Local-mode defaults mirror what we would set on a real cluster:

* AQE on (runtime partition coalescing, skew-join splitting) — the Spark
  analog of the reference's pool trimming (`maybetrimmedworkerpool`,
  reference src/clusterquery.jl:114-117) and balanced block partitioning.
* shuffle.partitions sized to cores, not the 200 default.
* Arrow enabled for every Pandas-UDF exchange.
* Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "parallelutilities_jl_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    On a real cluster the caller passes a pre-built session; everything in
    this package only assumes a `SparkSession`, never local mode.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Parquet scans: pushdown + pruning are on by default; keep split
        # sizes explicit so partition counts are predictable at any SF.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
