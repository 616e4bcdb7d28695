"""SparkSession factory.

Local testing runs one JVM with N threads; the config below is chosen
so the same code is correct and fast on a real multi-executor cluster:

* AQE on (runtime coalesce + skew-join splitting) — the reference's
  data is intrinsically skewed (one dominant company key), and TPC-H
  style facts skew on popular keys too.
* shuffle.partitions sized to cores locally; on a 1000-executor
  cluster this should be raised (or left to AQE's coalesce from a
  high initial value).
* Arrow enabled for the few Pandas-UDF paths.
* UTC session timezone so date/timestamp semantics are stable across
  environments (the reference's stringly dates are timezone-free).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEF_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "dww_data_pipeline_spark", cpus: str | None = None) -> SparkSession:
    """Create (or fetch) the tuned SparkSession."""
    n = cpus or _DEF_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # the driver's events table stores TIMESTAMP(NANOS), which the
        # vectorized parquet reader rejects; read as long and convert
        # in sources.catalog
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
