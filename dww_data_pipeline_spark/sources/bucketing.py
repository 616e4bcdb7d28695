"""Bucketed-table support for shuffle-free co-located joins
(SURVEY 100 TB posture: 'co-locate joins via bucketing').

At 100 TB the orders ⋈ lineitem class of fact-fact joins dominates
shuffle volume. Writing both facts bucketed by the join key (same
bucket count) lets Spark plan a sort-merge join with NO exchange on
either side — the join becomes partition-local. This module wraps the
write/read discipline; tests assert the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist a DataFrame as a bucketed (and optionally sorted)
    managed table. Sorting within buckets additionally removes the
    sort step of a sort-merge join."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Directory-partitioned parquet write (the gold-table layout at
    scale: facts partitioned by year/date so partition pruning turns
    time-range predicates into directory skips — SURVEY §7.3 'fact
    tables partitioned by year(release)')."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partition_pruned(
    spark: SparkSession, path: str
) -> DataFrame:
    """Read back a partitioned layout; filters on partition columns
    prune directories (shows as PartitionFilters in the scan)."""
    return spark.read.parquet(path)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — planned
    without exchanges when bucket specs line up.

    The merge hint pins a sort-merge join: broadcast would also avoid
    the shuffle but only while one side stays small; the bucketed SMJ
    is the plan that survives both sides growing to fact scale."""
    left = spark.table(left_table)
    right = spark.table(right_table).hint("merge")
    return left.join(right, on, how)


def write_gold(
    df: DataFrame,
    table: str,
    partition_cols: list[str],
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Gold-layer layout: directory-partitioned AND bucketed in one
    table — the combination a 100 TB fact wants. Partition columns
    (low-cardinality, time/enum) give partition pruning on range
    predicates; bucketing by the join key gives exchange-free joins
    against same-bucketed facts WITHIN the surviving partitions. A
    year's worth of a 100 TB fact is still TB-scale, so pruning alone
    never removes the join shuffle — only bucketing does; conversely
    bucketing alone scans every date for a one-month query. The two
    compose orthogonally (partition dirs × bucket files)."""
    writer = (
        df.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .bucketBy(num_buckets, bucket_col)
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)
