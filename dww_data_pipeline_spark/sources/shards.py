"""Deterministic training-shard serialization.

The last step of a curation pipeline: write the corpus as N shards
whose membership and internal order are pure functions of content
keys — no RNG state, no partition-count dependence — so a re-run,
a backfill, or a different cluster produces byte-identical shards
and a training job can seek/restart reproducibly.

Scale shape: shard assignment is one hash expression (no shuffle);
the write shuffles each row once to its shard writer
(``repartition(n_shards, shard)``), rows sort within partitions on
the order key, and ``partitionBy`` lays out one directory per shard.
A 100 TB corpus lands as ``shard=K/part-*.parquet`` with file sizes
bounded by ``maxRecordsPerFile`` — shard directories are the unit of
assignment, files inside them the unit of parallel IO, which is how
training loaders consume them (dir list -> file list -> row order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_key(key: Column, n_shards: int) -> Column:
    """Deterministic shard id in [0, n_shards): top 32 bits of
    md5(key) mod n_shards — engine-portable (md5 hex is identical
    everywhere; conv() parses it the same way DuckDB's '0x' cast
    does), uniform, and independent of partitioning."""
    return F.pmod(
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
        F.lit(n_shards),
    )


def shard_order_key(key: Column) -> Column:
    """Within-shard order key: the SECOND 32-bit chunk of the same
    md5, so order inside a shard is a deterministic permutation
    uncorrelated with the shard assignment bits (a global
    hash-shuffle of the corpus, as training ingestion expects)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 9, 8), 16, 10).cast("long")


def with_shards(df: DataFrame, key_col: str, n_shards: int = 16) -> DataFrame:
    """Attach ``shard`` and ``shard_pos`` columns."""
    k = F.col(key_col)
    return df.withColumn("shard", shard_key(k, n_shards)).withColumn(
        "shard_pos", shard_order_key(k)
    )


def write_sharded(
    out: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    max_records_per_file: int,
    partition_cols: tuple[str, ...] = ("shard",),
    mode: str = "overwrite",
) -> None:
    """The ONE write pipeline both the batch backfill and the
    streaming ingest use (repartition to shard writers → sorted runs
    on (shard, shard_pos, key) → bounded files → partitioned layout).
    ``out`` must already carry shard/shard_pos (``with_shards``);
    sharing this keeps the stream-built lake row-identical to the
    batch-built one by construction, not by parallel maintenance of
    two copies of the sort/partition logic."""
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_pos", key_col)
        .write.option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .mode(mode)
        .parquet(path)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    n_shards: int = 16,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Serialize ``df`` as ``path/shard=K/part-*.parquet``.

    One shuffle (rows to their shard writer), sorted runs within each
    writer task (``shard_pos`` asc, key asc as tie-break), bounded
    file sizes. Readers reconstruct the deterministic global order as
    (shard, shard_pos, key) — asserted round-trip in
    tests/test_shards.py.
    """
    out = with_shards(df, key_col, n_shards)
    write_sharded(out, path, key_col, n_shards, max_records_per_file)
