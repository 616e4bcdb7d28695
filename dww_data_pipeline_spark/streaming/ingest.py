"""Continuous corpus ingestion into the deterministic shard lake.

Streaming twin of ``sources.shards.write_training_shards``: documents
arrive as a stream, each micro-batch lands in the same
content-addressed layout (``shard = md5-top-32-bits mod N``,
intra-shard order = the next 32 bits), so the lake a stream builds is
row-identical to the one a batch backfill builds — the t21 manifest
(per-shard counts + order-key sums) is the cross-check, asserted in
tests/test_stream_ingest.py.

Exactly-once on plain parquet (no transaction log): every batch
writes under its own partition (``shard=K/batch=B/part-*``) and then
records a commit marker. A replayed batch (at-least-once foreachBatch
after a crash) first deletes any uncommitted ``batch=B`` partials,
then rewrites — so the lake converges to exactly one copy of every
batch regardless of where a crash landed. Scale shape per batch: one
shuffle (row → shard writer), sorted runs, bounded files; commit
markers are O(#batches) empty files, not data.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dww_data_pipeline_spark.sources.shards import with_shards


def _marker(lake_path: str, batch_id: int) -> str:
    return os.path.join(lake_path, "_commits", str(batch_id))


def shard_ingest_batch(
    batch_df: DataFrame,
    lake_path: str,
    batch_id: int,
    key_col: str = "doc_id",
    n_shards: int = 16,
    max_records_per_file: int = 1_000_000,
) -> bool:
    """Ingest one micro-batch; returns False if it was already
    committed (idempotent replay no-op)."""
    if "://" in lake_path or lake_path.startswith("file:"):
        raise ValueError(
            "shard_ingest_batch commits via local fs markers; on an "
            "object store use a transactional table format instead: "
            + lake_path
        )
    if os.path.exists(_marker(lake_path, batch_id)):
        return False
    # crash replay: drop uncommitted partials of THIS batch before
    # rewriting (partition dirs are per-batch, so this is surgical)
    for d in glob.glob(os.path.join(lake_path, "shard=*", f"batch={batch_id}")):
        shutil.rmtree(d, ignore_errors=True)
    out = with_shards(batch_df, key_col, n_shards).withColumn(
        "batch", F.lit(batch_id)
    )
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_pos", key_col)
        .write.option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard", "batch")
        .mode("append")
        .parquet(lake_path)
    )
    os.makedirs(os.path.dirname(_marker(lake_path, batch_id)), exist_ok=True)
    with open(_marker(lake_path, batch_id), "w") as f:
        f.write("committed")
    return True


def stream_shard_ingest(
    sdf: DataFrame,
    lake_path: str,
    checkpoint: str,
    key_col: str = "doc_id",
    n_shards: int = 16,
):
    """Attach the shard-ingest sink via foreachBatch; returns the
    started query (availableNow — drain then stop; swap the trigger
    for always-on mode)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        shard_ingest_batch(batch_df, lake_path, batch_id, key_col, n_shards)

    return (
        sdf.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_shard_lake(spark, lake_path: str) -> DataFrame:
    """Read the lake back; rows carry (shard, batch) partition
    columns, and (shard, shard_pos, key) is the deterministic global
    order regardless of how many batches built it."""
    return spark.read.parquet(lake_path)
