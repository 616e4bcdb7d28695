"""Streaming sinks: foreachBatch upsert into a parquet gold table.

The reference's serving layer re-scans the whole graph per request
(dwwApi.js:63-68); the streaming-native replacement maintains a
continuously-upserted gold table: each micro-batch merges into the
keyed state with last-write-wins by event time.

On a production lake this is a Delta/Iceberg ``MERGE INTO`` (ACID,
file-level conflict handling). Plain parquet has no transaction log,
so this module implements the lake-less fallback: merge into a
staging directory and atomically swap it in. Correctness properties
kept regardless of format:

* **order independence** — the merge keeps the max-(ts, tiebreak) row
  per key from the union of old state and the batch, so replayed or
  out-of-order micro-batches converge to the same table (idempotent
  upsert, an at-least-once-safe sink).
* **bounded work** — each merge touches |state| + |batch| rows, and
  state is one row per key. At scale, partition the gold path by a
  key prefix so a micro-batch only rewrites partitions it touches
  (or use a real table format — the swap here is the whole-table
  degenerate case of Iceberg's atomic snapshot commit).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, key_cols: list[str], ts_col: str, tiebreak: str
) -> DataFrame:
    """One row per key: max event time, deterministic tiebreak."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak).desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert_batch(
    batch_df: DataFrame,
    gold_path: str,
    key_cols: list[str],
    ts_col: str,
    tiebreak: str,
) -> None:
    """Merge one (micro-)batch into the parquet gold table:
    last-write-wins per key over the union of existing state and the
    batch, then atomic directory swap."""
    spark = batch_df.sparkSession
    fresh = latest_per_key(batch_df, key_cols, ts_col, tiebreak)
    if os.path.isdir(gold_path):
        existing = spark.read.parquet(gold_path).select(*fresh.columns)
        merged = latest_per_key(
            existing.unionByName(fresh), key_cols, ts_col, tiebreak
        )
    else:
        merged = fresh
    staging = gold_path + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    shutil.rmtree(gold_path, ignore_errors=True)
    os.replace(staging, gold_path)


def stream_upsert_to_gold(
    sdf: DataFrame,
    gold_path: str,
    key_cols: list[str],
    ts_col: str,
    tiebreak: str,
    checkpoint: str,
):
    """Attach the upsert sink to a streaming DataFrame via
    foreachBatch; returns the started query (availableNow trigger —
    drain what exists, then stop; swap for a processingTime trigger in
    always-on mode)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch(batch_df, gold_path, key_cols, ts_col, tiebreak)

    return (
        sdf.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
