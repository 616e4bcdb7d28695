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
    batch, then a rename-based swap with crash recovery.

    Swap protocol (local filesystem): write staging → rename gold to
    ``.old`` → rename staging to gold → delete ``.old``. Every crash
    window leaves either gold or ``.old`` intact, and the recovery
    step below restores ``.old`` if a crash lost gold — state is never
    silently discarded (the naive rmtree-then-rename has a window
    where gold is simply gone and a replayed batch would rebuild it
    from that batch alone).
    """
    if "://" in gold_path or gold_path.startswith("file:"):
        raise ValueError(
            "upsert_batch swaps via local renames; for object stores / "
            "remote filesystems use a transactional table format "
            "(Delta/Iceberg MERGE) instead: " + gold_path
        )
    spark = batch_df.sparkSession
    staging = gold_path + ".staging"
    backup = gold_path + ".old"
    # crash recovery: a previous run died between the two renames —
    # the backup IS the latest committed state
    if not os.path.isdir(gold_path) and os.path.isdir(backup):
        os.replace(backup, gold_path)
    shutil.rmtree(staging, ignore_errors=True)
    fresh = latest_per_key(batch_df, key_cols, ts_col, tiebreak)
    if os.path.isdir(gold_path):
        existing = spark.read.parquet(gold_path).select(*fresh.columns)
        merged = latest_per_key(
            existing.unionByName(fresh), key_cols, ts_col, tiebreak
        )
    else:
        merged = fresh
    merged.write.mode("overwrite").parquet(staging)
    shutil.rmtree(backup, ignore_errors=True)
    if os.path.isdir(gold_path):
        os.replace(gold_path, backup)
    os.replace(staging, gold_path)
    shutil.rmtree(backup, ignore_errors=True)


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
