"""Lake-maintenance primitives: small-file compaction and
dynamic-partition-overwrite writes.

The two jobs every 100 TB parquet lake schedules nightly:

* **Compaction** — streaming/micro-batch ingest leaves thousands of
  KB-scale files per partition; scans then pay one task + one footer
  read per file. Compaction rewrites a directory to ~target-sized
  files (bin-packed by actual byte size, not file count) and swaps
  atomically, so readers never observe a half-written directory.
* **Dynamic partition overwrite** — backfills rewrite ONLY the
  partitions present in the incoming batch
  (``partitionOverwriteMode=dynamic``), leaving sibling partitions
  untouched — the idempotent daily-backfill write discipline.

No reference counterpart (the reference serves from one JSON export);
this is north-star lake operations.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory tree."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Rewrite a parquet directory into ~target-sized files.

    Sizing uses the directory's ACTUAL byte footprint (not row or
    file counts — ingest files vary wildly in size), and the rewrite
    lands in a sibling temp dir swapped in by two renames: a reader
    never observes a PARTIAL directory, but there is a sub-millisecond
    not-found window between the renames (POSIX has no atomic
    directory exchange) — production deployments route readers
    through a manifest/symlink pointer or a table format to close it.
    Returns (files_before, files_after).

    At cluster scale the same routine runs per-partition-directory
    (compact the partitions a freshness watermark says are cold) —
    the swap unit stays one directory, so the atomicity story is
    unchanged.
    """
    files_before, total = dir_stats(path)
    if files_before == 0:
        return 0, 0
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    # repartition (round-robin), not coalesce: coalesce(n) merges
    # whole input partitions and can leave the skew it was meant to
    # remove
    try:
        df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)  # never leak the temp dir
        raise
    swap_dir(path, tmp)
    files_after, _ = dir_stats(path)
    return files_before, files_after


def swap_dir(path: str, new_dir: str) -> None:
    """Replace directory ``path`` with ``new_dir`` by two renames with
    rollback — the staged-rebuild swap every artifact in the lake uses
    (compaction above, tokenizer-store rebuilds, ANN index rebuilds).
    A reader never observes a PARTIAL directory; the sub-millisecond
    not-found window between the renames is the same one
    compact_parquet_dir documents (POSIX has no atomic directory
    exchange — production routes readers through a manifest pointer
    or a table format to close it)."""
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    try:
        os.rename(new_dir, path)
    except OSError:
        os.rename(old, path)  # roll back the swap
        raise
    shutil.rmtree(old)


def write_dynamic_partitions(
    df: DataFrame, path: str, partition_col: str
) -> None:
    """Overwrite ONLY the partitions present in ``df`` (dynamic mode),
    leaving sibling partitions in place — set per-write, not globally,
    so other writers keep static-overwrite semantics."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
