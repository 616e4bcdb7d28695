"""Continuous corpus ingestion: streaming dedup admission and the
deterministic shard lake.

A production corpus is not rebuilt per crawl — new document batches
arrive continuously, each must be deduped against the EXISTING corpus
before admission, and admitted documents must land in a reproducible
serialization layout. Two foreachBatch flows cover that:

* ``stream_incremental_dedup`` — streaming twin of d11: each
  micro-batch is decided by the same ``incremental_decisions`` core
  the batch query uses, against a corpus index (fingerprint counts,
  banded LSH signatures, shingle sets) built ONCE per run and cached,
  so micro-batches pay only for their own signatures.
* ``stream_shard_ingest`` — streaming twin of
  ``sources.shards.write_training_shards``: micro-batches land in the
  content-addressed shard layout (``shard = md5-top-32-bits mod N``,
  intra-shard order = the next 32 bits), so the lake a stream builds
  is row-identical to a batch backfill's — the t21 manifest is the
  cross-check, asserted in tests/test_stream_ingest.py.

Both are idempotent under foreachBatch's at-least-once replay:
dedup decisions overwrite their own ``batch=<id>`` subdirectory;
shard ingest writes under ``shard=K/batch=B`` partitions with commit
markers and deletes uncommitted partials before a rewrite, so the
lake converges to exactly one copy of every batch regardless of
where a crash landed (same discipline as streaming/sinks.upsert_batch).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dww_data_pipeline_spark.sources.shards import with_shards, write_sharded


# ------------------------------------------------ ingest dedup (d11 twin)

def stream_incremental_dedup(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """Attach the ingest-dedup flow to a streaming (doc_id, text)
    DataFrame. Returns the started query (availableNow trigger —
    drain pending files then stop; swap for processingTime in
    always-on mode).

    Idempotency: each micro-batch writes (overwrite) its own
    ``batch=<id>`` subdirectory, so foreachBatch replays after a crash
    converge instead of appending duplicates. Read results with
    ``spark.read.parquet(out_path + "/batch=*")``.

    The corpus index (fingerprint counts, banded signatures, shingle
    sets) is built ONCE here and cached, so micro-batches pay only for
    their own signatures + the batch-driven joins — not a per-batch
    re-derivation of the corpus side. Call ``.unpersist()`` on the
    returned query's ``corpus_index`` attribute values when done, or
    let the session end reclaim them.
    """
    from dww_data_pipeline_spark.plans.dedup_plans import (
        build_corpus_index,
        incremental_decisions,
    )

    index = {k: df.cache() for k, df in build_corpus_index(corpus_docs).items()}

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        decisions = incremental_decisions(
            batch_df.select("doc_id", "text"), index=index
        )
        decisions.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )

    query = (
        stream_docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.corpus_index = index  # expose for unpersist by the caller
    return query


# ------------------------------------------------ shard lake (t21 twin)

def _marker(lake_path: str, batch_id: int) -> str:
    return os.path.join(lake_path, "_commits", str(batch_id))


def _require_local_lake(spark, lake_path: str) -> None:
    """The commit protocol pairs DRIVER-local markers with the Spark
    write — both must land on the same (local) filesystem or the
    exactly-once discipline silently breaks. Reject explicit remote
    schemes AND a schemeless path when the session's default
    filesystem is not local (the parquet would go to HDFS/S3 while
    markers and partial-cleanup glob the driver's disk)."""
    if "://" in lake_path or lake_path.startswith("file:"):
        raise ValueError(
            "shard_ingest_batch commits via local fs markers; on an "
            "object store use a transactional table format instead: "
            + lake_path
        )
    default_fs = (
        spark.sparkContext._jsc.hadoopConfiguration().get("fs.defaultFS")
        or "file:///"
    )
    if not default_fs.startswith("file:"):
        raise ValueError(
            "shard_ingest_batch needs a local default filesystem "
            f"(fs.defaultFS={default_fs}); use a transactional table "
            "format for remote lakes"
        )


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
    _require_local_lake(batch_df.sparkSession, lake_path)
    if os.path.exists(_marker(lake_path, batch_id)):
        return False
    # crash replay: drop uncommitted partials of THIS batch before
    # rewriting (partition dirs are per-batch, so this is surgical)
    for d in glob.glob(os.path.join(lake_path, "shard=*", f"batch={batch_id}")):
        shutil.rmtree(d, ignore_errors=True)
    out = with_shards(batch_df, key_col, n_shards).withColumn(
        "batch", F.lit(batch_id)
    )
    write_sharded(
        out,
        lake_path,
        key_col,
        n_shards,
        max_records_per_file,
        partition_cols=("shard", "batch"),
        mode="append",
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
    max_records_per_file: int = 1_000_000,
):
    """Attach the shard-ingest sink via foreachBatch; returns the
    started query (availableNow — drain then stop; swap the trigger
    for always-on mode)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        shard_ingest_batch(
            batch_df, lake_path, batch_id, key_col, n_shards,
            max_records_per_file,
        )

    return (
        sdf.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_shard_lake(spark, lake_path: str) -> DataFrame:
    """Read the lake back — COMMITTED batches only: a crash between
    the parquet write and the marker leaves ``batch=B`` partials on
    disk until the next trigger replays them; filtering on the commit
    list keeps readers from ever seeing a torn batch. The filter is on
    the ``batch`` partition column, so uncommitted directories are
    partition-pruned, not scanned. Rows carry (shard, batch), and
    (shard, shard_pos, key) is the deterministic global order
    regardless of how many batches built the lake."""
    df = spark.read.parquet(lake_path)
    commits_dir = os.path.join(lake_path, "_commits")
    if os.path.isdir(commits_dir):
        committed = [int(b) for b in os.listdir(commits_dir)]
        df = df.filter(F.col("batch").isin(committed))
    return df


def compact_shard_lake(
    spark,
    lake_path: str,
    key_col: str = "doc_id",
    n_shards: int = 16,
    max_records_per_file: int = 1_000_000,
) -> int:
    """Rewrite the committed lake as ONE generation (batch=0).

    A long-running stream accumulates a ``batch=B`` directory (and its
    small files) per micro-batch; compaction folds every COMMITTED row
    into a single batch and drops torn partials. The swap is the
    staged-rename protocol from streaming/sinks.upsert_batch: write
    the compacted lake to ``.staging`` → rename current to ``.old`` →
    rename staging in → delete ``.old``; every crash window leaves a
    complete committed lake visible (never the duplicates a
    marker-by-marker swap could expose). Returns the number of rows
    compacted. Shard assignment and intra-shard order are pure
    functions of the key, so the compacted lake's manifest is
    byte-identical to the multi-batch one — asserted in tests. Run it
    with the ingest stream STOPPED (between availableNow drains, or
    in the stream's maintenance window) — the directory swap is not
    coordinated with concurrent appends.
    """
    _require_local_lake(spark, lake_path)
    staging = lake_path + ".staging"
    backup = lake_path + ".old"
    # crash recovery mirror of upsert_batch, BEFORE reading: if a
    # previous compaction died between the renames, .old IS the
    # committed lake
    if not os.path.isdir(lake_path) and os.path.isdir(backup):
        os.replace(backup, lake_path)
    rows = read_shard_lake(spark, lake_path).drop("batch")
    # shard/shard_pos already present from ingest; rewrite as batch=0
    out = rows.withColumn("batch", F.lit(0))
    shutil.rmtree(staging, ignore_errors=True)
    n = out.count()
    write_sharded(
        out,
        staging,
        key_col,
        n_shards,
        max_records_per_file,
        partition_cols=("shard", "batch"),
        mode="overwrite",
    )
    os.makedirs(os.path.join(staging, "_commits"), exist_ok=True)
    with open(os.path.join(staging, "_commits", "0"), "w") as f:
        f.write("committed")
    shutil.rmtree(backup, ignore_errors=True)
    os.replace(lake_path, backup)
    os.replace(staging, lake_path)
    shutil.rmtree(backup, ignore_errors=True)
    return n
