"""Streaming mergeable-sketch rollup: the incremental leg of
dq20_hll_merge_gate.

The 100 TB rollup pattern: never re-scan history for a distinct
count — persist per-micro-batch HLL PARTIAL sketches (DataSketches,
``hll_sketch_agg``) keyed by (month, event_type) as they stream in,
and answer any later rollup window by ``hll_union_agg`` over the
stored partials. Soundness rests on mergeability: an HLL union takes
the register-wise max, so the unioned state depends only on the SET
of hashed uniques, not on how arrivals were chopped into batches —
union-then-estimate is decomposition-independent (the single-stream
HIP estimator is NOT, which is why dq20 gates bounded error, and why
this module compares union-path against union-path).

Per-batch partial directories follow the streaming/ingest.py
idempotency discipline (overwrite per ``batch=<id>``, replay
converges).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _partials(batch_df: DataFrame) -> DataFrame:
    return batch_df.groupBy(
        F.date_trunc("month", F.col("ts")).alias("month"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))


def stream_sketch_rollup(
    stream_events: DataFrame, out_path: str, checkpoint: str
):
    """Attach the partial-sketch sink to a streaming events DataFrame
    (ts, user_id, event_type, ...). Each micro-batch writes its
    (month, event_type, sketch) partials to ``batch=<id>``; returns
    the started query (availableNow trigger)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _partials(batch_df).write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )

    return (
        stream_events.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def rollup_estimates(spark: SparkSession, out_path: str) -> DataFrame:
    """Answer the rollup from stored partials only: union the per-batch
    sketches per (month, event_type) and estimate. Never touches raw
    events — the cost is proportional to the partial count, not
    history size."""
    partials = spark.read.option("basePath", out_path).parquet(
        os.path.join(out_path, "batch=*")
    )
    return partials.groupBy("month", "event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct"),
        F.count(F.lit(1)).alias("n_partials"),
    )


def batch_rollup_estimates(events: DataFrame, split_col=None) -> DataFrame:
    """The batch reference for parity: the SAME union-path estimate
    over an arbitrary decomposition of the input (``split_col``
    groups rows into synthetic partials; None = one partial per
    group). Union normalizes register state, so this must equal the
    streamed answer for ANY decomposition on either side."""
    keys = [F.date_trunc("month", F.col("ts")).alias("month"), "event_type"]
    if split_col is None:
        partials = events.groupBy(*keys).agg(
            F.hll_sketch_agg("user_id").alias("sk")
        )
    else:
        partials = events.groupBy(*keys, split_col.alias("_split")).agg(
            F.hll_sketch_agg("user_id").alias("sk")
        )
    return partials.groupBy("month", "event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct")
    )
