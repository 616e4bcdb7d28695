"""Drift detection at ingest: the streaming twin of ev19.

A continuously-ingested event stream should raise a drift alarm as
data arrives, not at the next offline monitoring pass.  This module
runs ev19's EXACT scaled-integer CUSUM core on Structured Streaming:
each micro-batch folds its events into a persisted per-(type, day)
daily-count state, then recomputes the bounded CUSUM walk over the
accumulated series and emits the CURRENT per-day drift statistics —
so after the final micro-batch the latest output equals the one-shot
batch answer regardless of how the stream was chopped (the parity
test asserts exactly that).

State discipline: the daily-count state is VERSIONED BY BATCH ID
(``state/v=<batch_id>`` = state after that batch, written with
overwrite).  An at-least-once foreachBatch replay of batch N re-reads
``v=N-1`` and overwrites ``v=N`` — convergent with no atomic-swap
machinery.  The state is bounded (event-type x day, never raw
events), so versions cost rows-per-day-of-history, not corpus; a
production deployment prunes versions older than its replay horizon.

Recomputing the walk per micro-batch is correct, not a shortcut:
CUSUM's target mu = T/D is the accumulated series' own mean, so every
new day shifts all increments — the statistic over "everything seen
so far" is the honest streaming form, and the walk itself costs one
pass over the bounded daily state (the ev18/ev19 COLLECT_BOUNDED
argument).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_cusum(
    stream_events: DataFrame,
    out_path: str,
    checkpoint: str,
    state_dir: str,
):
    """Attach CUSUM-at-ingest to a streaming (event_type, ts)
    DataFrame; returns the started query (availableNow trigger —
    drain pending files then stop; swap for processingTime in
    always-on mode).

    Each micro-batch writes (overwrite) the full current drift table
    to ``out_path/batch=<id>``; the highest batch directory is the
    up-to-date answer. Read it with
    ``spark.read.parquet(out_path + "/batch=<max id>")``."""
    from dww_data_pipeline_spark.plans.selection_plans import cusum_walk

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = batch_df.groupBy(
            "event_type", F.to_date("ts").alias("day")
        ).agg(F.count(F.lit(1)).alias("cnt"))
        prev_path = os.path.join(state_dir, f"v={batch_id - 1}")
        if batch_id > 0:
            prev = spark.read.parquet(prev_path)
            merged = (
                prev.unionByName(inc)
                .groupBy("event_type", "day")
                .agg(F.sum("cnt").alias("cnt"))
            )
        else:
            merged = inc
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v={batch_id}")
        )
        daily = spark.read.parquet(os.path.join(state_dir, f"v={batch_id}"))
        cusum_walk(daily).write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )

    return (
        stream_events.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_embedding_bins(
    stream_vectors: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """Embedding-PSI monitoring at ingest (st22's module path — the
    st19/st20 pattern for distribution drift): each micro-batch of
    (vec_id, embedding) rows quantizes into the FIXED [-2,2) 16-bin
    grid and writes its (dim, bin, c) histogram segment
    (overwrite-on-replay).  Per-vector (dim, bin) rows depend only on
    the fixed bin edges and the vector itself, and histograms are
    additive — so re-aggregating the union of per-batch segments
    equals the one-shot histogram for ANY stream chopping (the
    parity test asserts it), and psi_from_counts turns accumulated
    segments into the dq22/st22 gate rows downstream.  Per-batch
    cost: one posexplode + a (dim, bin)-bounded partial agg (<= 1024
    rows written per batch); zero corpus re-reads."""
    import os

    from dww_data_pipeline_spark.plans.corpus_plans import (
        embedding_bin_counts,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        counts = embedding_bin_counts(
            batch_df, F.lit(1).cast("int")
        ).select("dim", "bin", "c")
        counts.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )

    return (
        stream_vectors.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
