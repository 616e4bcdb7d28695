"""Continuous-ingest dedup: the streaming twin of d11.

A production corpus is not rebuilt per crawl — new document batches
arrive continuously and each must be deduped against the EXISTING
corpus before admission. This module runs exactly that flow on
Structured Streaming: a file-source stream of new documents drains
through foreachBatch, each micro-batch is decided by the same
``incremental_decisions`` core the batch query (d11) uses, and
decisions land in per-batch output directories so crash-replay of a
micro-batch overwrites rather than duplicates (same idempotency
discipline as streaming/sinks.upsert_batch).

At scale the corpus side (fingerprints, banded LSH signatures,
shingle sets) is a persisted index, not a per-batch recompute — the
caller passes the corpus DataFrame once and should cache()/persist it;
every micro-batch then only pays for its own signatures plus
batch-driven joins.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


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
    """
    from dww_data_pipeline_spark.plans.dedup_plans import incremental_decisions

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        decisions = incremental_decisions(
            batch_df.select("doc_id", "text"), corpus_docs
        )
        decisions.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )

    return (
        stream_docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
