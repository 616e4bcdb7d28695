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
shingle sets) is a persisted index, not a per-batch recompute — this
module builds that index once per run via build_corpus_index and
caches its three DataFrames, so every micro-batch only pays for its
own signatures plus batch-driven joins.
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
