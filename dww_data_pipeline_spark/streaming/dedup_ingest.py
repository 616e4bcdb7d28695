"""Dedup-at-ingest: the streaming twin of d11_incremental_dedup.

A continuously-crawled corpus must decide exact_dup / near_dup / keep
for every incoming document AS BATCHES ARRIVE — waiting for the next
offline dedup pass means duplicates sit in the corpus (and in training
mixtures) until the rebuild. This module runs the d11 core on
Structured Streaming: a file-source stream of new documents drains
through foreachBatch, each micro-batch is checked by the same
``incremental_decisions`` core the batch query (and its DuckDB oracle)
uses, and per-doc decisions land in per-batch output directories
(overwrite-on-replay — the streaming/ingest.py idempotency
discipline).

Scale shape: the corpus-side artifacts (fingerprint counts, banded
MinHash signatures, shingle sets) are exactly what a production
pipeline PERSISTS between crawl snapshots — built ONCE per run via
``build_corpus_index`` and cached, so each micro-batch pays only for
its own signatures and the batch-driven joins against the index.  The
corpus never self-joins and never re-shuffles per micro-batch.
Decisions depend only on the fixed corpus index (batch docs are not
checked against each other — the d11 contract), so the union of
micro-batch outputs equals the one-shot batch answer regardless of
how the stream is chopped; the parity test asserts exactly that.
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
    """Attach dedup-at-ingest to a streaming (doc_id, text) DataFrame:
    every micro-batch document is decided against the fixed corpus
    index. Returns the started query (availableNow trigger — drain
    pending files then stop; swap for processingTime in always-on
    mode).

    Each micro-batch writes (overwrite) its own ``batch=<id>``
    subdirectory of decision rows (doc_id, decision, n_matches) so
    crash-replays converge. Read all decisions with
    ``spark.read.parquet(out_path + "/batch=*")``. The cached corpus
    index is exposed on the returned query as ``corpus_index`` for
    caller-side unpersist.
    """
    from dww_data_pipeline_spark.plans.dedup_plans import (
        build_corpus_index,
        incremental_decisions,
    )

    index = {
        name: df.cache()
        for name, df in build_corpus_index(
            corpus_docs.select("doc_id", "text")
        ).items()
    }

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
