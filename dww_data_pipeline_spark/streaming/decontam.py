"""Continuous decontamination: the streaming twin of d10.

A training corpus built from a live crawl must be screened against the
held-out eval/benchmark set as batches ARRIVE, not in one offline pass
— otherwise contaminated documents sit in the corpus until the next
full rebuild. This module runs the d10 core on Structured Streaming:
a file-source stream of training documents drains through
foreachBatch, each micro-batch is checked by the same
``decontamination_hits`` core the batch query uses, and flagged docs
land in per-batch output directories (overwrite-on-replay, the same
idempotency discipline as streaming/ingest.py).

Scale shape: the eval-gram index is benchmark-sized by construction —
built ONCE per run via ``build_eval_gram_index`` and cached, then
broadcast against every micro-batch, so a batch pays only for its own
n-grams. Training grams never shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def stream_decontamination(
    stream_docs: DataFrame,
    eval_docs: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """Attach the decontamination flow to a streaming (doc_id, text)
    DataFrame. Returns the started query (availableNow trigger — drain
    pending files then stop; swap for processingTime in always-on
    mode).

    Each micro-batch writes (overwrite) its own ``batch=<id>``
    subdirectory so crash-replays converge. Read flagged docs with
    ``spark.read.parquet(out_path + "/batch=*")``; documents absent
    from the output are clean. The cached eval index is exposed on the
    returned query as ``eval_index`` for caller-side unpersist.
    """
    from dww_data_pipeline_spark.plans.dedup_plans import (
        build_eval_gram_index,
        decontamination_hits,
    )

    index = build_eval_gram_index(eval_docs).cache()

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        hits = decontamination_hits(batch_df.select("doc_id", "text"), index)
        hits.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )

    query = (
        stream_docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.eval_index = index  # expose for unpersist by the caller
    return query
