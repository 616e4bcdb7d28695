"""Continuous LM perplexity gating: the streaming twin of st15.

CCNet-style pipelines score every incoming document against a
language model trained on the trusted corpus and gate on the score.
In continuous ingestion the batches arrive forever, so the model must
NOT be re-derived per batch: ``stream_lm_score`` builds the
Kneser-Ney bigram model components ONCE from the corpus snapshot,
caches them (the st13 persisted-index discipline — see
streaming/ingest.py), and each micro-batch pays only its own bigram
shuffle plus keyed left joins against the cached model.

Idempotency: each micro-batch overwrites its own ``batch=<id>``
directory, so at-least-once foreachBatch replay converges (the same
discipline every foreachBatch flow in this package uses). Read
results with ``spark.read.parquet(out_path + "/batch=*")``.

Model refresh is a REBUILD concern, not an ingest concern (the
ann_ingest.py rule): a production deployment retrains on a schedule
and swaps the cached components atomically between micro-batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def stream_lm_score(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """Attach the LM-gate flow to a streaming (doc_id, text)
    DataFrame; returns the started query (availableNow trigger —
    drain pending files then stop; swap for processingTime in
    always-on mode). The cached model components are exposed as
    ``query.lm_model`` for the caller to unpersist."""
    from dww_data_pipeline_spark.plans.curation_plans import (
        lm_model,
        lm_score,
    )

    model = {k: df.cache() for k, df in lm_model(corpus_docs).items()}

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        scored = lm_score(batch_df.select("doc_id", "text"), model)
        scored.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )

    query = (
        stream_docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.lm_model = model  # expose for unpersist by the caller
    return query
