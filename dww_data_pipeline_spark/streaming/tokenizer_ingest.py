"""Tokenizer-drift monitoring at ingest: the streaming twin of s20's
OOV/fertility legs (st19's module).

The tokenizer is a FROZEN artifact (sources/tokenizer_store.py); what
arrives after it was trained drifts — new domains bring
out-of-vocabulary words and fertility decay.  s20 measures that as a
batch lifecycle gate and c6 closes the rebuild; this module is the
monitoring plane a production ingest actually runs: a file-source
stream of new documents drains through foreachBatch, each micro-batch
computes PER-DOCUMENT drift metrics under the frozen store
(``frozen_oov_doc_metrics`` — the same function the registered st19
query and its DuckDB oracle aggregate), and per-doc rows land in
per-batch output directories (overwrite-on-replay — the
streaming/ingest.py idempotency discipline).

Every metric depends only on the frozen store and the document itself
(arrivals never touch the store — the st13 contract), so the union of
micro-batch outputs equals the one-shot batch answer for ANY stream
chopping; the parity test asserts exactly that.  The alarm threshold
evaluation and the rebuild decision stay OUTSIDE the stream (s20/c6):
ingest monitors, the lifecycle decides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def stream_tokenizer_oov(
    stream_docs: DataFrame,
    store_dir: str,
    out_path: str,
    checkpoint: str,
):
    """Attach frozen-tokenizer drift metrics to a streaming
    (doc_id, text) DataFrame.  Returns the started query
    (availableNow trigger — drain pending files then stop; swap for
    processingTime in always-on mode).

    Each micro-batch writes (overwrite) its own ``batch=<id>``
    subdirectory of per-doc rows (doc_id, n_tokens, oov_tokens,
    chars, bpe_tokens) so crash-replays converge.  Read all rows with
    ``spark.read.parquet(out_path + "/batch=*")``.

    Per-batch cost: one explode + two broadcast joins against the
    KB-scale store tables + 16 vocabulary-bounded encode folds over
    the batch's NOVEL words only — batch-proportional, zero corpus
    re-reads, no store mutation.
    """
    from dww_data_pipeline_spark.sources.tokenizer_store import (
        frozen_oov_doc_metrics,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        metrics = frozen_oov_doc_metrics(
            batch_df.select("doc_id", "text"),
            batch_df.sparkSession,
            store_dir,
        )
        metrics.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )

    return (
        stream_docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
