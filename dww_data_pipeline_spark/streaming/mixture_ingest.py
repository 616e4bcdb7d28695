"""Temperature-mixture admission at ingest: the streaming twin of
st18's batch core.

Data mixing is a corpus-level design decision — the admission rates
(q_l ∝ n_l^(1/2), t38's exact integer math) are derived from the
EXISTING corpus once and FROZEN; arriving documents must be admitted
against that design, not against rates that drift with every
micro-batch.  This module runs exactly that on Structured Streaming:
the frozen rate table is built once per run (|langs| rows) and
cached; a file-source stream of new documents drains through
foreachBatch, each micro-batch broadcast-joins the cached rates and
applies the pure int64 hash admission via the same
``mixture_admission_flags`` the batch query (and its DuckDB oracle)
uses, and per-doc flags land in per-batch output directories
(overwrite-on-replay — the streaming/ingest.py idempotency
discipline).

Flags depend only on the frozen corpus state (arrivals are never
counted into the rates — the st13 contract), so the union of
micro-batch outputs equals the one-shot batch answer regardless of
how the stream is chopped; the parity test asserts exactly that.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def stream_mixture_admission(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """Attach the frozen-mixture admission gate to a streaming
    (doc_id, lang) DataFrame.  Returns the started query
    (availableNow trigger — drain pending files then stop; swap for
    processingTime in always-on mode).

    Each micro-batch writes (overwrite) its own ``batch=<id>``
    subdirectory of flag rows (doc_id, lang, admitted) so
    crash-replays converge.  Read all flags with
    ``spark.read.parquet(out_path + "/batch=*")``.  The cached rate
    table is exposed on the returned query as ``rates`` for
    caller-side unpersist.
    """
    from dww_data_pipeline_spark.plans.pipeline_ext import (
        mixture_admission_flags,
        mixture_rates,
    )

    rates = mixture_rates(corpus_docs.select("doc_id", "lang")).cache()

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        flags = mixture_admission_flags(
            batch_df.select("doc_id", "lang"), rates
        )
        flags.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )

    query = (
        stream_docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.rates = rates  # expose for unpersist by the caller
    return query
