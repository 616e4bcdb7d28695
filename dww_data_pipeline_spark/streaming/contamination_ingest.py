"""Exact-substring contamination gate at ingest: the streaming twin
of st17's batch core.

A corpus ingest must flag arriving documents that carry text already
duplicated inside the corpus (boilerplate, license blocks, benchmark
passages — the published ExactSubstr contamination use) AS BATCHES
ARRIVE, not in the next offline dedup pass.  This module runs the
st17 core on Structured Streaming: the corpus' duplicated-window
fingerprint set is built ONCE per run (d26's suffix-rank machinery —
corpus content never hashes corpus-wide; only the bounded duplicated
classes fingerprint their keeper window) and cached; a file-source
stream of new documents drains through foreachBatch, each micro-batch
hashes its own windows and broadcast-joins the cached set via the
same ``exact_contamination_gate`` the batch query (and its DuckDB
oracle) uses, and per-doc flags land in per-batch output directories
(overwrite-on-replay — the streaming/ingest.py idempotency
discipline).

Flags depend only on the fixed corpus state (arrivals are not checked
against each other — the st13 contract), so the union of micro-batch
outputs equals the one-shot batch answer regardless of how the stream
is chopped; the parity test asserts exactly that.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def stream_contamination_gate(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """Attach the contamination gate to a streaming (doc_id, text)
    DataFrame.  Returns the started query (availableNow trigger —
    drain pending files then stop; swap for processingTime in
    always-on mode).

    Each micro-batch writes (overwrite) its own ``batch=<id>``
    subdirectory of flag rows (doc_id, n_windows, n_contaminated,
    first_hit_pos, contaminated) so crash-replays converge.  Read all
    flags with ``spark.read.parquet(out_path + "/batch=*")``.  The
    cached fingerprint set is exposed on the returned query as
    ``fingerprints`` for caller-side unpersist.
    """
    from dww_data_pipeline_spark.plans.dedup_plans import (
        exact_contamination_fingerprints,
        exact_contamination_gate,
    )

    fps = exact_contamination_fingerprints(
        corpus_docs.select("doc_id", "text")
    ).cache()

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        flags = exact_contamination_gate(
            batch_df.select("doc_id", "text"), fps
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
    query.fingerprints = fps  # expose for unpersist by the caller
    return query
