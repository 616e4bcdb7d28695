"""Sequence packing at ingest: the stateful-streaming twin of t40.

Batch packing (plans/text_plans.py t40_sequence_packing) folds a
shard's documents through the greedy no-split recurrence in one
Arrow group.  At ingest the same stream arrives chopped into
micro-batches, and the recurrence's state — the OPEN bin (id, docs,
fill, oversize flag) — must survive the chop: that is precisely the
applyInPandasWithState primitive (the st5 discipline), with state
per shard O(1) regardless of corpus size.

``pack_chunk`` is the single shared recurrence core: t40 runs it
with one chunk, the st21 registered query runs it chunk-by-chunk
with explicit carried state (and must emit bit-identical bins — the
t40 oracle verifies it), and ``stream_sequence_packing`` runs it per
micro-batch with the state store carrying the open bin.  A closed
bin never reopens (documents only append), so the stream emits each
bin exactly once, when it closes; the final open bin per shard stays
in state until the stream ends (the parity test asserts
closed-stream output == one-shot bins minus each shard's last).

Ordering contract: packing is order-sensitive by definition — the
stream must deliver each shard's documents in doc_id order across
batches (a file source draining ordered files, a Kafka partition
keyed by shard).  Within a micro-batch the group sorts its chunks
once (the st5 concat-then-sort rule).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PackState = tuple[int, int, int, bool]  # (bin_id, n_docs, fill, oversize)

BIN_COLUMNS = ["shard", "bin_id", "n_docs", "tokens", "has_oversize"]

BIN_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType(), False),
        T.StructField("bin_id", T.LongType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("tokens", T.LongType(), False),
        T.StructField("has_oversize", T.BooleanType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("bin_id", T.LongType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("fill", T.LongType(), False),
        T.StructField("oversize", T.BooleanType(), False),
    ]
)


def pack_chunk(
    ns: list[int], state: PackState | None, capacity: int
) -> tuple[list[tuple[int, int, int, bool]], PackState | None]:
    """Fold one ordered chunk of token counts through the greedy
    recurrence.  Returns (closed bins as (bin_id, n_docs, tokens,
    has_oversize) rows, open-bin state).  Feeding chunks of ANY
    chopping through carried state yields the same bins as one call
    with the concatenated list — the property st21 and the stream
    parity test pin."""
    closed: list[tuple[int, int, int, bool]] = []
    if state is None:
        bin_id, n_docs, fill, oversize = 0, 0, 0, False
    else:
        bin_id, n_docs, fill, oversize = state
    for n in ns:
        n = int(n)
        if bin_id == 0 or fill + n > capacity:
            if bin_id > 0:
                closed.append((bin_id, n_docs, fill, oversize))
            bin_id += 1
            n_docs, fill, oversize = 0, 0, False
        n_docs += 1
        fill += n
        oversize = oversize or n > capacity
    if bin_id == 0:
        return closed, None
    return closed, (bin_id, n_docs, fill, oversize)


def flush_state(state: PackState | None):
    """The final open bin as a bin row (or nothing)."""
    if state is None:
        return []
    bin_id, n_docs, fill, oversize = state
    return [(bin_id, n_docs, fill, oversize)]


def _make_packer(capacity: int):
    def pack_batch(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        chunks = list(pdfs)
        if not chunks:
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        ).sort_values("doc_id")
        prev: PackState | None = tuple(state.get) if state.exists else None
        closed, new_state = pack_chunk(
            [int(x) for x in pdf["n"]], prev, capacity
        )
        if new_state is not None:
            state.update(new_state)
        if closed:
            yield pd.DataFrame(
                [(int(shard), b, d, t, o) for b, d, t, o in closed],
                columns=BIN_COLUMNS,
            )

    return pack_batch


def stream_sequence_packing(
    stream_toks: DataFrame,
    checkpoint: str,
    out_path: str,
    capacity: int = 256,
):
    """Attach the stateful packer to a streaming (doc_id, shard, n)
    DataFrame; emits each bin once, when it closes, into per-batch
    parquet segments (overwrite-on-replay, the ingest idempotency
    discipline).  Returns the started query (availableNow — drain
    then stop)."""
    import os

    packed = stream_toks.groupBy("shard").applyInPandasWithState(
        _make_packer(capacity),
        outputStructType=BIN_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )

    return (
        packed.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
