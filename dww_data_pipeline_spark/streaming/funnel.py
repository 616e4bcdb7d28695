"""Stateful streaming funnel (view → click → purchase) via
applyInPandasWithState.

The real-time twin of the batch funnel (plans/web_plans.ev13): a
product-analytics engine wants stage-advance events AS THEY HAPPEN,
not at end of day.  Per-user state is three timestamps (the greedy
earliest-event anchors), so the state store grows with distinct
users only, and each stage advance emits exactly once — append-mode
safe.  Idle keys expire via EventTimeTimeout once the watermark
passes a day beyond their last advance (the stateful.py discipline).

Greedy semantics are order-dependent, so the streaming path processes
each micro-batch sorted by event time; ACROSS micro-batches the
per-stage anchors themselves are the late-event rule — an in-watermark
out-of-order event still advances the funnel iff its stage is unset
and the step window holds (a purchase seen first must not blind the
operator to an older view arriving one micro-batch later).  What
append mode cannot do is retract: an already-emitted anchor wins over
a later-arriving earlier event of the SAME stage, a divergence from
batch bounded by the watermark and pinned by the multi-micro-batch
parity test.  Batch mode runs the same semantics relationally — each
step joins the filtered fact against the one-row-per-user anchor
aggregate — which is also what the DuckDB oracle checks, so the
emission rule itself is differentially verified.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("stage", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("v_ms", T.LongType(), True),
        T.StructField("c_ms", T.LongType(), True),
        T.StructField("p_ms", T.LongType(), True),
        T.StructField("last_ms", T.LongType(), True),
    ]
)

_STEP_WINDOW_MS = 60 * 60 * 1000  # each step must land within 60 min
_IDLE_TIMEOUT_MS = 24 * 3600 * 1000

_STEP_OF = {"view": 1, "click": 2, "purchase": 3}


def _advance(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user funnel advancer: state is (v_ms, c_ms, p_ms); an event
    advances the funnel iff it is the first qualifying event for the
    NEXT stage within the step window. Chunks are concatenated and
    sorted once (the stateful.py rule)."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    v_ms = c_ms = p_ms = last_ms = None
    if state.exists:
        v_ms, c_ms, p_ms, last_ms = state.get

    chunks = list(pdfs)
    pdf = (
        pd.concat(chunks, ignore_index=True)
        if len(chunks) > 1
        else (chunks[0] if chunks else None)
    )
    out: list[dict] = []
    if pdf is not None:
        for row in pdf.sort_values("ts_ms").itertuples(index=False):
            ts = int(row.ts_ms)
            # Late-event rule: the per-stage anchors ARE the drop
            # threshold.  An out-of-order event in a later micro-batch
            # still advances the funnel iff its stage is unset and the
            # step window holds; only same-stage retraction is
            # impossible under append mode (see module docstring).
            et = row.event_type
            if et == "view" and v_ms is None:
                v_ms = ts
                out.append({"user_id": user_id, "stage": 1, "ts_ms": ts})
            elif (
                et == "click"
                and v_ms is not None
                and c_ms is None
                and v_ms < ts <= v_ms + _STEP_WINDOW_MS
            ):
                c_ms = ts
                out.append({"user_id": user_id, "stage": 2, "ts_ms": ts})
            elif (
                et == "purchase"
                and c_ms is not None
                and p_ms is None
                and c_ms < ts <= c_ms + _STEP_WINDOW_MS
            ):
                p_ms = ts
                out.append({"user_id": user_id, "stage": 3, "ts_ms": ts})
            last_ms = ts if last_ms is None else max(last_ms, ts)

    state.update((v_ms, c_ms, p_ms, last_ms))
    if last_ms is not None:
        # Spark rejects a timeout at or below the current watermark;
        # clamp so an idle key whose last event is already behind the
        # watermark still expires (at the next watermark advance)
        # instead of leaking state-store entries.
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_ms + _IDLE_TIMEOUT_MS, wm + 1))
    if out:
        yield pd.DataFrame(out)


def streaming_funnel(
    events: DataFrame,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stage-advance rows (user_id, stage, ts_ms) for the 3-step
    greedy funnel. Streaming input → applyInPandasWithState with
    O(1)-per-user state; batch input → the equivalent relational
    chain (each step = filtered fact ⋈ one-row-per-user anchor),
    which is also the DuckDB-checkable form."""
    prepared = events.filter(F.col("ts").isNotNull()).select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts) div 1000").alias("ts_ms"),
        F.col("ts").alias("_ts"),
    )
    if events.isStreaming:
        prepared = prepared.withWatermark("_ts", watermark)
        return prepared.groupBy("user_id").applyInPandasWithState(
            _advance,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )

    ev = prepared.drop("_ts")
    win = _STEP_WINDOW_MS
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("v_ms"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts_ms") > F.col("v_ms"))
            & (F.col("ts_ms") <= F.col("v_ms") + win)
        )
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("c_ms"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts_ms") > F.col("c_ms"))
            & (F.col("ts_ms") <= F.col("c_ms") + win)
        )
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("p_ms"))
    )

    def stage(df: DataFrame, col: str, n: int) -> DataFrame:
        return df.select(
            "user_id",
            F.lit(n).cast("int").alias("stage"),
            F.col(col).alias("ts_ms"),
        )

    return (
        stage(v, "v_ms", 1)
        .unionByName(stage(c, "c_ms", 2))
        .unionByName(stage(p, "p_ms", 3))
    )
