"""Stateful streaming journey-pattern matcher via
applyInPandasWithState — the real-time twin of ev17's
MATCH_RECOGNIZE-style regex counting (plans/web_plans.py).

Continuous journey monitoring is the production form of sequence
pattern matching: a match event should fire THE MOMENT a pattern
instance completes, not at end of day.  Both ev17 patterns reduce to
single-pass automata over the per-user event-initial sequence, which
is what makes them streamable with O(1) per-user state:

* ``vp_arc`` — non-overlapping leftmost ``v[^p]*p``: one boolean of
  state (an arc is open).  A ``v`` opens an arc if none is open; a
  ``p`` closes an open arc and EMITS at the closing event's
  timestamp.  Every ``p`` leaves the arc closed, so "p counts iff at
  least one v occurred since the previous p" — the relational form
  the batch twin and DuckDB oracle compute.
* ``error_burst`` — non-overlapping ``ee+`` = maximal runs of >= 2
  errors: two booleans of state (previous event was an error; this
  run already counted).  The SECOND consecutive error EMITS — exactly
  one emission per qualifying run, and an in-progress run needs no
  run-terminator to be counted (the open-run problem a count-at-
  run-end design would have on an unbounded stream).

Per-user state is four small ints, so the state store grows with
distinct users only, and each match emits exactly once — append-mode
safe.  Idle keys expire via EventTimeTimeout (the stateful.py
discipline).  Events inside a micro-batch are sorted by
(ts_ms, event_id); across micro-batches an in-watermark out-of-order
event is processed in arrival order — the same bounded divergence
st12/st13 document, pinned by the multi-micro-batch parity test.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

JOURNEY_MATCH_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("pattern", T.StringType(), False),
        T.StructField("ts_ms", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("open_arc", T.IntegerType(), True),
        T.StructField("prev_e", T.IntegerType(), True),
        T.StructField("burst_counted", T.IntegerType(), True),
        T.StructField("last_ms", T.LongType(), True),
    ]
)

_IDLE_TIMEOUT_MS = 24 * 3600 * 1000


def _match(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user pattern automaton (see module docstring)."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    open_arc = prev_e = burst_counted = 0
    last_ms = None
    if state.exists:
        open_arc, prev_e, burst_counted, last_ms = state.get

    chunks = list(pdfs)
    pdf = (
        pd.concat(chunks, ignore_index=True)
        if len(chunks) > 1
        else (chunks[0] if chunks else None)
    )
    out: list[dict] = []
    if pdf is not None:
        for row in pdf.sort_values(["ts_ms", "event_id"]).itertuples(
            index=False
        ):
            ts = int(row.ts_ms)
            c = row.c
            if c == "e":
                if prev_e and not burst_counted:
                    out.append(
                        {"user_id": user_id, "pattern": "error_burst", "ts_ms": ts}
                    )
                    burst_counted = 1
                prev_e = 1
            else:
                prev_e = 0
                burst_counted = 0
                if c == "v" and not open_arc:
                    open_arc = 1
                elif c == "p" and open_arc:
                    out.append(
                        {"user_id": user_id, "pattern": "vp_arc", "ts_ms": ts}
                    )
                    open_arc = 0
            last_ms = ts if last_ms is None else max(last_ms, ts)

    state.update((open_arc, prev_e, burst_counted, last_ms))
    if last_ms is not None:
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_ms + _IDLE_TIMEOUT_MS, wm + 1))
    if out:
        yield pd.DataFrame(out)


def streaming_journey_patterns(
    events: DataFrame,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Match-instance rows (user_id, pattern, ts_ms) for the ev17
    patterns.  Streaming input → applyInPandasWithState with O(1)
    per-user automaton state; batch input → the equivalent window
    chain (one user shuffle), which is also the DuckDB-checkable
    form:

    * ``vp_arc``: group events by the running count of prior ``p``
      initials; a ``p`` emits iff its group contains a ``v``.
    * ``error_burst``: an ``e`` emits iff the previous initial was
      ``e`` and the one before was not (run start + 1).
    """
    prepared = events.filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        "user_id",
        "event_id",
        F.substring("event_type", 1, 1).alias("c"),
        F.expr("unix_micros(ts) div 1000").alias("ts_ms"),
        F.col("ts").alias("_ts"),
    )
    if events.isStreaming:
        prepared = prepared.withWatermark("_ts", watermark)
        return prepared.groupBy("user_id").applyInPandasWithState(
            _match,
            outputStructType=JOURNEY_MATCH_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )

    ev = prepared.drop("_ts")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    o = ev.select(
        "user_id",
        "c",
        "ts_ms",
        F.lag("c", 1).over(w).alias("p1"),
        F.lag("c", 2).over(w).alias("p2"),
        F.coalesce(
            F.sum(F.when(F.col("c") == "p", 1).otherwise(0)).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("grp"),
    )
    wg = Window.partitionBy("user_id", "grp")
    og = o.withColumn(
        "has_v", F.max(F.when(F.col("c") == "v", 1).otherwise(0)).over(wg)
    )
    arcs = og.filter((F.col("c") == "p") & (F.col("has_v") == 1)).select(
        "user_id", F.lit("vp_arc").alias("pattern"), "ts_ms"
    )
    bursts = o.filter(
        (F.col("c") == "e")
        & (F.col("p1") == "e")
        & (F.col("p2").isNull() | (F.col("p2") != "e"))
    ).select("user_id", F.lit("error_burst").alias("pattern"), "ts_ms")
    return arcs.unionByName(bursts)
