"""Hierarchical time rollups (hypertable-style continuous aggregates
— a north-star custom operator with no reference counterpart).

``rollup_time`` materializes a fine-grained bucket aggregate once;
``coarsen`` derives any coarser bucketing FROM THE ROLLUP, not the
raw events — the decimal partial sums re-aggregate exactly, so a 1-hour
view built from 1-minute partials equals the direct 1-hour aggregate
bit for bit (asserted by oracle). At 100 TB this is the difference
between re-scanning the fact table per resolution and re-aggregating
a table 10⁴× smaller.

Buckets must nest (coarse % fine == 0) — enforced, since non-nesting
windows cannot be derived from partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _seconds(width: str) -> int:
    n, unit = width.split()
    unit = unit.rstrip("s")
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"unsupported unit {unit!r}")
    return int(n) * _UNIT_SECONDS[unit]


def rollup_time(
    events: DataFrame,
    width: str = "1 minute",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Fine-grained bucket aggregate: (bucket_start, *group_cols,
    n_events, sum_value) with a decimal-exact partial sum."""
    group_cols = group_cols or ["event_type"]
    out = (
        events.groupBy(
            F.window(ts_col, width).alias("win"), *group_cols
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_value"),
        )
        .select(F.col("win.start").alias("bucket_start"), *group_cols, "n_events", "sum_value")
    )
    # stamp the true bucket width into column metadata so coarsen()
    # validates against what was actually materialized, not a caller
    # claim (metadata survives selects/writes)
    return out.withColumn(
        "bucket_start",
        F.col("bucket_start").alias(
            "bucket_start", metadata={"bucket_seconds": _seconds(width)}
        ),
    )


def coarsen(
    rollup: DataFrame,
    fine_width: str,
    coarse_width: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Re-aggregate a fine rollup to a coarser nesting bucket —
    touches only the rollup, never the raw events."""
    group_cols = group_cols or ["event_type"]
    fine_s, coarse_s = _seconds(fine_width), _seconds(coarse_width)
    # prefer the width the rollup actually materialized (stamped in
    # column metadata by rollup_time) over the caller's claim — a wrong
    # claim that passes the divisibility check would silently miscount
    meta = rollup.schema["bucket_start"].metadata or {}
    actual = meta.get("bucket_seconds")
    if actual is not None and actual != fine_s:
        raise ValueError(
            f"rollup was materialized with {actual}s buckets, not {fine_width!r}"
        )
    if coarse_s % fine_s != 0:
        raise ValueError(
            f"{coarse_width!r} does not nest {fine_width!r} buckets"
        )
    return (
        rollup.groupBy(
            F.window("bucket_start", coarse_width).alias("win"), *group_cols
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
        .select(F.col("win.start").alias("bucket_start"), *group_cols, "n_events", "sum_value")
    )
