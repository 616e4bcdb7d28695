"""Z-order (Morton) layout for multi-dimensional data skipping.

Partition pruning handles ONE dimension; real scans filter on
several (customer AND date, user AND time). Interleaving the bits of
two quantized keys gives a single sort key whose contiguous ranges
are small rectangles in (x, y) space — so range-partitioned,
z-sorted files carry TIGHT min/max footer statistics on BOTH
columns, and a reader (Spark's parquet source, or any engine reading
the footers) skips most files for a predicate on either dimension.
This is the layout trick behind Delta/Iceberg OPTIMIZE ZORDER,
implemented here with plain integer arithmetic and a plain
``repartitionByRange`` write.

The z-value itself is exact integer bit math (generated once as a
parsed SQL expression), so it doubles as an oracle-checkable query
(``ext_zorder_key`` in plans/mining_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZBITS = 16


def z_value_sql(x_sql: str, y_sql: str, bits: int = ZBITS) -> str:
    """SQL text for the Morton interleave of two non-negative ints
    (x's bit i lands at 2i, y's at 2i+1). Pure +/*/div/mod integer
    arithmetic — no engine-specific bit builtins, so the IDENTICAL
    text runs on Spark and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(
            f"((({x_sql}) // {1 << i}) % 2) * {1 << (2 * i)}"
        )
        terms.append(
            f"((({y_sql}) // {1 << i}) % 2) * {1 << (2 * i + 1)}"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def z_value_col(x_sql: str, y_sql: str, bits: int = ZBITS):
    """Spark Column for the Morton interleave (Spark uses DIV for
    integer division where DuckDB uses //)."""
    return F.expr(z_value_sql(x_sql, y_sql, bits).replace("//", "DIV"))


def write_zordered(
    df: DataFrame,
    x_col: str,
    y_col: str,
    out_dir: str,
    n_files: int = 8,
    bits: int = ZBITS,
) -> None:
    """Write ``df`` as ``n_files`` z-ordered parquet files: range-
    partition on the z-value (contiguous z-ranges per file = small
    (x, y) rectangles), sort within partitions, drop the helper
    column. Footer min/max stats on BOTH columns come out tight —
    verified from the parquet metadata in tests.

    Each dimension is min-max normalized into the full ``bits`` range
    first (one bounded 1-row aggregate): raw keys of very different
    cardinalities would otherwise leave one dimension's bits entirely
    in the low positions, and the interleave would degenerate to a
    single-column sort — the classic z-order pitfall (Delta's
    OPTIMIZE ZORDER does the same via range-partition ids)."""
    top = (1 << bits) - 1
    b = df.agg(
        F.min(F.col(x_col).cast("long")).alias("_xmin"),
        F.max(F.col(x_col).cast("long")).alias("_xmax"),
        F.min(F.col(y_col).cast("long")).alias("_ymin"),
        F.max(F.col(y_col).cast("long")).alias("_ymax"),
    ).collect()[0]
    xspan = max(1, b["_xmax"] - b["_xmin"])
    yspan = max(1, b["_ymax"] - b["_ymin"])
    zx = f"((CAST({x_col} AS BIGINT) - {b['_xmin']}) * {top} DIV {xspan})"
    zy = f"((CAST({y_col} AS BIGINT) - {b['_ymin']}) * {top} DIV {yspan})"
    with_z = df.withColumn("_z", z_value_col(zx, zy, bits))
    (
        with_z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
