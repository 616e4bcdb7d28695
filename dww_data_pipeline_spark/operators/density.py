"""Density (headcount time-series) operators — reference A5/A6
(``densityCalc.js:39-121``).

Semantics (densityCalc.js:60-90): per (entity, group) timeline, each
credit counts toward every year from its own year until the year
before the entity's next credit; the last credit counts only its own
year; consecutive same-group same-year rows collapse.

Spark shape: one window pass (lead(year) per entity) + a guarded
``explode(sequence(...))`` range fill + one groupBy count. Two
shuffles total (window + agg) regardless of data size; the range fill
is clamped (MAX_SPAN) so dirty data cannot explode a partition
(SURVEY §7.3 hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_SPAN_YEARS = 50


def density(
    df: DataFrame,
    entity: str,
    group_cols: list[str],
    year_col: str,
    order: list[str] | None = None,
) -> DataFrame:
    """A5: per-(group, year) headcount with forward range fill.

    Returns ``group_cols + [year_col, 'headcount']`` where each input
    row is counted in every year from its own until the entity's next
    row's year (exclusive), clamped to MAX_SPAN_YEARS.
    """
    order = order or [year_col]
    w = Window.partitionBy(entity).orderBy(*order)
    next_year = F.lead(year_col).over(w)
    fill_end = F.when(
        next_year.isNull() | (next_year <= F.col(year_col)),
        F.col(year_col),
    ).otherwise(
        F.least(next_year - 1, F.col(year_col) + F.lit(MAX_SPAN_YEARS))
    )
    filled = (
        df.withColumn("_end", fill_end)
        .withColumn("fill_year", F.explode(F.sequence(F.col(year_col), F.col("_end"))))
        .drop("_end")
    )
    return (
        filled.groupBy(*group_cols, "fill_year")
        .agg(F.count_distinct(F.col(entity)).alias("headcount"))
    )


def density_report(
    dens: DataFrame, year: int, group_col: str, exclude_empty_group: bool = True
) -> DataFrame:
    """A6: one year's group→headcount breakdown plus a total row count
    that excludes the unmapped '' bucket (reference
    densityCalc.js:101-121, exclusion at :119)."""
    year_slice = dens.filter(F.col("fill_year") == year)
    if exclude_empty_group:
        total = year_slice.filter(F.col(group_col) != "").agg(
            F.sum("headcount").alias("total")
        )
    else:
        total = year_slice.agg(F.sum("headcount").alias("total"))
    return year_slice.crossJoin(F.broadcast(total))
