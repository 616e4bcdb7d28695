"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``dww_data_pipeline_spark.plans.registry`` — every
query/operator from SURVEY.md §2 (plus the north-star dedup /
similarity / text-analysis / streaming operators) registers there
with its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dww_data_pipeline_spark.plans.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A1 pricing summary — SURVEY §7.2 M0) on sf0.001."""
    q = all_queries()["a1_pricing_summary"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    ops — those get the driver's rows-only check)."""
    return all_oracles()
