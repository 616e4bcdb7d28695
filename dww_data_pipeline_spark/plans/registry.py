"""Query registry — the engine's declared correctness surface.

Every operator family from SURVEY §2 (plus the north-star LLM-pipeline
operators) registers one named query here: a Spark builder
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, the
equivalent DuckDB oracle SQL over the same parquet tables. The driver
hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json).

Conventions that make the hash-compare deterministic:

* every computed column is aliased identically on both sides;
* money aggregates go through DECIMAL (exact, associative) and are
  cast to DOUBLE only at the end — float summation order can differ
  between engines, decimal summation cannot;
* temporal outputs are rendered as strings (``yyyy-MM-dd`` /
  ``yyyy-MM-dd HH:mm:ss``) on both sides;
* nested/array outputs are rendered as deterministic sorted strings
  (``concat_ws`` ↔ ``string_agg(... ORDER BY ...)``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkBuilder
    oracle: str | None  # DuckDB SQL; None → non-SQL-expressible (rows-only check)
    description: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, description: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: SparkBuilder) -> SparkBuilder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, description=description)
        return fn

    return deco


def all_queries() -> dict[str, SparkBuilder]:
    _load_all()
    return {name: q.spark for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import all plan modules (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from dww_data_pipeline_spark.plans import (  # noqa: F401
        analytics_ext,
        corpus_plans,
        dedup_plans,
        relational,
        relational2,
        sequence_plans,
        streaming_plans,
        text_plans,
        tpch2,
    )

    _LOADED = True
