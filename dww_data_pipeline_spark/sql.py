"""SQL surface: every engine capability reachable from ``spark.sql``
(SURVEY §4 'register the whole surface as SQL').

``register_all`` creates temp views for the base tables and the
domain gold tables, so the operator inventory is usable from plain
SQL — Catalyst produces identical plans either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dww_data_pipeline_spark.sources.catalog import register_views


def register_all(
    spark: SparkSession,
    sf_dir: str,
    domain_tables: dict[str, DataFrame] | None = None,
) -> list[str]:
    """Register base test tables (+ optional domain gold tables) as
    temp views. Returns the registered view names."""
    base = register_views(spark, sf_dir)
    names = list(base)
    for name, df in (domain_tables or {}).items():
        df.createOrReplaceTempView(name)
        names.append(name)
    return names


# Representative SQL formulations of the engine's operator families —
# the same semantics as the DataFrame builders in plans/ (Catalyst
# compiles both to the same physical plans). Usable directly:
#   register_all(spark, sf_dir); spark.sql(SQL_EXAMPLES["jumps"])
SQL_EXAMPLES: dict[str, str] = {
    "search_counts": """
        SELECT o_orderpriority, COUNT(*) AS cnt
        FROM orders GROUP BY o_orderpriority
        ORDER BY cnt DESC, o_orderpriority
    """,
    "jumps": """
        SELECT o_custkey, o_orderkey, o_orderpriority
        FROM (
          SELECT o_custkey, o_orderkey, o_orderpriority,
                 lag(o_orderpriority) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ) AS prev
          FROM orders
        ) WHERE prev IS NULL OR o_orderpriority <> prev
    """,
    "density": """
        SELECT o_orderpriority, fill_year, COUNT(DISTINCT o_custkey) AS headcount
        FROM (
          SELECT o_custkey, o_orderpriority,
                 explode(sequence(yr,
                   CASE WHEN next_yr IS NULL OR next_yr <= yr THEN yr
                        ELSE least(next_yr - 1, yr + 50) END)) AS fill_year
          FROM (
            SELECT o_custkey, o_orderpriority, year(o_orderdate) AS yr,
                   lead(year(o_orderdate)) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ) AS next_yr
            FROM orders
          )
        )
        GROUP BY o_orderpriority, fill_year
    """,
    "nested_documents": """
        SELECT o_custkey,
               sort_array(collect_list(struct(o_orderdate, o_orderkey, o_orderpriority))) AS rels
        FROM orders GROUP BY o_custkey
    """,
    "exact_dedup": """
        SELECT md5(lower(trim(regexp_replace(text, '\\\\s+', ' ')))) AS fp,
               COUNT(*) AS dup_count
        FROM documents GROUP BY 1 HAVING COUNT(*) > 1
    """,
    "tumbling_windows": """
        SELECT window(ts, '1 hour').start AS window_start, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    """,
}
