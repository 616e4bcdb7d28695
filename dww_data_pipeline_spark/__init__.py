"""dww_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference system ``Mystfit/dww-data-pipeline``
(a VFX workforce-analytics ETL + query pipeline), built Spark-first:

* every operator is a pure ``DataFrame -> DataFrame`` function,
* all hot-path logic is built-in Column expressions (JVM-side,
  whole-stage-codegen'd) — Pandas UDFs only where built-ins cannot
  express the semantics (exact SequenceMatcher fuzzy parity,
  multimodal decode stubs),
* Catalyst supplies the optimizer (predicate pushdown, column
  pruning, join selection); we supply broadcast hints for dimension
  joins and partitioning discipline for 100 TB scale.

Layout
------
``session``     SparkSession factory tuned for local[32] testing but
                configured with cluster-scale defaults (AQE, skew join).
``sources``     Table catalog over parquet test data + CSV/JSON readers.
``functions``   Column-expression library (credit-note parsing, fuzzy
                ratio, dates, geo, text analysis, vector math).
``operators``   Relational + sequence operators (jumps, density,
                dedup, similarity search, document assembly).
``plans``       The query surface: named queries over the test tables,
                each paired with a DuckDB oracle SQL string.
``streaming``   Structured Streaming surface over the events table.
"""

from dww_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
