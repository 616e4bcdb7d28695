"""Table catalog over the parquet test tables.

The reference ingested via IMDb crawl + pickle cache + Neo4j REST
(reference ``GetWeta.py:56-115``, ``253-337``); the engine's sources
are columnar parquet scans so Catalyst gets predicate pushdown,
column pruning, and row-group skipping for free. At 100 TB the same
reader works over a partitioned data lake (directory-partitioned by
date/entity) — nothing here assumes local files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Every table the driver generates (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions safe to broadcast at any scale factor (they are
# bounded by the world, not by the fact-table scale: TPC-H nation=25,
# region=5 always; supplier/customer/part grow but stay tiny relative
# to lineitem/orders).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table from an sf directory."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events stores TIMESTAMP(NANOS), which the parquet reader
        # rejects without this flag; set it here (runtime-settable) so
        # the engine works under ANY caller's SparkSession, not just
        # ours (session.py also sets it at build time)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # ts is TIMESTAMP(NANOS) on disk, surfaced as long nanos via
        # spark.sql.legacy.parquet.nanosAsLong; truncate to micros with
        # integer division (double division would lose precision at
        # 1e18 nanos) — matches DuckDB's nanos→micros truncation.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Parquet TIMESTAMP(isAdjustedToUTC=false) surfaces as TIMESTAMP_NTZ
    # under Spark 4's default inference; normalize to session-local
    # TIMESTAMP so the whole expression surface (unix_micros, window(),
    # interval arithmetic) sees one timestamp flavor. The NTZ→TIMESTAMP
    # cast interprets wall-clock in the SESSION timezone, so pin it to
    # UTC here (runtime-settable, same rationale as nanosAsLong above):
    # under any caller's session the values then match DuckDB's
    # naive-timestamp arithmetic exactly.
    if any(isinstance(f.dataType, T.TimestampNTZType) for f in df.schema.fields):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast(T.TimestampType()))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view and return the dict of DataFrames.

    This makes the whole operator surface reachable from ``spark.sql``
    as well as the DataFrame API.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
