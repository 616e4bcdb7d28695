"""CSV / JSON dimension-file sources (reference S3/S4/S10).

The reference loads curated map files — companyMap/roleMap JSON with
a `maptype` tag (GetWeta.py:811-831, dwwApi.js:51-58) and
location/region CSVs with headers (utils/companyLocationCsvToJson.py:
27-55). These are small, schema-pinned dimension reads; inference is
allowed only here at the bronze edge (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

COMPANY_MAP_SCHEMA = T.StructType(
    [
        T.StructField("search", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("id", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
    ]
)

ROLE_MAP_SCHEMA = T.StructType(
    [
        T.StructField("raw_role", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)


CREDITS_SCHEMA = T.StructType(
    [
        T.StructField("person_id", T.StringType(), False),
        T.StructField("person_name", T.StringType(), True),
        T.StructField("movie_id", T.StringType(), False),
        T.StructField("notes", T.StringType(), True),
        T.StructField("release", T.StringType(), True),
        T.StructField("release_dates", T.ArrayType(T.StringType()), True),
    ]
)


def read_credits_json(spark: SparkSession, path: str) -> DataFrame:
    """S1 bronze ingest: pre-crawled credits as JSON lines with a
    PINNED schema (SURVEY §1.3: inference only at the bronze edge,
    and even there the schema is declared). One row per unparsed
    credit — the input to the F1/F9 parsing stage of pipeline.py
    (crawling itself is out of engine scope per SURVEY S1).

    Dropped malformed lines surface in the `_corrupt_record` policy:
    PERMISSIVE nulls them field-wise; use mode=FAILFAST upstream when
    ingest must be strict.
    """
    return spark.read.schema(CREDITS_SCHEMA).json(path)


def read_csv_dim(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    with_row_order: bool = False,
) -> DataFrame:
    """S3: header CSV dimension read (reference
    utils/companyLocationCsvToJson.py:27-55).

    ``with_row_order=True`` appends a ``_row_order`` long column
    reproducing file line order, so downstream map assembly can apply
    the reference's JS last-assignment-wins on duplicate keys
    (dwwApi.js:123). Dimension files are single-split by construction,
    where ``monotonically_increasing_id`` is exactly the line number;
    across splits it remains monotone in (split, line) order.
    """
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    if with_row_order:
        df = df.withColumn("_row_order", F.monotonically_increasing_id())
    return df


def read_map_json(
    spark: SparkSession,
    path: str,
    expected_maptype: str,
    schema: T.StructType,
) -> DataFrame:
    """S4: map-file JSON source with maptype validation (reference
    GetWeta.py:811-831 validates the tag before use).

    File shape: one JSON doc ``{"maptype": ..., "maps": {key: {...}}}``;
    returns the flattened maps as rows of ``schema`` (key column first).
    Raises ValueError on a maptype mismatch, like the reference's
    hard exit.
    """
    # pin the schema: inference would type `maps` as a struct keyed by
    # the (data-dependent) search strings instead of a map
    value_schema = T.StructType(schema.fields[1:])
    file_schema = T.StructType(
        [
            T.StructField("maptype", T.StringType()),
            T.StructField("maps", T.MapType(T.StringType(), value_schema)),
        ]
    )
    raw = spark.read.option("multiLine", True).schema(file_schema).json(path)
    tags = [r["maptype"] for r in raw.select("maptype").collect()]
    if tags and tags[0] != expected_maptype:
        raise ValueError(
            f"map file {path} has maptype {tags[0]!r}, expected {expected_maptype!r}"
        )
    key_col = schema.fields[0].name
    value_fields = [f.name for f in schema.fields[1:]]
    exploded = raw.select(F.explode("maps").alias(key_col, "entry"))
    cols = [F.col(key_col)] + [
        F.col(f"entry.{f}").cast(schema[f].dataType).alias(f) for f in value_fields
    ]
    return exploded.select(*cols)


#: Hard ceiling on rows a map-file sink will collect to the driver.
#: Dimension maps are small by construction (reference maps are ~32 KB);
#: anything larger indicates a fact table routed at the wrong sink and
#: would OOM the driver at scale — fail loudly instead.
MAP_JSON_MAX_ROWS = 100_000


def write_map_json(df: DataFrame, path: str, maptype: str, backup: bool = True) -> None:
    """S10: map-file sink — single JSON doc {maptype, maps} with a
    timestamped backup of any existing file before overwrite
    (reference GetWeta.py:507-512; backup behavior dwwRoutes.js:131-163).
    Dimension maps are small by construction; assembled driver-side
    like the reference, guarded by MAP_JSON_MAX_ROWS so a mis-routed
    fact table cannot silently collect to the driver."""
    import json
    import os
    import shutil
    import time

    # limit+1 collect: ONE job gives both the bounded guard and the
    # rows (a separate count probe would execute the upstream plan
    # twice, and a source changing between jobs could pass the probe
    # yet collect unboundedly)
    rows = df.limit(MAP_JSON_MAX_ROWS + 1).collect()
    if len(rows) > MAP_JSON_MAX_ROWS:
        raise ValueError(
            f"write_map_json: input exceeds {MAP_JSON_MAX_ROWS} rows — "
            "dimension maps are driver-side by design; route large tables "
            "to a distributed sink (parquet/CSV) instead"
        )

    if backup and os.path.exists(path):
        shutil.copy2(path, f"{path}.{int(time.time())}.bak")

    key_col = df.columns[0]
    maps = {row[key_col]: {c: row[c] for c in df.columns[1:]} for row in rows}
    with open(path, "w") as f:
        json.dump({"maptype": maptype, "maps": maps}, f, sort_keys=True)
