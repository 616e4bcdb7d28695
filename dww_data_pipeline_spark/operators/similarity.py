"""Similarity search over embedding columns (north-star extension).

Two paths:

* ``brute_force_topk`` — exact cosine top-k: broadcast the query set,
  one JVM-side cosine per (row, query), per-query top-k via window.
  The baseline and the verifier. Scales linearly in corpus size ×
  queries (fine when |queries| is small — the common batch case).
* ``lsh_buckets`` / ``lsh_topk`` — random-hyperplane LSH: each vector
  hashed to a b-bit bucket by sign of dot with b fixed pseudo-random
  hyperplanes (deterministic seed). Top-k runs only within matching
  buckets (multi-probe over the query's bucket), turning the scan
  into a bucket-pruned lookup — the 100 TB path.

Hyperplanes are generated driver-side from a seeded RNG and shipped
as literal arrays (they are tiny: b × dim floats), so executors do
zero Python work.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dww_data_pipeline_spark.functions.vectors import cosine, dot


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` must have columns (query_id, vec_col). The query set
    is broadcast (small side), so the only wide operation is the
    per-query top-k window — partitioned by query id, never global.
    """
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    scored = corpus.select(F.col(id_col), F.col(vec_col)).join(F.broadcast(q)).select(
        query_id,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).astype("float64")


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Bucket id expression: sign-bit concatenation over hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, arr) >= 0, 1).otherwise(0)
        bucket = bucket + (bit.cast("long") * F.lit(1 << i).cast("long"))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    query_id: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    Recall improves with fewer bits (bigger buckets) or multi-probe;
    this implementation probes the exact bucket only — the unit tests
    measure recall against brute force rather than assuming it.
    """
    planes = _hyperplanes(dim, bits, seed)
    c = corpus.withColumn("_bucket", lsh_bucket_col(vec_col, planes))
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qv")
    ).withColumn("_bucket", lsh_bucket_col("_qv", planes))
    scored = c.join(F.broadcast(q), "_bucket").select(
        query_id,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
