"""Persisted IVF index — the production ANN serving path.

``operators.similarity.ivf_topk`` trains its coarse quantizer per
query call; a real deployment trains ONCE, lays the corpus out as a
cluster-partitioned vector lake, and serves every query from the
persisted artifact. This module is that path:

* ``build_ivf_index``: train the quantizer on a bounded driver-side
  sample, assign every vector JVM-side (centroid literals folded into
  the plan), and write

      <dir>/centroids/            k rows: (list_id, centroid)
      <dir>/vectors/list_id=K/    the corpus, partitioned by list

  The partitioned layout is the point: probing n lists becomes a
  PARTITION-PRUNED scan — at 100 TB a 2-probe query reads 2/k of the
  corpus bytes, enforced by the storage layout rather than a runtime
  filter.

* ``ivf_index_topk``: read the k centroid rows (bounded), fold them
  back to plan-time literals for query assignment, restrict the
  vector lake to the probed partitions with a LITERAL IN filter (so
  the parquet source prunes partitions — asserted in tests), and
  score per-list exactly like the in-memory path.

Index build is one corpus scan + one partitioned write; queries touch
only probed partitions. Rebuilds go through a fresh directory +
atomic swap (see sources.maintenance for the rename discipline).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dww_data_pipeline_spark.functions.vectors import cosine
from dww_data_pipeline_spark.operators.similarity import (
    _centroid_probe_col,
    _kmeans_centroids,
    _nearest_centroid_col,
    _topk,
)


def build_ivf_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    out_dir: str,
    n_lists: int = 16,
    sample_size: int = 2000,
    seed: int = 42,
) -> int:
    """Train + assign + persist. Returns the number of lists written."""
    sample = np.array(
        [r[0] for r in corpus.select(vec_col).limit(sample_size).collect()],
        dtype="float64",
    )
    centroids = _kmeans_centroids(sample, k=n_lists, seed=seed)
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(int(j), [float(x) for x in c]) for j, c in enumerate(centroids)],
        "list_id int, centroid array<double>",
    )
    cent_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "centroids")
    )
    assigned = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        _nearest_centroid_col(vec_col, centroids).alias("list_id"),
    )
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(
        os.path.join(out_dir, "vectors")
    )
    return len(centroids)


def ivf_index_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 1,
    query_id: str = "query_id",
) -> DataFrame:
    """Approximate top-k served from the persisted index.

    The probed list ids are collected up front (bounded by n_lists)
    and pushed as a LITERAL IN filter so the parquet source prunes
    non-probed partitions — the scan is nprobe/n_lists of the lake
    by layout, not by luck.
    """
    cent_rows = sorted(
        spark.read.parquet(os.path.join(index_dir, "centroids")).collect(),
        key=lambda r: r["list_id"],
    )
    if not cent_rows:
        raise ValueError(f"empty centroid table under {index_dir}")
    centroids = np.array([r["centroid"] for r in cent_rows], dtype="float64")
    if not 1 <= nprobe <= len(centroids):
        raise ValueError(f"nprobe must be in [1, {len(centroids)}], got {nprobe}")

    q_assigned = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qv")
    ).withColumn("_list", F.explode(_centroid_probe_col("_qv", centroids, nprobe)))
    # bounded collect: at most n_lists distinct probed ids
    probed = sorted(
        r["_list"] for r in q_assigned.select("_list").distinct().collect()
    )
    vectors = spark.read.parquet(os.path.join(index_dir, "vectors")).filter(
        F.col("list_id").isin(probed)
    )
    pairs = vectors.withColumnRenamed("list_id", "_list").join(
        F.broadcast(q_assigned), "_list"
    )
    scored = pairs.select(
        query_id,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("cos"),
    )
    return _topk(scored, query_id, id_col, k)
