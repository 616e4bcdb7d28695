"""Prototype for s25_clustered_recall_gate: derive a deterministic
clustered embedding table from vec_id hash arithmetic, run the
s21 (flat entry) and s22 (hierarchical descent) walks over it, and
measure recall@5 vs brute force — parameter search before freezing
the registered gate's thresholds."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dww_data_pipeline_spark.plans.dedup_plans import (
    _S21_BEAM,
    _S21_K,
    _S21_ROUNDS,
    _S22_COARSE_BEAM,
    _S22_COARSE_MOD,
    _S22_COARSE_ROUNDS,
    _spark_cos,
    _spark_lsh_bucket,
    graph_ann_walk,
)
from dww_data_pipeline_spark.operators.similarity import bucket_knn_arrow
from dww_data_pipeline_spark.session import get_spark
from dww_data_pipeline_spark.sources.catalog import load_table

C = 8          # planted clusters
CMOD = 11      # cluster = (vec_id % CMOD) % C  (odd modulus so the
               # every-16th coarse layer spans all clusters)
JITTER = 401   # jitter range: ((vec_id*69069 + d*9973) % JITTER) - JITTER//2
QIDS = (0, 1, 2)


def clustered_vecs(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    cent = (
        f"(((CAST(vec_id % {CMOD} AS BIGINT) % {C}) * 73 + d * 151) "
        f"* 2654435761) % 2001 - 1000"
    )
    jit = f"((vec_id * 69069 + d * 9973) % {JITTER}) - {JITTER // 2}"
    return e.select(
        "vec_id",
        F.expr(
            f"transform(sequence(0, 63), d -> "
            f"CAST(({cent}) + ({jit}) AS DOUBLE))"
        ).alias("embedding"),
    )


def recall(walk_df, truth, nq=len(QIDS), k=_S21_K):
    got = {(r["query_id"], r["vec_id"]) for r in walk_df.collect()}
    hits = len(got & truth)
    return hits, hits / (nq * k)


def main():
    spark = get_spark("s25proto")
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.001"]:
        ec = clustered_vecs(spark, sf_dir).withColumn(
            "bucket", _spark_lsh_bucket("embedding")
        ).persist()
        n = ec.count()
        # bucket histogram — is LSH aligning with planted clusters?
        nb = ec.groupBy("bucket").count().count()
        edges = (
            bucket_knn_arrow(ec, "vec_id", "embedding", "bucket", k=3)
            .select("src", "dst")
            .localCheckpoint()
        )
        ce = ec.filter(F.col("vec_id") % _S22_COARSE_MOD == 0)
        cedges = (
            bucket_knn_arrow(ce, "vec_id", "embedding", "bucket", k=3)
            .select("src", "dst")
            .localCheckpoint()
        )
        # brute truth
        q = ec.filter(F.col("vec_id").isin(*QIDS)).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos"), "vec_id"
        )
        truth_df = (
            ec.crossJoin(F.broadcast(q))
            .select(
                "query_id",
                "vec_id",
                F.round(_spark_cos(F.col("embedding"), F.col("qv")), 6).alias(
                    "cos"
                ),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _S21_K)
        )
        truth = {(r["query_id"], r["vec_id"]) for r in truth_df.collect()}

        # flat s21-style walk (global MIN entry)
        flat = graph_ann_walk(ec, edges, QIDS)
        h_flat, r_flat = recall(flat, truth)

        # s22-style descent
        coarse_entry = ce.agg(F.min("vec_id").alias("vec_id"))
        cseeds = (
            q.select("query_id").crossJoin(F.broadcast(coarse_entry))
        )
        coarse = graph_ann_walk(
            ec, cedges, QIDS, seeds=cseeds,
            rounds=_S22_COARSE_ROUNDS, beam_width=_S22_COARSE_BEAM, k=1,
        )
        desc = graph_ann_walk(
            ec, edges, QIDS, seeds=coarse.select("query_id", "vec_id")
        )
        h_desc, r_desc = recall(desc, truth)
        print(
            f"{sf_dir}: n={n} buckets={nb} "
            f"flat={h_flat}/15 ({r_flat:.2f}) "
            f"descent={h_desc}/15 ({r_desc:.2f})"
        )
        ec.unpersist()


if __name__ == "__main__":
    main()
