"""Prototype study for the r13 serving-scale clustered recall gate.

The r12 verdict (#4): s25 proved the graph-ANN paradigm's recall claim
on a <= 2048-vector PROBE of the deterministic clustered corpus; the
production serving paths (s22 hierarchical descent, s24 NN-Descent
composition) have never had their recall measured on a clustered
corpus at full fixture scale.  This script measures, at sf0.01 /
sf0.1 (full fixture = 500 / 2000 vectors):

  A. s24 as-is  — nn_descent_edges final round, s21 walk (3 rounds)
  B. s24 + serving scaffold — final edges ∪ ring scaffold, 4 rounds
  C. bounded-window-init descent + scaffold — init kNN restricted to
     an in-bucket rank window (per-vector candidates <= 2W, linear in
     the bucket) instead of the quadratic per-bucket brute force,
     then the capped descent rounds, ∪ scaffold, 4 rounds
  D. s22 as-is — hierarchical coarse descent over raw bucket-kNN

against exact top-5 truth over the FULL clustered corpus.  The
winner's design (and its measured recall) becomes s26's registered
gate; the losers' numbers go to SCALE.md's uniform-vs-clustered
serving table.

Run: python tools/s26_proto.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from dww_data_pipeline_spark.plans.dedup_plans import (
        _S23_STRIDES,
        _spark_cos,
        _spark_lsh_bucket,
        clustered_corpus,
        graph_ann_walk,
        nn_descent_edges,
    )
    from dww_data_pipeline_spark.session import get_spark

    spark = get_spark("s26-proto", cpus="32")
    qids = (0, 1, 2)
    K = 5

    def exact_truth(ec):
        vecs = ec.select("vec_id", "embedding")
        q = vecs.filter(F.col("vec_id").isin(*qids)).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
        return {
            (r["query_id"], r["vec_id"])
            for r in (
                vecs.crossJoin(F.broadcast(q))
                .select(
                    "query_id",
                    "vec_id",
                    F.round(
                        _spark_cos(F.col("embedding"), F.col("qv")), 6
                    ).alias("cos"),
                )
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= K)
                .collect()
            )
        }

    def recall(walk_df, truth):
        got = {
            (r["query_id"], r["vec_id"]) for r in walk_df.collect()
        }
        return len(got & truth) / len(truth)

    def ring_edges(vecs, n):
        return (
            vecs.select(
                F.col("vec_id").alias("src"),
                F.explode(
                    F.array(
                        *[(F.col("vec_id") + s) % n for s in _S23_STRIDES]
                    )
                ).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .join(vecs.select(F.col("vec_id").alias("dst")), "dst")
            .select("src", "dst")
        )

    def windowed_init_descent(e, n, W=8, k=3, rounds=2):
        """Variant C build: init kNN from an in-bucket vec_id-rank
        window (|ra - rb| <= W → per-vector candidates <= 2W) ∪ ring,
        then the s23 capped descent rounds."""
        vecs = e.select("vec_id", "embedding")
        wb = Window.partitionBy("bucket").orderBy("vec_id")
        ranked = e.withColumn("rb", F.row_number().over(wb))
        a = ranked.select(
            F.col("vec_id").alias("src"), F.col("embedding").alias("_sv"),
            "bucket", F.col("rb").alias("ra"),
        )
        b = ranked.select(
            F.col("vec_id").alias("dst"), F.col("embedding").alias("_dv"),
            "bucket", F.col("rb").alias("rb2"),
        )
        w = Window.partitionBy("src").orderBy(F.desc("cos"), "dst")
        init_knn = (
            a.join(b, "bucket")
            .filter(
                (F.col("src") != F.col("dst"))
                & (F.abs(F.col("ra") - F.col("rb2")) <= W)
            )
            .select(
                "src", "dst",
                F.round(_spark_cos(F.col("_sv"), F.col("_dv")), 6).alias("cos"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("src", "dst")
        )
        init = init_knn.union(ring_edges(vecs, n)).distinct()
        a_v = vecs.select(F.col("vec_id").alias("src"), F.col("embedding").alias("_sv"))
        b_v = vecs.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("_dv"))

        def topk(cand):
            return (
                cand.join(a_v, "src")
                .join(b_v, "dst")
                .select(
                    "src", "dst",
                    F.round(_spark_cos(F.col("_sv"), F.col("_dv")), 6).alias("cos"),
                )
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k)
                .select("src", "dst", "cos")
                .localCheckpoint()
            )

        edges = topk(init)
        wrev = Window.partitionBy("dst").orderBy(F.desc("cos"), "src")
        for _ in range(rounds):
            rev = (
                edges.withColumn("rrn", F.row_number().over(wrev))
                .filter(F.col("rrn") <= k)
                .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            gen = edges.select("src", "dst").union(rev)
            twohop = (
                gen.alias("x")
                .join(gen.alias("y"), F.col("x.dst") == F.col("y.src"))
                .select(F.col("x.src").alias("src"), F.col("y.dst").alias("dst"))
                .filter(F.col("src") != F.col("dst"))
            )
            edges = topk(edges.select("src", "dst").union(twohop).distinct())
        return edges.select("src", "dst")

    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        ec = (
            clustered_corpus(spark, sf_dir)
            .withColumn("bucket", _spark_lsh_bucket("embedding"))
            .localCheckpoint()
        )
        n = ec.count()
        truth = exact_truth(ec)
        print(f"== {sf_dir} n={n}", flush=True)

        t0 = time.perf_counter()
        prod = nn_descent_edges(ec)[-1][1].select("src", "dst").localCheckpoint()
        t_build = time.perf_counter() - t0
        wA = graph_ann_walk(ec, prod, qids, rounds=3).select("query_id", "vec_id")
        print(f"A s24-as-is: recall={recall(wA, truth):.2f} build={t_build:.1f}s", flush=True)

        scaffold = ring_edges(ec.select("vec_id", "embedding"), n)
        servB = prod.union(scaffold).distinct().localCheckpoint()
        wB = graph_ann_walk(ec, servB, qids, rounds=4).select("query_id", "vec_id")
        print(f"B s24+scaffold 4r: recall={recall(wB, truth):.2f}", flush=True)

        t0 = time.perf_counter()
        bounded = windowed_init_descent(ec, n).localCheckpoint()
        t_build_c = time.perf_counter() - t0
        servC = bounded.union(scaffold).distinct().localCheckpoint()
        wC = graph_ann_walk(ec, servC, qids, rounds=4).select("query_id", "vec_id")
        print(
            f"C windowed-init+scaffold 4r: recall={recall(wC, truth):.2f} "
            f"build={t_build_c:.1f}s",
            flush=True,
        )

        # D: s22 as-is on the clustered corpus (coarse layer = every
        # 16th vec_id, raw bucket-kNN edges both layers)
        from dww_data_pipeline_spark.operators.similarity import (
            bucket_knn_arrow,
        )

        base_knn = bucket_knn_arrow(ec, "vec_id", "embedding", "bucket", k=3).select("src", "dst")
        ce = ec.filter(F.col("vec_id") % 16 == 0)
        coarse_knn = bucket_knn_arrow(ce, "vec_id", "embedding", "bucket", k=3).select("src", "dst")
        coarse_entry = ce.agg(F.min("vec_id").alias("vec_id"))
        seeds = (
            ec.filter(F.col("vec_id").isin(*qids))
            .select(F.col("vec_id").alias("query_id"))
            .crossJoin(F.broadcast(coarse_entry))
        )
        coarse = graph_ann_walk(
            ec, coarse_knn, qids, seeds=seeds, rounds=2, beam_width=4, k=1
        )
        wD = graph_ann_walk(
            ec, base_knn, qids, seeds=coarse.select("query_id", "vec_id")
        ).select("query_id", "vec_id")
        print(f"D s22-as-is: recall={recall(wD, truth):.2f}", flush=True)


if __name__ == "__main__":
    main()
