"""Profile the super-linear terms the --data-scaling study surfaced
(j15 ratio 5.65, pr1 5.36, d18 4.85 vs the linear ideal 4.0 at
64x/16x): count the INTERMEDIATE volumes that drive each query's
work at 16x and 64x, so the wall-clock ratio decomposes into
data-volume growth vs candidate/shuffle growth.

    python tools/profile_superlinear.py
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from dww_data_pipeline_spark.plans.pipeline_ext2 import (
        _J15_MAX_DEL_LEN,
    )
    from dww_data_pipeline_spark.session import get_spark
    from dww_data_pipeline_spark.sources.catalog import load_table

    spark = get_spark("profile-superlinear")
    out: list[dict] = []
    for m in (16, 64):
        sf_dir = f"/tmp/dww_scale_sf0.1_x{m}_cs"
        if not os.path.isdir(sf_dir):
            print(f"missing replica {sf_dir} — run scaling.py --data-scaling first")
            return

        # --- j15: FastSS deletion-variant bucket volume -------------
        c = load_table(spark, sf_dir, "customer").select("c_name")
        short = c.filter(F.length("c_name") <= _J15_MAX_DEL_LEN)
        del_keys = short.select(
            "c_name",
            F.explode(
                F.concat(
                    F.array(F.col("c_name")),
                    F.expr(
                        "transform(sequence(1, length(c_name)), i -> "
                        "concat(substring(c_name, 1, i - 1), "
                        "substring(c_name, i + 1, length(c_name))))"
                    ),
                )
            ).alias("key"),
        ).distinct()
        t0 = time.perf_counter()
        n_variants = del_keys.count()
        buckets = del_keys.groupBy("key").agg(F.count(F.lit(1)).alias("b"))
        # candidate pairs BEFORE the levenshtein prune = sum b*(b-1)/2
        cand = buckets.agg(
            F.sum(F.col("b") * (F.col("b") - 1) / 2).alias("pairs"),
            F.max("b").alias("max_bucket"),
        ).collect()[0]
        out.append(
            {
                "q": "j15",
                "multiple": m,
                "n_variants": n_variants,
                "candidate_pairs": int(cand["pairs"]),
                "max_bucket": int(cand["max_bucket"]),
                "sec": round(time.perf_counter() - t0, 2),
            }
        )
        print(json.dumps(out[-1]), flush=True)

        # --- d18: LSH candidate volume vs exact-truth join volume ---
        from dww_data_pipeline_spark.plans.registry import all_queries

        qs = all_queries()
        t0 = time.perf_counter()
        n_cand = qs["d2_minhash_lsh_pairs"](spark, sf_dir).count()
        t_cand = round(time.perf_counter() - t0, 2)
        from dww_data_pipeline_spark.plans.text_exprs import spark_kgrams

        d = load_table(spark, sf_dir, "documents")
        sh = d.select(
            "doc_id", F.explode(spark_kgrams(F.col("text"), 3)).alias("s")
        ).distinct()
        t0 = time.perf_counter()
        inter = (
            sh.alias("a")
            .join(sh.alias("b"), "s")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .count()
        )
        t_truth = round(time.perf_counter() - t0, 2)
        out.append(
            {
                "q": "d18",
                "multiple": m,
                "lsh_candidates": n_cand,
                "lsh_sec": t_cand,
                "truth_join_rows": inter,
                "truth_sec": t_truth,
            }
        )
        print(json.dumps(out[-1]), flush=True)

        # --- pr1: edge volume (should be exactly linear) ------------
        from dww_data_pipeline_spark.plans.curation_plans import (
            supplier_transition_edges,
        )

        t0 = time.perf_counter()
        edges = supplier_transition_edges(spark, sf_dir)
        n_edges = edges.count()
        n_nodes = edges.select("src").union(edges.select("dst")).distinct().count()
        out.append(
            {
                "q": "pr1",
                "multiple": m,
                "n_edges": n_edges,
                "n_nodes": n_nodes,
                "edge_build_sec": round(time.perf_counter() - t0, 2),
            }
        )
        print(json.dumps(out[-1]), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
