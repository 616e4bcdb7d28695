"""Round-12 data-scaling chain (round-11 verdict asks #4, #5, #8):

  1. TIER — the remaining iterative/superlinear-risk queries without
     measured 16x/64x shapes (pr1 pagerank, d6b components-star, e7
     kmeans, t33 bpe-train) plus the two round-12 additions (st20,
     s25), at 1x/16x/64x content-shifted replicas, min-of-2, fixed
     local[32] — SCALE_r12.json, same protocol as rounds 8-11.

  2. S23 CANDIDATE STUDY — per-round candidate accounting for
     NN-Descent (the r11 verdict's one above-ideal row: 73.3x at 64x
     vs ideal 64): init edges, forward+reverse general-neighborhood
     rows, two-hop candidate rows, distinct candidates, final edges —
     at each multiple, so the 73x either becomes "candidates grow
     superlinearly via reverse-degree inflation" (then cap with the
     paper's sample-rate) or "candidates scale linearly; the 73x is
     shuffle-constant noise".

  3. D28 STAGE ATTRIBUTION — candidate counts (pre-length-filter
     pair rows, post-length, post-positional) and wall-clock split
     candidate-gen vs verify at each multiple (min-of-1 — this is
     attribution, not a headline), extending the sf0.1 candidate
     table (dedup_plans.py ppjoin_exact comments) to 16x/64x.

Run serialized, nothing else on the box, with the 16 g driver heap
the 64x d28 sort-merge needs:

    SPARK_GRAFT_DRIVER_MEM=16g python tools/tier12_scale.py \
        /root/testdata/sf0.1 SCALE_r12.json
"""

from __future__ import annotations

import json
import os
import sys
import time

TIER = [
    "pr1_supplier_pagerank",
    "d6b_components_star",
    "e7_kmeans_clusters",
    "t33_bpe_train",
    "st20_stream_ann_drift",
    "s25_clustered_recall_gate",
    "t40_sequence_packing",
]

MULTIPLES = [1, 16, 64]


def s23_candidate_counts(spark, sf_dir: str) -> list[dict]:
    """Reproduce nn_descent_edges' per-round candidate flow and count
    every stage (the sets the paper's O(N k^2) bound speaks about)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dww_data_pipeline_spark.operators.similarity import bucket_knn_arrow
    from dww_data_pipeline_spark.plans.dedup_plans import (
        _S23_K,
        _S23_ROUNDS,
        _S23_STRIDES,
        _spark_cos,
        _spark_lsh_bucket,
    )
    from dww_data_pipeline_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _spark_lsh_bucket("embedding").alias("bucket")
    )
    vecs = e.select("vec_id", "embedding")
    n = vecs.count()
    ring = (
        vecs.select(
            F.col("vec_id").alias("src"),
            F.explode(
                F.array(*[(F.col("vec_id") + s) % n for s in _S23_STRIDES])
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .join(vecs.select(F.col("vec_id").alias("dst")), "dst")
        .select("src", "dst")
    )
    init = (
        bucket_knn_arrow(e, "vec_id", "embedding", "bucket", k=_S23_K)
        .select("src", "dst")
        .union(ring)
        .distinct()
    )
    a_v = vecs.select(F.col("vec_id").alias("src"), F.col("embedding").alias("_sv"))
    b_v = vecs.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("_dv"))
    w = Window.partitionBy("src").orderBy(F.desc("cos"), "dst")

    def topk(cand):
        return (
            cand.join(a_v, "src")
            .join(b_v, "dst")
            .select(
                "src", "dst",
                F.round(_spark_cos(F.col("_sv"), F.col("_dv")), 6).alias("cos"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _S23_K)
            .select("src", "dst", "cos")
            .localCheckpoint()
        )

    rows = []
    edges = topk(init)
    rows.append({"round": 0, "n": n, "init_rows": init.count(),
                 "edges": edges.count()})
    wrev = Window.partitionBy("dst").orderBy(F.desc("cos"), "src")
    for r in range(1, _S23_ROUNDS + 1):
        # mirrors nn_descent_edges including the r12 reverse cap
        rev = (
            edges.withColumn("rrn", F.row_number().over(wrev))
            .filter(F.col("rrn") <= _S23_K)
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        gen = edges.select("src", "dst").union(rev)
        twohop = (
            gen.alias("a")
            .join(gen.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        cand = edges.select("src", "dst").union(twohop).distinct()
        gen_rows = gen.count()
        twohop_rows = twohop.count()
        cand_rows = cand.count()
        edges = topk(cand)
        rows.append({
            "round": r, "gen_rows": gen_rows, "twohop_rows": twohop_rows,
            "cand_distinct": cand_rows, "edges": edges.count(),
        })
    return rows


def d28_stage_study(spark, sf_dir: str) -> dict:
    """Candidate counts + candidate-gen vs verify wall split for the
    PPJoin pipeline (stages mirror ppjoin_exact; counts force each
    stage, so timings are stage-inclusive scan-to-count)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dww_data_pipeline_spark.plans.text_exprs import exploded_kgrams
    from dww_data_pipeline_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    sh = (
        exploded_kgrams(d.select("doc_id", "text"), "text", 3,
                        carry=("doc_id",), out="s")
        .select("doc_id", "s")
        .distinct()
    )
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "s")
    ranked = (
        sh.join(dfreq.hint("merge"), "s")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("rn") <= F.floor(F.col("n") / 2) + 1
    ).select("doc_id", "s", "rn", "n")

    t0 = time.perf_counter()
    pairs = (
        prefix.select(F.col("doc_id").alias("id_a"), "s",
                      F.col("rn").alias("_ra"), F.col("n").alias("na"))
        .join(
            prefix.select(F.col("doc_id").alias("id_b"), "s",
                          F.col("rn").alias("_rb"), F.col("n").alias("nb"))
            .hint("merge"),
            "s",
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
    pre_length = pairs.count()
    post_length = pairs.filter(
        F.greatest("na", "nb") <= 2 * F.least("na", "nb")
    ).count()
    cand = (
        pairs.filter(F.greatest("na", "nb") <= 2 * F.least("na", "nb"))
        .withColumn(
            "_ub",
            F.least("_ra", "_rb")
            + F.least(F.col("na") - F.col("_ra"), F.col("nb") - F.col("_rb")),
        )
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.min("_ub").alias("_min_ub"))
        .filter(3 * F.col("_min_ub") >= F.col("na") + F.col("nb"))
        .select("id_a", "id_b", "na", "nb")
    )
    cand = cand.localCheckpoint()  # materialize: split gen from verify
    post_positional = cand.count()
    t_cand = time.perf_counter() - t0

    t0 = time.perf_counter()
    a_sh = sh.select(F.col("doc_id").alias("id_a"), "s")
    b_sh = sh.select(F.col("doc_id").alias("id_b"), "s")
    survivors = (
        cand.join(a_sh.hint("merge"), "id_a")
        .join(b_sh.hint("merge"), ["id_b", "s"])
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("ni"))
        .filter(3 * F.col("ni") >= F.col("na") + F.col("nb"))
        .count()
    )
    t_verify = time.perf_counter() - t0
    return {
        "pre_length_pairs": pre_length,
        "post_length_pairs": post_length,
        "post_positional_candidates": post_positional,
        "survivors": survivors,
        "t_candidate_gen": round(t_cand, 3),
        "t_verify": round(t_verify, 3),
    }


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from tools.scaling import build_replica

    from dww_data_pipeline_spark.plans.registry import all_queries
    from dww_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_r12.json"
    dirs = {}
    for m in MULTIPLES:
        dirs[m] = sf_dir if m == 1 else build_replica(
            sf_dir, m, content_shift=True
        )
        print(f"# {m}x -> {dirs[m]}", flush=True)
    spark = get_spark("tier12-scale", cpus="32")
    queries = all_queries()
    queries["a10_distinct"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict = {"tier": {}, "s23_candidates": {}, "d28_stages": {},
                 "s23_candidates_capped": {}}
    if os.path.exists(out_path):
        # resume: keep rows already measured this round (the chain is
        # re-entrant after a mid-run fix — e.g. the s25 probe rework)
        with open(out_path) as f:
            prior = json.load(f)
        for k in out:
            out[k].update(prior.get(k, {}))
    for name in TIER:
        if name in out["tier"]:
            print(json.dumps({"query": name, "skip": "already measured"}),
                  flush=True)
            continue
        rec: dict[str, float] = {}
        for m in MULTIPLES:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                queries[name](spark, dirs[m]).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            rec[f"t{m}x"] = round(best, 3)
            print(json.dumps({"query": name, "multiple": m,
                              "sec": rec[f"t{m}x"]}), flush=True)
        for m in MULTIPLES[1:]:
            rec[f"ratio_{m}x"] = round(rec[f"t{m}x"] / rec["t1x"], 3)
        rec["ratio"] = rec[f"ratio_{MULTIPLES[-1]}x"]
        rec["ideal"] = float(MULTIPLES[-1])
        out["tier"][name] = rec
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)

    for m in MULTIPLES:
        key = (
            "s23_candidates_capped"
            if f"{m}x" in out["s23_candidates"]
            else "s23_candidates"
        )
        if f"{m}x" in out[key]:
            continue
        rows = s23_candidate_counts(spark, dirs[m])
        out[key][f"{m}x"] = rows
        print(json.dumps({key: m, "rows": rows}), flush=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)

    for m in MULTIPLES:
        if f"{m}x" in out["d28_stages"]:
            continue
        rec = d28_stage_study(spark, dirs[m])
        out["d28_stages"][f"{m}x"] = rec
        print(json.dumps({"d28_stages": m, **rec}), flush=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)

    spark.stop()
    print(f"# wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
