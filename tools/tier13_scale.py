"""Round-13 data-scaling chain (round-12 verdict asks #2, #4, #9):

  1. TIER — wall at 1x/16x/64x (min-of-2, content-shifted replicas,
     fixed local[32]) for the round's re-measure set: s24 (composes
     the now-capped s23 — its prior 64x row predates the cap, verdict
     #9), d28 (the suffix-filter rewrite, verdict #2), and the two
     new r13 queries' batch shapes where applicable.

  2. D28 STAGE ATTRIBUTION v3 — extends r12's candidate-gen/verify
     split with the round-13 suffix filter: post-positional
     candidates, post-suffix survivors (the measured pruning rate),
     and the wall split candidate-gen / suffix-filter / array-verify
     at each multiple.  Done-criterion: bit-identical survivors
     (diffchecked separately), candidate reduction + verify wall
     recorded here.

  3. S26 SERVING TABLE — the serving-scale clustered recall gate at
     1x/16x (verdict #4): wall + per-query recall of the registered
     serving index (refined ∪ scaffold) on the full-fixture clustered
     corpus, plus the as-shipped s24 graph's recall on the same
     corpus (the negative control the gate exists to fix).  64x is
     intentionally SKIPPED and logged: the production bucket-kNN init
     is per-bucket brute force, and on a clustered corpus the LSH
     buckets align with the 8 planted clusters, so the init is
     Σ bucket² ~ quadratic in cluster size (measured 255 s at 16x for
     the s25 first attempt; ~4 B cos pairs at 64x).  The published
     build-side fix is incremental/partitioned insertion — named in
     SCALE.md as the frontier, not silently truncated.

Run serialized, nothing else on the box, 16 g driver heap (the 64x
d28 fixture needs it):

    SPARK_GRAFT_DRIVER_MEM=16g python tools/tier13_scale.py \
        /root/testdata/sf0.1 SCALE_r13.json
"""

from __future__ import annotations

import json
import os
import sys
import time

TIER = [
    "s24_graph_ann_refined",
    "d28_ppjoin_exact",
    "s26_serving_clustered_recall",  # 1x/16x only (see module doc)
]

MULTIPLES = [1, 16, 64]
S26_MULTIPLES = [1, 16]


def d28_stage_study(spark, sf_dir: str) -> dict:
    """Candidate counts + wall split for the r13 PPJoin pipeline:
    candidate-gen (prefix join + length + positional), suffix filter
    (hash-partition min-count bound), array-intersect verify.  Counts
    force each stage, so timings are stage-inclusive scan-to-count."""
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
    cand = (
        prefix.select(F.col("doc_id").alias("id_a"), "s",
                      F.col("rn").alias("_ra"), F.col("n").alias("na"))
        .join(
            prefix.select(F.col("doc_id").alias("id_b"), "s",
                          F.col("rn").alias("_rb"), F.col("n").alias("nb"))
            .hint("merge"),
            "s",
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.greatest("na", "nb") <= 2 * F.least("na", "nb"))
        )
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
    cand = cand.localCheckpoint()  # materialize: split gen from filter
    post_positional = cand.count()
    t_cand = time.perf_counter() - t0

    # suffix filter (mirrors ppjoin_exact's r13 stage)
    t0 = time.perf_counter()
    _K = 64
    hists = (
        sh.withColumn("_b", F.pmod(F.xxhash64("s"), F.lit(_K)))
        .groupBy("doc_id")
        .agg(
            F.array(
                *[
                    F.sum(
                        F.when(F.col("_b") == i, F.lit(1)).otherwise(F.lit(0))
                    ).cast("int")
                    for i in range(_K)
                ]
            ).alias("hist")
        )
    )
    _bound = F.aggregate(
        F.zip_with("_ha", "_hb", lambda x, y: F.least(x, y)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    pruned = (
        cand.join(
            hists.select(F.col("doc_id").alias("id_a"),
                         F.col("hist").alias("_ha")).hint("merge"),
            "id_a",
        )
        .join(
            hists.select(F.col("doc_id").alias("id_b"),
                         F.col("hist").alias("_hb")).hint("merge"),
            "id_b",
        )
        .filter(3 * _bound >= F.col("na") + F.col("nb"))
        .select("id_a", "id_b", "na", "nb")
    )
    pruned = pruned.localCheckpoint()  # materialize: split filter from verify
    post_suffix = pruned.count()
    t_suffix = time.perf_counter() - t0

    t0 = time.perf_counter()
    arrs = sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("s")).alias("sha")
    )
    survivors = (
        pruned.join(
            arrs.select(F.col("doc_id").alias("id_a"),
                        F.col("sha").alias("_sa")).hint("merge"),
            "id_a",
        )
        .join(
            arrs.select(F.col("doc_id").alias("id_b"),
                        F.col("sha").alias("_sb")).hint("merge"),
            "id_b",
        )
        .select(
            "id_a", "id_b", "na", "nb",
            F.size(F.array_intersect("_sa", "_sb")).alias("ni"),
        )
        .filter(3 * F.col("ni") >= F.col("na") + F.col("nb"))
        .count()
    )
    t_verify = time.perf_counter() - t0
    return {
        "post_positional_candidates": post_positional,
        "post_suffix_candidates": post_suffix,
        "suffix_prune_pct": round(
            100.0 * (1 - post_suffix / max(post_positional, 1)), 2
        ),
        "survivors": survivors,
        "t_candidate_gen": round(t_cand, 3),
        "t_suffix_filter": round(t_suffix, 3),
        "t_verify": round(t_verify, 3),
    }


def s26_serving_study(spark, sf_dir: str) -> dict:
    """Serving-scale clustered recall at one multiple: the registered
    s26 gate's wall + rows, plus the as-shipped s24 graph's recall on
    the same clustered corpus (negative control)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dww_data_pipeline_spark.plans.dedup_plans import (
        _S26_QIDS,
        _S26_ROUNDS,
        _spark_cos,
        _spark_lsh_bucket,
        clustered_corpus,
        graph_ann_walk,
        nn_descent_edges,
        s26_serving_clustered_recall,
    )

    t0 = time.perf_counter()
    rows = s26_serving_clustered_recall(spark, sf_dir).collect()
    t_gate = time.perf_counter() - t0
    gate = {
        "recall_overall": rows[0]["recall_overall"] if rows else None,
        "gate_pass": bool(rows and all(r["gate_pass"] for r in rows)),
        "t_sec": round(t_gate, 3),
    }

    # negative control: as-shipped refined graph, no scaffold union
    ec = clustered_corpus(spark, sf_dir).withColumn(
        "bucket", _spark_lsh_bucket("embedding")
    )
    refined = nn_descent_edges(ec)[-1][1].select("src", "dst")
    walk = graph_ann_walk(ec, refined, _S26_QIDS, rounds=_S26_ROUNDS).select(
        "query_id", "vec_id"
    )
    q = ec.filter(F.col("vec_id").isin(*_S26_QIDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    truth = (
        ec.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "vec_id",
            F.round(_spark_cos(F.col("embedding"), F.col("qv")), 6).alias(
                "cos"
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "vec_id")
    )
    hits = truth.join(walk, ["query_id", "vec_id"], "left_semi").count()
    gate["as_shipped_recall"] = round(hits / 15.0, 3)
    return gate


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
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_r13.json"
    dirs = {}
    for m in MULTIPLES:
        dirs[m] = sf_dir if m == 1 else build_replica(
            sf_dir, m, content_shift=True
        )
        print(f"# {m}x -> {dirs[m]}", flush=True)
    spark = get_spark("tier13-scale", cpus="32")
    queries = all_queries()
    queries["a10_distinct"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict = {"tier": {}, "d28_stages_v3": {}, "s26_serving": {}}
    if os.path.exists(out_path):
        # resume: keep rows already measured this round
        with open(out_path) as f:
            prior = json.load(f)
        for k in out:
            out[k].update(prior.get(k, {}))

    def save() -> None:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)

    for name in TIER:
        if name in out["tier"]:
            print(json.dumps({"query": name, "skip": "already measured"}),
                  flush=True)
            continue
        multiples = S26_MULTIPLES if name.startswith("s26") else MULTIPLES
        rec: dict[str, float] = {}
        for m in multiples:
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
        for m in multiples[1:]:
            rec[f"ratio_{m}x"] = round(rec[f"t{m}x"] / rec["t1x"], 3)
        rec["ratio"] = rec[f"ratio_{multiples[-1]}x"]
        rec["ideal"] = float(multiples[-1])
        if name.startswith("s26"):
            rec["skipped_64x"] = (
                "clustered bucket-kNN init is quadratic in cluster size "
                "(LSH buckets align with planted clusters); published fix "
                "= incremental insertion — see SCALE.md r13"
            )
        out["tier"][name] = rec
        save()

    for m in MULTIPLES:
        if f"{m}x" in out["d28_stages_v3"]:
            continue
        rec = d28_stage_study(spark, dirs[m])
        out["d28_stages_v3"][f"{m}x"] = rec
        print(json.dumps({"d28_stages_v3": m, **rec}), flush=True)
        save()

    for m in S26_MULTIPLES:
        if f"{m}x" in out["s26_serving"]:
            continue
        rec = s26_serving_study(spark, dirs[m])
        out["s26_serving"][f"{m}x"] = rec
        print(json.dumps({"s26_serving": m, **rec}), flush=True)
        save()

    spark.stop()
    print(f"# wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
