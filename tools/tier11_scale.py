"""Round-11 new-tier data-scaling measurement: the round-10/11
operators the r10 verdict listed as unmeasured (st17) plus everything
whose plan changed or landed this round (d28 post-PPJoin-fix, s22,
c6, t25b), re-anchored against the already-measured r10 tier
(t37/t38/s21/st18) on the SAME session so the columns are comparable
— one JSON artifact, SCALE_r11.json, same protocol as the round-8/9/10
tables (content-shifted sf0.1 replicas, fixed local[32], min-of-2).

    python tools/tier11_scale.py [sf_dir] [out_path]
"""

from __future__ import annotations

import json
import os
import sys
import time

QUERIES = [
    "st17_stream_contamination_gate",
    "d28_ppjoin_exact",
    "s22_hnsw_descent",
    "s23_nn_descent",
    "s24_graph_ann_refined",
    "c6_tokenizer_lifecycle",
    "t25b_fertility_from_store",
    "t35b_encode_top_from_store",
    "st19_stream_tokenizer_oov",
    "t39_c4_line_rules",
    "t37_gopher_repetition",
    "t38_temperature_mixture",
    "s21_graph_ann_walk",
    "st18_stream_mixture_admission",
]

MULTIPLES = [1, 16, 64]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.scaling import build_replica

    from dww_data_pipeline_spark.plans.registry import all_queries
    from dww_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_r11.json"
    dirs = {}
    for m in MULTIPLES:
        dirs[m] = sf_dir if m == 1 else build_replica(sf_dir, m, content_shift=True)
        print(f"# {m}x -> {dirs[m]}", flush=True)
    spark = get_spark("tier11-scale", cpus="32")
    queries = all_queries()
    queries["a10_distinct"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()  # warm-up
    out: dict[str, dict] = {}
    for name in QUERIES:
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
            print(
                json.dumps({"query": name, "multiple": m, "sec": rec[f"t{m}x"]}),
                flush=True,
            )
        for m in MULTIPLES[1:]:
            rec[f"ratio_{m}x"] = round(rec[f"t{m}x"] / rec["t1x"], 3)
        rec["ratio"] = rec[f"ratio_{MULTIPLES[-1]}x"]
        rec["ideal"] = float(MULTIPLES[-1])
        out[name] = rec
    spark.stop()
    artifact = {
        "round": 11,
        "threads": 32,
        "multiples": MULTIPLES,
        "driver_mem": "16g",
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "queries": out,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"# wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
