"""Round-12 root-cause experiment for the r07->r11 raw-slowdown cluster.

The r11 verdict found ten untouched queries running >2x their r07
recorded raw times at near-identical 2-point drift (r07 1.115, r11
1.092), with the whole 159-query common set at a 1.51x median.  Prime
suspect per the verdict: the 16 g driver-heap measurement-chain change
(git 0ff213e).  This script runs the cluster in a FRESH session,
min-of-5, at sf0.1, under whatever SPARK_GRAFT_DRIVER_MEM is set
(default 8g = the r07 setting), and prints one JSON line per run so
two invocations (8g vs 16g) bisect the heap hypothesis:

  SPARK_GRAFT_DRIVER_MEM=8g  python tools/r12_slowdown_bisect.py
  SPARK_GRAFT_DRIVER_MEM=16g python tools/r12_slowdown_bisect.py

Interpretation matrix (written into SCALE.md after the runs):
  8g ~= 16g ~= r11 numbers  -> box/environment shift; fix = per-shape
                                calibration panel (bench.py), cause
                                documented, weak marks explained.
  8g ~= r07, 16g ~= r11     -> heap regime is the cause; fix = pin the
                                bench chain at 8g, 16g only for the
                                SCALE fixture that needs it (d28 64x).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

CLUSTER = [
    "m4_audio_features",
    "e9_power_iteration_pc1",
    "d12_dedup_report",
    "st8_stream_static_enrich",
    "e7_kmeans_clusters",
    "d15_semantic_dedup",
    "t19_bigram_lm_score",
    "t20_contamination_share",
    "d6b_components_star",
    "t22_ngram_novelty",
]

# r07 / r11 recorded raw mins (BENCH_LOCAL artifacts) for side-by-side.
RECORDED = {
    "m4_audio_features": (0.478, 2.258),
    "e9_power_iteration_pc1": (0.887, 2.812),
    "d12_dedup_report": (0.957, 2.661),
    "st8_stream_static_enrich": (0.386, 1.073),
    "e7_kmeans_clusters": (0.646, 1.657),
    "d15_semantic_dedup": (0.631, 1.574),
    "t19_bigram_lm_score": (1.219, 3.035),
    "t20_contamination_share": (1.053, 2.604),
    "d6b_components_star": (2.272, 4.630),
    "t22_ngram_novelty": (1.398, 2.818),
}


def main() -> None:
    from dww_data_pipeline_spark.plans.registry import all_queries
    from dww_data_pipeline_spark.session import get_spark

    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(f"bisect-{heap}")
    queries = all_queries()
    # same warm-up bench.py uses
    queries["a10_distinct"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in CLUSTER:
        q = queries[name]
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        r07, r11 = RECORDED[name]
        print(
            f"  {name:28s} now={best:7.3f}  r07={r07}  r11={r11}",
            file=sys.stderr,
        )

    print(json.dumps({"heap": heap, "sf_dir": SF_DIR, "timings": timings}))


if __name__ == "__main__":
    main()
