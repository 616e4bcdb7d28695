"""Thread-scaling harness: run representative queries at increasing
local parallelism and report speedup / parallel efficiency.

    python tools/scaling.py [sf_dir] [--threads 4,8,16,32]

Each thread count gets a FRESH SparkSession (local[N], shuffle
partitions = N — the same sizing rule session.py applies), each query
runs twice and keeps the min (one warm-up for codegen). Output: one
JSON line per thread count plus a speedup table vs the smallest N.

This is the local stand-in for executor-count scaling on a cluster:
a query whose wall-clock refuses to drop with N is serialized
somewhere (single-partition window, driver loop, unsplittable Python
group) — exactly what the plan-discipline tests guard against.
"""

from __future__ import annotations

import json
import os
import sys
import time

QUERIES = [
    "a1_pricing_summary",   # scan + agg: should scale with cores
    "j1_star_join",         # broadcast star join
    "d2_minhash_lsh_pairs", # expression-heavy map + tiny shuffle
    "t2_quality_scores",    # pure per-row text expressions
    "e5_embedding_gram",    # Arrow partial-agg reduction
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    threads = [4, 8, 16, 32]
    for a in sys.argv[1:]:
        if a.startswith("--threads"):
            threads = [int(x) for x in a.split("=", 1)[1].split(",")]

    from dww_data_pipeline_spark.plans.registry import all_queries
    from dww_data_pipeline_spark.session import get_spark

    results: dict[int, dict[str, float]] = {}
    for n in threads:
        spark = get_spark(f"scaling-{n}", cpus=str(n))
        queries = all_queries()
        queries["a10_distinct"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # session warm-up
        timings: dict[str, float] = {}
        for name in QUERIES:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        results[n] = timings
        print(json.dumps({"threads": n, "queries": timings, "sf_dir": sf_dir}))
        spark.stop()

    base = threads[0]
    print(f"\nspeedup vs local[{base}] (ideal = N/{base}):")
    for name in QUERIES:
        row = " ".join(
            f"{n}t={results[base][name] / results[n][name]:.2f}x" for n in threads
        )
        print(f"  {name:28s} {row}")


if __name__ == "__main__":
    main()
