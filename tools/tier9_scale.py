"""Round-9 new-tier data-scaling measurement: time the round-9
queries (d26 suffix-array spans, s19 staleness gate, the rewired t25,
the extended c1) at 1x and 16x content-shifted data, fixed local[32],
min-of-2 — the recurring evidence row for SCALE.md's round-9 section
(same protocol as the round-8 new-tier table).

    python tools/tier9_scale.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

QUERIES = [
    "d26_suffix_array_spans",
    "d27_exactsubstr_scrub",
    "s19_index_staleness_gate",
    "t25_tokenizer_fertility",
    "c1_curation_pipeline",
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.scaling import build_replica

    from dww_data_pipeline_spark.plans.registry import all_queries
    from dww_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    dirs = {1: sf_dir, 16: build_replica(sf_dir, 16, content_shift=True)}
    spark = get_spark("tier9-scale", cpus="32")
    queries = all_queries()
    queries["a10_distinct"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()  # warm-up
    for name in QUERIES:
        rec = {}
        for m, d in dirs.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                queries[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            rec[m] = round(best, 3)
        print(
            json.dumps(
                {
                    "query": name,
                    "t1x": rec[1],
                    "t16x": rec[16],
                    "ratio": round(rec[16] / rec[1], 3),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
