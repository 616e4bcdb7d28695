"""j15 candidate-count disposition (round-9 verdict ask #6).

SCALE_r09 recorded j15 at 14.22x wall for 64x data (ideal 64) — the
largest ratio on the board — with the blocking story ("candidate
growth is data-linear") asserted, not measured.  This study measures
it: for each data multiple of the content-shifted sf0.1 replica
(the SAME fixture the scale artifact times), it reports the FastSS
blocking relation's actual size and shape —

  * n_names           distinct join-side strings
  * n_variant_rows    distinct (name, key) blocking pairs
  * n_buckets         distinct keys
  * max_bucket        largest bucket (names sharing one key)
  * cand_pairs        sum over buckets of size*(size-1)/2 — the exact
                      number of unordered candidate pairs the
                      equi-join generates before the levenshtein prune
  * hot_share         top bucket's share of cand_pairs
  * top10_share       top-10 buckets' share
  * n_result          final levenshtein<=1 pairs

If cand_pairs grows ~linearly with the multiple and hot_share stays
flat, the 64x wall ratio is shuffle/exchange cost, not candidate
blowup, and no salting is needed; a super-linear cand_pairs or a
hot bucket absorbing a constant fraction would demand salting.

    SPARK_GRAFT_DRIVER_MEM=16g python tools/j15_candidate_study.py \
        [sf_dir] [--multiples 1,16,64]

One JSON line per multiple; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling import build_replica  # noqa: E402


def study(sf_dir: str, multiples: list[int]) -> list[dict]:
    from pyspark.sql import functions as F

    from dww_data_pipeline_spark.plans.pipeline_ext2 import (
        _j15_variants,
        edit_distance_one_pairs,
    )
    from dww_data_pipeline_spark.session import get_spark
    from dww_data_pipeline_spark.sources.catalog import load_table

    dirs = {}
    for m in multiples:
        dirs[m] = (
            sf_dir if m == 1 else build_replica(sf_dir, m, content_shift=True)
        )
        print(f"# {m}x -> {dirs[m]}", flush=True)

    spark = get_spark("j15-candidate-study", cpus="32")
    rows = []
    for m in multiples:
        c = load_table(spark, dirs[m], "customer").select(
            F.col("c_name")
        ).distinct()
        variants = _j15_variants(c.select("c_name"))
        buckets = variants.groupBy("key").agg(F.count(F.lit(1)).alias("s"))
        pairs = F.col("s") * (F.col("s") - 1) / 2
        agg = buckets.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("s").alias("n_variant_rows"),
            F.max("s").alias("max_bucket"),
            F.sum(pairs).cast("long").alias("cand_pairs"),
        ).collect()[0]
        # top-10 buckets by pair volume: bounded collect
        top = (
            buckets.orderBy(F.desc("s")).limit(10).collect()
        )
        top_pairs = [r["s"] * (r["s"] - 1) // 2 for r in top]
        n_result = edit_distance_one_pairs(c, "c_name").count()
        rec = {
            "multiple": m,
            "n_names": c.count(),
            "n_variant_rows": int(agg["n_variant_rows"]),
            "n_buckets": int(agg["n_buckets"]),
            "max_bucket": int(agg["max_bucket"]),
            "cand_pairs": int(agg["cand_pairs"]),
            "hot_share": round(top_pairs[0] / max(agg["cand_pairs"], 1), 4),
            "top10_share": round(
                sum(top_pairs) / max(agg["cand_pairs"], 1), 4
            ),
            "n_result": n_result,
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    spark.stop()
    base = rows[0]
    for r in rows[1:]:
        m = r["multiple"]
        print(
            f"# {m}x growth: cand_pairs {r['cand_pairs'] / base['cand_pairs']:.2f}x "
            f"(ideal {m}), max_bucket {r['max_bucket'] / base['max_bucket']:.2f}x, "
            f"hot_share {base['hot_share']:.4f} -> {r['hot_share']:.4f}",
            flush=True,
        )
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
        "--"
    ) else "/root/testdata/sf0.1"
    multiples = [1, 16, 64]
    if "--multiples" in sys.argv:
        multiples = [
            int(x)
            for x in sys.argv[sys.argv.index("--multiples") + 1].split(",")
        ]
    if max(multiples) >= 64:
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    study(sf_dir, multiples)


if __name__ == "__main__":
    main()
