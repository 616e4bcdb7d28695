"""Thread-scaling harness: run representative queries at increasing
local parallelism and report speedup / parallel efficiency.

    python tools/scaling.py [sf_dir] [--threads 4,8,16,32] [--multiply N]
    python tools/scaling.py [sf_dir] --data-scaling [--multiples 1,16,64]
    python tools/scaling.py [sf_dir] --scale-artifact SCALE_r9.json \
        [--multiples 1,16,64]   # recurring top-5 data-scaling artifact

Each thread count gets a FRESH SparkSession (local[N], shuffle
partitions = N — the same sizing rule session.py applies), each query
runs twice and keeps the min (one warm-up for codegen). Output: one
JSON line per thread count plus a speedup table vs the smallest N.

At sf0.1 the queries are OVERHEAD-bound (sub-2s) and scaling
saturates; ``--multiply N`` builds a key-shifted N× replica of the
fact tables under /tmp (dimension tables nation/region stay
canonical so join semantics hold) and runs against that, which is
where throughput-bound scaling becomes visible. The replica is a
PERFORMANCE fixture only — correctness stays pinned to the driver's
own parquet.

``--data-scaling`` (round-6 verdict ask #3) holds threads FIXED at 32
and grows the DATA instead: the top-wall-time queries run at 1×, 16×
and 64× and the table reports rows/sec plus the t(64×)/t(16×) ratio
(linear = 4.0 past the fixed-overhead floor; anything well above is a
super-linear term the plan-shape argument missed). These replicas are
CONTENT-shifted as well as key-shifted: a key-only replica duplicates
every string 64×, which collapses under DISTINCT (j15 would measure
nothing) or turns the whole corpus into one giant near-dup cluster
(candidate generators would measure the duplication pathology, not
data growth) — so documents.text gets per-replica token prefixes and
customer.c_name a per-replica suffix whose cross-replica edit
distance is >= 2 by construction. The duplication pathology itself is
covered separately (hostile-skew studies in SCALE.md).

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

# per-table integer key columns to shift per replica so keys stay
# globally unique AND cross-table references stay consistent
_KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_KEY_OFFSET = 1_000_000_000


def _content_shift_cols(t: str, i: int):
    """Per-replica string perturbations for the data-scaling fixture
    (see module docstring): (col_name, expr) pairs for replica i."""
    from pyspark.sql import functions as F

    if t == "documents":
        # prefix EVERY token so no shingle/gram collides across
        # replicas — a genuinely-larger corpus, not 64 copies of one
        return [
            (
                "text",
                F.regexp_replace(F.col("text"), r"(\S+)", f"r{i}$1"),
            )
        ]
    if t == "customer":
        # doubled two-digit tag: any two replicas differ in >= 2
        # character positions, so no cross-replica pair enters the
        # levenshtein<=1 result (the study measures growth, not
        # fabricated fuzzy matches)
        return [
            ("c_name", F.concat(F.col("c_name"), F.lit(f"{i:02d}{i:02d}")))
        ]
    return []


def build_replica(sf_dir: str, n: int, content_shift: bool = False) -> str:
    """Materialize an n× key-shifted copy of the fact tables (tiny
    canonical dims copied as-is). Cached by (sf_dir, n, shift)."""
    import shutil

    from pyspark.sql import functions as F

    from dww_data_pipeline_spark.session import get_spark
    from dww_data_pipeline_spark.sources.catalog import TABLES, load_table

    tag = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/dww_scale_{tag}_x{n}" + ("_cs" if content_shift else "")
    if os.path.isdir(out) and os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    spark = get_spark("replica-build")
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        keys = _KEY_COLS.get(t)
        if not keys:  # nation/region: canonical dimensions
            df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
            continue
        parts = []
        for i in range(n):
            rep = df
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * _KEY_OFFSET))
            if content_shift:
                for col, expr in _content_shift_cols(t, i):
                    rep = rep.withColumn(col, expr)
            parts.append(rep)
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        # enough files that every thread count under test gets input
        # splits — a single large row group reads as ONE task and
        # silently serializes the scan no matter the parallelism
        full.repartition(64).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    spark.stop()
    open(os.path.join(out, "_DONE"), "w").close()
    return out

QUERIES = [
    "a1_pricing_summary",   # scan + agg: should scale with cores
    "j1_star_join",         # broadcast star join
    "d2_minhash_lsh_pairs", # expression-heavy map + tiny shuffle
    "t2_quality_scores",    # pure per-row text expressions
    "e5_embedding_gram",    # Arrow partial-agg reduction
    # round-4d scale paths
    "ev7_market_basket",    # in-place pair-gen + bounded pair counts
    "pr4_triangle_count",   # thresholded graph census (checkpointed)
    "c1_curation_pipeline", # composed gate -> dedup -> shard flow
    "s10_pq_ann_topk",      # PQ train + encode + ADC scan
    "j14_spatial_grid_join",  # cell-bucketed spatial candidates
    # round-5 scale paths (m9 excluded: its clip set is bounded by
    # design — doc_id < 150 — so replica size never changes its work)
    "d19_url_dedup",        # per-row canonicalization + key groupBy
    "t31_classifier_filter",  # vocab model train + broadcast score
    "ev14_retention_matrix",  # per-user anchors + distinct activity
    # round-6 scale paths
    "d20_substring_spans",  # gram-fp shuffle + doc-partitioned islands
    "ev17_pattern_match",   # one user shuffle + per-row regex scans
    "dq20_hll_merge_gate",  # partial sketches + union rollup
    # round-7 scale paths
    "t34_kneser_ney_score",   # vocab-bounded model + doc-bigram join
    "d23_cdc_chunking",       # doc-partitioned token window + chunk aggs
    "st15_stream_lm_score",   # frozen-model scoring (batch core)
]


# Data-scaling study set: the top-wall-time queries from the bench,
# each mapped to the table whose row count drives its work (rows/sec
# denominator).
DATA_QUERIES = {
    "j15_edit_distance_join": "customer",
    "s11_ivfpq_topk": "embeddings",
    "pr6_kcore": "lineitem",
    "d6b_components_star": "documents",
    "pr1_supplier_pagerank": "lineitem",
    "s10_pq_ann_topk": "embeddings",
    "d20_substring_spans": "documents",
    "d18_lsh_recall_gate": "documents",
    "d11_incremental_dedup": "documents",
    "st13_stream_incremental_dedup": "documents",
}


def data_scaling(sf_dir: str, multiples: list[int], threads: int = 32) -> None:
    """Fixed threads, growing data: time the DATA_QUERIES at each
    multiple of sf_dir (content-shifted replicas) and report rows/sec
    plus the top-to-mid time ratio vs the ideal linear ratio."""
    from dww_data_pipeline_spark.plans.registry import all_queries
    from dww_data_pipeline_spark.session import get_spark
    from dww_data_pipeline_spark.sources.catalog import load_table

    dirs = {}
    for m in multiples:
        dirs[m] = sf_dir if m == 1 else build_replica(sf_dir, m, content_shift=True)
        print(f"# {m}x -> {dirs[m]}", flush=True)

    spark = get_spark(f"data-scaling-{threads}", cpus=str(threads))
    base_rows = {
        t: load_table(spark, sf_dir, t).count()
        for t in sorted(set(DATA_QUERIES.values()))
    }
    queries = all_queries()
    queries["a10_distinct"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()  # warm-up
    results: dict[str, dict[int, float]] = {}
    for name in DATA_QUERIES:
        results[name] = {}
        for m in multiples:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                queries[name](spark, dirs[m]).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            results[name][m] = round(best, 3)
            print(
                json.dumps({"query": name, "multiple": m, "sec": results[name][m]}),
                flush=True,
            )
    spark.stop()

    lo, hi = multiples[-2], multiples[-1]
    ideal = hi / lo
    print(f"\nrows/sec at fixed local[{threads}] "
          f"(t{hi}x/t{lo}x ideal={ideal:.1f} for linear):")
    for name, table in DATA_QUERIES.items():
        r = results[name]
        rps = " ".join(
            f"{m}x={int(base_rows[table] * m / r[m]):,}/s" for m in multiples
        )
        ratio = r[hi] / r[lo]
        flag = "  <-- SUPER-LINEAR" if ratio > 1.5 * ideal else ""
        print(f"  {name:30s} {rps}  ratio={ratio:.2f}{flag}")


def _latest_bench_local(repo_root: str) -> tuple[str, dict]:
    """Path + parsed JSON of the newest BENCH_LOCAL_r{N}.json."""
    import glob
    import re

    cands = glob.glob(os.path.join(repo_root, "BENCH_LOCAL_r*.json"))
    if not cands:
        raise SystemExit("no BENCH_LOCAL_r*.json found — run bench.py first")
    def rnum(p):
        m = re.search(r"BENCH_LOCAL_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1
    path = max(cands, key=rnum)
    with open(path) as f:
        return path, json.load(f)


def scale_artifact(
    sf_dir: str, out_path: str, top_n: int = 5, multiples: list[int] | None = None
) -> None:
    """Recurring data-scaling artifact (round-7 verdict ask #2): time
    the top-``top_n`` wall-time queries from the latest local bench at
    each data multiple (min-of-2, fixed local[32], content-shifted
    replicas) and write one JSON artifact — SCALE_r{N}.json — so a new
    super-linear term is caught by a mechanical diff against last
    round's 16x column instead of a once-per-round manual study."""
    from dww_data_pipeline_spark.plans.registry import all_queries
    from dww_data_pipeline_spark.session import get_spark

    multiples = multiples or [1, 16, 64]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_path, bench = _latest_bench_local(repo_root)
    top = sorted(
        bench["queries"].items(), key=lambda kv: -kv[1]
    )[:top_n]
    names = [n for n, _ in top]
    print(f"# top-{top_n} from {os.path.basename(bench_path)}: {names}",
          flush=True)

    dirs = {}
    for m in multiples:
        dirs[m] = sf_dir if m == 1 else build_replica(sf_dir, m, content_shift=True)
        print(f"# {m}x -> {dirs[m]}", flush=True)

    spark = get_spark("scale-artifact", cpus="32")
    queries = all_queries()
    queries["a10_distinct"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()  # warm-up
    out: dict[str, dict] = {}
    for name in names:
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
            print(json.dumps({"query": name, "multiple": m, "sec": rec[f"t{m}x"]}),
                  flush=True)
        lo, hi = multiples[0], multiples[-1]
        for m in multiples[1:]:
            rec[f"ratio_{m}x"] = round(rec[f"t{m}x"] / rec[f"t{lo}x"], 3)
        rec["ratio"] = rec[f"ratio_{hi}x"]  # legacy top-tier alias
        rec["ideal"] = round(hi / lo, 1)
        out[name] = rec
    spark.stop()

    artifact = {
        "source_bench": os.path.basename(bench_path),
        "threads": 32,
        "multiples": multiples,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "queries": out,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"# wrote {out_path}", flush=True)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    threads = [4, 8, 16, 32]
    multiply = 0
    # None = "--multiples not passed"; resolved per path below.  A list
    # literal default made an EXPLICIT --multiples 1,16,64 indistinguishable
    # from the sentinel and silently rewrote it to [1,16] (round-8 advice).
    multiples = None
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        def _val(flag):
            if a.startswith(flag + "="):
                return a.split("=", 1)[1]
            if a == flag and i + 1 < len(argv):
                return argv[i + 1]
            return None
        v = _val("--threads")
        if v is not None:
            threads = [int(x) for x in v.split(",")]
        v = _val("--multiply")
        if v is not None:
            multiply = int(v)
        v = _val("--multiples")
        if v is not None:
            multiples = [int(x) for x in v.split(",")]
    artifact_out = None
    for i, a in enumerate(argv):
        if a.startswith("--scale-artifact="):
            artifact_out = a.split("=", 1)[1]
        elif a == "--scale-artifact" and i + 1 < len(argv):
            artifact_out = argv[i + 1]
    # resolved defaults: the recurring artifact carries BOTH the 16x and
    # 64x tiers from round 9 on (round-8 verdict ask #6); an explicit
    # --multiples list is always honored verbatim.
    mult_artifact = multiples or [1, 16, 64]
    mult_ds = multiples or [1, 16, 64]
    # round-7 measured finding: 64x data on the shared 8 GiB local JVM
    # shows fake super-linear ratios from GC pressure — 16 GiB is the
    # default for any study that touches a >= 64x replica (driver
    # memory can only be set before the first session launches)
    if (multiply >= 64 or ("--data-scaling" in argv and max(mult_ds) >= 64)
            or (artifact_out and max(mult_artifact) >= 64)):
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    if artifact_out:
        scale_artifact(sf_dir, artifact_out, multiples=mult_artifact)
        return
    if "--data-scaling" in argv:
        data_scaling(sf_dir, mult_ds)
        return

    from dww_data_pipeline_spark.plans.registry import all_queries
    from dww_data_pipeline_spark.session import get_spark

    if multiply > 1:
        sf_dir = build_replica(sf_dir, multiply)
        print(f"# running against {multiply}x replica: {sf_dir}")

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
