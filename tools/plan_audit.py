"""Generate PLANS.md: physical-plan evidence for the bench queries.

    python tools/plan_audit.py [sf_dir]

For every HEADLINE + EXTRA bench query, records the scale-relevant
plan facts straight from the executed plan: scan pushdown/pruning,
join strategies chosen, number of exchanges, whole-stage-codegen
spans, and Python (Arrow) stages. The point is reviewability — the
claims in SCALE.md are checkable against this file, and regressions
show up as diffs.
"""

from __future__ import annotations

import os
import re
import sys


# SCALE.md standing rule, mechanized (round-7 verdict ask #6):
# collect_list per group ONLY when group size is bounded by
# construction.  Every benched query whose executed plan contains a
# collect_list/collect_set aggregation must carry a one-line bound
# here; an entry missing from this table fails the audit (exit 1), so
# a NEW unbounded collect aggregation cannot land silently.  The
# opt-in runtime guard is the builders' ``max_group_rows`` parameter
# (operators/sequence.nest_documents, web_plans.journey_patterns) —
# a windowed row_number pre-filter, the spillable form the
# hostile-skew study measured.
COLLECT_BOUNDED = {
    "w8_nested_documents": "per-entity rel fan-out (catalog FK), max_group_rows guard available",
    "ev17_pattern_match": "per-user event count (generator-bounded), max_group_rows guard available",
    "d1_exact_dedup_groups": "dup-group id roster IS the report contract; hostile all-dup corpus covered by the skew study (decision paths d9/d17 carry no lists)",
    "d2_minhash_lsh_pairs": "LSH band-bucket size (band bit-width bounds buckets by design; skewed bucket = pair-list explosion regardless of strategy)",
    "ev7_market_basket": "basket brand set <= the 25-brand dimension",
    "t26_inverted_index": "postings capped at 30 by window rank BEFORE collection",
    "d14_chunk_dedup": "chunks per doc <= len/16 by construction",
    "d23_cdc_chunking": "chunk boundaries per doc <= len/min_size",
    "d25_span_scrub": "disjoint spans per doc <= len/(K+1) by construction",
    "m8_keyframes": "frames per shot <= clip frame count (clip-bounded)",
    "st10_session_paths": "session length (timeout-bounded sessions)",
    "ev18_holt_linear": "daily series per event_type <= the generator's "
    "30-day span (SF grows rows-per-day, never days)",
    "ev19_cusum_changepoint": "daily series per event_type <= the "
    "generator's 30-day span (ev18's bound)",
    "s18_rocchio_prf": "feedback set capped at 5 by the round-1 window "
    "BEFORE collection (t26's cap-then-collect rule)",
    "st16_stream_cusum": "daily series per event_type <= the "
    "generator's 30-day span (ev18's bound; prefix form)",
    "c1_curation_pipeline": "d25's span list composed in (round 9): "
    "disjoint spans per kept doc <= len/(K+1) by construction",
    "d27_exactsubstr_scrub": "scrub islands disjoint and >= L+1 apart "
    "=> <= len/(L+1) spans per doc by construction (d25's rule at L=50)",
    "ev21_holt_winters": "daily series per event_type <= the "
    "generator's 30-day span (ev18's bound; zero-filled calendar)",
    "d28_ppjoin_exact": "per-doc sorted shingle array (r12 verify): "
    "distinct shingles per doc <= doc token count by construction "
    "(doc-length-bounded, the d14/d23 rule)",
    "dq22_embedding_psi": "per-(side, dim) PSI term list <= the 16 "
    "fixed bins by construction (the ordered-fold determinism "
    "contract needs the bin-sorted list)",
    "dq17_embedding_psi": "alias of dq22_embedding_psi — same plan, "
    "same 16-bin bound",
    "st22_stream_embedding_psi": "per-(batch, dim) PSI term list <= "
    "the 16 fixed bins by construction (dq22's bound per micro-batch)",
}


def audit(plan: str) -> dict[str, object]:
    joins = {
        "BroadcastHashJoin": plan.count("BroadcastHashJoin"),
        "SortMergeJoin": plan.count("SortMergeJoin"),
        "BroadcastNestedLoopJoin": plan.count("BroadcastNestedLoopJoin"),
        "CartesianProduct": plan.count("CartesianProduct"),
        "ShuffledHashJoin": plan.count("ShuffledHashJoin"),
    }
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed_nonempty = [p for p in pushed if p.strip()]
    return {
        "exchanges": plan.count("Exchange hashpartitioning"),
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "joins": {k: v for k, v in joins.items() if v},
        "scans": plan.count("FileScan parquet"),
        "scans_with_pushdown": len(pushed_nonempty),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python_stages": plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython"),
        "row_python": plan.count("BatchEvalPython"),
        "takeordered": plan.count("TakeOrderedAndProject"),
        "collect_aggs": plan.count("collect_list(") + plan.count("collect_set("),
    }


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import bench as bench_mod

    from dww_data_pipeline_spark.plans.registry import all_queries
    from dww_data_pipeline_spark.session import get_spark

    spark = get_spark("plan-audit")
    queries = all_queries()
    lines = [
        "# PLANS — physical-plan audit of the bench queries",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir}`. Facts are",
        "extracted from `.explain` output so SCALE.md's claims are",
        "checkable here; regenerate after plan-affecting changes.",
        "",
        "Reading guide: zero CartesianProduct and zero row-at-a-time",
        "Python anywhere; every python stage is Arrow-vectorized",
        "(MapInPandas / grouped-map); every query carries whole-stage",
        "codegen spans. Counts come from the FINALIZED adaptive plan",
        "(executed, final section only). Iterative operators",
        "(d6/d12/d15-final/pr1) localCheckpoint upstream work, so",
        "their rows describe the final stage only.",
        "",
        "collect_list/collect_set audit: every row whose plan contains",
        "a collect aggregation carries its documented group-size bound",
        "in the notes column (SCALE.md's standing rule, enforced —",
        "the generator exits 1 on an undocumented collect agg).",
        "",
        "| query | exchanges | joins | scans (pushdown) | codegen | python stages | notes |",
        "|---|---|---|---|---|---|---|",
    ]
    undocumented_collects: list[str] = []
    for name in bench_mod.HEADLINE + bench_mod.EXTRA:
        df = queries[name](spark, sf_dir)
        # execute THIS DataFrame's own QueryExecution (collect —
        # a sink write builds a separate QueryExecution and would
        # leave this one's AQE plan unfinalized)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the finalized adaptive plan prints "== Final Plan ==" followed
        # by "== Initial Plan ==": audit the final section only, or
        # every count doubles
        if "== Initial Plan ==" in plan:
            plan = plan.split("== Initial Plan ==")[0]
        a = audit(plan)
        joins = (
            ", ".join(f"{k.replace('Join', '')}×{v}" for k, v in a["joins"].items())
            or "—"
        )
        notes = []
        if a["single_partition_exchanges"]:
            notes.append(f"{a['single_partition_exchanges']} single-partition")
        if a["row_python"]:
            notes.append("ROW-AT-A-TIME PYTHON")
        if a["joins"].get("CartesianProduct"):
            notes.append("CARTESIAN")
        if a["takeordered"]:
            notes.append("TakeOrdered")
        if a["collect_aggs"]:
            if name in COLLECT_BOUNDED:
                notes.append(f"collect bounded: {COLLECT_BOUNDED[name]}")
            else:
                notes.append("COLLECT_LIST WITHOUT DOCUMENTED BOUND")
                undocumented_collects.append(name)
        lines.append(
            f"| {name} | {a['exchanges']} | {joins} "
            f"| {a['scans']} ({a['scans_with_pushdown']}) "
            f"| {a['codegen_stages']} | {a['python_stages']} "
            f"| {'; '.join(notes) or '—'} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(bench_mod.HEADLINE) + len(bench_mod.EXTRA)} queries)")
    spark.stop()
    if undocumented_collects:
        print(
            "AUDIT FAIL: collect_list/collect_set without a documented "
            f"group-size bound (add to COLLECT_BOUNDED with the bound, "
            f"or cap with max_group_rows): {undocumented_collects}"
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
