"""Query registry — the engine's declared correctness surface.

Every operator family from SURVEY §2 (plus the north-star LLM-pipeline
operators) registers one named query here: a Spark builder
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, the
equivalent DuckDB oracle SQL over the same parquet tables. The driver
hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json).

Conventions that make the hash-compare deterministic:

* every computed column is aliased identically on both sides;
* money aggregates go through DECIMAL (exact, associative) and are
  cast to DOUBLE only at the end — float summation order can differ
  between engines, decimal summation cannot;
* temporal outputs are rendered as strings (``yyyy-MM-dd`` /
  ``yyyy-MM-dd HH:mm:ss``) on both sides;
* nested/array outputs are rendered as deterministic sorted strings
  (``concat_ws`` ↔ ``string_agg(... ORDER BY ...)``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkBuilder
    oracle: str | None  # DuckDB SQL; None → non-SQL-expressible (rows-only check)
    description: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, description: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: SparkBuilder) -> SparkBuilder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, description=description)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Emission order.
#
# The driver's correctness gate samples a PREFIX (~50) of the query dict
# per round, so emission order decides which queries get a differential
# CORRECTNESS row this round.  Queries that have never received a driver
# row yet are listed first (rounds 1-2 verified the first 50 registered:
# analytics_ext + corpus_plans + dedup_plans + relational, plus 12 from
# relational2/sequence sampled in round 1).  Everything already
# driver-green keeps pytest + tools/diffcheck.py coverage and rotates
# back in later rounds.
# ---------------------------------------------------------------------------

_PRIORITY: list[str] = [
    # ------- round-6 prefix: the 32 queries without a driver row yet
    # (cumulative r1∪…∪r5 union = 212/244 proven, zero failures).
    # Positions 0-29 are the 30 oracle-checked ones; positions 30-31
    # are the two rows-only-by-design queries (their oracle-checked
    # twins: d7→d7b, e6→e9).  A green CORRECTNESS_r06 on this prefix
    # closes the loop: every oracle-bearing query driver-proven.
    "d6b_components_star",
    "m2_video_frame_dedup",
    "s2_ann_ivf_topk",
    "d19_url_dedup",
    "ext_compaction_plan",
    "m9_audio_fingerprint",
    "s13_bitext_margin",
    "ev13_funnel_steps",
    "ev14_retention_matrix",
    "ext_skipping_report",
    "t31_classifier_filter",
    "st12_stream_funnel",
    "dq18_completeness_blocks",
    "v6_zipf_slope",
    "e10_jl_distortion_gate",
    "s14_filtered_ann",
    "ext_wap_audit",
    "ext_scd2_asof",
    "j16_nearest_event_join",
    "ev16_stickiness",
    "m10_decode_audit",
    "d21_pair_similarity_hist",
    "pr7_khop_reachability",
    "dq19_l_diversity",
    "t32_token_budget_plan",
    "ext_ivm_merge",
    "d22_minhash_calibration",
    "ext_unpivot_roundtrip",
    "v7_simpson_diversity",
    "pr8_degree_assortativity",
    # rows-only by design, each with an oracle-checked twin:
    # d7 (Gaussian-plane LSH) is superseded for hash-checking by d7b
    # and retained as the recall gate; e6's eigh top-8 PCA is not
    # SQL-expressible — e9 (power-iteration PC1) is its checked twin
    "d7_embedding_lsh_near_dups",
    "e6_pca_project",
    # NEW in round 6 (never driver-sampled): the streaming
    # dedup-at-ingest batch core and the maximal-substring-span dedup
    "st13_stream_incremental_dedup",
    "d20_substring_spans",
    "dq20_hll_merge_gate",
    "ev17_pattern_match",
    "s15_ann_probe_curve",
    # ------- positions 37-49: rotation — oldest r1-proven signature
    # queries whose shared operators changed since round 1 (dedup /
    # ANN / sequence / density rewrites), re-verified for regression
    # coverage.  Everything else keeps pytest + tools/diffcheck.py
    # coverage and rotates back in later rounds.
    "d2_minhash_lsh_pairs",
    "d6_dup_components",
    "w1_jumps",
    "a5_density",
    "a1_pricing_summary",
    "j1_star_join",
    "d7b_embedding_lsh_oracle",
    "s4_ann_lsh_topk",
    "d10_decontamination",
    "m1_multimodal_features",
    "w5_dummy_departures",
    "d1_exact_dedup_groups",
    "p1_projection_filter",
    "q3_shipping_priority",
    "a6_density_report",
    "s1_ann_brute_force_topk",
    "t14_sequence_packing",
    "st5_stateful_jumps",
]


def _ordered_names() -> list[str]:
    pri = [n for n in _PRIORITY if n in REGISTRY]
    pset = set(pri)
    return pri + [n for n in REGISTRY if n not in pset]


def all_queries() -> dict[str, SparkBuilder]:
    _load_all()
    return {name: REGISTRY[name].spark for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import all plan modules (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from dww_data_pipeline_spark.plans import (  # noqa: F401
        analytics_ext,
        corpus_plans,
        curation_plans,
        dedup_plans,
        mining_plans,
        pipeline_ext,
        pipeline_ext2,
        relational,
        relational2,
        sequence_plans,
        streaming_plans,
        text_plans,
        tpch2,
        web_plans,
    )

    _LOADED = True
