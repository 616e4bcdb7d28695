"""Plan-registry sanity + physical-plan discipline checks.

The full oracle differential runs via tools/diffcheck.py (and the
driver's own gate); here we assert structural invariants cheaply and
check the *physical plans* for the scale properties SURVEY §7.3
demands: filters pushed into the parquet scan, dimension joins
broadcast, no cartesian products on the hot paths.
"""

from __future__ import annotations

import pytest

from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all, all_oracles, all_queries


@pytest.fixture(scope="module", autouse=True)
def _loaded():
    _load_all()


class TestRegistry:
    def test_every_oracle_has_a_query(self):
        qs, os_ = all_queries(), all_oracles()
        assert set(os_) <= set(qs)
        assert len(qs) >= 50

    def test_descriptions_cite_reference_or_northstar(self):
        for q in REGISTRY.values():
            assert q.description, f"{q.name} missing description"

    def test_all_queries_analyzable(self, spark, sf_dir):
        # schema resolution exercises every expression tree without
        # executing jobs
        for name, q in REGISTRY.items():
            df = q.spark(spark, sf_dir)
            assert df.schema.fields, name


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


class TestPhysicalPlans:
    def test_filter_pushdown_reaches_scan(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "p1_projection_filter")
        assert "PushedFilters: [" in plan
        assert "IsNotNull(l_discount)" in plan or "GreaterThan(l_discount" in plan

    def test_column_pruning(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "p3_compound_filter")
        # scan must not read all orders columns for a 3-column output
        assert "o_totalprice" in plan
        assert "o_custkey" not in plan.split("ReadSchema")[-1]

    def test_dimension_joins_broadcast(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "j1_star_join")
        assert plan.count("BroadcastHashJoin") >= 2  # nation + region

    def test_semi_and_anti_joins_selected(self, spark, sf_dir):
        assert "LeftSemi" in _plan(spark, sf_dir, "j6_semi_join")
        assert "LeftAnti" in _plan(spark, sf_dir, "j7_anti_join")

    def test_ann_topk_broadcasts_queries_no_cartesian(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "s1_ann_brute_force_topk")
        assert "BroadcastNestedLoopJoin" in plan  # tiny query side broadcast
        assert "CartesianProduct" not in plan

    def test_window_queries_single_shuffle(self, spark, sf_dir):
        # W1 jumps: exactly one exchange (the entity repartition) —
        # lag + filter ride the same sort, no extra shuffles
        plan = _plan(spark, sf_dir, "w1_jumps")
        assert plan.count("Exchange hashpartitioning") == 1

    def test_approx_count_distinct_within_5pct(self, spark, sf_dir):
        # the HLL variant has no cross-engine oracle; assert accuracy here
        from pyspark.sql import functions as F

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        rows = li.groupBy("l_returnflag").agg(
            F.count_distinct("l_partkey").alias("exact"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        ).collect()
        for r in rows:
            assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.05

    def test_whole_stage_codegen_on_hot_path(self, spark, sf_dir):
        df = REGISTRY["a1_pricing_summary"].spark(spark, sf_dir)
        df.collect()  # AQE finalizes the plan only on execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        # "*(n)" prefixes mark WholeStageCodegen stages in the final plan
        assert "*(" in plan
        assert "BatchEvalPython" not in plan  # no row-at-a-time Python
