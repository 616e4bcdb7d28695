"""SQL-surface and bucketed-join tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dww_data_pipeline_spark.sources.bucketing import (
    bucketed_join,
    read_partition_pruned,
    write_bucketed,
    write_partitioned,
)
from dww_data_pipeline_spark.sql import SQL_EXAMPLES, register_all


class TestSqlSurface:
    def test_register_all_and_run_examples(self, spark, sf_dir):
        names = register_all(spark, sf_dir)
        assert set(names) >= {"orders", "lineitem", "documents", "events"}
        for key, sql in SQL_EXAMPLES.items():
            out = spark.sql(sql)
            assert out.schema.fields, key
            assert out.limit(1).count() >= 0, key

    def test_sql_density_equals_operator(self, spark, sf_dir):
        # regression guard: the SQL formulation must keep the same
        # next_yr<=yr clamp as the operator (a missing guard once made
        # sequence() descend and double-count prior years)
        from pyspark.sql import functions as F

        from dww_data_pipeline_spark.operators.density import density
        from dww_data_pipeline_spark.sources.catalog import load_table

        register_all(spark, sf_dir)
        sql_rows = {
            (r["o_orderpriority"], r["fill_year"]): r["headcount"]
            for r in spark.sql(SQL_EXAMPLES["density"]).collect()
        }
        o = load_table(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
        op_rows = {
            (r["o_orderpriority"], r["fill_year"]): r["headcount"]
            for r in density(
                o, "o_custkey", ["o_orderpriority"], "yr", ["o_orderdate", "o_orderkey"]
            ).collect()
        }
        assert sql_rows == op_rows

    def test_lsh_near_dup_recall_vs_brute_force(self, spark, sf_dir):
        # d7's recall-gate contract cross-checked against d5 (exhaustive):
        # per sampled query, n_truth must equal the number of d5 pairs
        # containing that query id, found <= candidates, found <= truth,
        # and aggregate recall must be nontrivial
        from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all

        _load_all()
        brute = {
            (r["id_a"], r["id_b"])
            for r in REGISTRY["d5_embedding_near_dups"].spark(spark, sf_dir).collect()
        }
        gate = {
            r["query_id"]: (r["n_truth"], r["n_candidates"], r["n_found"])
            for r in REGISTRY["d7_embedding_lsh_near_dups"]
            .spark(spark, sf_dir)
            .collect()
        }
        assert len(gate) == 16
        for qid, (n_truth, n_cand, n_found) in gate.items():
            assert n_truth == sum(1 for p in brute if qid in p)
            assert 0 <= n_found <= min(n_truth, n_cand)
        tot_truth = sum(v[0] for v in gate.values())
        tot_found = sum(v[2] for v in gate.values())
        if tot_truth:
            # single-probe hyperplane LSH recall for threshold-grade pairs is
            # (1 - theta/pi)^bits ~ 13% at cos=0.3 with 4 bits — truly-near
            # pairs collide far more often; multi-probe raises this at the
            # cost of pruning
            assert tot_found / tot_truth > 0.05

    def test_sql_equals_dataframe_plan_result(self, spark, sf_dir):
        register_all(spark, sf_dir)
        sql_rows = {
            (r["o_custkey"], r["o_orderkey"])
            for r in spark.sql(SQL_EXAMPLES["jumps"]).collect()
        }
        from dww_data_pipeline_spark.operators.sequence import jumps
        from dww_data_pipeline_spark.sources.catalog import load_table

        df_rows = {
            (r["o_custkey"], r["o_orderkey"])
            for r in jumps(
                load_table(spark, sf_dir, "orders"),
                "o_custkey",
                "o_orderpriority",
                ["o_orderdate", "o_orderkey"],
            ).collect()
        }
        assert sql_rows == df_rows


class TestBucketing:
    def test_bucketed_join_has_no_exchange(self, spark, sf_dir, tmp_path_factory):
        import shutil

        for t in ("b_lineitem", "b_orders"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            loc = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            shutil.rmtree(f"{loc.removeprefix('file:')}/{t}", ignore_errors=True)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        )
        write_bucketed(li, "b_lineitem", "l_orderkey", 8, sort_col="l_orderkey")
        write_bucketed(o, "b_orders", "l_orderkey", 8, sort_col="l_orderkey")
        joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        # and the result matches the plain join
        assert joined.count() == li.join(o, "l_orderkey").count()
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")

    def test_partitioned_write_prunes(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
            "order_year", F.year("o_orderdate")
        )
        path = str(tmp_path / "orders_by_year")
        write_partitioned(o, path, ["order_year"])
        back = read_partition_pruned(spark, path)
        filtered = back.filter(F.col("order_year") == 1997)
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(order_year" in plan
        # pruning: only the 1997 directory is scanned
        want = o.filter(F.col("order_year") == 1997).count()
        assert filtered.count() == want


class TestGoldLayout:
    def test_partitioned_and_bucketed_combo(self, spark, sf_dir):
        """write_gold: partition pruning AND exchange-free join from
        the same table — the scan must show both a partition filter on
        the partition column and no Exchange in the join."""
        import shutil

        from dww_data_pipeline_spark.sources.bucketing import write_gold

        for t in ("g_orders", "g_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            loc = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            shutil.rmtree(f"{loc.removeprefix('file:')}/{t}", ignore_errors=True)

        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderpriority", F.year("o_orderdate").alias("o_year")
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            F.col("l_orderkey").alias("o_orderkey"),
            "l_quantity",
            F.year("l_shipdate").alias("l_year"),
        )
        write_gold(o, "g_orders", ["o_year"], "o_orderkey", 8, sort_col="o_orderkey")
        write_gold(li, "g_lineitem", ["l_year"], "o_orderkey", 8, sort_col="o_orderkey")

        go = spark.table("g_orders").filter(F.col("o_year") == 1997)
        gl = spark.table("g_lineitem").filter(F.col("l_year") == 1997).hint("merge")
        joined = go.join(gl, "o_orderkey")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket co-location survives partition pruning
        assert "PartitionFilters: [" in plan and "o_year" in plan.split(
            "PartitionFilters"
        )[1].split("]")[0]

        # result parity with the plain join on raw parquet
        o_raw = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li_raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        want = (
            o_raw.filter(F.year("o_orderdate") == 1997)
            .join(
                li_raw.filter(F.year("l_shipdate") == 1997),
                o_raw.o_orderkey == li_raw.l_orderkey,
            )
            .count()
        )
        assert joined.count() == want


class TestFormatRoundTrips:
    """S-family widening: the gold layer reads/writes every format the
    container's Spark ships natively — parquet is the default; ORC,
    JSON-lines, and header-CSV round-trip with schema fidelity."""

    def _dim(self, spark):
        return spark.createDataFrame(
            [(1, "alpha", 1.5), (2, "beta", -2.0), (3, None, 0.25)],
            ["k", "name", "weight"],
        )

    def test_orc_round_trip(self, spark, tmp_path):
        df = self._dim(spark)
        path = str(tmp_path / "dim_orc")
        df.write.mode("overwrite").orc(path)
        back = spark.read.orc(path)
        assert back.schema == df.schema
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    def test_jsonlines_round_trip(self, spark, tmp_path):
        df = self._dim(spark)
        path = str(tmp_path / "dim_json")
        df.write.mode("overwrite").json(path)
        back = spark.read.schema(df.schema).json(path)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    def test_csv_round_trip_with_schema(self, spark, tmp_path):
        from dww_data_pipeline_spark.sources.files import read_csv_dim

        df = self._dim(spark)
        path = str(tmp_path / "dim_csv")
        df.write.mode("overwrite").option("header", True).csv(path)
        back = read_csv_dim(spark, path, df.schema)
        assert back.schema == df.schema
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


class TestLakeMaintenance:
    def test_compaction_reduces_file_count_preserves_rows(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from dww_data_pipeline_spark.sources.maintenance import (
            compact_parquet_dir,
            dir_stats,
        )

        path = str(tmp_path / "frag")
        df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
        # fragment: 64 shards of ~150 rows each (micro-batch litter)
        df.repartition(64).write.mode("overwrite").parquet(path)
        before, _ = dir_stats(path)
        assert before >= 32
        total_before = spark.read.parquet(path).count()
        sum_before = spark.read.parquet(path).agg(F.sum("v")).collect()[0][0]

        fb, fa = compact_parquet_dir(spark, path, target_file_bytes=10**9)
        assert fb == before and fa < before
        after = spark.read.parquet(path)
        assert after.count() == total_before
        assert after.agg(F.sum("v")).collect()[0][0] == sum_before

    def test_compaction_empty_dir_noop(self, spark, tmp_path):
        from dww_data_pipeline_spark.sources.maintenance import compact_parquet_dir

        p = tmp_path / "empty"
        p.mkdir()
        assert compact_parquet_dir(spark, str(p)) == (0, 0)

    def test_dynamic_overwrite_touches_only_incoming_partitions(
        self, spark, tmp_path
    ):
        from pyspark.sql import functions as F

        from dww_data_pipeline_spark.sources.maintenance import (
            write_dynamic_partitions,
        )

        path = str(tmp_path / "bydate")
        base = spark.createDataFrame(
            [(d, i) for d in ("2026-01-01", "2026-01-02") for i in range(5)],
            "dt string, v int",
        )
        write_dynamic_partitions(base, path, "dt")
        # backfill day 2 with different values; day 1 must be untouched
        backfill = spark.createDataFrame(
            [("2026-01-02", 100 + i) for i in range(3)], "dt string, v int"
        )
        write_dynamic_partitions(backfill, path, "dt")
        got = spark.read.parquet(path)
        day1 = got.filter(F.col("dt") == "2026-01-01")
        day2 = got.filter(F.col("dt") == "2026-01-02")
        assert day1.count() == 5  # untouched
        assert day2.count() == 3  # replaced
        assert day2.agg(F.min("v")).collect()[0][0] == 100


class TestPartitionPruning:
    def test_date_partition_filter_prunes_scan(self, spark, tmp_path):
        """Directory-partitioned layout + a partition filter must show
        up as PartitionFilters in the scan (files of other partitions
        never open) — the layout contract for 100 TB date-partitioned
        lakes."""
        from pyspark.sql import functions as F

        from dww_data_pipeline_spark.sources.maintenance import (
            write_dynamic_partitions,
        )

        path = str(tmp_path / "part_events")
        df = spark.createDataFrame(
            [(f"2026-0{1 + (i % 3)}-01", i, float(i)) for i in range(300)],
            "dt string, id int, v double",
        )
        write_dynamic_partitions(df, path, "dt")
        q = spark.read.parquet(path).filter(F.col("dt") == "2026-02-01")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "2026-02-01" in plan.split("PartitionFilters")[1].split("]")[0]
        assert q.count() == 100
        # non-partition filters must still push down to parquet
        q2 = spark.read.parquet(path).filter(
            (F.col("dt") == "2026-02-01") & (F.col("id") > 250)
        )
        plan2 = q2._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan2
        assert "GreaterThan(id,250)" in plan2


class TestSchemaEvolution:
    def test_merge_schema_reads_mixed_file_generations(self, spark, tmp_path):
        """Appending files written with a WIDER schema must stay
        readable: mergeSchema unions the generations, old files
        surface nulls for new columns — the additive-evolution
        contract a long-lived lake depends on."""
        from pyspark.sql import functions as F

        path = str(tmp_path / "evolving")
        v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
        v1.write.mode("overwrite").parquet(path)
        v2 = spark.createDataFrame(
            [(3, "c", 0.5)], "id long, name string, score double"
        )
        v2.write.mode("append").parquet(path)

        merged = spark.read.option("mergeSchema", "true").parquet(path)
        assert set(merged.columns) == {"id", "name", "score"}
        rows = {r["id"]: r for r in merged.collect()}
        assert rows[1]["score"] is None  # old generation: null-filled
        assert rows[3]["score"] == 0.5
        # filters on the new column must not error on old files
        assert merged.filter(F.col("score") > 0).count() == 1
