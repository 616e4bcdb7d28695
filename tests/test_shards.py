"""Deterministic training-shard serialization (sources/shards.py)."""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from dww_data_pipeline_spark.sources.shards import (
    with_shards,
    write_training_shards,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


class TestShardAssignment:
    def test_complete_and_disjoint(self, docs):
        out = with_shards(docs.select("doc_id"), "doc_id", n_shards=16)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("shard").alias("lo"),
            F.max("shard").alias("hi"),
            F.countDistinct("shard").alias("k"),
        ).first()
        assert agg["n"] == docs.count()
        assert agg["lo"] >= 0 and agg["hi"] <= 15
        assert agg["k"] == 16  # every shard populated even at sf0.001

    def test_assignment_is_pure_function_of_key(self, docs):
        a = with_shards(docs.select("doc_id"), "doc_id").collect()
        b = with_shards(
            docs.select("doc_id").repartition(7), "doc_id"
        ).collect()
        assert {(r["doc_id"], r["shard"], r["shard_pos"]) for r in a} == {
            (r["doc_id"], r["shard"], r["shard_pos"]) for r in b
        }

    def test_balance(self, docs):
        # md5 top bits are uniform: no shard should exceed 2x the mean
        sizes = [
            r["n"]
            for r in with_shards(docs.select("doc_id"), "doc_id")
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        mean = sum(sizes) / len(sizes)
        assert max(sizes) < 2 * mean


class TestWriteRoundTrip:
    def test_layout_order_and_stability(self, spark, docs, tmp_path):
        p1 = str(tmp_path / "run1")
        p2 = str(tmp_path / "run2")
        write_training_shards(docs, p1, "doc_id", n_shards=8)
        write_training_shards(
            docs.repartition(13), p2, "doc_id", n_shards=8
        )

        # one directory per shard
        dirs = sorted(
            d.name for d in pathlib.Path(p1).iterdir() if d.name.startswith("shard=")
        )
        assert dirs == sorted(f"shard={k}" for k in range(8))

        # membership + within-shard order survive the round trip and are
        # identical across runs with different input partitionings
        def manifest(path):
            back = spark.read.parquet(path)
            return (
                back.groupBy("shard")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("shard_pos").alias("sig"),
                    F.sum(F.col("doc_id") * F.col("shard_pos")).alias("xsig"),
                )
                .orderBy("shard")
                .collect()
            )

        m1, m2 = manifest(p1), manifest(p2)
        assert [tuple(r) for r in m1] == [tuple(r) for r in m2]
        assert sum(r["n"] for r in m1) == docs.count()

        # the global order key (shard, shard_pos, doc_id) is a total
        # order: reading one shard back sorted reproduces the exact
        # sequence a training loader would consume
        one = spark.read.parquet(f"{p1}/shard=3").orderBy("shard_pos", "doc_id")
        pos = [r["shard_pos"] for r in one.select("shard_pos").collect()]
        assert pos == sorted(pos)
