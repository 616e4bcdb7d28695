"""Persisted IVF index (sources/ann_index.py): build/query round
trip, partition-pruned probe scans, parity with the in-memory path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dww_data_pipeline_spark.sources.ann_index import (
    build_ivf_index,
    ivf_index_topk,
)
from dww_data_pipeline_spark.sources.catalog import load_table


N_LISTS = 8


@pytest.fixture(scope="module")
def index_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ivf") / "index")
    emb = load_table(spark, sf_dir, "embeddings")
    n = build_ivf_index(
        emb, "vec_id", "embedding", out, n_lists=N_LISTS, sample_size=500
    )
    assert n == N_LISTS
    return out


def _queries(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 100 == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


class TestIvfIndex:
    def test_layout_on_disk(self, index_dir, spark):
        assert os.path.isdir(os.path.join(index_dir, "centroids"))
        vec_dir = os.path.join(index_dir, "vectors")
        lists = [d for d in os.listdir(vec_dir) if d.startswith("list_id=")]
        assert 1 <= len(lists) <= N_LISTS
        cents = spark.read.parquet(os.path.join(index_dir, "centroids"))
        assert cents.count() == N_LISTS

    def test_index_preserves_every_vector(self, index_dir, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        vecs = spark.read.parquet(os.path.join(index_dir, "vectors"))
        assert vecs.count() == emb.count()
        assert vecs.select("vec_id").distinct().count() == emb.count()

    def test_probe_scan_is_partition_pruned(self, index_dir, spark, sf_dir):
        q = _queries(spark, sf_dir)
        df = ivf_index_topk(
            spark, index_dir, q, "vec_id", "embedding", k=3, nprobe=2
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the literal IN filter must reach the parquet source as a
        # partition filter — the layout, not a runtime filter, bounds
        # the scan
        assert "PartitionFilters" in plan
        pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        assert "list_id" in pf

    def test_matches_in_memory_ivf(self, index_dir, spark, sf_dir):
        """Same quantizer seed + sample => identical results to the
        per-call in-memory ivf_topk."""
        from dww_data_pipeline_spark.operators.similarity import ivf_topk

        emb = load_table(spark, sf_dir, "embeddings")
        q = _queries(spark, sf_dir)
        a = {
            (r["query_id"], r["vec_id"], r["rank"])
            for r in ivf_index_topk(
                spark, index_dir, q, "vec_id", "embedding", k=3, nprobe=2
            ).collect()
        }
        b = {
            (r["query_id"], r["vec_id"], r["rank"])
            for r in ivf_topk(
                emb,
                q,
                "vec_id",
                "embedding",
                k=3,
                n_lists=N_LISTS,
                sample_size=500,
                nprobe=2,
            ).collect()
        }
        assert a == b

    def test_results_ranked_and_bounded(self, index_dir, spark, sf_dir):
        q = _queries(spark, sf_dir)
        rows = ivf_index_topk(
            spark, index_dir, q, "vec_id", "embedding", k=3, nprobe=1
        ).collect()
        assert rows
        per_q: dict[int, list] = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r)
        for qid, grp in per_q.items():
            assert len(grp) <= 3
            ranks = sorted(r["rank"] for r in grp)
            assert ranks == list(range(1, len(grp) + 1))

    def test_bad_nprobe_rejected(self, index_dir, spark, sf_dir):
        q = _queries(spark, sf_dir)
        with pytest.raises(ValueError):
            ivf_index_topk(
                spark, index_dir, q, "vec_id", "embedding", k=3, nprobe=99
            )


class TestStreamingAnnIngest:
    def test_stream_delta_then_compact(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from dww_data_pipeline_spark.streaming.ann_ingest import (
            ann_ingest_batch,
            _load_centroids,
            compact_ann_delta,
            read_indexed_vectors,
            stream_ann_ingest,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        base = emb.filter(F.col("vec_id") < 300)
        incoming = emb.filter(F.col("vec_id") >= 300)
        idx = str(tmp_path / "index")
        build_ivf_index(base, "vec_id", "embedding", idx, n_lists=4, sample_size=200)

        # two source files -> two micro-batches
        src = str(tmp_path / "src")
        incoming.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(
            f"{src}/f0"
        )
        incoming.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(
            f"{src}/f1"
        )
        sdf = (
            spark.readStream.schema(incoming.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = stream_ann_ingest(sdf, idx, str(tmp_path / "ckpt"))
        q.awaitTermination(120)

        total = emb.count()
        view = read_indexed_vectors(spark, idx)
        assert view.count() == total
        # streamed vectors landed under the SAME list the batch
        # assigner would pick (frozen quantizer)
        cents = _load_centroids(spark, idx)
        from dww_data_pipeline_spark.operators.similarity import (
            _nearest_centroid_col,
        )

        expected = {
            (r["vec_id"], r["j"])
            for r in incoming.select(
                "vec_id", _nearest_centroid_col("embedding", cents).alias("j")
            ).collect()
        }
        got = {
            (r["vec_id"], int(r["list_id"]))
            for r in view.filter(F.col("vec_id") >= 300)
            .select("vec_id", "list_id")
            .collect()
        }
        assert got == expected

        # replaying a batch converges (idempotent overwrite)
        replay = incoming.filter(F.col("vec_id") % 2 == 0)
        ann_ingest_batch(replay, 0, idx, cents)
        assert read_indexed_vectors(spark, idx).count() == total

        # compaction folds deltas into the base lake and clears them
        n = compact_ann_delta(spark, idx)
        assert n >= 2
        import os as _os

        assert not _os.path.exists(_os.path.join(idx, "delta"))
        lake = spark.read.parquet(_os.path.join(idx, "vectors"))
        assert lake.count() == total
        # compaction is a no-op when there is nothing to fold
        assert compact_ann_delta(spark, idx) == 0

        # the persisted-index query path serves the merged lake
        qdf = (
            emb.filter(F.col("vec_id") % 100 == 0)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        rows = ivf_index_topk(
            spark, idx, qdf, "vec_id", "embedding", k=3, nprobe=2
        ).collect()
        assert rows
        # a post-ingest vector must be findable: query with its own
        # embedding -> rank-1 hit on itself (cos = 1.0)
        probe_id = 300
        self_q = emb.filter(F.col("vec_id") == probe_id).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        top = ivf_index_topk(
            spark, idx, self_q, "vec_id", "embedding", k=1, nprobe=1
        ).collect()
        assert top and top[0]["vec_id"] == probe_id
