"""END-TO-END LLM preprocessing pipeline: the full DAG a training-data
team would run on this engine, composed ONLY from registry operators —

    documents
      -> t13 corpus filter gate   (keep/drop + audited reasons)
      -> d9-style dedup keep-best (LSH -> components -> best per group)
      -> t7 chunking              (64-token windows, stride 48)
      -> partitioned gold write   (pruned reads downstream)
    embeddings of survivors -> e3 L2 normalize -> gold

Assertions are flow invariants (conservation, ordering, idempotence,
partition pruning), not re-implementations — the per-operator math is
already differentially verified against DuckDB by the registry.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dww_data_pipeline_spark.plans.registry import all_queries


@pytest.fixture(scope="module")
def qs():
    return all_queries()


class TestLlmPipelineEndToEnd:
    def test_full_preprocessing_dag(self, spark, sf_dir, qs, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("gold")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_docs = docs.count()

        # 1. filter gate: keep decisions partition the corpus exactly
        gate = qs["t13_corpus_filter_decision"](spark, sf_dir).cache()
        assert gate.count() == n_docs
        kept = gate.filter(F.col("keep")).select("doc_id")
        dropped = gate.filter(~F.col("keep"))
        assert kept.count() + dropped.count() == n_docs
        # every dropped doc carries at least one audited reason
        assert dropped.filter(F.col("reasons") == "").count() == 0

        # 2. dedup keep-best over the SURVIVORS: keeper per component
        best = qs["d9_dedup_keep_best"](spark, sf_dir)
        survivors = (
            kept.join(best, "doc_id")
            .filter(F.col("kept"))
            .select("doc_id")
        )
        n_survivors = survivors.count()
        assert 0 < n_survivors <= n_docs

        # 3. chunking the surviving docs: every chunk traces to a
        # survivor, chunk ids dense from 0
        chunks = qs["t7_chunking"](spark, sf_dir).join(survivors, "doc_id")
        per_doc = chunks.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("chunk_id").alias("lo"),
            F.max("chunk_id").alias("hi"),
        )
        bad = per_doc.filter(
            (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)
        )
        assert bad.count() == 0

        # 4. gold write through the REAL training-shard serializer
        # (content-addressed md5 sharding, t21's layout); reads prune
        from dww_data_pipeline_spark.sources.shards import write_training_shards

        gold = chunks.withColumn(
            "chunk_uid",
            F.concat_ws("_", F.col("doc_id"), F.col("chunk_id")),
        )
        write_training_shards(gold, str(tmp / "chunks"), "chunk_uid", n_shards=8)
        back = spark.read.parquet(str(tmp / "chunks"))
        assert back.count() == chunks.count()
        plan = (
            back.filter(F.col("shard") == 3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters: [isnotnull(shard" in plan

        # 5. embeddings of survivors, L2-normalized for serving —
        # e3 emits (vec_id, dim, nval) rows; sum of squares per vector
        # must be 1 (nval rounds to 6 decimals, hence the tolerance)
        norm = qs["e3_embedding_normalize"](spark, sf_dir)
        emb_gold = norm.join(
            survivors.select(F.col("doc_id").alias("vec_id")), "vec_id"
        )
        sq = emb_gold.groupBy("vec_id").agg(
            F.sum(F.col("nval") * F.col("nval")).alias("s")
        )
        assert sq.count() > 0
        assert sq.filter(F.abs(F.col("s") - 1.0) > 1e-4).count() == 0
        gate.unpersist()

    def test_gate_is_idempotent_and_deterministic(self, spark, sf_dir, qs):
        a = qs["t13_corpus_filter_decision"](spark, sf_dir)
        b = qs["t13_corpus_filter_decision"](spark, sf_dir)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestIncrementalRefreshEndToEnd:
    def test_incremental_refresh_dag(self, spark, sf_dir, qs):
        """Compose the late round-3 stages the way a periodic corpus
        refresh runs them: snapshot diff -> decontaminate only the new
        work -> mixture admission -> curriculum deciles."""
        diff = qs["d13_snapshot_diff"](spark, sf_dir).cache()
        # statuses must match the synthetic snapshot construction
        assert diff.filter(
            (F.col("status") == "changed") & (F.col("doc_id") % 11 != 0)
        ).count() == 0
        assert diff.filter(
            (F.col("status") == "removed") & (F.col("doc_id") % 5 != 0)
        ).count() == 0
        assert diff.filter(
            (F.col("status") == "added") & (F.col("doc_id") % 7 != 0)
        ).count() == 0
        work = diff.filter(F.col("status").isin("added", "changed")).select("doc_id")
        n_work = work.count()
        assert n_work > 0

        # only the work set is screened against the eval slice — the
        # point of the diff is that unchanged docs are never reprocessed
        from dww_data_pipeline_spark.plans.dedup_plans import (
            build_eval_gram_index,
            decontamination_hits,
        )

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        eval_docs = d.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
        work_docs = d.join(work, "doc_id").select("doc_id", "text")
        flags = decontamination_hits(work_docs, build_eval_gram_index(eval_docs))
        clean = work.join(flags.select("doc_id"), "doc_id", "left_anti")
        assert clean.count() + flags.count() == n_work  # flags partition work

        # mixture admission restricted to the clean work docs
        sample = qs["t16_mixture_sample"](spark, sf_dir).join(clean, "doc_id")
        n_admitted = sample.count()
        assert 0 < n_admitted <= clean.count()

        # curriculum deciles cover every admitted doc with a valid bucket
        dec = qs["t17_curriculum_deciles"](spark, sf_dir).join(
            sample.select("doc_id"), "doc_id"
        )
        assert dec.count() == n_admitted
        rng = dec.agg(F.min("decile").alias("lo"), F.max("decile").alias("hi")).collect()[0]
        assert 1 <= rng["lo"] and rng["hi"] <= 10
        diff.unpersist()


class TestCurationDagRound4:
    def test_span_dedup_quality_contamination_packing_dag(
        self, spark, sf_dir, qs
    ):
        """Round-4 composition: chunk-level span dedup -> bigram-LM
        quality floor -> graded contamination cap -> sequence packing.
        Each stage's output keys must nest inside the previous one, and
        the packing output must cover exactly the surviving docs that
        have chunkable text."""
        from pyspark.sql import functions as F

        # stage 1: span dedup — every doc survives (as a row), some
        # shrink; dedup stats must be internally consistent
        spans = qs["d14_chunk_dedup"](spark, sf_dir)
        bad = spans.filter(
            (F.col("n_removed") < 0) | (F.col("n_removed") > F.col("n_chunks"))
        )
        assert bad.count() == 0
        n_docs = spans.count()

        # stage 2: LM-quality floor at the corpus median avg_logp —
        # half-ish of the corpus passes, all scored docs are covered
        lm = qs["t19_bigram_lm_score"](spark, sf_dir)
        assert lm.count() <= n_docs  # docs with >= 2 tokens
        median = lm.agg(F.percentile("avg_logp", F.lit(0.5))).collect()[0][0]
        quality_pass = lm.filter(F.col("avg_logp") >= median).select("doc_id")
        n_quality = quality_pass.count()
        assert 0 < n_quality <= lm.count()

        # stage 3: contamination cap — keep share <= 0.5; clean docs
        # (share 0.0) must all survive this gate
        contam = qs["t20_contamination_share"](spark, sf_dir)
        kept = contam.filter(F.col("contamination_share") <= 0.5).select("doc_id")
        survivors = quality_pass.join(kept, "doc_id")
        n_surv = survivors.count()
        assert n_surv <= n_quality

        # stage 4: packing restricted to survivors — bins must be
        # dense from 0 and every chunk accounted for exactly once
        packed = qs["t14_sequence_packing"](spark, sf_dir).join(
            survivors, "doc_id"
        )
        n_chunks = packed.count()
        assert n_chunks > 0
        per_doc = packed.groupBy("doc_id").count()
        assert per_doc.count() <= n_surv
        # start_tok strictly increasing within a doc's chunks
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy("chunk_id")
        mono = packed.withColumn("_prev", F.lag("start_tok").over(w)).filter(
            F.col("_prev").isNotNull() & (F.col("start_tok") <= F.col("_prev"))
        )
        assert mono.count() == 0
