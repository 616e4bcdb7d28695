"""Streaming shard ingest == batch shard write (streaming/ingest.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dww_data_pipeline_spark.sources.shards import write_training_shards
from dww_data_pipeline_spark.streaming.ingest import (
    read_shard_lake,
    shard_ingest_batch,
    stream_shard_ingest,
)

SF_DIR = "/root/testdata/sf0.001"
N_SHARDS = 8


def _manifest(df):
    """Per-shard manifest rows; shard may arrive as partition-column
    string — normalize to long."""
    return sorted(
        tuple(r)
        for r in df.groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("shard_pos").alias("sig"),
            F.sum(F.col("doc_id") * F.col("shard_pos")).alias("xsig"),
        )
        .collect()
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "n_chars"
    )


class TestStreamShardIngest:
    def test_stream_equals_batch(self, spark, docs, tmp_path):
        # batch reference lake
        batch_lake = str(tmp_path / "batch_lake")
        write_training_shards(docs, batch_lake, "doc_id", n_shards=N_SHARDS)

        # split the corpus into 2 source files -> 2 micro-batches
        src = str(tmp_path / "src")
        docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
            f"{src}/f0"
        )
        docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
            f"{src}/f1"
        )
        stream_lake = str(tmp_path / "stream_lake")
        sdf = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        q = stream_shard_ingest(
            sdf,
            stream_lake,
            checkpoint=str(tmp_path / "ckpt"),
            n_shards=N_SHARDS,
        )
        q.awaitTermination(120)

        back = read_shard_lake(spark, stream_lake)
        assert back.select("batch").distinct().count() >= 2  # really micro-batched
        assert _manifest(back) == _manifest(
            spark.read.parquet(batch_lake)
        )

    def test_replay_is_idempotent(self, spark, docs, tmp_path):
        lake = str(tmp_path / "lake")
        b0 = docs.limit(40)
        assert shard_ingest_batch(b0, lake, 0, n_shards=N_SHARDS) is True
        m1 = _manifest(read_shard_lake(spark, lake))

        # committed batch replays as a no-op
        assert shard_ingest_batch(b0, lake, 0, n_shards=N_SHARDS) is False
        assert _manifest(read_shard_lake(spark, lake)) == m1

        # crash window: files written but marker lost -> replay must
        # remove partials and converge to one copy
        os.remove(os.path.join(lake, "_commits", "0"))
        assert shard_ingest_batch(b0, lake, 0, n_shards=N_SHARDS) is True
        assert _manifest(read_shard_lake(spark, lake)) == m1

    def test_torn_batch_hidden_from_readers(self, spark, docs, tmp_path):
        lake = str(tmp_path / "lake")
        shard_ingest_batch(docs.limit(30), lake, 0, n_shards=N_SHARDS)
        shard_ingest_batch(docs.limit(60), lake, 1, n_shards=N_SHARDS)
        # crash window: batch 1's files exist but its marker was lost
        os.remove(os.path.join(lake, "_commits", "1"))
        seen = read_shard_lake(spark, lake)
        assert seen.select("batch").distinct().collect() == [
            spark.createDataFrame([(0,)], ["batch"]).first()
        ]
        # raw read (no marker filter) WOULD see the torn batch
        assert (
            spark.read.parquet(lake).select("batch").distinct().count() == 2
        )

    def test_object_store_path_rejected(self, docs):
        with pytest.raises(ValueError, match="transactional"):
            shard_ingest_batch(docs, "s3://bucket/lake", 0)

    def test_compaction_preserves_manifest_and_drops_torn(
        self, spark, docs, tmp_path
    ):
        from dww_data_pipeline_spark.streaming.ingest import compact_shard_lake

        lake = str(tmp_path / "lake")
        shard_ingest_batch(docs.limit(30), lake, 0, n_shards=N_SHARDS)
        shard_ingest_batch(docs.limit(80), lake, 1, n_shards=N_SHARDS)
        shard_ingest_batch(docs.limit(100), lake, 2, n_shards=N_SHARDS)
        os.remove(os.path.join(lake, "_commits", "2"))  # torn batch
        before = _manifest(read_shard_lake(spark, lake))
        n = compact_shard_lake(spark, lake, n_shards=N_SHARDS)
        after_df = read_shard_lake(spark, lake)
        assert _manifest(after_df) == before          # committed rows identical
        assert n == sum(r[1] for r in before)
        assert after_df.select("batch").distinct().count() == 1
        # torn batch-2 directories are gone from the compacted lake
        import glob as _glob

        assert not _glob.glob(os.path.join(lake, "shard=*", "batch=2"))
        # compaction is rerunnable (recovery path + idempotent result)
        compact_shard_lake(spark, lake, n_shards=N_SHARDS)
        assert _manifest(read_shard_lake(spark, lake)) == before


class TestStreamIncrementalDedup:
    """Dedup-at-ingest (streaming/dedup_ingest.py) == the d11/st13
    batch core, for a multi-micro-batch chopping of the feed.

    Decisions depend only on the fixed corpus index, so the union of
    per-micro-batch decision outputs must equal the one-shot batch
    answer REGARDLESS of how the stream is chopped — including
    out-of-id-order file arrival (feed files are NOT ordered by
    doc_id)."""

    def test_multi_microbatch_stream_equals_batch(self, spark, docs, tmp_path):
        from dww_data_pipeline_spark.plans.dedup_plans import (
            incremental_decisions,
        )
        from dww_data_pipeline_spark.streaming.dedup_ingest import (
            stream_incremental_dedup,
        )

        feed = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
        corpus = docs.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")

        batch_ans = sorted(
            tuple(r) for r in incremental_decisions(feed, corpus).collect()
        )
        assert batch_ans  # non-vacuous: the feed split is non-empty
        assert {t[1] for t in batch_ans} >= {"exact_dup", "keep"}

        # three source files -> three micro-batches, id-interleaved so
        # arrival order is not doc_id order
        src = str(tmp_path / "src")
        for i in range(3):
            feed.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
                f"{src}/f{i}"
            )
        sdf = (
            spark.readStream.schema(feed.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        out = str(tmp_path / "decisions")
        q = stream_incremental_dedup(
            sdf, corpus, out, checkpoint=str(tmp_path / "ckpt")
        )
        q.awaitTermination(180)
        for df in q.corpus_index.values():
            df.unpersist()

        import glob as _glob

        batch_dirs = _glob.glob(os.path.join(out, "batch=*"))
        assert len(batch_dirs) >= 3  # really micro-batched
        streamed = spark.read.option("basePath", out).parquet(
            os.path.join(out, "batch=*")
        ).select("doc_id", "decision", "n_matches")
        assert sorted(tuple(r) for r in streamed.collect()) == batch_ans


class TestStreamSketchRollup:
    """Streaming HLL partial-sketch rollup (streaming/sketch_rollup.py)
    == the batch union-path answer, for any decomposition on either
    side — mergeability (register-wise max) is decomposition- and
    order-independent, so the parity is EXACT equality of estimates,
    not a tolerance."""

    def test_stream_partials_union_equals_batch_union(self, spark, tmp_path):
        from pyspark.sql import functions as F  # noqa: F811

        from dww_data_pipeline_spark.streaming.sketch_rollup import (
            batch_rollup_estimates,
            rollup_estimates,
            stream_sketch_rollup,
        )

        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "ts", "user_id", "event_type"
        )

        # 3 source files chopped by event_id-free hash of user_id, so
        # (month, event_type) groups SPAN micro-batches
        src = str(tmp_path / "src")
        for i in range(3):
            ev.filter(F.crc32(F.col("user_id").cast("string")) % 3 == i) \
                .coalesce(1).write.parquet(f"{src}/f{i}")
        sdf = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        out = str(tmp_path / "partials")
        q = stream_sketch_rollup(sdf, out, checkpoint=str(tmp_path / "ckpt"))
        q.awaitTermination(120)

        streamed = rollup_estimates(spark, out)
        # real incremental case: some group assembled from >= 2 partials
        assert streamed.filter(F.col("n_partials") >= 2).count() > 0

        got = sorted(
            tuple(r)
            for r in streamed.select(
                "month", "event_type", "est_distinct"
            ).collect()
        )
        # batch reference over a DIFFERENT decomposition (odd/even user)
        want = sorted(
            tuple(r)
            for r in batch_rollup_estimates(
                ev, split_col=(F.col("user_id") % 2)
            ).collect()
        )
        assert got == want
        # and over no decomposition at all (single partial per group)
        want1 = sorted(
            tuple(r) for r in batch_rollup_estimates(ev).collect()
        )
        assert got == want1


class TestStreamLmScore:
    """LM gate at ingest (streaming/lm_ingest.py) == the st15 batch
    core: scores depend only on the frozen corpus model, so the union
    of per-micro-batch score outputs must equal the one-shot batch
    answer regardless of how the stream is chopped."""

    def test_multi_microbatch_stream_equals_batch(self, spark, docs, tmp_path):
        from dww_data_pipeline_spark.plans.curation_plans import (
            lm_model,
            lm_score,
        )
        from dww_data_pipeline_spark.streaming.lm_ingest import stream_lm_score

        feed = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
        # at sf0.001 the corpus covers every feed bigram, so the OOV
        # path is exercised by construction: one synthetic doc whose
        # tokens cannot exist in the corpus
        feed = feed.unionByName(
            spark.createDataFrame(
                [(999_000_003, "zzqx1 zzqx2 zzqx3 zzqx1 zzqx2")],
                "doc_id long, text string",
            )
        )
        corpus = docs.filter(F.col("doc_id") % 10 != 0).select(
            "doc_id", "text"
        )

        batch_ans = sorted(
            tuple(r) for r in lm_score(feed, lm_model(corpus)).collect()
        )
        assert batch_ans
        # non-vacuous OOV path, and fully-OOV docs score finite
        oov_row = [t for t in batch_ans if t[0] == 999_000_003][0]
        assert oov_row[1] == 4 and oov_row[2] == 4
        import math

        assert math.isfinite(oov_row[3]) and oov_row[3] < 0

        src = str(tmp_path / "src")
        for i in range(3):
            feed.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
                f"{src}/f{i}"
            )
        sdf = (
            spark.readStream.schema(feed.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        out = str(tmp_path / "scores")
        q = stream_lm_score(sdf, corpus, out, checkpoint=str(tmp_path / "ckpt"))
        q.awaitTermination(180)
        for df in q.lm_model.values():
            df.unpersist()

        import glob as _glob

        batch_dirs = _glob.glob(os.path.join(out, "batch=*"))
        assert len(batch_dirs) >= 3  # really micro-batched
        streamed = spark.read.option("basePath", out).parquet(
            os.path.join(out, "batch=*")
        ).select("doc_id", "n_bigrams", "n_oov", "avg_logp")
        assert sorted(tuple(r) for r in streamed.collect()) == batch_ans


class TestStreamCusum:
    """CUSUM-at-ingest (streaming/drift_ingest.py) == the ev19 batch
    core after the final micro-batch, for a multi-micro-batch
    chopping of the event feed: the versioned daily-count state makes
    the accumulated series identical to the batch table, and the walk
    is the SAME cusum_walk the oracle-checked query runs."""

    def test_final_microbatch_equals_batch(self, spark, tmp_path):
        from dww_data_pipeline_spark.plans.registry import REGISTRY, all_queries
        from dww_data_pipeline_spark.streaming.drift_ingest import stream_cusum
        from dww_data_pipeline_spark.sources.catalog import load_table

        all_queries()
        sf_dir = "/root/testdata/sf0.001"
        batch_ans = sorted(
            tuple(r)
            for r in REGISTRY["ev19_cusum_changepoint"].spark(spark, sf_dir).collect()
        )
        assert batch_ans

        ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
        src = str(tmp_path / "src")
        # three source files -> three micro-batches, interleaved by
        # timestamp second so each batch touches most days (arrival order
        # is NOT day order)
        for i in range(3):
            ev.filter(F.second("ts") % 3 == i).coalesce(1).write.parquet(
                f"{src}/f{i}"
            )
        sdf = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        out = str(tmp_path / "drift")
        q = stream_cusum(
            sdf,
            out,
            checkpoint=str(tmp_path / "ckpt"),
            state_dir=str(tmp_path / "state"),
        )
        q.awaitTermination(180)

        import os

        batches = sorted(
            int(d.split("=")[1]) for d in os.listdir(out) if d.startswith("batch=")
        )
        assert len(batches) == 3  # one per source file
        final = sorted(
            tuple(r)
            for r in spark.read.parquet(f"{out}/batch={batches[-1]}").collect()
        )
        assert final == batch_ans

        # intermediate batches carry the same schema and only-seen days
        mid = spark.read.parquet(f"{out}/batch={batches[0]}")
        assert mid.columns == [
            "event_type",
            "day",
            "cnt",
            "cusum_pos",
            "cusum_neg",
            "alarm_pos",
            "alarm_neg",
        ]
        assert 0 < mid.count() <= len(batch_ans)


class TestStreamContaminationGate:
    """Contamination-at-ingest (streaming/contamination_ingest.py) ==
    the st17 batch core, for a multi-micro-batch chopping of the feed.

    Flags depend only on the fixed corpus fingerprint set, so the
    union of per-micro-batch outputs must equal the one-shot batch
    answer regardless of chopping — including out-of-id-order file
    arrival."""

    def test_multi_microbatch_stream_equals_batch(self, spark, docs, tmp_path):
        from dww_data_pipeline_spark.plans.dedup_plans import (
            exact_contamination_fingerprints,
            exact_contamination_gate,
        )
        from dww_data_pipeline_spark.streaming.contamination_ingest import (
            stream_contamination_gate,
        )

        feed = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
        corpus = docs.filter(F.col("doc_id") % 5 != 0).select("doc_id", "text")

        fps = exact_contamination_fingerprints(corpus)
        batch_ans = sorted(
            tuple(r) for r in exact_contamination_gate(feed, fps).collect()
        )
        assert batch_ans  # non-vacuous feed
        # the sf0.001 split really contains contaminated arrivals
        assert any(t[4] for t in batch_ans), "split yields no hits"
        assert any(not t[4] for t in batch_ans)

        src = str(tmp_path / "src")
        for i in range(3):
            feed.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
                f"{src}/f{i}"
            )
        sdf = (
            spark.readStream.schema(feed.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        out = str(tmp_path / "flags")
        q = stream_contamination_gate(
            sdf, corpus, out, checkpoint=str(tmp_path / "ckpt")
        )
        q.awaitTermination(180)
        q.fingerprints.unpersist()

        import glob as _glob

        batch_dirs = _glob.glob(os.path.join(out, "batch=*"))
        assert len(batch_dirs) >= 3  # really micro-batched
        streamed = spark.read.option("basePath", out).parquet(
            os.path.join(out, "batch=*")
        ).select(
            "doc_id", "n_windows", "n_contaminated", "first_hit_pos",
            "contaminated",
        )
        assert sorted(tuple(r) for r in streamed.collect()) == batch_ans

    def test_planted_contamination_flagged(self, spark):
        """A synthetic arrival carrying a corpus-duplicated 50-token
        block is flagged with the exact window count and first
        position; a clean arrival is not."""
        from dww_data_pipeline_spark.plans.dedup_plans import (
            exact_contamination_fingerprints,
            exact_contamination_gate,
        )

        boiler = " ".join(f"b{i}" for i in range(50))
        corpus = spark.createDataFrame(
            [
                (1, boiler + " " + " ".join(f"x{i}" for i in range(10))),
                (2, " ".join(f"y{i}" for i in range(10)) + " " + boiler),
                (3, " ".join(f"z{i}" for i in range(60))),
            ],
            "doc_id long, text string",
        )
        fps = exact_contamination_fingerprints(corpus)
        arriving = spark.createDataFrame(
            [
                (100, " ".join(f"p{i}" for i in range(5)) + " " + boiler),
                (101, " ".join(f"q{i}" for i in range(70))),
                (102, "short doc"),
            ],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in exact_contamination_gate(arriving, fps).collect()
        }
        assert rows[100]["contaminated"]
        assert rows[100]["n_contaminated"] == 1
        assert rows[100]["first_hit_pos"] == 6
        assert not rows[101]["contaminated"] and rows[101]["n_windows"] == 21
        assert not rows[102]["contaminated"] and rows[102]["n_windows"] == 0
        assert rows[102]["first_hit_pos"] is None


class TestStreamMixtureAdmission:
    """Mixture-admission-at-ingest (streaming/mixture_ingest.py) ==
    the st18 batch core, for a multi-micro-batch chopping of the feed.

    Rates are frozen from the corpus split, so the union of
    per-micro-batch flags must equal the one-shot batch answer
    regardless of chopping."""

    def test_multi_microbatch_stream_equals_batch(self, spark, tmp_path):
        from dww_data_pipeline_spark.plans.pipeline_ext import (
            mixture_admission_flags,
            mixture_rates,
        )
        from dww_data_pipeline_spark.streaming.mixture_ingest import (
            stream_mixture_admission,
        )

        # the module docs fixture drops lang — read it here
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "lang"
        )
        feed = d.filter(F.col("doc_id") % 5 == 0)
        corpus = d.filter(F.col("doc_id") % 5 != 0)

        rates = mixture_rates(corpus)
        batch_ans = sorted(
            tuple(r) for r in mixture_admission_flags(feed, rates).collect()
        )
        assert batch_ans
        assert any(t[2] == 1 for t in batch_ans), "no admissions in split"
        assert any(t[2] == 0 for t in batch_ans), "no rejections in split"

        src = str(tmp_path / "src")
        for i in range(3):
            feed.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
                f"{src}/f{i}"
            )
        sdf = (
            spark.readStream.schema(feed.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        out = str(tmp_path / "flags")
        q = stream_mixture_admission(
            sdf, corpus, out, checkpoint=str(tmp_path / "ckpt")
        )
        q.awaitTermination(180)
        q.rates.unpersist()

        import glob as _glob

        batch_dirs = _glob.glob(os.path.join(out, "batch=*"))
        assert len(batch_dirs) >= 3  # really micro-batched
        streamed = spark.read.option("basePath", out).parquet(
            os.path.join(out, "batch=*")
        ).select("doc_id", "lang", "admitted")
        assert sorted(tuple(r) for r in streamed.collect()) == batch_ans

    def test_unseen_lang_rejected(self, spark):
        """A frozen mixture admits nothing it has never seen: arrivals
        in a language absent from the corpus are rejected outright."""
        from dww_data_pipeline_spark.plans.pipeline_ext import (
            mixture_admission_flags,
            mixture_rates,
        )

        corpus = spark.createDataFrame(
            [(i, "en") for i in range(50)], "doc_id long, lang string"
        )
        arrivals = spark.createDataFrame(
            [(100, "xx"), (101, "en")], "doc_id long, lang string"
        )
        flags = {
            r["doc_id"]: r["admitted"]
            for r in mixture_admission_flags(
                arrivals, mixture_rates(corpus)
            ).collect()
        }
        assert flags[100] == 0


class TestStreamTokenizerOov:
    """Tokenizer-drift-at-ingest (streaming/tokenizer_ingest.py) ==
    the st19 per-doc core, for a multi-micro-batch chopping of the
    feed.  Metrics are frozen-store functions of each document alone,
    so the union of per-micro-batch rows must equal the one-shot
    batch answer regardless of chopping."""

    def test_multi_microbatch_stream_equals_batch(self, spark, tmp_path):
        import shutil
        import tempfile

        from dww_data_pipeline_spark.sources.tokenizer_store import (
            build_tokenizer_store,
            frozen_oov_doc_metrics,
        )
        from dww_data_pipeline_spark.streaming.tokenizer_ingest import (
            stream_tokenizer_oov,
        )

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        feed = d.filter(F.col("doc_id") % 4 == 3)
        base = d.filter(F.col("doc_id") % 4 != 3)

        store = tempfile.mkdtemp(prefix="dww_tokstore_st19test_")
        try:
            build_tokenizer_store(base, store)
            batch_ans = sorted(
                tuple(r)
                for r in frozen_oov_doc_metrics(feed, spark, store).collect()
            )
            assert batch_ans
            assert any(t[1] > 0 for t in batch_ans), "no tokens in feed"

            src = str(tmp_path / "src")
            for i in range(3):
                feed.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
                    f"{src}/f{i}"
                )
            sdf = (
                spark.readStream.schema(feed.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{src}/f*")
            )
            out = str(tmp_path / "metrics")
            q = stream_tokenizer_oov(
                sdf, store, out, checkpoint=str(tmp_path / "ckpt")
            )
            q.awaitTermination(300)

            import glob as _glob

            batch_dirs = _glob.glob(os.path.join(out, "batch=*"))
            assert len(batch_dirs) >= 3  # really micro-batched
            streamed = spark.read.option("basePath", out).parquet(
                os.path.join(out, "batch=*")
            ).select("doc_id", "n_tokens", "oov_tokens", "chars", "bpe_tokens")
            assert sorted(tuple(r) for r in streamed.collect()) == batch_ans
        finally:
            shutil.rmtree(store, ignore_errors=True)

    def test_oov_words_counted_and_zero_token_docs_emit(self, spark):
        import shutil
        import tempfile

        from dww_data_pipeline_spark.sources.tokenizer_store import (
            build_tokenizer_store,
            frozen_oov_doc_metrics,
        )

        base = spark.createDataFrame(
            [(i, "the quick brown fox jumps over the lazy dog")
             for i in range(8)],
            "doc_id long, text string",
        )
        store = tempfile.mkdtemp(prefix="dww_tokstore_oovdoc_")
        try:
            build_tokenizer_store(base, store)
            arrivals = spark.createDataFrame(
                [(100, "the quick zzyzxq"), (101, ""), (102, None)],
                "doc_id long, text string",
            )
            got = {
                r["doc_id"]: tuple(r)[1:]
                for r in frozen_oov_doc_metrics(
                    arrivals, spark, store
                ).collect()
            }
            n_tokens, oov, chars, bpe = got[100]
            assert n_tokens == 3 and oov == 1 and chars == len("thequickzzyzxq")
            assert bpe >= 3  # OOV word segments into >= 1 symbol
            assert got[101] == (0, 0, 0, 0)
            assert got[102] == (0, 0, 0, 0)
        finally:
            shutil.rmtree(store, ignore_errors=True)


class TestStreamCoarseDrift:
    """ANN-staleness monitoring at ingest (streaming/ann_ingest.py's
    stream_coarse_drift_monitor) == the st20 per-vector core, for a
    multi-micro-batch chopping of the feed.  A vector's cell depends
    only on the frozen persisted quantizer and the vector itself, so
    the union of per-micro-batch assignment rows must equal the
    one-shot batch assignment regardless of chopping — and feeding
    the streamed segments into st20's factored monitor yields the
    identical drift rows as the batch-assembled corpus."""

    def test_multi_microbatch_stream_equals_batch(self, spark, tmp_path):
        import glob as _glob
        import shutil
        import tempfile

        from dww_data_pipeline_spark.plans.pipeline_ext2 import (
            _IVF_K,
            _PQ_VQ_SPARK,
            _ivfpq_coarse_expr,
        )
        from dww_data_pipeline_spark.plans.selection_plans import (
            _S19_STEPS,
            batch_assignment_drift,
        )
        from dww_data_pipeline_spark.sources.ann_index import (
            build_coarse_store,
            load_coarse_centroids,
        )
        from dww_data_pipeline_spark.streaming.ann_ingest import (
            stream_coarse_drift_monitor,
        )

        e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        q = e.select(
            "vec_id",
            F.expr(_PQ_VQ_SPARK).alias("vq"),
            F.expr(
                "CASE WHEN vec_id % 4 = 3 "
                "THEN CAST((vec_id % 16) div 4 AS INT) + 1 ELSE 0 END"
            ).alias("batch"),
        )
        base = q.filter(F.col("batch") == 0)
        feed = q.filter(F.col("batch") >= 1)

        store = tempfile.mkdtemp(prefix="dww_coarse_st20test_")
        try:
            build_coarse_store(base.select("vec_id", "vq"), store)
            ccents = load_coarse_centroids(spark, store)
            one_shot = sorted(
                (int(r["vec_id"]), int(r["cluster"]))
                for r in feed.select(
                    "vec_id",
                    F.expr(_ivfpq_coarse_expr(ccents)).alias("cluster"),
                ).collect()
            )
            assert one_shot

            src = str(tmp_path / "src")
            feed_io = feed.select("vec_id", "vq")
            for i in range(3):
                feed_io.filter(F.col("vec_id") % 3 == i).coalesce(
                    1
                ).write.parquet(f"{src}/f{i}")
            sdf = (
                spark.readStream.schema(feed_io.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{src}/f*")
            )
            out = str(tmp_path / "assign")
            sq = stream_coarse_drift_monitor(
                sdf, store, out, checkpoint=str(tmp_path / "ckpt")
            )
            sq.awaitTermination(300)

            batch_dirs = _glob.glob(os.path.join(out, "batch=*"))
            assert len(batch_dirs) >= 3  # really micro-batched
            streamed = spark.read.option("basePath", out).parquet(
                os.path.join(out, "batch=*")
            )
            assert (
                sorted(
                    (int(r["vec_id"]), int(r["cluster"]))
                    for r in streamed.select("vec_id", "cluster").collect()
                )
                == one_shot
            )

            # the factored monitor over the STREAMED segments (mapped
            # back to arrival steps) == over the batch-assembled corpus
            arrival_step = F.expr(
                "CAST((vec_id % 16) div 4 AS INT) + 1"
            ).alias("batch")
            from_stream = streamed.select(
                "vec_id", arrival_step, "cluster"
            ).unionByName(
                base.select(
                    "vec_id",
                    F.lit(0).cast("int").alias("batch"),
                    F.expr(_ivfpq_coarse_expr(ccents)).alias("cluster"),
                )
            )
            from_batch = q.select(
                "vec_id",
                "batch",
                F.expr(_ivfpq_coarse_expr(ccents)).alias("cluster"),
            )
            rows_stream = sorted(
                tuple(r)
                for r in batch_assignment_drift(
                    from_stream, _S19_STEPS, _IVF_K
                ).collect()
            )
            rows_batch = sorted(
                tuple(r)
                for r in batch_assignment_drift(
                    from_batch, _S19_STEPS, _IVF_K
                ).collect()
            )
            assert rows_stream == rows_batch
            assert len(rows_batch) == _S19_STEPS
        finally:
            shutil.rmtree(store, ignore_errors=True)

    def test_zero_arrival_batch_emits_row(self, spark):
        from dww_data_pipeline_spark.plans.selection_plans import (
            batch_assignment_drift,
        )

        assigned = spark.createDataFrame(
            # base: 3 vectors in cell 0, 1 in cell 1; batch 1 arrives
            # all-cell-1 (maximal reshuffle), batches 2-3 arrive empty
            [(0, 0, 0), (1, 0, 0), (2, 0, 0), (3, 0, 1),
             (10, 1, 1), (11, 1, 1)],
            "vec_id long, batch int, cluster int",
        )
        rows = {
            r["batch"]: r
            for r in batch_assignment_drift(assigned, 3, 2).collect()
        }
        assert set(rows) == {1, 2, 3}
        # batch 1: a=(3,1), b=(0,2), n1=4, n2=2
        # drift = |3*2-0*4| + |1*2-2*4| = 6 + 6 = 12 > n1*n2/2 -> alarm
        r1 = rows[1]
        assert r1["n_arrived"] == 2 and r1["drift_num"] == 12
        assert r1["alarm"] is True
        assert r1["top_cell"] == 1 and r1["top_share"] == 1.0
        # zero-arrival batches still emit, un-alarmed, null top cell
        for b in (2, 3):
            r = rows[b]
            assert r["n_arrived"] == 0 and r["drift_num"] == 0
            assert r["alarm"] is False and r["top_cell"] is None
            assert r["l1_assign_drift"] == 0.0


class TestStreamPacking:
    """Sequence packing at ingest (streaming/pack_ingest.py) — the
    stateful st21 core.  Packing is order-sensitive, so the open bin
    must CARRY across micro-batches via applyInPandasWithState; the
    stream emits a bin exactly once, when it closes, and the final
    open bin per shard stays in state — so closed-stream output must
    equal the one-shot bins minus each shard's last bin."""

    def test_pack_chunk_chopping_invariance(self):
        from dww_data_pipeline_spark.streaming.pack_ingest import (
            flush_state,
            pack_chunk,
        )

        ns = [5, 30, 1, 0, 29, 31, 2, 2, 40, 7, 30, 30, 30, 3]
        one_shot, st = pack_chunk(ns, None, 30)
        one_shot = one_shot + flush_state(st)
        for cuts in [(3,), (1, 2, 5, 9), (7, 7), tuple(range(1, 14))]:
            state, got = None, []
            prev = 0
            for c in list(cuts) + [len(ns)]:
                closed, state = pack_chunk(ns[prev:c], state, 30)
                got.extend(closed)
                prev = c
            assert got + flush_state(state) == one_shot, cuts

    def test_multi_microbatch_stream_equals_batch(self, spark, tmp_path):
        from dww_data_pipeline_spark.plans.text_plans import (
            _T40_CAPACITY,
            _T40_SHARDS,
            t40_sequence_packing,
        )
        from dww_data_pipeline_spark.plans.text_exprs import spark_tokens
        from dww_data_pipeline_spark.streaming.pack_ingest import (
            stream_sequence_packing,
        )

        one_shot = {
            (r["shard"], r["bin_id"]): (
                r["n_docs"], r["tokens"], r["has_oversize"]
            )
            for r in t40_sequence_packing(spark, SF_DIR).collect()
        }
        last_bin = {}
        for shard, bin_id in one_shot:
            last_bin[shard] = max(last_bin.get(shard, 0), bin_id)
        expected_closed = {
            k: v for k, v in one_shot.items() if k[1] < last_bin[k[0]]
        }

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        toks = d.select(
            "doc_id",
            (F.col("doc_id") % _T40_SHARDS).alias("shard"),
            F.coalesce(F.size(spark_tokens(F.col("text"))), F.lit(0))
            .cast("long")
            .alias("n"),
        )
        # ordered arrival: file f0 holds the lowest doc_ids, f1 the
        # next tercile, f2 the rest — drained one file per trigger
        src = str(tmp_path / "src")
        n_docs = toks.count()
        ordered = toks.orderBy("doc_id").collect()
        for i in range(3):
            chunk = ordered[i * n_docs // 3: (i + 1) * n_docs // 3]
            spark.createDataFrame(chunk, toks.schema).coalesce(
                1
            ).write.parquet(f"{src}/f{i}")
        sdf = (
            spark.readStream.schema(toks.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        out = str(tmp_path / "bins")
        q = stream_sequence_packing(
            sdf, str(tmp_path / "ckpt"), out, capacity=_T40_CAPACITY
        )
        q.awaitTermination(300)

        import glob as _glob

        batch_dirs = _glob.glob(os.path.join(out, "batch=*"))
        assert len(batch_dirs) >= 3  # really micro-batched
        streamed = {
            (r["shard"], r["bin_id"]): (
                r["n_docs"], r["tokens"], r["has_oversize"]
            )
            for r in spark.read.option("basePath", out)
            .parquet(os.path.join(out, "batch=*"))
            .collect()
        }
        assert streamed == expected_closed
        assert streamed  # non-degenerate: bins really closed mid-stream


class TestStreamEmbeddingBins:
    """Embedding-PSI at ingest (streaming/drift_ingest.py's
    stream_embedding_bins) == the st22 per-vector core: fixed-grid
    (dim, bin) rows are chop-invariant and histograms are additive,
    so re-aggregated per-batch segments equal the one-shot counts."""

    def test_multi_microbatch_stream_equals_batch(self, spark, tmp_path):
        import glob as _glob

        from dww_data_pipeline_spark.plans.corpus_plans import (
            embedding_bin_counts,
        )
        from dww_data_pipeline_spark.streaming.drift_ingest import (
            stream_embedding_bins,
        )

        e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        feed = e.filter(F.col("vec_id") % 4 == 3)
        one_shot = {
            (r["dim"], r["bin"]): r["c"]
            for r in embedding_bin_counts(feed, F.lit(1).cast("int"))
            .select("dim", "bin", "c")
            .collect()
        }
        assert one_shot

        src = str(tmp_path / "src")
        for i in range(3):
            feed.filter(F.col("vec_id") % 3 == i).coalesce(1).write.parquet(
                f"{src}/f{i}"
            )
        sdf = (
            spark.readStream.schema(feed.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        out = str(tmp_path / "bins")
        q = stream_embedding_bins(sdf, out, str(tmp_path / "ckpt"))
        q.awaitTermination(300)

        batch_dirs = _glob.glob(os.path.join(out, "batch=*"))
        assert len(batch_dirs) >= 3
        streamed = {
            (r["dim"], r["bin"]): r["c"]
            for r in spark.read.option("basePath", out)
            .parquet(os.path.join(out, "batch=*"))
            .groupBy("dim", "bin")
            .agg(F.sum("c").alias("c"))
            .collect()
        }
        assert streamed == one_shot
