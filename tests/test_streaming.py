"""Structured Streaming tests: the REAL readStream path (file source,
watermark, memory sink) must converge to the same answer as the batch
run of the identical function — Spark's unified-API property that the
plan registry's oracles rely on.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dww_data_pipeline_spark.sources.catalog import load_table
from dww_data_pipeline_spark.streaming.events import (
    read_events_stream,
    session_window_agg,
    stream_dedup,
    tumbling_window_agg,
)


def _run_stream_to_memory(sdf, name: str, mode: str = "complete"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


class TestLateData:
    def test_watermark_drops_late_events(self, spark, tmp_path):
        """Two micro-batches: batch 1 advances the watermark past a
        late event delivered in batch 2 — the late event must be
        dropped from the windowed aggregate (the batch run of the same
        function WOULD count it)."""
        import os
        import pandas as pd

        stage = tmp_path / "stream"
        stage.mkdir()
        on_time = pd.DataFrame(
            {
                "event_id": [1, 2],
                "ts": pd.to_datetime(["2024-01-01 10:10:00", "2024-01-01 11:50:00"]).tz_localize("UTC"),
                "user_id": [1, 1],
                "event_type": ["click", "click"],
                "value": [1.0, 1.0],
                "props": ["{}", "{}"],
            }
        )
        late = pd.DataFrame(
            {
                "event_id": [3],
                "ts": pd.to_datetime(["2024-01-01 08:00:00"]).tz_localize("UTC"),  # far behind watermark
                "user_id": [1],
                "event_type": ["click"],
                "value": [1.0],
                "props": ["{}"],
            }
        )
        f1, f2 = str(stage / "b1.parquet"), str(stage / "b2.parquet")
        # micros, not pandas' default nanos: TIMESTAMP(NANOS) would read
        # back as long under the session's nanos compat flag
        on_time.to_parquet(f1, coerce_timestamps="us")

        schema = spark.read.parquet(f1).schema
        stream = spark.readStream.schema(schema).parquet(str(stage))
        agg = tumbling_window_agg(stream, width="1 hour", watermark="30 minutes")
        q = (
            agg.writeStream.format("memory")
            .queryName("late_t")
            .outputMode("append")
            .start()
        )
        try:
            # batch 1: only the on-time file exists → watermark advances
            q.processAllAvailable()
            # batch 2: the late file arrives AFTER the watermark moved
            late.to_parquet(f2, coerce_timestamps="us")
            q.processAllAvailable()
            got = {
                str(r["window_start"]): r["n_events"]
                for r in spark.sql("SELECT * FROM late_t").collect()
            }
        finally:
            q.stop()
        # batch 1: events at 10:10 and 11:50 → watermark 11:20 after it;
        # batch 2's 08:00 event is far behind → its window never appears
        assert "2024-01-01 10:00:00" in got and got["2024-01-01 10:00:00"] == 1
        assert "2024-01-01 08:00:00" not in got
        # the batch run of the SAME function does count the late event
        batch = tumbling_window_agg(spark.read.parquet(str(stage)))
        batch_windows = {
            str(r["window_start"]): r["n_events"] for r in batch.collect()
        }
        assert batch_windows["2024-01-01 08:00:00"] == 1


class TestStreamStreamJoin:
    def test_interval_join_stream_equals_batch(self, spark, sf_dir):
        """Stream-stream interval join (watermarked both sides) must
        produce the batch interval-join result on the same data."""
        from dww_data_pipeline_spark.plans.streaming_plans import (
            interval_join_clicks_purchases,
        )

        stream = read_events_stream(spark, sf_dir)
        wm = stream.withWatermark("ts", "30 minutes")
        q = (
            interval_join_clicks_purchases(wm, wm)
            .writeStream.format("memory")
            .queryName("ssjoin_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        try:
            got = {
                (r["click_id"], r["purchase_id"])
                for r in spark.sql("SELECT * FROM ssjoin_t").collect()
            }
        finally:
            q.stop()
        ev = load_table(spark, sf_dir, "events")
        want = {
            (r["click_id"], r["purchase_id"])
            for r in interval_join_clicks_purchases(ev, ev).collect()
        }
        assert got == want


class TestStreamingParity:
    def test_tumbling_stream_equals_batch(self, spark, sf_dir):
        stream = read_events_stream(spark, sf_dir)
        assert stream.isStreaming
        q = _run_stream_to_memory(tumbling_window_agg(stream), "tumbling_t")
        try:
            got = {
                (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
                for r in spark.sql("SELECT * FROM tumbling_t").collect()
            }
            batch = tumbling_window_agg(load_table(spark, sf_dir, "events"))
            want = {
                (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
                for r in batch.collect()
            }
            assert got == want
        finally:
            q.stop()

    def test_session_windows_stream(self, spark, sf_dir):
        stream = read_events_stream(spark, sf_dir)
        q = _run_stream_to_memory(session_window_agg(stream), "sessions_t")
        try:
            got = spark.sql("SELECT sum(n_events) AS n FROM sessions_t").collect()[0]["n"]
            total = load_table(spark, sf_dir, "events").count()
            assert got == total  # every event lands in exactly one session
        finally:
            q.stop()

    def test_stream_static_enrich_stream_equals_batch(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from dww_data_pipeline_spark.streaming.events import (
            stream_static_enrich_agg,
        )

        nation = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name"
        )
        key = F.pmod(F.col("user_id"), F.lit(25)).cast("int")
        stream = read_events_stream(spark, sf_dir)
        q = _run_stream_to_memory(
            stream_static_enrich_agg(
                stream, nation, key, "n_nationkey", "n_name"
            ),
            "enrich_t",
        )
        try:
            got = {
                (str(r["window_start"]), r["n_name"]): (
                    r["n_events"],
                    r["sum_value"],
                )
                for r in spark.sql("SELECT * FROM enrich_t").collect()
            }
            batch = stream_static_enrich_agg(
                load_table(spark, sf_dir, "events"),
                nation,
                key,
                "n_nationkey",
                "n_name",
            )
            want = {
                (str(r["window_start"]), r["n_name"]): (
                    r["n_events"],
                    r["sum_value"],
                )
                for r in batch.collect()
            }
            assert got == want
        finally:
            q.stop()

    def test_stream_dedup_drops_dups_within_watermark(self, spark, sf_dir):
        stream = read_events_stream(spark, sf_dir)
        deduped = stream_dedup(stream)
        assert deduped.isStreaming
        q = (
            deduped.groupBy()
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory")
            .queryName("dedup_t")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        try:
            got = spark.sql("SELECT n FROM dedup_t").collect()[0]["n"]
            want = (
                load_table(spark, sf_dir, "events")
                .dropDuplicates(["event_id"])
                .count()
            )
            assert got == want
        finally:
            q.stop()


class TestForeachBatchUpsert:
    def test_multi_batch_upsert_converges_to_batch_last_per_key(
        self, spark, sf_dir, tmp_path
    ):
        """st8: split events into 3 files, stream them one per
        micro-batch through the foreachBatch upsert sink, and the gold
        table must equal the batch last-event-per-user — including
        across batch boundaries (later batch overwrites earlier keys,
        out-of-order-safe merge)."""
        from dww_data_pipeline_spark.sources.catalog import load_table
        from dww_data_pipeline_spark.streaming.sinks import (
            latest_per_key,
            stream_upsert_to_gold,
        )

        ev = load_table(spark, str(sf_dir), "events").select(
            "event_id", "user_id", "ts", "event_type"
        )
        # 3 chunks with interleaved users (split by event_id mod, NOT by
        # time — so batches genuinely overwrite each other's keys)
        src = tmp_path / "src"
        for i in range(3):
            ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(src / f"chunk_{i}"))
        stage = tmp_path / "stream_in"
        stage.mkdir()
        n = 0
        for i in range(3):
            d = src / f"chunk_{i}"
            for f in d.iterdir():
                if f.suffix == ".parquet":
                    os.link(f, stage / f"{i}_{f.name}")
                    n += 1
        assert n == 3

        gold = str(tmp_path / "gold")
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stage))
        )
        q = stream_upsert_to_gold(
            stream,
            gold,
            key_cols=["user_id"],
            ts_col="ts",
            tiebreak="event_id",
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

        got = spark.read.parquet(gold)
        want = latest_per_key(ev, ["user_id"], "ts", "event_id")
        assert got.count() == want.count()
        assert (
            got.select("user_id", "event_id")
            .exceptAll(want.select("user_id", "event_id"))
            .count()
            == 0
        )

    def test_upsert_idempotent_on_replay(self, spark, sf_dir, tmp_path):
        """Replaying the same batch (at-least-once delivery) must not
        change the gold table."""
        from dww_data_pipeline_spark.sources.catalog import load_table
        from dww_data_pipeline_spark.streaming.sinks import upsert_batch

        ev = load_table(spark, str(sf_dir), "events").select(
            "event_id", "user_id", "ts", "event_type"
        )
        gold = str(tmp_path / "gold2")
        upsert_batch(ev, gold, ["user_id"], "ts", "event_id")
        first = sorted(
            (r["user_id"], r["event_id"])
            for r in spark.read.parquet(gold).collect()
        )
        upsert_batch(ev, gold, ["user_id"], "ts", "event_id")  # replay
        second = sorted(
            (r["user_id"], r["event_id"])
            for r in spark.read.parquet(gold).collect()
        )
        assert first == second


class TestSinkCrashRecovery:
    def test_recovery_restores_backup_when_gold_lost(self, spark, sf_dir, tmp_path):
        """Simulate a crash between the two swap renames (gold moved to
        .old, new gold not yet in place): the next upsert must restore
        the backup, not silently rebuild from the replayed batch."""
        from dww_data_pipeline_spark.sources.catalog import load_table
        from dww_data_pipeline_spark.streaming.sinks import upsert_batch

        ev = load_table(spark, str(sf_dir), "events").select(
            "event_id", "user_id", "ts", "event_type"
        )
        # split by USER so some users exist only in the first batch —
        # exactly the state that a naive rebuild-from-replay would lose
        first_half = ev.filter(F.col("user_id") % 3 != 2)
        second_half = ev.filter(F.col("user_id") % 3 != 0)
        gold = str(tmp_path / "gold3")
        upsert_batch(first_half, gold, ["user_id"], "ts", "event_id")
        n_state = spark.read.parquet(gold).count()
        # crash window: gold renamed away, replacement never landed
        os.replace(gold, gold + ".old")
        upsert_batch(second_half, gold, ["user_id"], "ts", "event_id")
        merged = spark.read.parquet(gold)
        # users only in the first half must have survived via recovery
        only_first = (
            first_half.select("user_id")
            .distinct()
            .join(second_half.select("user_id").distinct(), "user_id", "left_anti")
            .count()
        )
        assert only_first > 0  # the scenario is non-trivial
        assert merged.count() >= max(n_state, only_first)
        got_users = {r["user_id"] for r in merged.select("user_id").distinct().collect()}
        want_users = {r["user_id"] for r in ev.select("user_id").distinct().collect()}
        assert got_users == want_users

    def test_remote_path_rejected(self, spark):
        from dww_data_pipeline_spark.streaming.sinks import upsert_batch

        df = spark.range(1).select(
            F.col("id").alias("k"), F.col("id").alias("ts"), F.col("id").alias("tb")
        )
        with pytest.raises(ValueError):
            upsert_batch(df, "s3://bucket/gold", ["k"], "ts", "tb")


class TestBatchTwinNullEntity:
    def test_null_entity_is_one_group(self, spark):
        """entity_id=None rows form ONE sequence (pandas groupby must
        not drop the NaN key): [a, a, b] under a null entity emits the
        first event and the a->b change only."""
        import datetime as dt

        from dww_data_pipeline_spark.streaming.stateful import streaming_jumps

        base = dt.datetime(2024, 1, 1)
        rows = [
            (None, base + dt.timedelta(seconds=0), "a"),
            (None, base + dt.timedelta(seconds=1), "a"),
            (None, base + dt.timedelta(seconds=2), "b"),
            ("u1", base + dt.timedelta(seconds=0), "x"),
        ]
        ev = spark.createDataFrame(
            rows, "user_id string, ts timestamp, event_type string"
        )
        out = sorted(
            (
                (r["entity_id"], r["value"])
                for r in streaming_jumps(ev).select("entity_id", "value").collect()
            ),
            key=lambda x: (x[0] is not None, x[0] or "", x[1]),
        )
        assert out == [(None, "a"), (None, "b"), ("u1", "x")]


class TestCheckpointRestart:
    def test_restart_processes_only_new_files(self, spark, sf_dir, tmp_path):
        """Stop-and-restart with the same checkpoint: the file source's
        offset log must skip already-processed files, and the upsert
        sink must still converge to last-per-key over ALL data."""
        from dww_data_pipeline_spark.sources.catalog import load_table
        from dww_data_pipeline_spark.streaming.sinks import (
            latest_per_key,
            stream_upsert_to_gold,
        )

        ev = load_table(spark, str(sf_dir), "events").select(
            "event_id", "user_id", "ts", "event_type"
        )
        old_part = ev.filter(F.col("event_id") % 2 == 0)
        new_part = ev.filter(F.col("event_id") % 2 == 1)
        stage = tmp_path / "in"
        stage.mkdir()
        gold = str(tmp_path / "gold")
        ckpt = str(tmp_path / "ckpt")

        def _add(df, name):
            d = tmp_path / name
            df.coalesce(1).write.mode("overwrite").parquet(str(d))
            for f in d.iterdir():
                if f.suffix == ".parquet":
                    os.link(f, stage / f"{name}.parquet")

        def _run():
            stream = spark.readStream.schema(ev.schema).parquet(str(stage))
            q = stream_upsert_to_gold(
                stream, gold, ["user_id"], "ts", "event_id", checkpoint=ckpt
            )
            q.awaitTermination(120)

        _add(old_part, "a")
        _run()
        count_after_first = spark.read.parquet(gold).count()
        _add(new_part, "b")
        _run()  # restart from the same checkpoint

        got = spark.read.parquet(gold)
        want = latest_per_key(ev, ["user_id"], "ts", "event_id")
        assert got.count() == want.count() >= count_after_first
        assert (
            got.select("user_id", "event_id")
            .exceptAll(want.select("user_id", "event_id"))
            .count()
            == 0
        )


class TestServingFromGold:
    def test_streamed_jump_view_serves_batch_answer(self, spark, sf_dir, tmp_path):
        """The reference re-scans the whole graph per serving request
        (dwwApi.js:63-68); the replacement maintains a continuously
        upserted materialized jump view: stream -> stateful jump
        detection -> foreachBatch upsert -> gold, which a serving
        query reads directly. The gold view must equal the batch jump
        computation over the same events."""
        from dww_data_pipeline_spark.streaming.sinks import stream_upsert_to_gold
        from dww_data_pipeline_spark.streaming.stateful import streaming_jumps

        stream = read_events_stream(spark, sf_dir)
        jumps_stream = streaming_jumps(stream)
        gold = str(tmp_path / "jump_gold")
        q = stream_upsert_to_gold(
            jumps_stream.select("entity_id", "ts_ms", "value"),
            gold,
            key_cols=["entity_id", "ts_ms"],  # jump rows are unique per (entity, ts)
            ts_col="ts_ms",
            tiebreak="value",
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(180)

        served = {
            (r["entity_id"], r["ts_ms"], r["value"])
            for r in spark.read.parquet(gold).collect()
        }
        batch = streaming_jumps(load_table(spark, sf_dir, "events"))
        want = {
            (r["entity_id"], r["ts_ms"], r["value"])
            for r in batch.select("entity_id", "ts_ms", "value").collect()
        }
        assert served == want


class TestStreamingIngestDedup:
    def test_streamed_batches_match_batch_d11(self, spark, sf_dir, tmp_path):
        """Continuous-ingest dedup: new-doc files arriving as TWO
        separate micro-batches through the stream must produce exactly
        the decisions the one-shot batch query (d11) produces for the
        same split — streaming admission control equals batch replay."""
        from dww_data_pipeline_spark.plans.dedup_plans import incremental_decisions
        from dww_data_pipeline_spark.sources.catalog import load_table
        from dww_data_pipeline_spark.streaming.ingest import stream_incremental_dedup

        d = load_table(spark, str(sf_dir), "documents")
        corpus = d.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
        batch = d.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
        corpus.cache().count()

        stage = tmp_path / "in"
        stage.mkdir()
        out = str(tmp_path / "decisions")
        ckpt = str(tmp_path / "ckpt")

        def _add(df, name):
            dd = tmp_path / name
            df.coalesce(1).write.mode("overwrite").parquet(str(dd))
            for f in dd.iterdir():
                if f.suffix == ".parquet":
                    os.link(f, stage / f"{name}.parquet")

        def _drain():
            stream = spark.readStream.schema(batch.schema).parquet(str(stage))
            q = stream_incremental_dedup(stream, corpus, out, ckpt)
            q.awaitTermination(120)

        # two arrivals -> two micro-batches (restart reuses checkpoint)
        _add(batch.filter(F.col("doc_id") < 250), "early")
        _drain()
        _add(batch.filter(F.col("doc_id") >= 250), "late")
        _drain()

        got = {
            r["doc_id"]: (r["decision"], r["n_matches"])
            for r in spark.read.parquet(f"{out}/batch=*").collect()
        }
        want = {
            r["doc_id"]: (r["decision"], r["n_matches"])
            for r in incremental_decisions(batch, corpus).collect()
        }
        assert got == want
        assert len(got) == batch.count()
        corpus.unpersist()


class TestStreamingDecontamination:
    def test_streamed_batches_match_batch_d10(self, spark, sf_dir, tmp_path):
        """Continuous decontamination: training docs arriving as TWO
        micro-batches must produce exactly the flags the one-shot batch
        core produces for the same split — streaming screening equals
        offline replay."""
        from dww_data_pipeline_spark.plans.dedup_plans import (
            build_eval_gram_index,
            decontamination_hits,
        )
        from dww_data_pipeline_spark.sources.catalog import load_table
        from dww_data_pipeline_spark.streaming.decontam import stream_decontamination

        d = load_table(spark, str(sf_dir), "documents")
        eval_docs = d.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
        train = d.filter(F.col("doc_id") % 50 != 0).select("doc_id", "text")

        stage = tmp_path / "in"
        stage.mkdir()
        out = str(tmp_path / "flags")
        ckpt = str(tmp_path / "ckpt")

        def _add(df, name):
            dd = tmp_path / name
            df.coalesce(1).write.mode("overwrite").parquet(str(dd))
            for f in dd.iterdir():
                if f.suffix == ".parquet":
                    os.link(f, stage / f"{name}.parquet")

        def _drain():
            stream = spark.readStream.schema(train.schema).parquet(str(stage))
            q = stream_decontamination(stream, eval_docs, out, ckpt)
            q.awaitTermination(120)
            q.eval_index.unpersist()

        _add(train.filter(F.col("doc_id") < 250), "early")
        _drain()
        _add(train.filter(F.col("doc_id") >= 250), "late")
        _drain()

        got = {
            r["doc_id"]: (r["n_shared_ngrams"], r["n_eval_docs"])
            for r in spark.read.parquet(f"{out}/batch=*").collect()
        }
        want = {
            r["doc_id"]: (r["n_shared_ngrams"], r["n_eval_docs"])
            for r in decontamination_hits(
                train, build_eval_gram_index(eval_docs)
            ).collect()
        }
        assert got == want
        assert got, "synthetic corpus must contain at least one hit"


class TestStreamingCms:
    def test_cms_cells_stream_equals_batch(self, spark, sf_dir):
        """The windowed sketch maintained by the REAL readStream path
        (file source + watermark) must finalize to the same d x w cell
        grid as the batch run."""
        from dww_data_pipeline_spark.streaming.events import windowed_cms_cells

        stream = read_events_stream(spark, sf_dir)
        assert stream.isStreaming
        q = _run_stream_to_memory(windowed_cms_cells(stream), "cms_cells_t")
        try:
            got = {
                (str(r["window_start"]), r["row_id"], r["bucket"]): r["c"]
                for r in spark.sql("SELECT * FROM cms_cells_t").collect()
            }
            want = {
                (str(r["window_start"]), r["row_id"], r["bucket"]): r["c"]
                for r in windowed_cms_cells(
                    load_table(spark, sf_dir, "events")
                ).collect()
            }
            assert got == want
        finally:
            q.stop()

    def test_sketch_never_underestimates(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import all_queries

        rows = all_queries()["st9_stream_cms_hitters"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            # absolute CMS guarantee: never an underestimate
            assert r["cms_est"] >= r["n"]
        # the epsilon bound est <= n + 3N/w is PROBABILISTIC — tiny
        # per-window totals can violate it; require it to hold for the
        # overwhelming majority (measured: 100% at sf0.001, 97.7% at
        # sf0.01)
        rate = sum(1 for r in rows if r["within_bound"]) / len(rows)
        assert rate >= 0.9


class TestSessionPaths:
    def test_paths_stream_equals_batch(self, spark, sf_dir):
        from dww_data_pipeline_spark.streaming.events import session_paths_agg

        stream = read_events_stream(spark, sf_dir)
        assert stream.isStreaming
        q = _run_stream_to_memory(session_paths_agg(stream), "spaths_t")
        try:
            got = {
                (str(r["session_start"]), r["user_id"]): (r["path"], r["n_events"])
                for r in spark.sql("SELECT * FROM spaths_t").collect()
            }
            want = {
                (str(r["session_start"]), r["user_id"]): (r["path"], r["n_events"])
                for r in session_paths_agg(
                    load_table(spark, sf_dir, "events")
                ).collect()
            }
            assert got == want
        finally:
            q.stop()

    def test_path_is_time_ordered_prefix(self, spark, sf_dir):
        from dww_data_pipeline_spark.streaming.events import session_paths_agg

        rows = session_paths_agg(load_table(spark, sf_dir, "events")).collect()
        assert rows
        for r in rows:
            steps = r["path"].split(">")
            assert 1 <= len(steps) <= 5
            assert len(steps) == min(r["n_events"], 5)


class TestStreamingAbMoments:
    def test_moments_stream_equals_batch(self, spark, sf_dir):
        from dww_data_pipeline_spark.streaming.events import windowed_ab_moments

        stream = read_events_stream(spark, sf_dir)
        assert stream.isStreaming
        q = _run_stream_to_memory(windowed_ab_moments(stream), "ab_mom_t")
        try:
            got = {
                (str(r["window_start"]), r["arm"]): (r["n"], r["s"], r["ss"])
                for r in spark.sql("SELECT * FROM ab_mom_t").collect()
            }
            want = {
                (str(r["window_start"]), r["arm"]): (r["n"], r["s"], r["ss"])
                for r in windowed_ab_moments(
                    load_table(spark, sf_dir, "events")
                ).collect()
            }
            assert got == want
        finally:
            q.stop()

    def test_moments_reconstruct_ev12_totals(self, spark, sf_dir):
        """Associativity: summing the windowed moments must reproduce
        ev12's corpus-level arm counts and sums exactly."""
        from dww_data_pipeline_spark.plans.registry import all_queries

        rows = all_queries()["st11_stream_ab_moments"](spark, sf_dir).collect()
        by_arm: dict[int, tuple[int, int]] = {}
        for r in rows:
            n, s = by_arm.get(r["arm"], (0, 0))
            by_arm[r["arm"]] = (n + r["n"], s + r["s"])
        ab = all_queries()["ev12_ab_test"](spark, sf_dir).collect()[0]
        assert by_arm[0][0] == ab["n_a"] and by_arm[1][0] == ab["n_b"]
        assert round(by_arm[0][1] / by_arm[0][0] / 1e6, 6) == ab["mean_a"]
        assert round(by_arm[1][1] / by_arm[1][0] / 1e6, 6) == ab["mean_b"]


class TestStreamingFunnel:
    def test_stream_advances_match_batch(self, spark, sf_dir):
        """The stateful streaming funnel (applyInPandasWithState, real
        readStream) must emit exactly the stage advances the batch
        relational chain computes — the st5 parity discipline for the
        funnel operator."""
        from dww_data_pipeline_spark.streaming.funnel import streaming_funnel

        stream = read_events_stream(spark, str(sf_dir))
        q = (
            streaming_funnel(stream)
            .writeStream.format("memory")
            .queryName("funnel_advances")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["user_id"], r["stage"], r["ts_ms"])
            for r in spark.sql("select * from funnel_advances").collect()
        }
        want = {
            (r["user_id"], r["stage"], r["ts_ms"])
            for r in streaming_funnel(
                load_table(spark, str(sf_dir), "events")
            ).collect()
        }
        assert got == want and len(want) > 0

    def test_out_of_order_across_micro_batches(self, spark, tmp_path):
        """An in-watermark out-of-order event arriving in a LATER
        micro-batch must still advance the funnel: a purchase seen
        first (batch 1) must not blind the operator to the older
        view/click/purchase chain delivered in batch 2.  Guards the
        per-stage late-event rule — a blanket last-seen-timestamp drop
        would emit nothing here."""
        import pandas as pd

        from dww_data_pipeline_spark.streaming.funnel import streaming_funnel

        stage = tmp_path / "ooo_stream"
        stage.mkdir()

        def _events(ids, times, types):
            return pd.DataFrame(
                {
                    "event_id": ids,
                    "ts": pd.to_datetime(times).tz_localize("UTC"),
                    "user_id": [7] * len(ids),
                    "event_type": types,
                    "value": [1.0] * len(ids),
                    "props": ["{}"] * len(ids),
                }
            )

        first = _events([1], ["2024-01-01 10:00:00"], ["purchase"])
        # all above the post-batch-1 watermark (10:00 - 30 min = 09:30)
        late = _events(
            [2, 3, 4],
            ["2024-01-01 09:50:00", "2024-01-01 09:55:00", "2024-01-01 09:58:00"],
            ["view", "click", "purchase"],
        )
        f1, f2 = str(stage / "b1.parquet"), str(stage / "b2.parquet")
        first.to_parquet(f1, coerce_timestamps="us")

        schema = spark.read.parquet(f1).schema
        stream = spark.readStream.schema(schema).parquet(str(stage))
        q = (
            streaming_funnel(stream)
            .writeStream.format("memory")
            .queryName("funnel_ooo")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()  # batch 1: lone purchase, no advance
            late.to_parquet(f2, coerce_timestamps="us")
            q.processAllAvailable()  # batch 2: out-of-order chain
            got = {
                (r["user_id"], r["stage"], r["ts_ms"])
                for r in spark.sql("select * from funnel_ooo").collect()
            }
        finally:
            q.stop()
        want = {
            (r["user_id"], r["stage"], r["ts_ms"])
            for r in streaming_funnel(spark.read.parquet(str(stage))).collect()
        }
        assert got == want
        assert {s for (_, s, _) in got} == {1, 2, 3}


class TestStreamingJourneyPatterns:
    def test_stream_matches_match_batch(self, spark, sf_dir):
        """The stateful journey-pattern matcher (applyInPandasWithState,
        real readStream) must emit exactly the match instances the
        batch window chain computes — the st12 parity discipline for
        the MATCH_RECOGNIZE operator."""
        from dww_data_pipeline_spark.streaming.journey import (
            streaming_journey_patterns,
        )

        stream = read_events_stream(spark, str(sf_dir))
        q = (
            streaming_journey_patterns(stream)
            .writeStream.format("memory")
            .queryName("journey_matches")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = sorted(
            (r["user_id"], r["pattern"], r["ts_ms"])
            for r in spark.sql("select * from journey_matches").collect()
        )
        want = sorted(
            (r["user_id"], r["pattern"], r["ts_ms"])
            for r in streaming_journey_patterns(
                load_table(spark, str(sf_dir), "events")
            ).collect()
        )
        assert got == want and len(want) > 0

    def test_batch_counts_reconstruct_sequential_reference(self, spark, sf_dir):
        """The batch window chain must agree with a from-scratch
        sequential automaton over the same (ts_ms, event_id) order —
        an implementation-independent check of the non-overlapping
        counting semantics."""
        from dww_data_pipeline_spark.streaming.journey import (
            streaming_journey_patterns,
        )

        ev = (
            load_table(spark, str(sf_dir), "events")
            .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
            .select(
                "user_id",
                "event_id",
                F.substring("event_type", 1, 1).alias("c"),
                F.expr("unix_micros(ts) div 1000").alias("ts_ms"),
            )
            .collect()
        )
        by_user: dict = {}
        for r in ev:
            by_user.setdefault(r["user_id"], []).append(
                (r["ts_ms"], r["event_id"], r["c"])
            )
        want: list = []
        for uid, rows in by_user.items():
            open_arc = prev_e = burst_counted = False
            for ts, _eid, c in sorted(rows):
                if c == "e":
                    if prev_e and not burst_counted:
                        want.append((uid, "error_burst", ts))
                        burst_counted = True
                    prev_e = True
                else:
                    prev_e = burst_counted = False
                    if c == "v" and not open_arc:
                        open_arc = True
                    elif c == "p" and open_arc:
                        want.append((uid, "vp_arc", ts))
                        open_arc = False
        got = sorted(
            (r["user_id"], r["pattern"], r["ts_ms"])
            for r in streaming_journey_patterns(
                load_table(spark, str(sf_dir), "events")
            ).collect()
        )
        assert got == sorted(want)

    def test_state_carries_across_micro_batches(self, spark, tmp_path):
        """Pattern state must survive micro-batch boundaries: an arc
        opened by a view in batch 1 closes on the purchase in batch 2,
        and a burst whose two errors straddle the boundary still emits
        exactly once — the automaton, not per-batch regexes."""
        import pandas as pd

        from dww_data_pipeline_spark.streaming.journey import (
            streaming_journey_patterns,
        )

        stage = tmp_path / "journey_stream"
        stage.mkdir()

        def _events(ids, times, types):
            return pd.DataFrame(
                {
                    "event_id": ids,
                    "ts": pd.to_datetime(times).tz_localize("UTC"),
                    "user_id": [11] * len(ids),
                    "event_type": types,
                    "value": [1.0] * len(ids),
                    "props": ["{}"] * len(ids),
                }
            )

        b1 = _events(
            [1, 2],
            ["2024-01-01 10:00:00", "2024-01-01 10:01:00"],
            ["view", "error"],
        )
        b2 = _events(
            [3, 4],
            ["2024-01-01 10:02:00", "2024-01-01 10:03:00"],
            ["error", "purchase"],
        )
        f1, f2 = str(stage / "b1.parquet"), str(stage / "b2.parquet")
        b1.to_parquet(f1, coerce_timestamps="us")

        schema = spark.read.parquet(f1).schema
        stream = spark.readStream.schema(schema).parquet(str(stage))
        q = (
            streaming_journey_patterns(stream)
            .writeStream.format("memory")
            .queryName("journey_xbatch")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()  # batch 1: open arc + first error
            b2.to_parquet(f2, coerce_timestamps="us")
            q.processAllAvailable()  # batch 2: burst completes, arc closes
            got = sorted(
                (r["user_id"], r["pattern"], r["ts_ms"])
                for r in spark.sql("select * from journey_xbatch").collect()
            )
        finally:
            q.stop()
        want = sorted(
            (r["user_id"], r["pattern"], r["ts_ms"])
            for r in streaming_journey_patterns(
                spark.read.parquet(str(stage))
            ).collect()
        )
        assert got == want
        assert [p for (_, p, _) in got] == sorted(["error_burst", "vp_arc"])
