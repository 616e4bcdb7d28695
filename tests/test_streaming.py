"""Structured Streaming tests: the REAL readStream path (file source,
watermark, memory sink) must converge to the same answer as the batch
run of the identical function — Spark's unified-API property that the
plan registry's oracles rely on.
"""

from __future__ import annotations

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
