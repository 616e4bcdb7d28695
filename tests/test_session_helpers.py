"""r13 session helpers: Arrow-path local frames and scoped loop width.

``local_rows_df`` replaced every non-test ``createDataFrame(list)``
call (21 sites) — these tests pin its VALUE fidelity against the
default path (the optimization must be invisible to results), the
exact-integer hazard it was designed around (no float64 promotion for
long columns containing None), and ``bounded_loop_shuffle``'s
restore-on-exit contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dww_data_pipeline_spark.session import bounded_loop_shuffle, local_rows_df


class TestLocalRowsDf:
    CASES = [
        # exact 64-bit long next to a None in the same column — the
        # pandas from_records path would round this through float64
        ([(1, "a b", None, 2**62 + 12345), (2, None, "x", None)],
         "step long, pair string, merged string, n long"),
        ([(1, [1, 2, 3], 0.5), (2, [2**61, -5], None)],
         "i long, v array<long>, d double"),
        ([], "a long, b string"),
        ([(True, 0), (False, None)], "f boolean, n long"),
    ]

    def test_values_and_schema_match_default_path(self, spark):
        for rows, schema in self.CASES:
            got = local_rows_df(spark, rows, schema)
            want = spark.createDataFrame(rows, schema)
            assert got.schema == want.schema, schema
            assert sorted(map(tuple, got.collect())) == sorted(
                map(tuple, want.collect())
            ), schema

    def test_shape_mismatch_fails_fast(self, spark):
        # r14 advice: a row with more fields than the schema used to be
        # silently truncated by the column-wise zip, and a short row
        # padded with NaN by the pandas reindex — both must raise, as
        # spark.createDataFrame(rows, schema) would
        import pytest

        with pytest.raises(ValueError, match="3 fields, schema has 2"):
            local_rows_df(spark, [(1, "a", 99)], "a long, b string")
        with pytest.raises(ValueError, match="1 fields, schema has 2"):
            local_rows_df(spark, [(1,)], "a long, b string")

    def test_row_objects_round_trip(self, spark):
        src = spark.range(3).select(
            "id",
            (F.col("id") % 2 == 0).alias("flag"),
            F.lit(None).cast("long").alias("z"),
        )
        rows = src.collect()
        back = local_rows_df(spark, rows, src.schema)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, rows))

    def test_coalesce1_write_round_trip(self, spark, tmp_path):
        # the motivating case: the tokenizer store's 16-row merge table
        rows = [(i, " a b ", " ab ", 100 + i) for i in range(16)]
        schema = "step long, pair string, merged string, n long"
        out = str(tmp_path / "merges")
        local_rows_df(spark, rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(out)
        got = sorted(map(tuple, spark.read.parquet(out).collect()))
        assert got == sorted(rows)


class TestBoundedLoopShuffle:
    def test_width_derives_from_rows_and_caps_at_session(self, spark):
        cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
        with bounded_loop_shuffle(spark, 31) as parts:
            assert parts == 1
            assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
            # AQE stays ON unless explicitly opted out (join loops
            # need its runtime sizes)
            assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == cur
        huge = 10**12
        with bounded_loop_shuffle(spark, huge) as parts:
            assert parts == cur  # capped at the session width
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == cur

    def test_restores_on_exception(self, spark):
        cur = spark.conf.get("spark.sql.shuffle.partitions")
        aqe = spark.conf.get("spark.sql.adaptive.enabled")
        try:
            with bounded_loop_shuffle(spark, 1, disable_aqe=True):
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert spark.conf.get("spark.sql.shuffle.partitions") == cur
        assert spark.conf.get("spark.sql.adaptive.enabled") == aqe
