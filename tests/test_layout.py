"""Z-order layout (sources/layout.py): parquet footer min/max stats
must be tight on BOTH dimensions — the data-skipping proof."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dww_data_pipeline_spark.sources.catalog import load_table
from dww_data_pipeline_spark.sources.layout import write_zordered

N_FILES = 8


def _file_spans(path: str, cols: list[str]) -> dict[str, list[int]]:
    """Per-file (max - min) span for each column, from footer stats."""
    spans: dict[str, list[int]] = {c: [] for c in cols}
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        mins: dict[str, int] = {}
        maxs: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i, name in enumerate(names):
                if name not in cols:
                    continue
                st = g.column(i).statistics
                assert st is not None and st.has_min_max
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
        for c in cols:
            spans[c].append(maxs[c] - mins[c])
    return spans


@pytest.fixture(scope="module")
def dims(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_custkey").cast("long").alias("cust"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    )


class TestZorderLayout:
    def test_both_dimensions_tight(self, spark, dims, tmp_path):
        zdir = str(tmp_path / "zorder")
        sdir = str(tmp_path / "single")
        write_zordered(dims, "cust", "day", zdir, n_files=N_FILES)
        # contrast layout: sorted by ONE dimension only
        (
            dims.repartitionByRange(N_FILES, "cust")
            .sortWithinPartitions("cust")
            .write.mode("overwrite")
            .parquet(sdir)
        )

        stats = dims.agg(
            (F.max("cust") - F.min("cust")).alias("cust_range"),
            (F.max("day") - F.min("day")).alias("day_range"),
        ).collect()[0]

        z = _file_spans(zdir, ["cust", "day"])
        s = _file_spans(sdir, ["cust", "day"])
        avg = lambda xs: sum(xs) / len(xs)  # noqa: E731

        # single-dim sort: cust spans tiny, day spans ~ full range
        assert avg(s["day"]) > 0.8 * stats["day_range"]
        # z-order: BOTH dimensions substantially tighter than full
        assert avg(z["cust"]) < 0.7 * stats["cust_range"]
        assert avg(z["day"]) < 0.7 * stats["day_range"]

    def test_rows_preserved(self, spark, dims, tmp_path):
        out = str(tmp_path / "z2")
        write_zordered(dims, "cust", "day", out, n_files=4)
        back = spark.read.parquet(out)
        assert back.count() == dims.count()
        assert set(back.columns) == set(dims.columns)  # helper col dropped

    def test_zvalue_locality(self, spark, dims):
        """Adjacent z-values differ little in both coordinates on
        average — the rectangle property that makes footer stats
        tight. Sanity-check on a small slice."""
        from dww_data_pipeline_spark.sources.layout import z_value_col

        from pyspark.sql import functions as F2

        slice_df = dims.limit(512)
        b = slice_df.agg(
            F2.min("cust").alias("cmin"), F2.max("cust").alias("cmax"),
            F2.min("day").alias("dmin"), F2.max("day").alias("dmax"),
        ).collect()[0]
        cspan = max(1, b["cmax"] - b["cmin"])
        dspan = max(1, b["dmax"] - b["dmin"])
        rows = (
            slice_df.select(
                "cust",
                "day",
                z_value_col(
                    f"((cust - {b['cmin']}) * 65535 DIV {cspan})",
                    f"((day - {b['dmin']}) * 65535 DIV {dspan})",
                ).alias("z"),
            )
            .orderBy("z")
            .collect()
        )
        # full-key ranges for normalization
        cr = max(r["cust"] for r in rows) - min(r["cust"] for r in rows) or 1
        dr = max(r["day"] for r in rows) - min(r["day"] for r in rows) or 1
        jumps_c = [
            abs(b["cust"] - a["cust"]) / cr for a, b in zip(rows, rows[1:])
        ]
        jumps_d = [
            abs(b["day"] - a["day"]) / dr for a, b in zip(rows, rows[1:])
        ]
        # neighbors in z are near in BOTH dims on average
        assert sum(jumps_c) / len(jumps_c) < 0.25
        assert sum(jumps_d) / len(jumps_d) < 0.25
