"""Golden-replay tests for the domain pipeline: handcrafted credits in
the reference's own shapes (FIXTURES.md §1/§6) flow bronze → gold and
reproduce the reference's semantics (parse → resolve → enrich →
jumps/density/exports).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dww_data_pipeline_spark import pipeline
from dww_data_pipeline_spark.operators.resolution import dedupe_edges
from dww_data_pipeline_spark.sources.files import (
    COMPANY_MAP_SCHEMA,
    ROLE_MAP_SCHEMA,
    read_csv_dim,
    read_map_json,
    write_map_json,
)

CREDITS = [
    # person_id, person_name, movie_id, notes, release
    ("0001", "Rick Sander", "m01", "3d animator: VIFX", "1996"),
    ("0001", "Rick Sander", "m02", "3d artist: VIFX (uncredited)", "1997-03-01"),
    ("0001", "Rick Sander", "m03", "compositor: Weta Digital ltd", "2001-12-03"),
    ("0002", "Jane Doe", "m01", "digital compositor: Mill Film, London", "1996"),
    ("0002", "Jane Doe", "m04", "lead td: Weta Digital", "1999-06-30"),
    ("0003", "No Colon", "m05", "Weta Digital", "none"),
]

COMPANY_MAP = [
    ("vifx", "VIFX", "0024117", None),
    ("weta digital", "Weta Digital", "0005031", "Wellington"),
    ("london", "zzz_baddata:london", "-1", None),
]

ROLE_MAP = [
    ("3d animator", "Animation"),
    ("3d artist", "Paint/Rotoscope"),
    ("compositor", "Compositing"),
    ("digital compositor, mill film", "Compositing"),
    ("lead td", "zzz_baddata:td"),
]

LOCATIONS = [("Weta Digital", "-41.30528,174.823492", "wellington")]
REGIONS = [("wellington", "new zealand")]


@pytest.fixture(scope="module")
def gold(spark):
    credits = spark.createDataFrame(
        CREDITS, ["person_id", "person_name", "movie_id", "notes", "release"]
    )
    cmap = spark.createDataFrame(COMPANY_MAP, ["search", "name", "id", "location"]).drop(
        "location"
    )
    rmap = spark.createDataFrame(ROLE_MAP, ["raw_role", "name"])
    locs = spark.createDataFrame(LOCATIONS, ["loc_company_name", "geo_loc", "location"])
    regs = spark.createDataFrame(REGIONS, ["reg_location", "global_region"])
    return pipeline.build_gold(credits, cmap, rmap, locs, regs)


class TestWorkedFor:
    def test_parse_and_resolve(self, gold):
        wf = {r["movie_id"]: r for r in gold.worked_for.filter(F.col("person_id") == "0001").collect()}
        assert wf["m01"]["company_search"] == "vifx"
        assert wf["m01"]["company_name"] == "VIFX"
        assert wf["m01"]["company_id"] == "0024117"
        assert wf["m01"]["match_ratio"] == 100
        assert wf["m03"]["company_name"] == "Weta Digital"

    def test_division_comma_semantics(self, gold):
        # "Mill Film, London": comma ⇒ company = part after the comma,
        # role += ", " + part before it (GetWeta.py:397-409)
        row = gold.worked_for.filter(F.col("movie_id") == "m01").filter(
            F.col("person_id") == "0002"
        ).collect()[0]
        assert row["company_search"] == "london"
        assert row["company_name"] == ""  # zzz_baddata blanked (P5)
        assert row["role"] == "digital compositor, mill film"
        assert row["true_role"] == "Compositing"  # division-role still mapped

    def test_sentinel_role_blanked(self, gold):
        row = gold.worked_for.filter(F.col("movie_id") == "m04").collect()[0]
        assert row["true_role"] == ""  # zzz_baddata role → '' (J3)

    def test_release_canonicalized(self, gold):
        rels = {
            r["movie_id"]: (r["release"], r["date_precision"])
            for r in gold.worked_for.filter(F.col("person_id") == "0001").collect()
        }
        assert rels["m01"] == ("1996-01-01", "year")
        assert rels["m03"] == ("2001-12-03", "day")

    def test_none_release_null(self, gold):
        row = gold.worked_for.filter(F.col("person_id") == "0003").collect()[0]
        assert row["release"] is None
        assert row["date_precision"] == "none"

    def test_location_enrichment(self, gold):
        row = gold.worked_for.filter(F.col("movie_id") == "m03").collect()[0]
        assert row["location"] == "wellington"
        assert row["global_region"] == "new zealand"


class TestGoldTables:
    def test_jumps_change_points_only(self, gold):
        jumps = gold.jumps.filter(F.col("person_id") == "0001").collect()
        # VIFX, VIFX, Weta → first credit + company change = 2 jumps
        assert [r["movie_id"] for r in jumps] == ["m01", "m03"]
        assert all(r["date_ms"] is not None for r in jumps)

    def test_directional_jump_query(self, gold):
        out = pipeline.jumps_query(
            gold.worked_for, filter_key="company_name", target="weta digital",
            direction="in",
        )
        rows = out.collect()
        # directional filter operates on the JUMP rows (reference
        # FormatRels runs after jumpsOnly dedup): 0001's jump timeline
        # is [m01 VIFX, m03 Weta] → predecessor of the Weta jump is m01
        got = {(r["person_id"], r["movie_id"]) for r in rows}
        assert ("0001", "m01") in got
        assert ("0001", "m02") not in got  # non-jump row must not appear

    def test_filter_requires_target(self, gold):
        with pytest.raises(ValueError):
            pipeline.jumps_query(gold.worked_for, filter_key="company_name")

    def test_density_range_fill(self, gold):
        dens = {
            (r["company_name"], r["fill_year"]): r["headcount"]
            for r in gold.density.filter(F.col("company_name") == "VIFX").collect()
        }
        # 0001 at VIFX 1996 → fills 1996-2000 (next credit 2001)
        assert dens[("VIFX", 1996)] == 1
        assert dens[("VIFX", 2000)] == 1
        assert ("VIFX", 2001) not in dens

    def test_search_counts_order(self, gold):
        rows = gold.search_counts.collect()
        # colon-less notes are unparseable ('' search, GetWeta.py:405-406):
        # vifx and weta digital tie at 2, name-asc puts vifx first
        assert rows[0]["company_search"] == "vifx"
        assert rows[0]["count"] == 2

    def test_jumps_with_departures_geo_trip(self, gold, spark):
        """W5 + F16/F17: dummy departure rows appear between jumps at
        next_ts − trip_days·86400000 with haversine-derived trips."""
        hubs = spark.createDataFrame(
            [("wellington", "-41.3,174.8"), ("london", "51.5,-0.12")],
            ["hub", "geo_loc"],
        )
        out = pipeline.jumps_with_departures(gold.worked_for, hubs)
        rows = {(r["person_id"], r["dummy"]): r for r in out.collect()}
        real = [r for r in out.collect() if not r["dummy"]]
        dummies = [r for r in out.collect() if r["dummy"]]
        # person 0001 has 2 jumps → exactly 1 dummy between them
        p1_d = [d for d in dummies if d["person_id"] == "0001"]
        assert len(p1_d) == 1
        p1_real = sorted(
            (r for r in real if r["person_id"] == "0001"), key=lambda r: r["ts_ms"]
        )
        # no geo on the first jump's location pair → 1-day fallback trip
        assert p1_d[0]["ts_ms"] == p1_real[-1]["ts_ms"] - 1 * 86400000
        # every dummy copies its predecessor row's identity
        assert p1_d[0]["movie_id"] == p1_real[0]["movie_id"]

    def test_dedupe_edges(self, gold, spark):
        existing = spark.createDataFrame(
            [("0001", "0024117", "m01")], ["person_id", "company_id", "movie_id"]
        )
        out = dedupe_edges(gold.worked_for, existing)
        assert out.filter(
            (F.col("person_id") == "0001") & (F.col("movie_id") == "m01")
        ).count() == 0
        assert out.count() == gold.worked_for.count() - 1


class TestExactParityResolution:
    def test_sequence_matcher_path(self, spark):
        """exact_parity=True routes scoring through the SequenceMatcher
        pandas_udf (the reference's fuzz.ratio semantics)."""
        from difflib import SequenceMatcher

        from dww_data_pipeline_spark.operators.resolution import resolve_companies

        parsed = spark.createDataFrame([("weta digitl",)], ["company_search"])
        cmap = spark.createDataFrame(
            [("weta digitl", "Weta Digital", "0005031")], ["search", "name", "id"]
        )
        row = resolve_companies(parsed, cmap, exact_parity=True).collect()[0]
        want = int(round(100 * SequenceMatcher(None, "weta digitl", "weta digital").ratio()))
        assert row["match_ratio"] == want


class TestObservability:
    def test_observe_metrics_a11(self, spark, sf_dir):
        """A11 progress/size counts via DataFrame.observe — metrics ride
        the job instead of extra count() actions (GetWeta.py:109-112
        logged sizes with separate passes)."""
        from pyspark.sql import Observation

        obs = Observation("ingest")
        df = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .observe(
                obs,
                F.count(F.lit(1)).alias("rows_seen"),
                # DISTINCT aggregates are not allowed in observed
                # metrics — approx is the observability idiom
                F.approx_count_distinct("o_custkey").alias("customers_seen"),
            )
            .filter(F.col("o_totalprice") > 0)
        )
        df.write.format("noop").mode("overwrite").save()
        got = obs.get
        assert got["rows_seen"] == 1500
        assert abs(got["customers_seen"] - 150) <= 8  # HLL tolerance


class TestLshResolution:
    def test_lsh_resolution_matches_fuzzy_semantics(self, spark):
        """The non-broadcast LSH path must resolve near-exact alias
        matches the broadcast path would (same winner), and leave
        garbage unmatched."""
        from dww_data_pipeline_spark.operators.resolution import resolve_companies_lsh

        parsed = spark.createDataFrame(
            [("weta digital",), ("weta digitl",), ("qqqxyzzz",)],
            ["company_search"],
        )
        cmap = spark.createDataFrame(
            [
                ("weta digital", "Weta Digital", "0005031"),
                ("vifx", "VIFX", "0024117"),
                ("2002", "zzz_baddata:2002", "-1"),
            ],
            ["search", "name", "id"],
        )
        out = {
            r["company_search"]: (r["company_name"], r["match_ratio"])
            for r in resolve_companies_lsh(parsed, cmap).collect()
        }
        assert out["weta digital"] == ("Weta Digital", 100)
        name, ratio = out["weta digitl"]  # typo still resolves via LSH+fuzzy
        assert name == "Weta Digital" and ratio >= 90
        assert out["qqqxyzzz"][0] is None  # garbage unmatched

    def test_lsh_resolution_blanks_sentinels(self, spark):
        from dww_data_pipeline_spark.operators.resolution import resolve_companies_lsh

        parsed = spark.createDataFrame([("2002",)], ["company_search"])
        cmap = spark.createDataFrame(
            [("2002", "zzz_baddata:2002", "-1")], ["search", "name", "id"]
        )
        row = resolve_companies_lsh(parsed, cmap).collect()[0]
        assert row["company_name"] == ""
        assert row["match_ratio"] == 0


class TestServingExports:
    def test_people_json_exact_field_names(self, gold):
        out = pipeline.export_people_json(gold.worked_for)
        row = [r for r in out.collect() if r["id"] == "0001"][0]
        assert row["name"] == "Rick Sander"
        rel = row["rels"][0]
        assert sorted(rel.asDict()) == [
            "companyMatchRatio",
            "companySearch",
            "imdbMovieId",
            "matchedCompanyId",
            "matchedCompanyName",
            "movieReleaseYear",
            "personMappedRole",
            "personRole",
        ]
        assert [x["imdbMovieId"] for x in row["rels"]] == ["m01", "m02", "m03"]
        # epoch ms of 1996-01-01 (canonicalized year-only release)
        assert row["rels"][0]["movieReleaseYear"] == 820454400000

    def test_jumps_csv_shape(self, gold):
        out = pipeline.export_jumps_csv(gold.jumps)
        assert out.columns == ["person", "role", "date", "company", "location", "region"]
        assert out.count() == gold.jumps.count()

    def test_jumps_csv_without_geo_dimensions(self, spark):
        # build_gold without locations/regions is a supported path —
        # the CSV export must emit '' columns, not crash
        credits = spark.createDataFrame(
            [("p1", "Ann", "m1", "animator: VIFX", "1996")],
            ["person_id", "person_name", "movie_id", "notes", "release"],
        )
        cmap = spark.createDataFrame([("vifx", "VIFX", "1")], ["search", "name", "id"])
        rmap = spark.createDataFrame([("animator", "Animation")], ["raw_role", "name"])
        g = pipeline.build_gold(credits, cmap, rmap)
        rows = pipeline.export_jumps_csv(g.jumps).collect()
        assert rows[0]["location"] == "" and rows[0]["region"] == ""

    def test_group_jumps_person(self, gold):
        nested = pipeline.group_jumps(gold.jumps, "person")
        row = [r for r in nested.collect() if r["person_id"] == "0001"][0]
        assert len(row["rels"]) == 2  # two jumps

    def test_group_jumps_keys(self, gold):
        keyed = {
            r["company_name"]: r["total"]
            for r in pipeline.group_jumps(gold.jumps, "keys").collect()
        }
        assert keyed["Weta Digital"] >= 1

    def test_group_jumps_invalid(self, gold):
        with pytest.raises(ValueError):
            pipeline.group_jumps(gold.jumps, "bogus")


class TestSinks:
    def test_csv_sink_comma_strip(self, gold, tmp_path):
        from dww_data_pipeline_spark.operators.documents import to_flat_csv

        out = to_flat_csv(
            gold.worked_for.withColumn("role", F.lit("a,b,c")), ["person_id", "role"]
        )
        assert all(r["role"] == "abc" for r in out.collect())

    def test_nested_json_sink(self, gold, tmp_path):
        from dww_data_pipeline_spark.operators.documents import to_nested_json

        path = str(tmp_path / "people")
        nested = to_nested_json(
            gold.worked_for.filter(F.col("release").isNotNull()),
            ["person_id", "person_name"],
            ["movie_id", "company_name", "release"],
            ["release", "movie_id"],
            path=path,
        )
        row = [r for r in nested.collect() if r["person_id"] == "0001"][0]
        assert [x["movie_id"] for x in row["rels"]] == ["m01", "m02", "m03"]
        reread = gold.worked_for.sparkSession.read.json(path)
        assert reread.count() == nested.count()

    def test_kml_sink_shape(self, gold):
        from dww_data_pipeline_spark.operators.documents import kml_tracks

        jumps = gold.jumps.withColumn("coords", F.lit("174.8,-41.3,0")).withColumn(
            "when_str", F.lit("2001-12-03")
        )
        row = kml_tracks(jumps, "person_name", "coords", "when_str").collect()[0]
        assert row["kml"].startswith("<Placemark>")
        assert "<gx:coord>174.8,-41.3,0</gx:coord>" in row["kml"]


class TestMapFiles:
    def test_map_json_round_trip(self, spark, tmp_path):
        cmap = spark.createDataFrame(COMPANY_MAP, COMPANY_MAP_SCHEMA)
        path = str(tmp_path / "companyMap.json")
        write_map_json(cmap, path, "company")
        back = read_map_json(spark, path, "company", COMPANY_MAP_SCHEMA)
        assert {r["search"]: r["name"] for r in back.collect()} == {
            s: n for s, n, _, _ in COMPANY_MAP
        }

    def test_map_json_backup_on_overwrite(self, spark, tmp_path):
        import glob

        cmap = spark.createDataFrame(COMPANY_MAP, COMPANY_MAP_SCHEMA)
        path = str(tmp_path / "companyMap.json")
        write_map_json(cmap, path, "company")
        write_map_json(cmap, path, "company")  # second write backs up
        assert len(glob.glob(f"{path}.*.bak")) == 1

    def test_map_json_oversized_input_rejected(self, spark, tmp_path, monkeypatch):
        from dww_data_pipeline_spark.sources import files as files_mod

        monkeypatch.setattr(files_mod, "MAP_JSON_MAX_ROWS", 10)
        big = spark.range(11).select(
            F.col("id").cast("string").alias("search"), F.lit("x").alias("name")
        )
        path = str(tmp_path / "tooBig.json")
        with pytest.raises(ValueError, match="exceeds 10 rows"):
            files_mod.write_map_json(big, path, "company")
        assert not (tmp_path / "tooBig.json").exists()

    def test_map_json_wrong_maptype_rejected(self, spark, tmp_path):
        path = str(tmp_path / "roleMap.json")
        with open(path, "w") as f:
            json.dump({"maptype": "role", "maps": {"td": {"name": "TD"}}}, f)
        with pytest.raises(ValueError, match="maptype"):
            read_map_json(spark, path, "company", ROLE_MAP_SCHEMA)

    def test_credits_json_bronze_ingest(self, spark, tmp_path):
        from dww_data_pipeline_spark.sources.files import read_credits_json

        path = str(tmp_path / "credits.jsonl")
        with open(path, "w") as f:
            f.write(
                '{"person_id":"0001","person_name":"Ann","movie_id":"m1",'
                '"notes":"animator: VIFX","release":"1996",'
                '"release_dates":["USA::20 July 2007"]}\n'
            )
            f.write('{"person_id":"0002","movie_id":"m2","notes":null,"release":"none"}\n')
        df = read_credits_json(spark, path)
        rows = {r["person_id"]: r for r in df.collect()}
        assert rows["0001"]["release_dates"] == ["USA::20 July 2007"]
        assert rows["0002"]["person_name"] is None  # missing field → null
        # flows straight into the parsing pipeline
        cmap = spark.createDataFrame([("vifx", "VIFX", "1")], ["search", "name", "id"])
        rmap = spark.createDataFrame([("animator", "Animation")], ["raw_role", "name"])
        wf = pipeline.build_worked_for(df.drop("release_dates"), cmap, rmap)
        assert wf.filter(wf.company_name == "VIFX").count() == 1

    def test_csv_dim_source(self, spark, tmp_path):
        path = str(tmp_path / "locations.csv")
        with open(path, "w") as f:
            f.write("Location,Region,Lat Long\nwellington,new zealand,\"-41.3,174.8\"\n")
        df = read_csv_dim(spark, path)
        row = df.collect()[0]
        assert row["Location"] == "wellington"
        assert row["Lat Long"] == "-41.3,174.8"
