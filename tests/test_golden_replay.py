"""Golden replay against the reference's OWN published export
(SURVEY §5b / §7.2 M6): the nested people document the reference
serves (`jsonReduced.json`, 330 people / 4346 credits from the real
Weta-rooted crawl) is flattened into the engine's worked_for shape and
run through the jump / density / search-count operators. Assertions
are the reference's invariants computed independently in Python — a
differential oracle on real production data, not synthetic fixtures.

The file is read from the read-only reference checkout at test time
(never copied into this repo); tests skip if the checkout is absent.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dww_data_pipeline_spark.operators import density as density_ops
from dww_data_pipeline_spark.operators import sequence as seq

GOLDEN = "/root/reference/serverScripts/src/public/js/jsonReduced.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference checkout not available"
)


def _load_people() -> list[dict]:
    with open(GOLDEN) as f:
        return json.load(f)["people"]


@pytest.fixture(scope="module")
def worked_for(spark):
    rows = []
    for p in _load_people():
        for rel in p.get("rels", []):
            rows.append(
                (
                    p["id"],
                    p["name"],
                    rel["imdbMovieId"],
                    rel["companySearch"],
                    int(rel["companyMatchRatio"]),
                    rel["personRole"],
                    rel["personMappedRole"],
                    str(rel["movieReleaseYear"]),
                    rel["matchedCompanyId"],
                    rel["matchedCompanyName"],
                )
            )
    return spark.createDataFrame(
        rows,
        [
            "person_id",
            "person_name",
            "movie_id",
            "company_search",
            "match_ratio",
            "role",
            "true_role",
            "release",
            "company_id",
            "company_name",
        ],
    )


ORDER = ["release", "movie_id"]


class TestGoldenReplay:
    def test_scale_matches_published_export(self, worked_for):
        assert worked_for.select("person_id").distinct().count() == 330
        assert worked_for.count() == 4346

    def test_jump_detection_invariants(self, worked_for):
        """W1 on the real crawl: per person, consecutive jump companies
        must differ, the first credit is always a jump, and jump count
        computed independently in Python matches."""
        jumps = seq.jumps(worked_for, "person_id", "company_name", ORDER)
        got = jumps.groupBy("person_id").agg(
            F.count(F.lit(1)).alias("n"),
        )
        got_counts = {r["person_id"]: r["n"] for r in got.collect()}

        # independent Python oracle over the same rows
        want_counts: dict[str, int] = {}
        for p in _load_people():
            rels = sorted(
                p.get("rels", []),
                key=lambda r: (str(r["movieReleaseYear"]), r["imdbMovieId"]),
            )
            last = object()
            n = 0
            for r in rels:
                if r["matchedCompanyName"] != last:
                    n += 1
                    last = r["matchedCompanyName"]
            if n:
                want_counts[p["id"]] = n
        assert got_counts == want_counts

    def test_directional_filter_on_real_data(self, worked_for):
        """W4 'who joined Weta Digital' on the real crawl: every
        returned row's successor jump is Weta and the row itself is
        not."""
        jump_rows = seq.jumps(worked_for, "person_id", "company_name", ORDER)
        incoming = seq.directional_filter(
            jump_rows, "person_id", ORDER, "company_name", "Weta Digital", "in"
        )
        rows = incoming.collect()
        assert len(rows) > 0
        assert all(r["company_name"].lower() != "weta digital" for r in rows)

    def test_density_totals_match_credit_span(self, worked_for):
        """A5 on the real crawl: summing the density headcounts of a
        single person's company equals their filled year span,
        computed independently."""
        with_year = worked_for.withColumn(
            "yr", F.substring("release", 1, 4).cast("int")
        ).filter(F.col("yr").isNotNull())
        dens = density_ops.density(
            with_year, "person_id", ["company_name"], "yr", order=ORDER
        )
        total_fill = dens.agg(F.sum("headcount").alias("s")).collect()[0]["s"]

        # independent Python fill with the same clamp
        fill = 0
        span = density_ops.MAX_SPAN_YEARS
        years_by_person: dict[tuple, set] = {}
        for p in _load_people():
            rels = sorted(
                (
                    r
                    for r in p.get("rels", [])
                    if str(r["movieReleaseYear"])[:4].isdigit()
                ),
                key=lambda r: (str(r["movieReleaseYear"]), r["imdbMovieId"]),
            )
            for i, r in enumerate(rels):
                yr = int(str(r["movieReleaseYear"])[:4])
                if i + 1 < len(rels):
                    nxt = int(str(rels[i + 1]["movieReleaseYear"])[:4])
                    end = yr if nxt <= yr else min(nxt - 1, yr + span)
                else:
                    end = yr
                for y in range(yr, end + 1):
                    years_by_person.setdefault(
                        (p["id"], r["matchedCompanyName"]), set()
                    ).add(y)
        by_company_year: dict[tuple, set] = {}
        for (pid, comp), years in years_by_person.items():
            for y in years:
                by_company_year.setdefault((comp, y), set()).add(pid)
        want = sum(len(v) for v in by_company_year.values())
        assert total_fill == want

    def test_search_counts_against_python(self, worked_for):
        got = {
            r["company_search"]: r["count"]
            for r in worked_for.groupBy("company_search")
            .agg(F.count(F.lit(1)).alias("count"))
            .collect()
        }
        want: dict[str, int] = {}
        for p in _load_people():
            for r in p.get("rels", []):
                want[r["companySearch"]] = want.get(r["companySearch"], 0) + 1
        assert got == want


JUMPS2 = "/root/reference/serverScripts/src/public/js/jumps_(2).json"


@pytest.fixture(scope="module")
def jumps2():
    with open(JUMPS2) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def jumps2_clean(jumps2):
    """People whose real rels have strictly-increasing non-null
    timestamps — the export's list order is then identical to the
    engine's ORDER BY, so reconstruction can be exact. (6 rels in the
    file have null release dates and 4 tie; those people are skipped.)"""
    out = []
    for p in jumps2["people"]:
        reals = [r for r in p["rels"] if not r["dummy"]]
        ts = [r["movieReleaseYear"] for r in reals]
        if all(t is not None for t in ts) and all(b > a for a, b in zip(ts, ts[1:])):
            out.append((p, reals))
    return out


class TestJumpsExportReplay:
    """Replay of the reference's second jump-formatted export
    (`jumps_(2).json`, 2127 people — the variant whose rels carry
    `location` coords, making the dummy-departure timestamps fully
    reconstructible): the engine's geo + dummy-departure operators must
    reproduce the published file bit-for-bit (dwwApi.js:283-293,
    locUtils.js:2-34)."""

    def test_export_shape_and_alternation(self, jumps2):
        # jumps-only stream: real/dummy alternation, one dummy between
        # consecutive real credits (dwwApi.js FormatRels)
        assert len(jumps2["people"]) == 2127
        for p in jumps2["people"]:
            reals = [r for r in p["rels"] if not r["dummy"]]
            dummies = [r for r in p["rels"] if r["dummy"]]
            assert len(dummies) == max(0, len(reals) - 1), p["id"]

    def test_jumps_only_stream_is_jump_fixpoint(self, spark, jumps2_clean):
        # the export is already jump-filtered: running the engine's W1
        # jump detector over it must keep every row (consecutive
        # companies always differ)
        rows = [
            (p["id"], r["imdbMovieId"], int(r["movieReleaseYear"]), r["matchedCompanyName"])
            for p, reals in jumps2_clean
            for r in reals
        ]
        df = spark.createDataFrame(rows, ["person_id", "movie_id", "ts_ms", "company"])
        out = seq.jumps(df, "person_id", "company", ["ts_ms"])
        assert out.count() == len(rows)

    def test_dummy_departure_timestamps_reconstructed_exactly(
        self, spark, jumps2_clean
    ):
        """W5 + F16 + F20 on the real export: dummy ts = next credit's
        ts − max(1, floor(haversine_km/100)) days, computed from the
        rels' own lat/lon strings — all 2600+ published dummy rows must
        match to the millisecond."""
        from pyspark.sql import Window

        from dww_data_pipeline_spark.functions import geo

        rows = [
            (
                p["id"],
                r["imdbMovieId"],
                int(r["movieReleaseYear"]),
                r["matchedCompanyName"],
                r["location"],
            )
            for p, reals in jumps2_clean
            for r in reals
        ]
        df = spark.createDataFrame(
            rows, ["person_id", "movie_id", "ts_ms", "company", "location"]
        )
        lat, lon = geo.parse_geo_loc(F.col("location"))
        w = Window.partitionBy("person_id").orderBy("ts_ms")
        trip = geo.trip_days(
            geo.haversine_km(lat, lon, F.lead(lat).over(w), F.lead(lon).over(w))
        )
        out = seq.dummy_departures(df, "person_id", ["ts_ms"], "ts_ms", trip)
        got = sorted(
            (r["person_id"], r["ts_ms"], r["company"])
            for r in out.filter(F.col("dummy")).collect()
        )
        want = sorted(
            (p["id"], r["movieReleaseYear"], r["matchedCompanyName"])
            for p, _ in jumps2_clean
            for r in p["rels"]
            if r["dummy"]
        )
        assert len(got) > 2500
        assert got == want

    def test_company_location_map_roundtrip(self, spark, jumps2):
        # the export's `locations` dict is derivable from the rels
        # themselves (J9 reverse-map shape): company → its single
        # location string
        rows = [
            (r["matchedCompanyName"], r["location"])
            for p in jumps2["people"]
            for r in p["rels"]
            if not r["dummy"]
        ]
        df = spark.createDataFrame(rows, ["company", "location"])
        got = {
            r["company"]: r["loc"]
            for r in df.groupBy("company")
            .agg(F.first("location").alias("loc"), F.count_distinct("location").alias("n"))
            .collect()
        }
        per_company = df.groupBy("company").agg(
            F.count_distinct("location").alias("n")
        )
        assert per_company.filter(F.col("n") > 1).count() == 0
        for comp, loc in got.items():
            assert jumps2["locations"][comp] == loc


class TestServingEnvelope:
    """S8+: the FULL four-key serving document (dwwApi.js:219-223
    ``{jumps, locations, regions, globalRegions}``) assembled as one
    operator, checked against the reference's own exports."""

    def test_envelope_keys_and_people_shape(self, spark, worked_for):
        from dww_data_pipeline_spark.pipeline import export_serving_envelope

        locations = spark.createDataFrame(
            [("Weta Digital", "-41.30528,174.823492", "Wellington")],
            ["loc_company_name", "geo_loc", "location"],
        )
        regions = spark.createDataFrame(
            [("Wellington", "Oceania")], ["reg_location", "global_region"]
        )
        env = export_serving_envelope(worked_for, locations, regions)
        assert env.columns == ["jumps", "locations", "regions", "globalRegions"]
        row = env.collect()[0]

        # people list matches the published export's scale and shape
        golden_people = _load_people()
        assert len(row["jumps"]) == len(golden_people) == 330
        got_ids = [p["id"] for p in row["jumps"]]
        assert got_ids == sorted(p["id"] for p in golden_people)
        rel_keys = set(row["jumps"][0]["rels"][0].asDict())
        assert rel_keys == set(golden_people[0]["rels"][0])

        # maps carry through with reference value shapes
        assert row["locations"] == {"Weta Digital": "-41.30528,174.823492"}
        assert row["regions"] == {"Wellington": "oceania"}
        assert row["globalRegions"] == {}

    def test_envelope_locations_match_published_export(self, spark, jumps2):
        """The locations map in the envelope has exactly the shape the
        reference published in jumps_(2).json: company → geoLoc."""
        from dww_data_pipeline_spark.pipeline import export_serving_envelope

        loc_rows = [
            (name, geo, "") for name, geo in jumps2["locations"].items()
        ]
        locations = spark.createDataFrame(
            loc_rows, ["loc_company_name", "geo_loc", "location"]
        )
        regions = spark.createDataFrame(
            [("x", "y")], ["reg_location", "global_region"]
        ).limit(0)
        wf = spark.createDataFrame(
            [("p1", "P One", "m1", "s", 100, "r", "R", "2001", "c1", "C")],
            [
                "person_id", "person_name", "movie_id", "company_search",
                "match_ratio", "role", "true_role", "release",
                "company_id", "company_name",
            ],
        )
        row = export_serving_envelope(wf, locations, regions).collect()[0]
        assert row["locations"] == jumps2["locations"]
        assert row["regions"] == {}

    def test_envelope_json_serializes_as_document(self, spark, worked_for):
        import json as _json

        from dww_data_pipeline_spark.pipeline import export_serving_envelope

        locations = spark.createDataFrame(
            [("Weta Digital", "-41.3,174.8", "Wellington")],
            ["loc_company_name", "geo_loc", "location"],
        )
        regions = spark.createDataFrame(
            [("Wellington", "Oceania")], ["reg_location", "global_region"]
        )
        env = export_serving_envelope(worked_for.limit(50), locations, regions)
        doc = _json.loads(env.toJSON().first())
        assert list(doc) == ["jumps", "locations", "regions", "globalRegions"]
        assert isinstance(doc["jumps"], list) and isinstance(doc["locations"], dict)

    def test_envelope_hubs_match_published_export(self, spark, jumps2):
        """With the hubs dim passed, the envelope's hubs map equals the
        published jumps_(2).json hubs dict exactly."""
        from dww_data_pipeline_spark.pipeline import export_serving_envelope

        hubs = spark.createDataFrame(
            list(jumps2["hubs"].items()), ["hub", "geo_loc"]
        )
        locations = spark.createDataFrame(
            [("x", "0,0", "loc")], ["loc_company_name", "geo_loc", "location"]
        ).limit(0)
        regions = spark.createDataFrame(
            [("x", "y")], ["reg_location", "global_region"]
        ).limit(0)
        wf = spark.createDataFrame(
            [("p1", "P One", "m1", "s", 100, "r", "R", "2001", "c1", "C")],
            [
                "person_id", "person_name", "movie_id", "company_search",
                "match_ratio", "role", "true_role", "release",
                "company_id", "company_name",
            ],
        )
        env = export_serving_envelope(wf, locations, regions, hubs=hubs)
        assert env.columns == [
            "jumps", "locations", "regions", "globalRegions", "hubs"
        ]
        row = env.collect()[0]
        assert row["hubs"] == jumps2["hubs"]

    def test_envelope_duplicate_dim_keys_last_wins(self, spark, worked_for):
        """The reference assembles these dicts by JS assignment (last
        key wins); duplicate keys in a dim must not throw
        DUPLICATE_MAP_KEY — they collapse deterministically."""
        from dww_data_pipeline_spark.pipeline import export_serving_envelope

        locations = spark.createDataFrame(
            [
                ("Weta Digital", "-41.3,174.8", "Wellington"),
                ("Weta Digital", "-41.9,174.9", "Wellington"),  # dup key
            ],
            ["loc_company_name", "geo_loc", "location"],
        )
        regions = spark.createDataFrame(
            [("Wellington", "Oceania")], ["reg_location", "global_region"]
        )
        row = export_serving_envelope(
            worked_for.limit(10), locations, regions
        ).collect()[0]
        assert row["locations"] == {"Weta Digital": "-41.9,174.9"}

    def test_envelope_row_order_true_last_wins(self, spark, worked_for, tmp_path):
        """With a `_row_order` column (read_csv_dim with_row_order=True)
        the envelope reproduces the reference's FILE-ORDER last-wins,
        even when the file's last value is NOT the lexicographic max
        (the case where the max(value) stand-in diverges)."""
        from dww_data_pipeline_spark.pipeline import export_serving_envelope
        from dww_data_pipeline_spark.sources.files import read_csv_dim

        csv = tmp_path / "locs.csv"
        csv.write_text(
            "loc_company_name,geo_loc,location\n"
            "Weta Digital,\"-49.9,174.9\",Wellington\n"
            "Weta Digital,\"-41.3,174.8\",Wellington\n"  # file-last, sorts LOWER
        )
        locations = read_csv_dim(spark, str(csv), with_row_order=True)
        regions = spark.createDataFrame(
            [("Wellington", "Oceania")], ["reg_location", "global_region"]
        )
        row = export_serving_envelope(
            worked_for.limit(10), locations, regions
        ).collect()[0]
        # max(value) would pick "-49.9,174.9"; true last-wins picks the
        # file's final assignment, matching dwwApi.js:123
        assert row["locations"] == {"Weta Digital": "-41.3,174.8"}


class TestF2ParityDrift:
    """F2: quantified drift between the engine's default JVM-side
    levenshtein_ratio and the reference's SequenceMatcher ratio
    (GetWeta.py:236-237), measured on the reference's OWN crawl pairs
    in the decision band 75-95 where the 80/90 thresholds
    (GetWeta.py:496-497) live. Measured r3 on 450 distinct
    (companySearch, matchedCompanyName) pairs: 37 in-band, 51% exactly
    equal, max |delta| 9; threshold crossings 80: 10.8%, 90: 8.1%
    (documented in COVERAGE.md §F2). The exact-parity pandas_udf mode
    exists for when zero crossings are required."""

    def test_drift_bounded_on_crawl_pairs(self, spark, worked_for):
        from dww_data_pipeline_spark.functions.fuzzy import (
            levenshtein_ratio,
            sequence_matcher_ratio,
        )

        pairs = worked_for.select("company_search", "company_name").distinct()
        scored = pairs.select(
            levenshtein_ratio(F.col("company_search"), F.col("company_name")).alias(
                "lev"
            ),
            sequence_matcher_ratio(
                F.col("company_search"), F.col("company_name")
            ).alias("sm"),
        ).collect()
        assert len(scored) == 450
        band = [r for r in scored if 75 <= r["sm"] <= 95]
        assert len(band) == 37
        exact = sum(r["lev"] == r["sm"] for r in band)
        cross80 = sum((r["sm"] >= 80) != (r["lev"] >= 80) for r in band)
        cross90 = sum((r["sm"] >= 90) != (r["lev"] >= 90) for r in band)
        max_delta = max(abs(r["lev"] - r["sm"]) for r in band)
        # pin the measured drift so regressions in either path surface
        assert exact == 19
        assert cross80 == 4 and cross90 == 3
        assert max_delta == 9
        # structural property: indel identity means lev never scores
        # BELOW SequenceMatcher on these pairs (substitutions only
        # cheapen the distance)
        assert all(r["lev"] >= r["sm"] for r in band)
