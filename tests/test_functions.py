"""Unit tests for the Column-expression function library.

Golden examples come from the reference's own parsing semantics
(FIXTURES.md §6, GetWeta.py:370-411 / :348-368); property tests check
the invariants the reference depends on (padding ⇒ lexicographic ==
chronological, GetWeta.py:362-366).
"""

from __future__ import annotations

import datetime as dt
from difflib import SequenceMatcher

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dww_data_pipeline_spark.functions import dates, fuzzy, geo, strings, text


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _parse(spark, note: str) -> tuple[str, str]:
    row = (
        spark.createDataFrame([(note,)], ["notes"])
        .select(
            strings.parse_role(F.col("notes")).alias("role"),
            strings.parse_company(F.col("notes")).alias("company"),
        )
        .collect()[0]
    )
    return row["role"], row["company"]


class TestCreditNoteParser:
    def test_simple_role_company(self, spark):
        role, company = _parse(spark, "visual effects artist: Weta Digital")
        assert role == "visual effects artist"
        assert company == "weta digital"

    def test_uncredited_stripped(self, spark):
        role, company = _parse(spark, "animator: VIFX (uncredited)")
        assert role == "animator"
        assert company == "vifx"

    def test_division_dash_split(self, spark):
        _, company = _parse(spark, "animator: Digital Domain - Venice")
        assert company == "digital domain"

    def test_division_comma_moves_company(self, spark):
        # "division, company" → company is the part after the comma
        _, company = _parse(spark, "compositor: Mill Film, London")
        assert company == "london"

    def test_company_suffix_stripped(self, spark):
        _, company = _parse(spark, "td: Framestore ltd")
        assert company == "framestore"

    def test_symbols_stripped(self, spark):
        role, company = _parse(spark, "[senior] animator: Weta (Digital)!")
        assert role == "senior animator"
        assert company == "weta digital"

    def test_no_colon_unparseable(self, spark):
        # colon-less notes are unparseable: both empty (reference
        # else-branch GetWeta.py:405-406)
        role, company = _parse(spark, "Weta Digital")
        assert role == ""
        assert company == ""

    def test_uncredited_capitalized_stripped(self, spark):
        # the reference lowercases BEFORE the removal regexes
        role, company = _parse(spark, "Compositor: Weta Digital (Uncredited)")
        assert role == "compositor"
        assert company == "weta digital"


class TestDates:
    def test_normalize_release_basic(self, spark):
        v = _one(spark, dates.normalize_release(F.lit("17 July 2007 (UK)")))
        assert v == "2007-07-17"

    def test_normalize_release_prefix(self, spark):
        v = _one(spark, dates.normalize_release(F.lit("New Zealand::3 December 2001")))
        assert v == "2001-12-03"

    def test_normalize_release_unparseable(self, spark):
        assert _one(spark, dates.normalize_release(F.lit("Summer 2007"))) is None

    def test_earliest_release_from_region_list(self, spark):
        v = _one(
            spark,
            dates.earliest_release(
                F.array(
                    F.lit("USA::20 July 2007 (premiere)"),
                    F.lit("New Zealand::17 July 2007"),
                    F.lit("garbage entry"),
                )
            ),
        )
        assert v == "2007-07-17"  # earliest parseable wins, garbage skipped

    @given(
        st.text(
            alphabet=st.characters(whitelist_categories=["Lu", "Ll", "Nd", "Zs", "Po"]),
            max_size=60,
        )
    )
    @settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
    def test_normalize_release_never_crashes_or_mislabels(self, s):
        # property: arbitrary text either yields NULL or a well-formed
        # padded date (the reference skipped unparseable entries)
        from dww_data_pipeline_spark.session import get_spark

        spark = get_spark("tests", cpus="8")
        v = _one(spark, dates.normalize_release(F.lit(s)))
        if v is not None:
            import re

            assert re.fullmatch(r"\d{4}-\d{2}-\d{2}", v)

    def test_canonical_release_pads_year_only(self, spark):
        assert _one(spark, dates.canonical_release(F.lit("1996"))) == "1996-01-01"
        assert _one(spark, dates.canonical_release(F.lit("2007-7-7"))) == "2007-07-07"
        assert _one(spark, dates.canonical_release(F.lit("none"))) is None

    def test_date_precision(self, spark):
        assert _one(spark, dates.date_precision(F.lit("2007-07-17"))) == "day"
        assert _one(spark, dates.date_precision(F.lit("1996"))) == "year"
        assert _one(spark, dates.date_precision(F.lit("none"))) == "none"

    def test_epoch_ms_no_month_off_by_one(self, spark):
        # the reference's serving layer had a month off-by-one
        # (dwwApi.js:111-112); ours must not
        v = _one(spark, dates.to_epoch_ms(F.lit("2007-07-17")))
        assert v == int(
            dt.datetime(2007, 7, 17, tzinfo=dt.timezone.utc).timestamp() * 1000
        )

    @given(
        y=st.integers(1900, 2100),
        m=st.integers(1, 12),
        d=st.integers(1, 28),
        y2=st.integers(1900, 2100),
        m2=st.integers(1, 12),
        d2=st.integers(1, 28),
    )
    @settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
    def test_padded_lexicographic_equals_chronological(self, y, m, d, y2, m2, d2):
        # the invariant FixUnpaddedDates (GetWeta.py:675-703) exists to restore
        a, b = f"{y:04d}-{m:02d}-{d:02d}", f"{y2:04d}-{m2:02d}-{d2:02d}"
        assert (a < b) == (dt.date(y, m, d) < dt.date(y2, m2, d2))


class TestFuzzy:
    def test_exact_match_100(self, spark):
        v = _one(spark, fuzzy.levenshtein_ratio(F.lit("weta digital"), F.lit("Weta Digital ")))
        assert v == 100

    def test_sequence_matcher_parity(self, spark):
        pairs = [
            ("weta digital", "weta digital ltd"),
            ("mpc", "moving picture company"),
            ("vifx", "blue sky/vifx"),
            ("framestore", "framestore cfc"),
        ]
        df = spark.createDataFrame(pairs, ["a", "b"]).select(
            "a", "b", fuzzy.sequence_matcher_ratio(F.col("a"), F.col("b")).alias("r")
        )
        for row in df.collect():
            expect = int(
                round(100 * SequenceMatcher(None, row["a"].lower(), row["b"].lower()).ratio())
            )
            assert row["r"] == expect


class TestGeo:
    def test_haversine_wellington_london(self, spark):
        lat1, lon1 = F.lit(-41.2889), F.lit(174.7772)  # Wellington
        lat2, lon2 = F.lit(51.5074), F.lit(-0.1278)  # London
        v = _one(spark, geo.haversine_km(lat1, lon1, lat2, lon2))
        assert abs(v - 18800) < 150  # ~18.8k km

    def test_trip_days_clamped_to_one(self, spark):
        assert _one(spark, geo.trip_days(F.lit(50.0))) == 1
        assert _one(spark, geo.trip_days(F.lit(1000.0))) == 10

    def test_wrap_lon_diff(self, spark):
        assert _one(spark, geo.wrap_lon_diff(F.lit(170.0), F.lit(-170.0))) == 20.0
        assert _one(spark, geo.wrap_lon_diff(F.lit(-170.0), F.lit(170.0))) == -20.0


class TestText:
    def test_token_count(self, spark):
        assert _one(spark, text.token_count(F.lit("  a  b c "))) == 3
        assert _one(spark, text.token_count(F.lit(""))) == 0

    def test_word_shingles(self, spark):
        v = _one(spark, text.word_shingles(F.lit("a b c d"), k=3))
        assert v == ["a b c", "b c d"]

    def test_word_shingles_short_text(self, spark):
        assert _one(spark, text.word_shingles(F.lit("a b"), k=3)) == []

    def test_char_ngrams(self, spark):
        v = _one(spark, text.char_ngrams(F.lit("abcdef"), n=5))
        assert v == ["abcde", "bcdef"]

    def test_lang_id_markers(self, spark):
        assert _one(spark, text.lang_id(F.lit("the cat and the hat of a town"))) == "en"
        assert _one(spark, text.lang_id(F.lit("el perro y la casa de que y"))) == "es"
        assert _one(spark, text.lang_id(F.lit("zzz qqq"))) == "und"

    def test_fingerprint_normalizes_whitespace_case(self, spark):
        a = _one(spark, text.fingerprint(F.lit("Hello   World")))
        b = _one(spark, text.fingerprint(F.lit("hello world ")))
        assert a == b

    def test_quality_score_in_range(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        stats = docs.select(
            F.min(text.quality_score(F.col("text"))).alias("lo"),
            F.max(text.quality_score(F.col("text"))).alias("hi"),
        ).collect()[0]
        assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0


class TestStrings:
    def test_strip_commas(self, spark):
        assert _one(spark, strings.strip_commas(F.lit("a,b,c"))) == "abc"

    def test_clean_blacklist(self, spark):
        v = _one(spark, strings.clean_blacklist(F.lit("Senior Lead Animator"), ["senior", "lead"]))
        assert v == "animator"

    def test_blacklist_hits(self, spark):
        v = _one(
            spark, strings.blacklist_hits(F.lit("Senior Animator"), ["senior", "lead"])
        )
        assert v == ["senior"]

    def test_sentinels(self, spark):
        assert _one(spark, strings.zzz_tag(F.lit("2002"))) == "zzz_baddata:2002"
        assert _one(spark, strings.is_sentinel(F.lit("zzz_role:foo"))) is True
        assert _one(spark, strings.is_sentinel(F.lit("weta"))) is False
