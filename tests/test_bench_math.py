"""Pin the bench.py drift-normalization math (round-9 verdict #7).

The round-8 advice fix made ``normalized_ratios`` divide BOTH rounds'
timings by their own recorded calibration drift; nothing tested the
formula, so a regression (e.g. reverting to raw previous timings)
would only show up as silently-biased round-over-round reads.  These
tests need no Spark session — bench.py's pure math only.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from bench import normalized_ratios  # noqa: E402


def _prev(queries: dict, drift: float | None) -> dict:
    prev = {"queries": queries, "_path": "synthetic"}
    if drift is not None:
        prev["calibration"] = {"drift": drift}
    return prev


class TestNormalizedRatios:
    def test_both_sides_divided_by_own_drift(self):
        """Known drifts 0.5 (prev) and 1.0 (current): a query that ran
        2.0s then on a half-speed box 1.0s is EXACTLY unchanged."""
        out = normalized_ratios(
            {"q": 2.0}, 1.0, _prev({"q": 1.0}, 0.5)
        )
        assert out == {"q": 1.0}

    def test_identity_when_drifts_equal(self):
        out = normalized_ratios(
            {"a": 3.0, "b": 0.5}, 0.8, _prev({"a": 1.5, "b": 0.5}, 0.8)
        )
        assert out == {"a": 2.0, "b": 1.0}

    def test_regression_shows_through_drift(self):
        """A true 2x regression must read 2.0 regardless of how the
        box drifted between rounds."""
        out = normalized_ratios({"q": 4.0}, 2.0, _prev({"q": 0.5}, 0.5))
        assert out == {"q": 2.0}

    def test_missing_prev_calibration_defaults_to_raw(self):
        out = normalized_ratios({"q": 2.0}, 1.0, _prev({"q": 2.0}, None))
        assert out == {"q": 1.0}
        # an explicit zero/None drift must not divide by zero
        out = normalized_ratios({"q": 2.0}, 1.0, _prev({"q": 2.0}, 0.0))
        assert out == {"q": 1.0}

    def test_unmatched_and_zero_prev_queries_skipped(self):
        out = normalized_ratios(
            {"new": 1.0, "zero": 1.0, "ok": 1.0},
            1.0,
            _prev({"zero": 0.0, "ok": 2.0}, 1.0),
        )
        assert out == {"ok": 0.5}


from bench import runs_for  # noqa: E402


class TestRunsFor:
    """Round-10 verdict #8: sub-second queries (per the previous
    round's artifact) run min-of-5; everything else min-of-3."""

    def test_subsecond_gets_extra_runs(self):
        assert runs_for("q", {"queries": {"q": 0.55}}) == 5

    def test_second_and_above_stay_at_base(self):
        assert runs_for("q", {"queries": {"q": 1.0}}) == 3
        assert runs_for("q", {"queries": {"q": 12.5}}) == 3

    def test_no_previous_artifact_or_entry_stays_at_base(self):
        assert runs_for("q", None) == 3
        assert runs_for("q", {"queries": {}}) == 3

    def test_zero_or_negative_prev_time_stays_at_base(self):
        # a 0.0 entry means "never really measured" — don't quintuple it
        assert runs_for("q", {"queries": {"q": 0.0}}) == 3
