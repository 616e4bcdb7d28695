"""Repo-hygiene gates that keep generated artifacts honest.

The round-5 verdict found COVERAGE.md's proof ledger stale (it said
162/244 while the truth was 212/244) because nothing enforced
regeneration after a CORRECTNESS_r{N}.json landed.  These tests make
staleness fail the suite.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_proof_ledger_fresh():
    """COVERAGE.md's generated ledger must match the CORRECTNESS files."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "proof_ledger.py"), "--check"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_registry_prefix_spends_sample_on_unproven():
    """No unproven query may wait BEHIND the ~50-slot driver prefix while
    an already-proven query occupies a prefix slot (the round-4 rotation
    defect).  Re-verification picks in the prefix are fine once every
    unproven query is already inside it."""
    sys.path.insert(0, REPO)
    from tools.proof_ledger import _proof_rounds

    from dww_data_pipeline_spark.plans.registry import REGISTRY, all_queries

    order = list(all_queries())
    proved = _proof_rounds({n for n in order if REGISTRY[n].oracle is not None})
    waiting = [n for n in order[50:] if n not in proved]
    wasted = [n for n in order[:50] if n in proved]
    assert not (waiting and wasted), (
        f"rotation defect: {len(waiting)} unproven queries wait beyond the "
        f"prefix ({waiting[:5]}…) while proven ones occupy prefix slots "
        f"({wasted[:5]}…) — rotate registry._PRIORITY"
    )
