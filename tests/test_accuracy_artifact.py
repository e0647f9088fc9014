"""ACCURACY_r{N}.json must be self-describing (VERDICT r11 item 3):
every cell carries an explicit ``gated`` boolean (false exactly when
``low_support`` is set) and the artifact carries a top-level
``gate_summary`` with the 23-vs-25-style arithmetic, so a reader of
the JSON alone cannot mistake "all ok" for "all gated". Pure-function
tests over tools/accuracy_sweep.finalize_artifact — no Spark."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from accuracy_sweep import finalize_artifact  # noqa: E402


def _doc(runs_by_query):
    return {
        "sf": "sf0.1",
        "ratios": [0.1, 0.001],
        "seed": 123,
        "queries": [
            {"query": name, "runs": [dict(r) for r in runs]}
            for name, runs in runs_by_query.items()
        ],
    }


class TestGatedFlag:
    def test_gated_false_exactly_when_low_support(self):
        doc = finalize_artifact(_doc({
            "word_count": [
                {"ratio": 0.1, "ok": True, "share_ok": True, "low_support": None},
                {"ratio": 0.001, "ok": True, "share_ok": True,
                 "low_support": "expected kept rows 5.0 < 50"},
            ],
        }))
        runs = doc["queries"][0]["runs"]
        assert runs[0]["gated"] is True
        assert runs[1]["gated"] is False

    def test_family_sweeps_without_share_ok_still_count(self):
        # stratified_daily / joined_pairs runs have ok but no share_ok:
        # a missing gate key must read as passing, not as red
        doc = finalize_artifact(_doc({
            "stratified_daily": [
                {"ratio": 0.1, "ok": True, "low_support": None},
                {"ratio": 0.001, "ok": False, "low_support": None},
            ],
        }))
        assert doc["gate_summary"] == {"n_cells": 2, "n_gated": 2, "n_green": 1}

    def test_summary_matches_r11_shape(self):
        # the r11 artifact shape: 25 cells, 2 low-support -> 23 gated;
        # all gated green -> 23/23
        runs = [{"ratio": 0.1, "ok": True, "share_ok": True, "low_support": None}
                for _ in range(23)]
        runs += [{"ratio": 0.001, "ok": True, "share_ok": True,
                  "low_support": "all 50 groups below the N_g*r >= 5 floor"}
                 for _ in range(2)]
        doc = finalize_artifact(_doc({"grid": runs}))
        gs = doc["gate_summary"]
        assert (gs["n_cells"], gs["n_gated"], gs["n_green"]) == (25, 23, 23)
        assert sum(1 for r in doc["queries"][0]["runs"] if r["gated"]) == 23

    def test_red_gated_cell_not_green(self):
        doc = finalize_artifact(_doc({
            "events": [
                {"ratio": 0.1, "ok": True, "share_ok": False, "low_support": None},
            ],
        }))
        assert doc["gate_summary"] == {"n_cells": 1, "n_gated": 1, "n_green": 0}
        assert doc["queries"][0]["runs"][0]["gated"] is True
