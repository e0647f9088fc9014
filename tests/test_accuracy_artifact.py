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


class TestAchievedPointModel:
    """The run-pick families gate on the error model evaluated at the
    ACHIEVED pick (VERDICT r13 "what's wrong" #2): conditional on the
    realized picked-cluster count, the HT estimate's error is the bias
    (r_hat/r - 1) plus SRSWOR noise. Pure-function pins — the Spark
    sweep itself runs in tools/, not CI."""

    def test_folded_mean_degenerate_and_centered(self):
        import math

        from accuracy_sweep import _folded_normal_mean

        assert _folded_normal_mean(3.0, 0.0) == 3.0
        assert _folded_normal_mean(-3.0, 0.0) == 3.0
        # mu=0: E|N(0, s^2)| = s*sqrt(2/pi)
        assert abs(_folded_normal_mean(0.0, 2.0) - 2.0 * math.sqrt(2 / math.pi)) < 1e-12
        # large |mu|/sigma: E|X| -> |mu|
        assert abs(_folded_normal_mean(100.0, 1.0) - 100.0) < 1e-6

    def test_bias_term_exact_when_clusters_equal(self):
        from accuracy_sweep import expected_grouped_rel_l1_at_achieved

        # 40 clusters each holding t=5 of the single key: S2 == 0, so
        # the conditional model is PURE bias |r_hat/r - 1|
        n, t, total = 40, 5.0, 200.0
        stats = [(total, n * t * t)]
        got = expected_grouped_rel_l1_at_achieved(stats, total, n, 0.025, 0.00875)
        assert abs(got - abs(0.00875 / 0.025 - 1.0)) < 1e-12  # 0.65
        # on-nominal realized pick: zero bias, zero variance
        assert expected_grouped_rel_l1_at_achieved(stats, total, n, 0.025, 0.025) < 1e-12

    def test_overpick_bias_symmetric(self):
        from accuracy_sweep import expected_grouped_rel_l1_at_achieved

        n, t, total = 32, 4.0, 128.0
        stats = [(total, n * t * t)]
        # 3 picked of 32 at nominal 0.025: r_hat/r = 3.75 -> bias 2.75
        got = expected_grouped_rel_l1_at_achieved(stats, total, n, 0.025, 3 / 32)
        assert abs(got - 2.75) < 1e-12

    def test_variance_widens_the_expectation_off_zero_bias(self):
        from accuracy_sweep import expected_grouped_rel_l1_at_achieved

        # unequal clusters (S2 > 0), realized pick on nominal: the model
        # is the SRSWOR folded-normal noise, strictly positive
        n = 10
        ts = [1.0, 9.0] * 5
        total = sum(ts)
        stats = [(total, sum(x * x for x in ts))]
        got = expected_grouped_rel_l1_at_achieved(stats, total, n, 0.5, 0.5)
        assert got > 0.0

    def test_rejects_out_of_range_fractions(self):
        import pytest

        from accuracy_sweep import expected_grouped_rel_l1_at_achieved

        with pytest.raises(ValueError):
            expected_grouped_rel_l1_at_achieved([(1.0, 1.0)], 1.0, 4, 0.0, 0.5)
        with pytest.raises(ValueError):
            expected_grouped_rel_l1_at_achieved([(1.0, 1.0)], 1.0, 4, 0.5, 1.5)
