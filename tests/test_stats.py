"""Stats core tests, pinned to the reference's table values (SURVEY.md §5,
FIXTURES.md F5)."""

import math

import pytest

from random_sampling_based_approximate_mapreduce_spark.sampling import stats
from random_sampling_based_approximate_mapreduce_spark.sampling.config import SamplingConfig


class TestZScore:
    @pytest.mark.parametrize(
        "conf,expected,tol",
        [
            (0.95, 1.96, 0.01),   # RandomSamplingUtil.java:363
            (0.99, 2.575, 0.01),  # :367
            (0.90, 1.645, 0.01),  # :360
            (0.80, 1.282, 0.01),
            (0.50, 0.674, 0.01),
        ],
    )
    def test_matches_reference_table(self, conf, expected, tol):
        assert abs(stats.z_score(conf) - expected) < tol
        assert stats.z_score_reference(conf) == expected

    def test_extreme_confidence_clamped(self):
        # reference returns 5.0 beyond 0.999 (RandomSamplingUtil.java:373)
        assert stats.z_score_reference(0.9999) == 5.0
        assert stats.z_score(0.9999999999999) == 5.0

    def test_invalid(self):
        with pytest.raises(ValueError):
            stats.z_score(0.0)
        with pytest.raises(ValueError):
            stats.z_score(1.0)


class TestCochran:
    def test_formula_hand_computed(self):
        # r = 1/(1 + 4*N*e^2/z^2) with c=0.95 -> z≈1.959964
        z = stats.z_score(0.95)
        n = 1e8
        e = 0.01
        expected = 1.0 / (1.0 + 4.0 * n * e * e / (z * z))
        assert math.isclose(stats.cochran_ratio(0.95, 0.01, n), expected)

    def test_small_population_ratio_near_one(self):
        # N=10 at default accuracy -> nearly everything sampled
        r = stats.cochran_ratio(0.95, 0.02, 10.0)
        assert r > 0.99

    def test_monotonic_in_error(self):
        r_tight = stats.cochran_ratio(0.95, 0.001, 1e6)
        r_loose = stats.cochran_ratio(0.95, 0.05, 1e6)
        assert r_tight > r_loose


class TestAchievedError:
    def test_formula(self):
        # err = sqrt(0.25/n) * z * sqrt((N-n)/(N-1))  (RandomSamplingUtil.java:376-378)
        z = stats.z_score(0.95)
        n, total = 10_000, 1_000_000
        expected = math.sqrt(0.25 / n) * z * math.sqrt((total - n) / (total - 1.0))
        assert math.isclose(stats.achieved_error(0.95, n, total), expected)

    def test_full_sample_zero_error(self):
        assert stats.achieved_error(0.95, 1000, 1000) == 0.0

    def test_inverse_of_cochran(self):
        # sampling at the Cochran ratio should achieve ~the requested bound
        n_pop = 10**6
        r = stats.cochran_ratio(0.95, 0.01, n_pop)
        err = stats.achieved_error(0.95, int(r * n_pop), n_pop)
        assert err == pytest.approx(0.01, rel=0.01)


class TestScaleUp:
    def test_horvitz_thompson(self):
        # comparator: counts.get(i) * ratio.get(0) / ratio.get(i)  (:70)
        assert stats.scale_up(50, 0.1) == 500.0
        assert stats.scale_up(50, 0.5, base_ratio=1.0) == 100.0


class TestConfigResolution:
    def test_explicit_ratio_wins(self):
        assert SamplingConfig(ratio=0.25, confidence=0.5, error_bound=0.5).resolve() == 0.25

    def test_invalid_ratio_falls_back(self):
        # reference: invalid ratio then invalid (conf,err) -> 0.1 (:72-79)
        assert SamplingConfig(ratio=1.5, confidence=-1).resolve() == 0.1

    def test_invalid_accuracy_falls_back(self):
        assert SamplingConfig(ratio=None, confidence=1.5).resolve() == 0.1
        assert SamplingConfig(ratio=None, error_bound=-0.1).resolve() == 0.1

    def test_solved_from_accuracy(self):
        cfg = SamplingConfig(ratio=None, confidence=0.95, error_bound=0.02, input_bits=6)
        assert math.isclose(cfg.resolve(), stats.cochran_ratio(0.95, 0.02, 1e6))

    def test_cli_parsing(self):
        assert SamplingConfig.from_cli("0.1").resolve() == 0.1
        cfg = SamplingConfig.from_cli("0.95,0.02,6")
        assert cfg.confidence == 0.95 and cfg.input_bits == 6
        with pytest.raises(ValueError):
            SamplingConfig.from_cli("1,2")

    def test_exact_mode(self):
        assert SamplingConfig.exact().resolve() == 1.0
