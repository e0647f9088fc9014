"""Statistics core of the engine (pure Python, no Spark dependency).

Re-expresses the reference's statistical machinery
(``RandomSamplingUtil.java`` in jessefjxm/Random-Sampling-Based-Approximate-
MapReduce) as plain functions:

- z-score lookup          -> reference ``RandomSamplingUtil.java:331-374``
- Cochran ratio solver    -> reference ``RandomSamplingUtil.java:380-382``
- achieved-error estimate -> reference ``RandomSamplingUtil.java:376-378``

The reference uses a 44-entry step-function z-table; we compute the exact
two-sided z via the inverse normal CDF and keep the reference's table as a
parity oracle (``Z_TABLE_REFERENCE``) for tests.
"""

from __future__ import annotations

import math
from statistics import NormalDist

# The reference's step-function z-table (confidence -> two-sided z), kept
# verbatim as a test oracle. Source: RandomSamplingUtil.java:331-374.
# Values above 0.999 confidence are clamped to 5.0 in the reference (:373).
Z_TABLE_REFERENCE: list[tuple[float, float]] = [
    (0.50, 0.674),
    (0.60, 0.842),
    (0.70, 1.036),
    (0.80, 1.282),
    (0.90, 1.645),
    (0.95, 1.96),
    (0.98, 2.326),
    (0.99, 2.575),
    (0.995, 2.807),
    (0.999, 3.291),
]

_MAX_Z = 5.0  # reference clamps z to 5.0 for confidence > 0.999 (:373)


def z_score(confidence: float) -> float:
    """Two-sided z for a confidence level in (0, 1).

    Exact inverse-normal computation; ``min``-clamped at 5.0 to match the
    reference's behavior for extreme confidence (RandomSamplingUtil.java:373).
    """
    if not 0.0 < confidence < 1.0:
        raise ValueError(f"confidence must be in (0,1), got {confidence}")
    z = NormalDist().inv_cdf((1.0 + confidence) / 2.0)
    return min(z, _MAX_Z)


def z_score_reference(confidence: float) -> float:
    """The reference's step-table z lookup, for parity tests.

    Returns the table z for the largest table confidence <= requested, and
    5.0 beyond 0.999 (RandomSamplingUtil.java:331-374).
    """
    if confidence > 0.999:
        return _MAX_Z
    best = Z_TABLE_REFERENCE[0][1]
    for conf, z in Z_TABLE_REFERENCE:
        if confidence >= conf:
            best = z
    return best


def cochran_ratio(confidence: float, error_bound: float, population: float) -> float:
    """Sampling ratio from an accuracy spec via Cochran's formula.

    ``r = 1 / (1 + 4 * N * e^2 / z^2)`` — worst-case proportion p=0.5 with
    finite-population correction, exactly as the reference computes it
    (RandomSamplingUtil.java:380-382; N = 10^inputbits at :57,77).
    """
    if error_bound <= 0:
        raise ValueError("error_bound must be > 0")
    if population <= 0:
        raise ValueError("population must be > 0")
    z = z_score(confidence)
    return 1.0 / (1.0 + 4.0 * population * error_bound * error_bound / (z * z))


def achieved_error(confidence: float, sampled: int, total: int) -> float:
    """Post-run error bound from exact (sampled, total) counts.

    ``err = sqrt(0.25 / n) * z * sqrt((N - n) / (N - 1))`` — standard error
    of a proportion at worst-case p=0.5 with finite-population correction
    (RandomSamplingUtil.java:376-378).
    """
    if sampled <= 0:
        return float("inf")
    if total <= 1:
        return 0.0
    z = z_score(confidence)
    fpc = math.sqrt((total - sampled) / (total - 1.0))
    return math.sqrt(0.25 / sampled) * z * fpc


def sample_size_for(confidence: float, error_bound: float, population: float) -> int:
    """Minimum sample size n for the accuracy spec (ceil of r * N)."""
    return int(math.ceil(cochran_ratio(confidence, error_bound, population) * population))


def scale_up(value: float, ratio: float, base_ratio: float = 1.0) -> float:
    """Horvitz–Thompson estimate of the exact value from a sampled one.

    ``v_hat = v_sampled * base_ratio / ratio`` — the comparator applies this
    per group before differencing (RSMRResultComparator.java:66-70).
    """
    if ratio <= 0:
        raise ValueError("ratio must be > 0")
    return value * base_ratio / ratio
