"""Sampling configuration + resolution precedence.

Mirrors the reference's config surface (RandomSamplingUtil.java:25-31 keys,
:54-64 defaults, :72-79 resolution precedence, :125-153 CLI parsing) as a
dataclass. The reference stores these under Hadoop ``Configuration`` keys
``mapreduce.randomsapling.*`` (sic) and resolves an effective ratio once per
job; we resolve at ``SamplingConfig.resolve()``.

Precedence (RandomSamplingUtil.java:72-79):
1. explicit ratio in (0, 1] wins;
2. else an invalid (confidence, error) spec falls back to DEFAULT_RATIO;
3. else solve the ratio from (confidence, error, population=10^input_bits)
   via Cochran's formula.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from . import stats

DEFAULT_RATIO = 0.1        # RandomSamplingUtil.java:54
DEFAULT_ERROR_BOUND = 0.02  # RandomSamplingUtil.java:55
DEFAULT_CONFIDENCE = 0.95   # RandomSamplingUtil.java:56
DEFAULT_INPUT_BITS = 1      # RandomSamplingUtil.java:57


@dataclass(frozen=True)
class SamplingConfig:
    """Accuracy/sampling spec for one query run.

    ``ratio=None`` means "derive from (confidence, error_bound,
    input_bits)"; ``ratio=1.0`` means exact mode (the engine then skips the
    Sample operator entirely so exact runs hash-match SQL oracles).
    """

    ratio: float | None = None
    confidence: float = DEFAULT_CONFIDENCE
    error_bound: float = DEFAULT_ERROR_BOUND
    input_bits: int = DEFAULT_INPUT_BITS
    seed: int | None = 42  # None -> nondeterministic, like the reference's unseeded Random

    @property
    def population(self) -> float:
        """Assumed population magnitude N = 10^input_bits (RandomSamplingUtil.java:77)."""
        return 10.0 ** self.input_bits

    def resolve(self) -> float:
        """Effective sampling ratio per the reference's precedence (:72-79)."""
        if self.ratio is not None:
            if 0.0 < self.ratio <= 1.0:
                return self.ratio
            return DEFAULT_RATIO
        if not (0.0 < self.confidence < 1.0) or self.error_bound <= 0.0:
            return DEFAULT_RATIO
        return min(1.0, stats.cochran_ratio(self.confidence, self.error_bound, self.population))

    def predicted_error(self) -> float:
        """Error bound implied by the resolved ratio over the assumed population."""
        r = self.resolve()
        n = max(1, int(r * self.population))
        return stats.achieved_error(self.confidence, n, int(self.population))

    @classmethod
    def exact(cls) -> "SamplingConfig":
        return cls(ratio=1.0)

    @classmethod
    def from_cli(cls, arg: str, seed: int | None = 42) -> "SamplingConfig":
        """Parse the reference's CLI arg: ``ratio`` or ``conf,err,bits``.

        Comma-split dispatch per RandomSamplingUtil.java:125-153.
        """
        parts = arg.split(",")
        if len(parts) == 1:
            return cls(ratio=float(parts[0]), seed=seed)
        if len(parts) == 3:
            return cls(
                ratio=None,
                confidence=float(parts[0]),
                error_bound=float(parts[1]),
                input_bits=int(parts[2]),
                seed=seed,
            )
        raise ValueError(f"expected 'ratio' or 'conf,err,bits', got {arg!r}")

    def with_seed(self, seed: int | None) -> "SamplingConfig":
        return replace(self, seed=seed)
