from . import stats
from .config import SamplingConfig
from .sampled_frame import SampledFrame, SamplingReport

__all__ = ["stats", "SamplingConfig", "SampledFrame", "SamplingReport"]
