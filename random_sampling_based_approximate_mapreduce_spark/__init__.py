"""rsmr-spark: a PySpark-native approximate analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
jessefjxm/Random-Sampling-Based-Approximate-MapReduce (see SURVEY.md):
scan-level Bernoulli sampling with statistically-derived ratios, exact
cardinality tracking via observed metrics, Horvitz–Thompson scaled
estimators with per-group confidence intervals — plus the relational /
dedup / similarity / text-analysis operator surface a 100 TB training-data
pipeline needs.

Import as ``import random_sampling_based_approximate_mapreduce_spark as rsmr``.
"""

from .sampling import stats
from .sampling.config import SamplingConfig
from .sampling.sampled_frame import (
    SampledFrame,
    SamplingReport,
    stratified_sample,
    weighted_count,
    weighted_sum,
)
from .session import get_spark

__all__ = [
    "SamplingConfig",
    "SampledFrame",
    "SamplingReport",
    "stats",
    "get_spark",
    "stratified_sample",
    "weighted_count",
    "weighted_sum",
]
__version__ = "0.1.0"
