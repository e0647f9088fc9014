"""Hash-deterministic sampling: reproducibility, exact size, plan shape."""

import pytest
from pyspark.sql import functions as F

from random_sampling_based_approximate_mapreduce_spark.sampling.deterministic import (
    exact_k_sample,
    hash_bernoulli,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

    return load(spark, sf_dir, "events")


class TestHashBernoulli:
    def test_deterministic_across_runs(self, events):
        a = sorted(r["event_id"] for r in hash_bernoulli(events, "event_id", 0.1).select("event_id").collect())
        b = sorted(r["event_id"] for r in hash_bernoulli(events, "event_id", 0.1).select("event_id").collect())
        assert a == b and len(a) > 0

    def test_rate_close_to_ratio(self, events):
        total = events.count()
        kept = hash_bernoulli(events, "event_id", 0.2, seed=1).count()
        assert kept / total == pytest.approx(0.2, abs=0.03)

    def test_different_seeds_differ(self, events):
        a = set(r["event_id"] for r in hash_bernoulli(events, "event_id", 0.1, seed=1).select("event_id").collect())
        b = set(r["event_id"] for r in hash_bernoulli(events, "event_id", 0.1, seed=2).select("event_id").collect())
        assert a != b


class TestExactK:
    def test_exactly_k_and_deterministic(self, events):
        a = [r["event_id"] for r in exact_k_sample(events, "event_id", 50).select("event_id").collect()]
        b = [r["event_id"] for r in exact_k_sample(events, "event_id", 50).select("event_id").collect()]
        assert len(a) == 50
        assert sorted(a) == sorted(b)

    def test_plans_as_take_ordered(self, events):
        plan = (
            exact_k_sample(events, "event_id", 10)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # per-partition top-k + merge, NOT a global sort exchange
        assert "TakeOrderedAndProject" in plan
        assert "rangepartitioning" not in plan
