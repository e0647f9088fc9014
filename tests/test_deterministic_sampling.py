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


class TestWeightedBernoulli:
    def test_inclusion_scales_with_weight(self, spark):
        from pyspark.sql import functions as F

        from random_sampling_based_approximate_mapreduce_spark.sampling.deterministic import (
            weighted_bernoulli,
        )

        # weights 1 vs 9, mean 5: pi = 0.25*w/5 -> 0.05 vs 0.45
        df = spark.range(0, 4000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 2 == 0, F.lit(1)).otherwise(F.lit(9)).alias("w"),
        )
        out = weighted_bernoulli(df, "k", "w", 0.25, mean_weight=5.0, seed=3)
        by_w = {r["w"]: r["n"] for r in out.groupBy("w").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert by_w[1] / 2000 == pytest.approx(0.05, abs=0.02)
        assert by_w[9] / 2000 == pytest.approx(0.45, abs=0.04)

    def test_ht_estimator_unbiased_for_total(self, spark):
        from pyspark.sql import functions as F

        from random_sampling_based_approximate_mapreduce_spark.sampling.deterministic import (
            weighted_bernoulli,
        )

        df = spark.range(1, 5001).select(
            F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("w")
        )
        exact = df.agg(F.sum("w")).first()[0]
        mean_w = df.agg(F.avg("w")).first()[0]
        s = weighted_bernoulli(df, "k", "w", 0.3, mean_weight=mean_w, seed=5)
        est = s.select(F.sum(F.col("w") / F.col("__pi"))).first()[0]
        assert est == pytest.approx(exact, rel=0.05)

    def test_pi_capped_at_one(self, spark):
        from pyspark.sql import functions as F

        from random_sampling_based_approximate_mapreduce_spark.sampling.deterministic import (
            weighted_bernoulli,
        )

        # one huge weight: pi would exceed 1 uncapped; capped rows always kept
        df = spark.createDataFrame([(1, 1000), (2, 1), (3, 1)], ["k", "w"])
        out = weighted_bernoulli(df, "k", "w", 0.5, mean_weight=334.0, seed=1)
        pis = {r["k"]: r["__pi"] for r in out.collect()}
        assert pis.get(1) == 1.0
