"""Skew operators: salting must be invisible in results."""

import pytest
from pyspark.sql import functions as F

from random_sampling_based_approximate_mapreduce_spark.operators.skew import salted_join, two_phase_agg


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


class TestSaltedJoin:
    def test_inner_matches_plain_join(self, orders, customer):
        o = orders.select("o_custkey", "o_totalprice")
        c = customer.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
        plain = sorted(o.join(c, "o_custkey").collect())
        salted = sorted(salted_join(o, c, "o_custkey", n_salts=4).collect())
        assert salted == plain

    def test_left_keeps_unmatched_big_rows(self, spark):
        big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "no-match")], ["k", "v"])
        small = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "w"])
        out = salted_join(big, small, "k", n_salts=4, how="left").collect()
        assert len(out) == 3
        assert {r["k"]: r["w"] for r in out} == {1: "x", 2: "y", 99: None}

    def test_right_join_rejected(self, spark):
        df = spark.range(2)
        with pytest.raises(ValueError):
            salted_join(df, df, "id", how="right")


class TestTwoPhaseAgg:
    def test_matches_plain_groupby(self, orders):
        plain = {
            (r["o_orderpriority"]): (r["cnt"], r["total"])
            for r in orders.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("o_totalprice").alias("total"))
            .collect()
        }
        salted = {
            (r["o_orderpriority"]): (r["cnt"], r["total"])
            for r in two_phase_agg(
                orders.select("o_orderpriority", "o_totalprice"),
                ["o_orderpriority"],
                {"cnt": ("count", None), "total": ("sum", "o_totalprice")},
                n_salts=4,
            ).collect()
        }
        assert set(salted) == set(plain)
        for k, (cnt, total) in plain.items():
            assert salted[k][0] == cnt
            assert salted[k][1] == pytest.approx(total, rel=1e-12)


class TestApproxQuantile:
    def test_sketch_close_to_exact(self, orders):
        exact = {
            r["o_orderpriority"]: r["p50"]
            for r in orders.groupBy("o_orderpriority")
            .agg(F.expr("percentile(o_totalprice, 0.5)").alias("p50"))
            .collect()
        }
        approx = {
            r["o_orderpriority"]: r["p50"]
            for r in orders.groupBy("o_orderpriority")
            .agg(F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("p50"))
            .collect()
        }
        for k, v in exact.items():
            assert approx[k] == pytest.approx(v, rel=0.05)


class TestSuggestNSalts:
    def test_hot_key_sized_to_partitions(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from random_sampling_based_approximate_mapreduce_spark.operators.skew import suggest_n_salts
        from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

        ev = load(spark, sf_dir, "events").select(
            F.when(F.pmod("event_id", F.lit(4)) < 3, F.lit(0))
            .otherwise(F.col("user_id"))
            .alias("k")
        )
        # 75% on one key, 32 shuffle partitions -> ceil(0.75*32) = 24-ish
        n = suggest_n_salts(ev, "k", shuffle_partitions=32, sample_ratio=1.0)
        assert 20 <= n <= 28

    def test_uniform_needs_no_salt(self, spark, sf_dir):
        from random_sampling_based_approximate_mapreduce_spark.operators.skew import suggest_n_salts
        from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

        o = load(spark, sf_dir, "orders")
        # ~uniform o_custkey across hundreds of keys: below uniform share
        assert suggest_n_salts(o, "o_custkey", shuffle_partitions=8, sample_ratio=1.0) == 1

    def test_cap(self, spark):
        from random_sampling_based_approximate_mapreduce_spark.operators.skew import suggest_n_salts

        df = spark.range(1000).selectExpr("0 AS k")  # 100% one key
        assert suggest_n_salts(df, "k", shuffle_partitions=10_000, sample_ratio=1.0, max_salts=64) == 64
