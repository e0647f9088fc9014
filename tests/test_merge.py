"""Merge/upsert operator."""

from random_sampling_based_approximate_mapreduce_spark.operators.merge import merge_upsert


class TestMergeUpsert:
    def test_update_insert_survive(self, spark):
        base = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
        )
        updates = spark.createDataFrame(
            [(2, "B2"), (9, "new")], ["k", "v"]
        )
        got = {r["k"]: r["v"] for r in merge_upsert(base, updates, "k").collect()}
        assert got == {1: "a", 2: "B2", 3: "c", 9: "new"}

    def test_broadcastable_updates_do_not_shuffle_base(self, spark):
        from pyspark.sql import functions as F

        base = spark.range(0, 10000).select(F.col("id").alias("k"), F.lit("x").alias("v"))
        updates = spark.createDataFrame([(5, "y")], ["k", "v"])
        merged = merge_upsert(base, updates, "k")
        # collect THIS frame (count() builds a different QueryExecution):
        # AQE replans the anti-join to broadcast from runtime stats
        merged.collect()
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "BroadcastHashJoin" in plan
