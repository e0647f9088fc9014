"""Bloom semi-join reduction: correctness (exact plain-join parity, no
false negatives) and the plan shape the operator exists for — the big
side filtered by the broadcast bucket semi-join BEFORE its shuffle."""

import contextlib
import io

from pyspark.sql import functions as F

from random_sampling_based_approximate_mapreduce_spark.operators.bloom import bloom_semi_join, key_buckets
from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
from random_sampling_based_approximate_mapreduce_spark.sources.tables import load


class TestBloomSemiJoin:
    def test_never_drops_joining_rows(self, spark, sf_dir):
        li = load(spark, sf_dir, "lineitem").select("l_orderkey")
        urgent = (
            load(spark, sf_dir, "orders")
            .where(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        reduced = bloom_semi_join(li, "l_orderkey", urgent, "o_orderkey")
        exact = li.join(urgent, li.l_orderkey == urgent.o_orderkey, "left_semi")
        # superset of the exact semi-join (no false negatives)...
        assert reduced.count() >= exact.count()
        assert exact.join(reduced, "l_orderkey", "left_anti").count() == 0
        # ...and a real reduction vs the unfiltered side
        assert reduced.count() < li.count()

    def test_catalog_query_matches_plain_join(self, spark, sf_dir):
        got = {
            r["l_linestatus"]: (r["sum_qty"], r["cnt"])
            for r in QUERIES["bloom_semi_join"].spark(spark, sf_dir).collect()
        }
        li = load(spark, sf_dir, "lineitem")
        o = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
        want = {
            r["l_linestatus"]: (r["sum_qty"], r["cnt"])
            for r in li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .collect()
        }
        assert got == want

    def test_big_side_filtered_before_shuffle(self, spark, sf_dir):
        """The executed plan must show the LeftSemi broadcast join BELOW
        (deeper than) the big side's hashpartitioning exchange: rejected
        rows never reach the shuffle. Collect the frame first so AQE's
        final plan is what we assert on."""
        df = QUERIES["bloom_semi_join"].spark(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        lines = plan.splitlines()
        exch = [
            i
            for i, ln in enumerate(lines)
            if "Exchange hashpartitioning(l_orderkey" in ln
        ]
        semi = [i for i, ln in enumerate(lines) if "LeftSemi" in ln]
        assert exch and semi, plan
        # children print below parents: the semi join is inside the
        # exchange's subtree, i.e. runs before the shuffle
        assert min(exch) < min(semi), plan
        assert "SortMergeJoin" in plan, plan

    def test_bucket_relation_is_bounded(self, spark, sf_dir):
        """The broadcast side is DISTINCT bucket ints — bounded by
        n_buckets however large the dim side grows."""
        urgent = load(spark, sf_dir, "orders").select("o_orderkey")
        n_buckets = 1 << 10
        b = key_buckets(urgent, "o_orderkey", n_buckets)
        assert b.count() <= n_buckets
        assert dict(b.dtypes)["__bucket"] == "bigint"
