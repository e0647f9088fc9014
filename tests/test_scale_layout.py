"""Storage-layout scale mechanics: bucketed joins and partition pruning.

These verify the two claims docs/SCALE.md makes about what changes first
at cluster scale — that bucketing removes the join exchange and that a
partitioned layout prunes scanned files — so the claims are executable,
not aspirational.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    """Orders + customer written BUCKETED by the join key into a local
    warehouse (saveAsTable is required for bucket metadata)."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    (orders.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
     .saveAsTable("b_orders"))
    (customer.withColumn("o_custkey", F.col("c_custkey")).write.mode("overwrite")
     .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_customer"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, warehouse):
        spark = warehouse
        # disable broadcast so the join strategy decision is about shuffling
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
            plan = j._jdf.queryExecution().executedPlan().toString()
            # co-bucketed on the join key: SMJ reads buckets directly,
            # zero Exchange on either side
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_bucketed_results_match_plain_join(self, warehouse, sf_dir):
        spark = warehouse
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        plain = (
            orders.join(customer, orders.o_custkey == customer.c_custkey)
            .groupBy("c_mktsegment").count().collect()
        )
        bucketed = (
            spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
            .groupBy("c_mktsegment").count().collect()
        )
        assert sorted((r["c_mktsegment"], r["count"]) for r in plain) == sorted(
            (r["c_mktsegment"], r["count"]) for r in bucketed
        )


class TestPartitionPruning:
    def test_filter_prunes_partitions(self, spark, sf_dir, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("events_part"))
        from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

        events = load(spark, sf_dir, "events").withColumn(
            "day", F.date_format("ts", "yyyy-MM-dd")
        )
        events.write.mode("overwrite").partitionBy("day").parquet(out)
        all_days = spark.read.parquet(out)
        n_days = all_days.select("day").distinct().count()
        assert n_days > 3

        day0 = all_days.select("day").orderBy("day").first()["day"]
        one_day = all_days.where(F.col("day") == day0)
        # the filter must reach the file index as a partition filter
        # (inputFiles() reports the unpruned relation; the one-line plan
        # truncates scan metadata — formatted explain prints it in full)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            one_day.explain("formatted")
        import re

        m = [ln for ln in buf.getvalue().splitlines() if "PartitionFilters" in ln]
        assert m and re.search(rf"\(day#\d+ = {day0}\)", m[0])
        # and pruning is semantically right
        assert one_day.count() == events.where(F.col("day") == day0).count()


class TestCatalogLayoutQueries:
    def test_docs_partitioned_query_prunes(self, spark, sf_dir):
        """The docs_partitioned_lang CATALOG query (not just a synthetic
        frame) carries its lang IN filter as PartitionFilters."""
        import contextlib
        import io

        from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES

        df = QUERIES["docs_partitioned_lang"].spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        lines = [ln for ln in buf.getvalue().splitlines() if "PartitionFilters" in ln]
        assert lines and "lang" in lines[0] and "in(lang" in lines[0].replace("IN (", "in(lang")

    def test_multifile_text_scan_is_parallel(self, spark, sf_dir):
        """The 8-file text layout yields >= 8 scan partitions without any
        repartition in the query."""
        from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES

        QUERIES["word_count_multifile"].spark(spark, sf_dir).count()  # materialize layout
        import glob
        import hashlib

        key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
        files = glob.glob(f"/tmp/rsmr_text_multifile_{key}/part-*")
        assert len(files) == 8
        # tiny files are bin-packed (maxPartitionBytes/openCostInBytes), so
        # the floor is the session's parallelism, not the file count
        floor = min(8, spark.sparkContext.defaultParallelism)
        assert (
            spark.read.text(f"/tmp/rsmr_text_multifile_{key}").rdd.getNumPartitions() >= floor
        )


class TestRelationalPlanShapes:
    def test_exists_subqueries_decorrelate(self, spark, sf_dir):
        from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES

        plan = (
            QUERIES["exists_subquery_customers"].spark(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "LeftSemi" in plan and "LeftAnti" in plan

    def test_grouping_sets_single_scan(self, spark, sf_dir):
        from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES

        qe = QUERIES["events_grouping_sets"].spark(spark, sf_dir)._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        assert "Expand" in plan
        assert plan.count("Scan parquet") == 1 or plan.count("FileScan") == 1
