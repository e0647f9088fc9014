#!/usr/bin/env python
"""Measure the agg-before-join inversion behind the Q13/Q18-shape queries.

plans/catalog.py claims (order_counts_distribution, large_orders_topk):
pre-aggregating the fact side BEFORE the dimension join shrinks the join
input from |fact rows| to |distinct keys|, which is the difference between
shuffling the fact table and shuffling its key domain at 100 TB. This tool
measures both plan shapes for both queries — identical results asserted —
on a replicated fact side, reporting wall seconds and shuffle bytes (Spark
UI REST API via measure_shuffle.measure).

Naive Q13: customer LEFT JOIN orders row-level, then count per customer.
Naive Q18: lineitem JOIN orders JOIN customer row-level, then group+HAVING.

Usage: python tools/measure_join_inversion.py [replicas]   (default 20)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from measure_shuffle import measure  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(spark, label, df):
    # one unmeasured execution first: the initial run of a shape pays
    # page-cache / codegen warmup that inverted-vs-naive order would
    # otherwise attribute to whichever ran first (observed 2.3 s cold vs
    # 0.7 s warm on the identical plan); then median-of-3 wall, the
    # bench.py discipline for this box's documented run-to-run noise
    from statistics import median

    df.write.format("noop").mode("overwrite").save()
    walls = []
    for i in range(3):
        t0 = time.monotonic()
        if i == 0:
            measure(spark, label, df)
        else:
            df.write.format("noop").mode("overwrite").save()
        walls.append(time.monotonic() - t0)
    print(f"{'':>22}  wall median {median(walls):6.2f} s  (runs: "
          + ", ".join(f"{w:.2f}" for w in walls) + ")")


def main() -> None:
    from pyspark.sql import functions as F

    from random_sampling_based_approximate_mapreduce_spark.session import get_spark
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("join-inversion-audit", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    # the inversion is a LOGICAL-plan property; disable AQE's own
    # post-shuffle rescue so the two shapes are compared as planned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")

    c = load(spark, SF_DIR, "customer").select("c_custkey").localCheckpoint(eager=True)
    # replicate orders to stand in for a fact side >> dim side; keys are
    # reused so per-customer counts grow, matching the skewless 100 TB case
    o1 = load(spark, SF_DIR, "orders").select("o_custkey", "o_orderkey")
    o = (
        spark.range(replicas)
        .crossJoin(o1)
        .select("o_custkey", (F.col("o_orderkey") * replicas + F.col("id")).alias("o_orderkey"))
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    n_c, n_o = c.count(), o.count()
    print(f"customers {n_c}; replicated orders {n_o} ({replicas}x)")

    # ---- Q13 shape ----------------------------------------------------
    inverted = (
        c.join(
            o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")),
            c.c_custkey == F.col("o_custkey"),
            "left",
        )
        .select(F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )
    naive = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )
    a = {tuple(r) for r in inverted.collect()}
    b = {tuple(r) for r in naive.collect()}
    assert a == b, "Q13 shapes disagree"
    print("Q13: results identical; measuring...")
    _timed(spark, "Q13 agg-before-join", inverted)
    _timed(spark, "Q13 join-before-agg", naive)

    # ---- Q18 shape ----------------------------------------------------
    li1 = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    li = (
        spark.range(replicas)
        .crossJoin(li1)
        .select((F.col("l_orderkey") * replicas + F.col("id")).alias("l_orderkey"), "l_quantity")
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    orders = (
        spark.range(replicas)
        .crossJoin(load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_totalprice"))
        .select((F.col("o_orderkey") * replicas + F.col("id")).alias("o_orderkey"), "o_custkey", "o_totalprice")
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    print(f"replicated lineitem {li.count()}; replicated orders {orders.count()}")

    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    inv18 = (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_custkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )
    naive18 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )
    a18 = [tuple(r) for r in inv18.collect()]
    b18 = [tuple(r) for r in naive18.collect()]
    assert a18 == b18, "Q18 shapes disagree"
    print("Q18: results identical; measuring...")
    _timed(spark, "Q18 agg-then-bcast", inv18)
    _timed(spark, "Q18 join-then-having", naive18)

    spark.stop()


if __name__ == "__main__":
    main()
