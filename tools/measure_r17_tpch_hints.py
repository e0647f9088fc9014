#!/usr/bin/env python
"""Round-17 A/B: per-query SHUFFLE_HASH hints on tpch q9/q12/q21 (VERDICT
r16 item 1), measured on the x10 replica with alternated in-session passes
(min-of-N each way) so box drift hits both arms equally.

The UNHINTED twins are reconstructed inline (the tree now carries the
hints), byte-identical to the r16 query bodies. small_qty_revenue rides
along as the known SHJ-loser control — it must NOT regress because the
hints are per-query, not a planner flip.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
    from random_sampling_based_approximate_mapreduce_spark.plans.tpch_behavioral import _dec
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark
    from random_sampling_based_approximate_mapreduce_spark.sources.scale_up import (
        ensure_scaled_tpch,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

    spark = get_spark("rsmr-ab-tpch-hints")
    spark.sparkContext.setLogLevel("ERROR")
    sf = ensure_scaled_tpch(spark, SF_DIR, copies=10)

    # --- unhinted twins (r16 bodies, verbatim minus the hint) ---------
    def q9_unhinted(spark, sf_dir):
        one = F.lit("1.00").cast("decimal(4,2)")
        p = (
            load(spark, sf_dir, "part")
            .where(F.col("p_name").like("%gear%"))
            .select("p_partkey", "p_retailprice")
        )
        n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        sup = (
            load(spark, sf_dir, "supplier")
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("nation"))
        )
        lf = (
            load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount")
            .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
            .withColumn(
                "amount",
                _dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))
                - _dec("p_retailprice") * _dec("l_quantity"),
            )
            .select("l_orderkey", "nation", "amount")
        )
        of = load(spark, sf_dir, "orders").select("o_orderkey", F.year("o_orderdate").alias("o_year"))
        return (
            lf.join(of, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("nation", "o_year")
            .agg(F.sum("amount").cast("double").alias("sum_profit"))
        )

    def q12_unhinted(spark, sf_dir):
        hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        l = (
            load(spark, sf_dir, "lineitem")
            .where(
                (F.col("l_shipdate") >= "1996-01-01")
                & (F.col("l_shipdate") < "1997-01-01")
                & F.col("l_returnflag").isin("A", "R")
            )
            .select("l_orderkey", "l_returnflag")
        )
        o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
        return (
            l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_returnflag")
            .agg(
                F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
                F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
            )
        )

    def q21_unhinted(spark, sf_dir):
        from pyspark.sql.window import Window

        o = (
            load(spark, sf_dir, "orders")
            .where(F.col("o_orderstatus") == "F")
            .select("o_orderkey")
        )
        l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
        ol = (
            l.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
            .groupBy("l_orderkey", "l_suppkey")
            .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("is_r"))
        )
        w = Window.partitionBy("l_orderkey")
        flagged = ol.select(
            "l_orderkey",
            "l_suppkey",
            "is_r",
            F.count(F.lit(1)).over(w).alias("n_supp"),
            F.sum("is_r").over(w).alias("n_r_supp"),
        ).where((F.col("is_r") == 1) & (F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
        s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
        return (
            flagged.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_suppkey", "s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
        )

    pairs = {
        "product_profit_q9": q9_unhinted,
        "priority_case_count_q12": q12_unhinted,
        "waiting_suppliers_q21": q21_unhinted,
    }
    control = "small_qty_revenue"

    def run(df) -> float:
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    # warmup
    run(QUERIES["tpch_q1"].spark(spark, sf))

    n_rounds = int(os.environ.get("AB_ROUNDS", 4))
    res: dict[str, dict] = {n: {"hinted": [], "unhinted": []} for n in pairs}
    res[control] = {"hinted": [], "unhinted": []}
    for _ in range(n_rounds):
        for name, unhinted in pairs.items():
            res[name]["unhinted"].append(run(unhinted(spark, sf)))
            res[name]["hinted"].append(run(QUERIES[name].spark(spark, sf)))
        # control has no hint; time it twice per round into both arms
        res[control]["unhinted"].append(run(QUERIES[control].spark(spark, sf)))
        res[control]["hinted"].append(run(QUERIES[control].spark(spark, sf)))
        spark.sparkContext._jvm.System.gc()

    out = {}
    for name, arms in res.items():
        a, b = min(arms["unhinted"]), min(arms["hinted"])
        out[name] = {
            "unhinted_min": round(a, 3),
            "hinted_min": round(b, 3),
            "delta": round(a - b, 3),
            "unhinted_all": [round(x, 3) for x in arms["unhinted"]],
            "hinted_all": [round(x, 3) for x in arms["hinted"]],
        }
        print(f"{name:28s} unhinted={a:6.3f} hinted={b:6.3f} delta={a-b:+.3f}")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "docs", "bench", "AB_r17_tpch_hints.json")
    with open(path, "w") as fh:
        json.dump({"sf_dir": SF_DIR, "x10": True, "rounds": n_rounds, "queries": out}, fh, indent=1)
    print("wrote", path)

    # sanity: hinted plans actually contain ShuffledHashJoin
    for name in pairs:
        plan = QUERIES[name].spark(spark, sf)._jdf.queryExecution().executedPlan().toString()
        print(name, "ShuffledHashJoin" in plan and "SHJ-in-initial-plan" or "no-SHJ-initial (check AQE final)")
    spark.stop()


if __name__ == "__main__":
    main()
