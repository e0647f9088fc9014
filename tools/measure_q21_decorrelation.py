#!/usr/bin/env python
"""Measure the Q21 decorrelation claim (catalog waiting_suppliers_q21).

The spec's correlated EXISTS / NOT EXISTS pair is textbook-rewritten as
two lineitem self-joins; the shipped form replaces both with ONE window
pass over the (orderkey, suppkey) grouped relation. Three
result-identical forms, measured at Nx the bench lineitem (distinct
orderkeys per replica, so per-order supplier structure is preserved —
just Nx more orders):

  window    — count/sum OVER (PARTITION BY orderkey) on ol directly
              (the shipped form; zero self-joins)
  join-back — per-order counts aggregated from ol, joined back
  self-join — ol semi-joined (EXISTS other supplier) and anti-joined
              (NOT EXISTS other late supplier) against itself, the
              shape a literal decorrelation produces

Per-form shuffle-write bytes (Spark UI REST, like measure_shuffle.py)
and wall seconds; asserts all three return identical results.

Usage: python tools/measure_q21_decorrelation.py [--mult 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_totals(spark) -> dict:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return {s["stageId"]: s.get("shuffleWriteBytes", 0) for s in stages}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from random_sampling_based_approximate_mapreduce_spark.session import get_spark
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

    spark = get_spark("rsmr-measure-q21", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df, key):
        parts = [
            df.withColumn(key, F.col(key) + F.lit(i * 100_000_000))
            for i in range(args.mult)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    big = replicate(
        load(spark, args.sf, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag"),
        "l_orderkey",
    )
    big_o = replicate(
        load(spark, args.sf, "orders").where(F.col("o_orderstatus") == "F").select("o_orderkey"),
        "o_orderkey",
    )

    # the shared grouped relation, checkpointed so each form starts from
    # identical materialized input and the measurement isolates the
    # decorrelation strategy itself
    ol = (
        big.join(big_o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("is_r"))
        .localCheckpoint(eager=True)
    )
    print(f"ol rows={ol.count():,} (mult={args.mult})")

    w = Window.partitionBy("l_orderkey")
    win = (
        ol.select(
            "l_suppkey",
            "is_r",
            F.count(F.lit(1)).over(w).alias("n_supp"),
            F.sum("is_r").over(w).alias("n_r_supp"),
        )
        .where((F.col("is_r") == 1) & (F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )

    oa = ol.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("is_r").alias("n_r_supp")
    )
    jb = (
        ol.join(oa, ol.l_orderkey == oa.ok)
        .where((F.col("is_r") == 1) & (F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )

    late = ol.where(F.col("is_r") == 1)
    other = ol.select(F.col("l_orderkey").alias("e_ok"), F.col("l_suppkey").alias("e_sk"))
    other_late = late.select(F.col("l_orderkey").alias("n_ok"), F.col("l_suppkey").alias("n_sk"))
    sj = (
        late.join(
            other, (late.l_orderkey == other.e_ok) & (late.l_suppkey != other.e_sk), "left_semi"
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("n_ok")) & (F.col("l_suppkey") != F.col("n_sk")),
            "left_anti",
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )

    results = {}
    for name, df in [("window", win), ("join-back", jb), ("self-join", sj)]:
        before = _stage_totals(spark)
        t0 = time.monotonic()
        rows = {(r.l_suppkey, r.numwait) for r in df.collect()}
        wall = time.monotonic() - t0
        after = _stage_totals(spark)
        wbytes = sum(v for sid, v in after.items() if sid not in before)
        results[name] = rows
        print(f"{name:10s} wall={wall:6.2f} s  shuffle-write={wbytes/1e6:8.1f} MB  suppliers={len(rows)}")
    assert results["window"] == results["join-back"] == results["self-join"], "forms disagree"
    print("all three forms identical")
    spark.stop()


if __name__ == "__main__":
    main()
