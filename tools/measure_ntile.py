#!/usr/bin/env python
"""Measure the global-ntile trap the RFM query documents
(customer_rfm_segments: 'a GLOBAL ntile would be the single-partition
trap').

ntile(5) OVER (ORDER BY metric) moves EVERY row through one task — the
plan Spark itself warns about ('No Partition Defined for Window
operation'). Scoring within a partition key (nation) keeps the same
quintile semantics per segment and parallelizes. This tool times both
forms on replicated customer rows and reports the scaling curve.

Usage: python tools/measure_ntile.py [--mults 10,40]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="10,40")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from random_sampling_based_approximate_mapreduce_spark.session import get_spark
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

    spark = get_spark("rsmr-measure-ntile")
    spark.sparkContext.setLogLevel("ERROR")

    base = load(spark, args.sf, "customer").select("c_custkey", "c_nationkey", "c_acctbal")

    for mult in [int(m) for m in args.mults.split(",")]:
        reps = [
            base.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * 10_000_000))
            for i in range(mult)
        ]
        big = reps[0]
        for r in reps[1:]:
            big = r.union(big)
        big = big.localCheckpoint(eager=True)
        n = big.count()

        w_global = Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
        w_nation = Window.partitionBy("c_nationkey").orderBy(
            F.asc("c_acctbal"), F.asc("c_custkey")
        )

        def run(w):
            t0 = time.monotonic()
            big.select(F.ntile(5).over(w).alias("s")).groupBy("s").count().collect()
            return time.monotonic() - t0

        g = min(run(w_global) for _ in range(2))
        p = min(run(w_nation) for _ in range(2))
        print(f"rows={n:>10,}  global ntile={g:6.2f} s   per-nation ntile={p:6.2f} s   ({g/p:.1f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
