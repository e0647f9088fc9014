#!/usr/bin/env python
"""Measure the incremental-rollup claim (catalog events_hourly_incremental).

Compares the cost of one refresh under two strategies at Nx the bench
events table:

  full recompute — scan ALL history + the new day, aggregate everything
  incremental    — aggregate ONLY the new day's delta, merge with the
                   stored hourly partials (union + re-agg over two
                   group-bounded relations)

The refresh is repeated for several "days" so the full strategy's cost
growth (re-scanning an ever-longer history) and the incremental
strategy's flat cost are both visible. Results asserted identical.

Usage: python tools/measure_incremental.py [--mult 20] [--days 4]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=20)
    ap.add_argument("--days", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from random_sampling_based_approximate_mapreduce_spark.session import get_spark
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

    spark = get_spark("rsmr-measure-incremental")
    spark.sparkContext.setLogLevel("ERROR")

    # Nx events spread across a longer synthetic timeline: replica i
    # shifts by i*30 days, so each replica is one month of "history".
    base = load(spark, args.sf, "events").select("ts", "event_type", "value")
    months = [
        base.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 30} DAYS"))
        for i in range(args.mult)
    ]
    work = "/tmp/rsmr_measure_incremental"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    hist = months[0]
    for m in months[1:]:
        hist = hist.union(m)
    hist.write.mode("overwrite").parquet(f"{work}/history")
    history = spark.read.parquet(f"{work}/history")
    print(f"history rows={history.count():,} (mult={args.mult})")

    def agg(df):
        return df.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("val_sum"),
        )

    # bootstrap the stored partials from history
    agg(history).write.mode("overwrite").parquet(f"{work}/partials")

    full_times, inc_times = [], []
    for d in range(1, args.days + 1):
        delta = base.limit(50_000).withColumn(
            "ts",
            F.col("ts") + F.expr(f"INTERVAL {args.mult * 30 + d} DAYS"),
        )
        delta.write.mode("overwrite").parquet(f"{work}/delta_{d}")
        delta_p = spark.read.parquet(f"{work}/delta_{d}")

        # full recompute: history + all deltas so far, from raw rows
        t0 = time.monotonic()
        full_src = history
        for j in range(1, d + 1):
            full_src = full_src.unionByName(spark.read.parquet(f"{work}/delta_{j}"))
        # both strategies persist their refreshed rollup (the real
        # pipeline contract) so the write cost is paid equally
        full = agg(full_src)
        full.write.mode("overwrite").parquet(f"{work}/full_out")
        full_times.append(time.monotonic() - t0)

        # incremental: delta agg + stored partials, re-agg; persist the
        # merged partials as the next day's base (the real pipeline loop)
        t0 = time.monotonic()
        partials = spark.read.parquet(f"{work}/partials")
        merged = (
            partials.unionByName(agg(delta_p))
            .groupBy("hour", "event_type")
            .agg(F.sum("cnt").alias("cnt"), F.sum("val_sum").alias("val_sum"))
        )
        merged.write.mode("overwrite").parquet(f"{work}/partials_next")
        inc_times.append(time.monotonic() - t0)
        shutil.rmtree(f"{work}/partials")
        os.replace(f"{work}/partials_next", f"{work}/partials")
        print(
            f"day {d}: full={full_times[-1]:6.2f} s   incremental={inc_times[-1]:6.2f} s"
        )

    # identity check on the final state
    final_inc = spark.read.parquet(f"{work}/partials").select(
        "hour", "event_type", "cnt", F.col("val_sum").cast("double").alias("v")
    )
    full_src = history
    for j in range(1, args.days + 1):
        full_src = full_src.unionByName(spark.read.parquet(f"{work}/delta_{j}"))
    final_full = agg(full_src).select(
        "hour", "event_type", "cnt", F.col("val_sum").cast("double").alias("v")
    )
    diff = final_inc.exceptAll(final_full).count() + final_full.exceptAll(final_inc).count()
    assert diff == 0, f"incremental != full ({diff} differing rows)"
    print(
        f"identical results; mean full={sum(full_times)/len(full_times):.2f} s "
        f"vs mean incremental={sum(inc_times)/len(inc_times):.2f} s "
        f"({sum(full_times)/sum(inc_times):.1f}x)"
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
