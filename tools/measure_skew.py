#!/usr/bin/env python
"""Skew-join measurement behind docs/SCALE.md "Measured: skew".

Generates a Zipf-head fact table (HOT_FRAC of rows on key 0, the rest
uniform over N_KEYS) plus a dim table, then times the same
join+aggregate under the engine's three skew strategies:

  plain   - sort-merge join, AQE off, broadcast off: the hot key's
            shuffle partition lands on ONE task (the 100 TB failure mode)
  aqe     - AQE skew-join on (spark.sql.adaptive.skewJoin): runtime
            splits the oversized partition, no query change
  salted  - operators.skew.salted_join: explicit (key, salt) spread,
            for producers AQE can't fix (single key >> split target)
  bcast   - broadcast join reference point (what the planner picks when
            the dim fits; skew is irrelevant on a map-side join)

Usage: python tools/measure_skew.py [n_rows] [out_dir]
Writes parquet under /tmp/rsmr_skew_<pid> unless out_dir given; prints a
wall-time table. Deterministic (seeded) generation, best-of-1 per cell —
rerun for best-of-3 as docs/SCALE.md does.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
N_KEYS = 200_000
HOT_FRAC = 0.75
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/rsmr_skew_{os.getpid()}"


def build(spark):
    from pyspark.sql import functions as F

    fact = (
        spark.range(0, N_ROWS, numPartitions=32)
        .select(
            F.when(
                F.pmod(F.xxhash64("id"), F.lit(100)) < int(HOT_FRAC * 100), F.lit(0)
            )
            .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_KEYS)))
            .cast("long")
            .alias("k"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)) / 100.0).alias("v"),
        )
    )
    dim = spark.range(0, N_KEYS).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(50)).cast("long").alias("seg"),
    )
    fact.write.mode("overwrite").parquet(f"{OUT}/fact")
    dim.write.mode("overwrite").parquet(f"{OUT}/dim")


def run(spark, strategy: str) -> float:
    from pyspark.sql import functions as F

    from random_sampling_based_approximate_mapreduce_spark.operators.skew import salted_join

    conf = spark.conf
    conf.set("spark.sql.adaptive.enabled", "true" if strategy == "aqe" else "false")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # keep the split target well below the hot partition so AQE acts
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    conf.set(
        "spark.sql.autoBroadcastJoinThreshold",
        "10m" if strategy == "bcast" else "-1",
    )

    fact = spark.read.parquet(f"{OUT}/fact")
    dim = spark.read.parquet(f"{OUT}/dim")
    if strategy == "salted":
        joined = salted_join(fact, dim, "k", n_salts=32)
    else:
        joined = fact.join(dim, "k")
    q = joined.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    t0 = time.monotonic()
    q.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main():
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark

    spark = get_spark("measure-skew", master=f"local[{os.cpu_count()}]")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    print(f"building {N_ROWS:,} fact rows ({HOT_FRAC:.0%} on key 0), {N_KEYS:,} dim keys -> {OUT}")
    build(spark)
    # warmup (codegen, page cache)
    run(spark, "bcast")
    for strategy in ("plain", "aqe", "salted", "bcast"):
        wall = run(spark, strategy)
        print(f"{strategy:>7}: {wall:6.2f} s")
    if len(sys.argv) <= 2:
        shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
