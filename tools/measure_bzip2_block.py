#!/usr/bin/env python
"""Measure the bzip2-block byte-skip win (sources/bzip2_block_text.py).

Builds a single large .bz2 text file (documents.text replicated), then
times, with a count() downstream (n passes, min):

- JVM whole-stream text scan of the .bz2 (Spark/Hadoop's own splittable
  bzip2 reader — the fallback the engine used before round 9),
- df.sample(0.1) over that scan (the row-sampler floor: every byte
  still decompressed),
- bzip2_block ratio 1.0 (full decode through the Python block source),
- bzip2_block ratio 0.1 (the skip: only picked compressed ranges are
  opened and decoded),

and reports compressed bytes opened from pick_ranges' exact accounting.

Usage: python tools/measure_bzip2_block.py [--copies 8] [--sf DIR]
Prints one JSON line; paste the table into docs/SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from random_sampling_based_approximate_mapreduce_spark.session import get_spark  # noqa: E402


def _timed(fn, n=2):
    # one untimed warmup pass (review r10): the first workload measured
    # on a cold session otherwise absorbs JVM/codegen warmup the later
    # workloads don't pay, biasing the first-vs-rest comparison
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--copies", type=int, default=8)
    ap.add_argument("--ratio", type=float, default=0.1)
    ap.add_argument("--range-bytes", type=int, default=4 << 20)
    args = ap.parse_args()

    spark = get_spark("measure-bzip2-block")
    spark.sparkContext.setLogLevel("ERROR")

    from random_sampling_based_approximate_mapreduce_spark.sources.bzip2_block_text import (
        pick_ranges,
        read_text_bzip2_sampled,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import (
        ensure_layout,
    )

    import hashlib

    key = hashlib.md5(f"{args.sf}:{args.copies}:v2".encode()).hexdigest()[:10]
    src = ensure_layout(
        f"/tmp/rsmr_bz2_measure_{key}",
        lambda d: (
            spark.read.parquet(os.path.join(args.sf, "documents.parquet"))
            .select("text")
            .crossJoin(spark.range(args.copies).select(F.col("id").alias("__c")))
            # per-copy entropy suffix: without it bzip2 folds the
            # replicas to ~nothing and the corpus stays one range
            .select(
                F.concat(
                    F.col("text"),
                    F.lit(" "),
                    F.md5(F.concat(F.col("text"), F.col("__c").cast("string"))),
                    F.lit(" "),
                    F.md5(F.col("__c").cast("string")),
                ).alias("value")
            )
            .repartition(1)
            .write.mode("overwrite")
            .option("compression", "bzip2")
            .text(d)
        ),
    )
    comp_bytes = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".bz2")
    )

    jvm = _timed(lambda: spark.read.text(src).count())
    jvm_sample = _timed(lambda: spark.read.text(src).sample(args.ratio, seed=1).count())
    blk_full = _timed(
        lambda: read_text_bzip2_sampled(spark, src, 1.0, range_bytes=args.range_bytes).df.count()
    )
    blk_sampled = _timed(
        lambda: read_text_bzip2_sampled(spark, src, args.ratio, range_bytes=args.range_bytes, seed=9).df.count()
    )
    _, picked_bytes, total_bytes = pick_ranges(src, args.ratio, args.range_bytes, seed=9)

    print(
        json.dumps(
            {
                "compressed_mb": round(comp_bytes / 1e6, 1),
                "jvm_full_scan_s": jvm,
                "jvm_row_sample_s": jvm_sample,
                "block_full_s": blk_full,
                "block_sampled_s": blk_sampled,
                "ratio": args.ratio,
                "picked_compressed_mb": round(picked_bytes / 1e6, 1),
                "total_compressed_mb": round(total_bytes / 1e6, 1),
                "skip_speedup_vs_full_block": round(blk_full / blk_sampled, 2)
                if blk_sampled
                else None,
                "sampled_vs_jvm_full": round(jvm / blk_sampled, 2) if blk_sampled else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
