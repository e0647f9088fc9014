#!/usr/bin/env python
"""Isolated A/B measurement for the log_host_sampled r4 bench regression.

VERDICT r4 item 1: BENCH_r03 had log_host_sampled at 0.473 s, BENCH_r04 at
1.678 s (median-of-3) while `git diff r3..r4` shows zero changes to the
query's executed plan (catalog entry, apache_log.py, approx_count, session
config all untouched; the sampled_frame.py r4 edits touch report()/
approx_sum/approx_ratio only). This script measures the query isolated —
fresh session, warmup, N timed runs, reporting min/median/all — so the
same command run from the repo root at two different commits gives a
controlled A/B on the same box.

Usage: python tools/measure_log_host_sampled.py [runs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
QUERIES_TO_TIME = ["log_host", "log_host_sampled", "word_count", "word_count_sampled"]


def main() -> None:
    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark

    spark = get_spark("rsmr-ab-loghost")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py: JVM + codegen + parquet footers
    QUERIES["tpch_q1"].spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in QUERIES_TO_TIME:
        ts = []
        for _ in range(RUNS):
            t0 = time.monotonic()
            QUERIES[name].spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(round(time.monotonic() - t0, 3))
        ts_sorted = sorted(ts)
        out[name] = {
            "min": ts_sorted[0],
            "median": ts_sorted[len(ts_sorted) // 2],
            "all": ts,
        }
    print(json.dumps({"sf_dir": SF_DIR, "runs": RUNS, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
