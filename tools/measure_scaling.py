#!/usr/bin/env python
"""Scaling trends at 1x / 10x / 40x the bench corpus (key-consistent
replication, sources/scale_up.py).

Two questions the per-round bench can't answer alone:
1. Do the 22 TPC-H plans scale LINEARLY once data dominates the floor?
   (A plan with a hidden quadratic stage or a collapsing broadcast shows
   super-linear growth between 10x and 40x.)
2. Does the sampling speedup keep growing with input size, toward the
   reference's ~40x-at-GB-scale regime claim (BASELINE.md)?

Usage: python tools/measure_scaling.py [copies ...]   (default: 10 40)
Emits one JSON line; paste the table into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# the 1x baseline is always measured on SF_DIR itself; an explicit "1"
# argument would otherwise clobber that entry with a pointless replica
COPIES = sorted({int(a) for a in sys.argv[1:] if int(a) > 1}) or [10, 40]

REF_QUERIES = ["word_count", "word_count_sampled", "log_host", "log_host_sampled"]


def main() -> None:
    from bench import TPCH_SUITE

    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark
    from random_sampling_based_approximate_mapreduce_spark.sources.scale_up import (
        ensure_scaled_tables,
        ensure_scaled_tpch,
    )

    spark = get_spark("rsmr-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["tpch_q1"].spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    def run(names, sf_dir):
        out = {}
        for name in names:
            ts = []
            for _ in range(2):
                t0 = time.monotonic()
                QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts.append(time.monotonic() - t0)
            out[name] = round(min(ts), 3)
        return out

    result: dict = {"sf_dir": SF_DIR, "scales": {}}
    dirs = {1: SF_DIR}
    for c in COPIES:
        t0 = time.monotonic()
        tpch_dir = ensure_scaled_tpch(spark, SF_DIR, copies=c)
        ref_dir = ensure_scaled_tables(spark, SF_DIR, ("events", "documents"), copies=c)
        build = round(time.monotonic() - t0, 1)
        dirs[c] = (tpch_dir, ref_dir)
        result["scales"][str(c)] = {"build_sec": build}

    for c, d in dirs.items():
        tpch_dir = d if c == 1 else d[0]
        ref_dir = d if c == 1 else d[1]
        tpch = run(TPCH_SUITE, tpch_dir)
        ref = run(REF_QUERIES, ref_dir)
        result["scales"][str(c)] = {
            **result["scales"].get(str(c), {}),
            "tpch_total_sec": round(sum(tpch.values()), 2),
            "tpch_worst3": sorted(tpch.items(), key=lambda kv: -kv[1])[:3],
            "word_count": ref["word_count"],
            "word_count_sampled": ref["word_count_sampled"],
            "word_count_speedup": round(ref["word_count"] / ref["word_count_sampled"], 2),
            "log_host": ref["log_host"],
            "log_host_sampled": ref["log_host_sampled"],
            "log_host_speedup": round(ref["log_host"] / ref["log_host_sampled"], 2),
        }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
