#!/usr/bin/env python
"""Scaling curve for the round-6 estimator surface: the weighted LEFT-join
composition (join_weighted_left) and the sampled quantile estimator
(approx_quantile), at 1x / 10x / 40x the bench corpus.

Questions:
1. join_weighted_left is two equi-shuffles on the join key (pair join +
   per-key count agg) — does it scale linearly like the other relational
   plans, and does AQE broadcast the counts side back?
2. approx_quantile's window path has parallelism = #groups (the sort
   runs one task per group). With 5 order priorities that is a 5-task
   stage REGARDLESS of data size — the curve should show the wall
   growing ~linearly in rows/5 while a high-cardinality grouping (by
   o_custkey % 1024) stays flat-per-task. This measures the declared
   scale limit instead of hand-waving it.

Usage: python tools/measure_new_estimators_scale.py [copies ...] (default 10 40)
Emits one JSON line; paste into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = sorted({int(a) for a in sys.argv[1:] if int(a) > 1}) or [10, 40]


def main() -> None:
    from pyspark.sql import functions as F

    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
    from random_sampling_based_approximate_mapreduce_spark.sampling.config import SamplingConfig
    from random_sampling_based_approximate_mapreduce_spark.sampling.deterministic import hash_bernoulli
    from random_sampling_based_approximate_mapreduce_spark.sampling.sampled_frame import SampledFrame
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark
    from random_sampling_based_approximate_mapreduce_spark.sources.scale_up import ensure_scaled_tpch
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

    spark = get_spark("rsmr-new-estimators-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    def quantile_frame(sf_dir, group_expr, group_name, method="window"):
        o = load(spark, sf_dir, "orders").withColumn(
            "__k", F.col("o_orderkey").cast("string")
        )
        sampled = (
            hash_bernoulli(o, "__k", 0.1, seed=7)
            .withColumn("v", F.col("o_totalprice").cast("double"))
            .withColumn("g", group_expr)
        )
        sf = SampledFrame(
            df=sampled, ratio=0.1, config=SamplingConfig(ratio=0.1, seed=7)
        )
        return sf.approx_quantile(
            "v", [0.25, 0.5, 0.9], "g", ci=True, alias="est", method=method
        )

    def timed(build):
        ts = []
        for _ in range(2):
            t0 = time.monotonic()
            build().write.format("noop").mode("overwrite").save()
            ts.append(time.monotonic() - t0)
        return round(min(ts), 3)

    from random_sampling_based_approximate_mapreduce_spark.sources.scale_up import (
        ensure_scaled_tables,
    )

    result: dict = {"sf_dir": SF_DIR, "scales": {}}
    dirs = {1: SF_DIR}
    ref_dirs = {1: SF_DIR}
    for c in COPIES:
        t0 = time.monotonic()
        dirs[c] = ensure_scaled_tpch(spark, SF_DIR, copies=c)
        ref_dirs[c] = ensure_scaled_tables(
            spark, SF_DIR, ("events", "documents"), copies=c
        )
        result["scales"][str(c)] = {
            "build_sec": round(time.monotonic() - t0, 1)
        }

    for c, d in dirs.items():
        entry = result["scales"].setdefault(str(c), {})
        entry["join_weighted_left"] = timed(
            lambda: QUERIES["sampled_left_join_hash_twin"].spark(spark, d)
        )
        entry["quantile_5_groups"] = timed(
            lambda: quantile_frame(d, F.col("o_orderpriority"), "prio")
        )
        entry["quantile_1024_groups"] = timed(
            lambda: quantile_frame(
                d, F.pmod(F.col("o_custkey"), F.lit(1024)), "cust1024"
            )
        )
        # worst case for the window path: ONE group = one sort task
        entry["quantile_global"] = timed(
            lambda: quantile_frame(d, F.lit(0), "all")
        )
        # the fix: exact distributed k-selection (method='histogram')
        entry["quantile_global_histogram"] = timed(
            lambda: quantile_frame(d, F.lit(0), "all", method="histogram")
        )
        rd = ref_dirs[c]
        entry["weighted_quantile_daily"] = timed(
            lambda: QUERIES["stratified_value_quantile_hash_sampled"].spark(
                spark, rd
            )
        )
        entry["topk_tokens"] = timed(
            lambda: QUERIES["sampled_topk_tokens"].spark(spark, rd)
        )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
