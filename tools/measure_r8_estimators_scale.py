#!/usr/bin/env python
"""Scaling curve for the round-8 estimator surface: the cluster-variance
join CI (join_sampled with row ids) and the bootstrap weighted quantile
(weighted_quantile_bootstrap), at 1x / 10x the bench corpus.

Questions:
1. The cluster CI adds two (group, row-id) partial-aggregated shuffles
   over the joined pairs — does the overhead vs the plain (uncorrected)
   join CI stay a constant factor as pairs grow 10x?
2. The bootstrap quantile explodes x(B+1) into per-(group, rep) window
   sorts. With G groups and B replicates the sort stage has G*(B+1)
   independent tasks — the curve should scale ~linearly in rows*B with
   full-core utilization (unlike the 5-task plain quantile window).

Usage: python tools/measure_r8_estimators_scale.py [copies ...] (default 10)
Emits one JSON line; paste into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = sorted({int(a) for a in sys.argv[1:] if int(a) > 1}) or [10]


def main() -> None:
    from pyspark.sql import functions as F

    from random_sampling_based_approximate_mapreduce_spark.sampling.bootstrap import (
        weighted_quantile_bootstrap,
    )
    from random_sampling_based_approximate_mapreduce_spark.sampling.config import SamplingConfig
    from random_sampling_based_approximate_mapreduce_spark.sampling.deterministic import (
        hash_bernoulli,
        stratified_hash_weight,
    )
    from random_sampling_based_approximate_mapreduce_spark.sampling.sampled_frame import SampledFrame
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark
    from random_sampling_based_approximate_mapreduce_spark.sources.scale_up import (
        ensure_scaled_tables,
        ensure_scaled_tpch,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

    spark = get_spark("rsmr-r8-estimators-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    def joined(sf_dir, with_ids):
        o = load(spark, sf_dir, "orders").withColumn(
            "__k", F.col("o_orderkey").cast("string")
        )
        so_df = hash_bernoulli(o, "__k", 0.5, seed=3).drop("__k")
        li = load(spark, sf_dir, "lineitem").withColumn(
            "__k", F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
        )
        sl_df = hash_bernoulli(li, "__k", 0.2, seed=9).drop("__k")
        so = SampledFrame(
            df=so_df, ratio=0.5, config=SamplingConfig(ratio=0.5, seed=3)
        )
        sl = SampledFrame(
            df=sl_df, ratio=0.2, config=SamplingConfig(ratio=0.2, seed=9)
        )
        kw = (
            dict(left_id="o_orderkey", right_id=["l_orderkey", "l_linenumber"])
            if with_ids
            else {}
        )
        j = so.join_sampled(sl, F.col("o_orderkey") == F.col("l_orderkey"), **kw)
        return j.approx_count("o_orderpriority", ci=True, alias="est_pairs")

    def boot_quantile(sf_dir, n_replicates):
        from random_sampling_based_approximate_mapreduce_spark.plans.estimators import (
            _STRAT_FRACTIONS,
        )

        e = load(spark, sf_dir, "events").withColumn(
            "__k", F.col("event_id").cast("string")
        )
        w = stratified_hash_weight("event_type", "__k", _STRAT_FRACTIONS, seed=11)
        s = (
            e.withColumn("w", w)
            .where(F.col("w").isNotNull())
            .select(
                "event_type",
                F.col("value").cast("double").alias("v"),
                F.col("event_id").cast("string").alias("bk"),
                "w",
            )
        )
        return weighted_quantile_bootstrap(
            s, "v", 0.5, "event_type", key_col="bk", weight_col="w",
            n_replicates=n_replicates, seed=77,
        )

    def run(df):
        t0 = time.monotonic()
        n = len(df.collect())
        return round(time.monotonic() - t0, 3), n

    out = {"sf": SF_DIR, "runs": []}
    dirs = {1: SF_DIR}
    for c in COPIES:
        dirs[c] = ensure_scaled_tpch(spark, SF_DIR, copies=c)
        # events replica for the bootstrap-quantile curve
        ensure_scaled_tables(spark, SF_DIR, ("events",), copies=c)
    edirs = {1: SF_DIR}
    for c in COPIES:
        edirs[c] = ensure_scaled_tables(spark, SF_DIR, ("events",), copies=c)

    for c in sorted(dirs):
        for with_ids in (False, True):
            run(joined(dirs[c], with_ids))  # warm
            wall, rows = run(joined(dirs[c], with_ids))
            out["runs"].append(
                {"query": "join_ci", "copies": c, "cluster_ci": with_ids,
                 "wall_s": wall, "rows": rows}
            )
            print(f"join_ci copies={c} cluster={with_ids} wall={wall}s", file=sys.stderr)
    for c in sorted(edirs):
        for b in (32,):
            run(boot_quantile(edirs[c], b))  # warm
            wall, rows = run(boot_quantile(edirs[c], b))
            out["runs"].append(
                {"query": "boot_quantile", "copies": c, "replicates": b,
                 "wall_s": wall, "rows": rows}
            )
            print(f"boot_quantile copies={c} B={b} wall={wall}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
