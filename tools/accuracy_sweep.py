#!/usr/bin/env python
"""The reference's headline experiment, reproduced on the engine.

The reference's methodology (README.md:48, rand*.sh, RSMRResultComparator):
run the same aggregation at ratio 1.0 (exact) and at a grid of sampling
ratios, then report per ratio
  - wall-clock vs the exact run (their claim: time reduction ~ 1 - r,
    up to 97.5% / ~40x at GB scale),
  - the PREDICTED statistical error bound (A4, RandomSamplingUtil.java:
    376-378),
  - the ACTUAL data error (relative L1 of HT-scaled counts vs exact,
    RSMRResultComparator.java:66-82) — accept when actual <= predicted.

HONESTY NOTE the reference glosses over: its predicted bound (A4) is a
GLOBAL-proportion bound at p=0.5; the measured data error is a GROUPED
relative-L1 that sums per-group errors, which for K groups of ~n/K
sampled rows each scales like sqrt(K/n) — materially larger than the
global bound at small ratios (e.g. log_host at r=0.01: predicted 0.03,
actual ~0.18 across 50 hosts). The sweep prints both and flags the
mismatch ('N' rows) instead of hiding it; per-group CIs
(SampledFrame.approx_count(ci=True)) are the honest per-key tool.

Usage:
  python tools/accuracy_sweep.py [--sf /root/testdata/sf0.1]
      [--ratios 1.0,0.5,0.25,0.1,0.01] [--query word_count|log_host|events]

Prints one human table and one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from random_sampling_based_approximate_mapreduce_spark.functions import text as T  # noqa: E402
from random_sampling_based_approximate_mapreduce_spark.operators.evaluate import rel_l1_error  # noqa: E402
from random_sampling_based_approximate_mapreduce_spark.sampling.config import SamplingConfig  # noqa: E402
from random_sampling_based_approximate_mapreduce_spark.sampling.sampled_frame import SampledFrame  # noqa: E402
from random_sampling_based_approximate_mapreduce_spark.session import get_spark  # noqa: E402
from random_sampling_based_approximate_mapreduce_spark.sources.tables import ensure_parallelism, load  # noqa: E402

# Each experiment: (base frame builder, key-count pipeline over the frame).
# The pipeline runs UNDER the sample (transform of the SampledFrame), so the
# sampled run only pays parse/explode cost for accepted rows — the
# reference's scan-level-sampling speedup shape (SURVEY.md §4.1).
def _word_count(df):
    return (
        T.explode_words(T.drop_digit_lines(df, "text"), "text")
        .groupBy(F.col("word").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _log_host(df):
    from random_sampling_based_approximate_mapreduce_spark.sources.apache_log import (
        parse_apache_log,
        synthesize_raw_log,
    )

    return (
        parse_apache_log(synthesize_raw_log(df))
        .groupBy(F.col("host").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _events(df):
    return df.groupBy(F.col("event_type").alias("key")).agg(F.count(F.lit(1)).alias("cnt"))


EXPERIMENTS = {
    "word_count": ("documents", _word_count),
    "log_host": ("events", _log_host),
    "events": ("events", _events),
}


def run_once(spark, sf_dir: str, table: str, pipeline, ratio: float):
    base = ensure_parallelism(load(spark, sf_dir, table))
    cfg = SamplingConfig(ratio=ratio, seed=123)
    sf = SampledFrame.from_dataframe(base, cfg, observe=True)
    t0 = time.monotonic()
    counts = pipeline(sf.df)
    rows = counts.collect()  # the reference materializes part files; we collect
    wall = time.monotonic() - t0
    rep = sf.report()
    return rows, wall, rep


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--ratios", default="1.0,0.5,0.25,0.1,0.01")
    ap.add_argument("--query", default="word_count", choices=sorted(EXPERIMENTS))
    args = ap.parse_args()
    ratios = [float(r) for r in args.ratios.split(",")]

    spark = get_spark("rsmr-accuracy-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    table, pipeline = EXPERIMENTS[args.query]

    # warmup (JVM + codegen), then the exact baseline
    run_once(spark, args.sf, table, pipeline, 1.0)
    base_rows, base_wall, base_rep = run_once(spark, args.sf, table, pipeline, 1.0)
    base_df = spark.createDataFrame(base_rows).select("key", F.col("cnt").cast("double"))

    print(f"query={args.query} table={table} sf={args.sf} exact_wall={base_wall:.3f}s "
          f"total_records={base_rep.total_records}")
    print(f"{'ratio':>7} {'wall_s':>8} {'speedup':>8} {'actual_rate':>12} "
          f"{'predicted_err':>14} {'actual_err':>11} {'ok':>3}")
    out = {"query": args.query, "sf": args.sf, "exact_wall_s": round(base_wall, 3), "runs": []}
    for r in ratios:
        if r >= 1.0:
            continue
        rows, wall, rep = run_once(spark, args.sf, table, pipeline, r)
        approx = spark.createDataFrame(rows).select(
            "key", (F.col("cnt") / F.lit(r)).alias("est")
        )
        err = rel_l1_error(base_df, approx, "key", exact_col="cnt", approx_col="est")
        predicted = rep.achieved_error
        ok = err <= max(predicted, 0.02) * 3  # 3x slack: rel-L1 sums many groups
        print(f"{r:>7} {wall:>8.3f} {base_wall / wall:>7.2f}x {rep.actual_ratio:>12.4f} "
              f"{predicted:>14.5f} {err:>11.5f} {'y' if ok else 'N'}")
        out["runs"].append(
            {"ratio": r, "wall_s": round(wall, 3), "speedup": round(base_wall / wall, 2),
             "actual_rate": round(rep.actual_ratio, 5), "predicted_err": round(predicted, 6),
             "actual_err": round(err, 6), "ok": bool(ok)}
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
