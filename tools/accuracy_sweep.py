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
      [--all] [--out ACCURACY_r06.json] [--gate]

Prints one human table and one JSON line per query.

Per-round ratchet (VERDICT r5 item 3): ``--all --out ACCURACY_r{N}.json
--gate`` runs the full reference grid (README.md:48 ratios) over all three
experiments and commits the numbers as a round artifact, exiting nonzero
if any gate fails. Two error columns per run, because they bound
DIFFERENT estimands:

- ``actual_err`` — the reference's measured metric: grouped relative L1
  of HT-scaled counts vs exact (RSMRResultComparator.java:66-82). The
  reference accepts it against the GLOBAL bound, which the HONESTY NOTE
  shows is the wrong yardstick for grouped error; the gate instead uses
  the CORRECT closed form for its expectation under Bernoulli(r):
  per-group count error is ~N(0, N_g(1-r)/r), so
  E[relL1] = sqrt(2/pi) * sqrt((1-r)/r) * sum_g sqrt(N_g) / N_total —
  computed exactly from the exact counts. Gated at
  ``actual_err <= 3 * expected_grouped_err`` (the ratio is ~1 for
  many-group families; small-K families like events (K=5) see +/-35%
  relative noise per realization, still far inside 3x). This IS the
  artifact's ``ok`` column (VERDICT r8: ``ok`` must gate on the metric
  actually being measured). The reference-style comparison of the
  grouped error against A4's GLOBAL proportion bound
  (RandomSamplingUtil.java:376-378 — which bounds only the global count
  proportion, never per-group error) is recorded as
  ``global_bound_ok`` so the reference's own dishonesty stays visible;
  at r=0.01 it is false BY DESIGN for every many-group family and
  nothing gates on it.
- ``max_share_z`` — per-group SHARE errors standardized by their own
  binomial std sqrt(p(1-p)(1-r)/n_total); the gate bounds the max over
  groups at 4.5 (Bonferroni-safe up to ~30k groups at 95%). This is the
  estimand A4's p=0.5 proportion bound actually covers; the raw
  ``max_share_err`` and the A4 comparison are recorded alongside.
"""

from __future__ import annotations

import argparse
import json
import math
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

# Estimator-family sweeps beyond plain Bernoulli (VERDICT r7 item 2):
# stratified weighted counts and the sampled-join composition. Each has
# its own closed-form expected grouped rel-L1, derived from the same
# design variance its CI estimator uses, so the sweep ratchets the
# THEORY the estimators ship with against measured spread.
FAMILY_SWEEPS = ("stratified_daily", "joined_pairs")


def sweep_stratified(spark, sf: str, ratios: list[float]) -> dict:
    """Daily event counts from a STRATIFIED sample (rare event types
    oversampled 10x), estimated with weighted_count. Expected grouped
    rel-L1 under independent per-stratum Bernoulli(r_h):
    Var(est_g) = sum_h N_gh (1-r_h)/r_h, E|err_g| = sqrt(2/pi * Var_g),
    E[relL1] = sum_g E|err_g| / N_total — the exact closed form for the
    estimand weighted_count's CI bounds (HT variance, VERDICT r5/r6)."""
    from random_sampling_based_approximate_mapreduce_spark.sampling.sampled_frame import (
        stratified_sample,
        weighted_count,
    )

    base = ensure_parallelism(
        load(spark, sf, "events").select(
            "event_type", F.to_date("ts").alias("d")
        )
    ).localCheckpoint()
    t0 = time.monotonic()
    exact_gh = {
        (r["d"], r["event_type"]): r["c"]
        for r in base.groupBy("d", "event_type").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    base_wall = time.monotonic() - t0
    type_totals: dict = {}
    for (_, h), c in exact_gh.items():
        type_totals[h] = type_totals.get(h, 0) + c
    total = sum(type_totals.values())
    rare = {h for h, c in type_totals.items() if c / total < 0.05}
    exact_g: dict = {}
    for (g, _), c in exact_gh.items():
        exact_g[g] = exact_g.get(g, 0) + c

    print(f"query=stratified_daily sf={sf} groups={len(exact_g)} "
          f"strata={len(type_totals)} rare={sorted(rare)} exact_wall={base_wall:.3f}s")
    print(f"{'ratio':>7} {'wall_s':>8} {'actual_err':>11} {'exp_grouped':>12} {'gok':>4}")
    out = {"query": "stratified_daily", "sf": sf,
           "exact_wall_s": round(base_wall, 3), "runs": []}
    for r in ratios:
        if r >= 1.0:
            continue
        fracs = {h: (min(1.0, 10.0 * r) if h in rare else r) for h in type_totals}
        t0 = time.monotonic()
        w = stratified_sample(base, "event_type", fracs, seed=123)
        got = {row["d"]: row["est_count"]
               for row in weighted_count(w, "d").collect()}
        wall = time.monotonic() - t0
        err = sum(abs(got.get(g, 0.0) - c) for g, c in exact_g.items()) / total
        expected = (
            (2.0 / math.pi) ** 0.5
            * sum(
                (sum(
                    exact_gh.get((g, h), 0) * (1.0 - fracs[h]) / fracs[h]
                    for h in type_totals
                )) ** 0.5
                for g in exact_g
            )
            / total
        )
        grouped_ok = expected == 0.0 or err <= 3.0 * expected
        print(f"{r:>7} {wall:>8.3f} {err:>11.5f} {expected:>12.5f} "
              f"{'y' if grouped_ok else 'N'}")
        out["runs"].append(
            {"ratio": r, "wall_s": round(wall, 3), "actual_err": round(err, 6),
             "expected_grouped_err": round(expected, 6), "grouped_ok": bool(grouped_ok)}
        )
    print(json.dumps(out))
    return out


def sweep_joined(spark, sf: str, ratios: list[float]) -> dict:
    """Per-priority pair counts from joining orders (Bernoulli r1=0.5)
    to lineitem (Bernoulli r2=grid), HT-scaled by 1/(r1*r2). Expected
    grouped rel-L1 from the DESIGN variance the cluster CI estimates
    (sampled_frame.join_sampled): pairs sharing a kept order are
    correlated, so Var(T_g) = [r1r2(1-r1r2) N_g + r1r2^2(1-r1) M2_g]
    / (r1r2)^2 with M2_g = sum_orders (m^2 - m); the right-side excess
    is zero (each lineitem row joins exactly one order)."""
    r1 = 0.5
    orders = ensure_parallelism(
        load(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    ).localCheckpoint()
    li = ensure_parallelism(
        load(spark, sf, "lineitem").select("l_orderkey")
    ).localCheckpoint()
    t0 = time.monotonic()
    per_order = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority", "o_orderkey")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    stats_rows = (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.sum("m").alias("n"),
            F.sum(F.col("m") * F.col("m") - F.col("m")).alias("m2"),
        )
        .collect()
    )
    base_wall = time.monotonic() - t0
    exact_g = {r["o_orderpriority"]: r["n"] for r in stats_rows}
    m2_g = {r["o_orderpriority"]: r["m2"] for r in stats_rows}
    total = sum(exact_g.values())

    print(f"query=joined_pairs sf={sf} r1={r1} groups={len(exact_g)} "
          f"pairs={total} exact_wall={base_wall:.3f}s")
    print(f"{'ratio':>7} {'wall_s':>8} {'actual_err':>11} {'exp_grouped':>12} {'gok':>4}")
    out = {"query": "joined_pairs", "sf": sf, "r1": r1,
           "exact_wall_s": round(base_wall, 3), "runs": []}
    for r2 in ratios:
        if r2 >= 1.0:
            continue
        t0 = time.monotonic()
        so = orders.sample(withReplacement=False, fraction=r1, seed=123)
        sl = li.sample(withReplacement=False, fraction=r2, seed=777)
        got = {
            row["o_orderpriority"]: row["c"] / (r1 * r2)
            for row in so.join(sl, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        wall = time.monotonic() - t0
        err = sum(abs(got.get(g, 0.0) - c) for g, c in exact_g.items()) / total
        rr = r1 * r2
        expected = (
            (2.0 / math.pi) ** 0.5
            * sum(
                ((rr * (1.0 - rr) * exact_g[g]
                  + r1 * r2 * r2 * (1.0 - r1) * m2_g[g]) / (rr * rr)) ** 0.5
                for g in exact_g
            )
            / total
        )
        grouped_ok = err <= 3.0 * expected
        print(f"{r2:>7} {wall:>8.3f} {err:>11.5f} {expected:>12.5f} "
              f"{'y' if grouped_ok else 'N'}")
        out["runs"].append(
            {"ratio": r2, "wall_s": round(wall, 3), "actual_err": round(err, 6),
             "expected_grouped_err": round(expected, 6), "grouped_ok": bool(grouped_ok)}
        )
    print(json.dumps(out))
    return out


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


def sweep_query(spark, sf: str, query: str, ratios: list[float]) -> dict:
    table, pipeline = EXPERIMENTS[query]

    # warmup (JVM + codegen), then the exact baseline
    run_once(spark, sf, table, pipeline, 1.0)
    base_rows, base_wall, base_rep = run_once(spark, sf, table, pipeline, 1.0)
    base_df = spark.createDataFrame(base_rows).select("key", F.col("cnt").cast("double"))
    base_counts = {r["key"]: r["cnt"] for r in base_rows}
    base_total = sum(base_counts.values())

    print(f"query={query} table={table} sf={sf} exact_wall={base_wall:.3f}s "
          f"total_records={base_rep.total_records}")
    print(f"{'ratio':>7} {'wall_s':>8} {'speedup':>8} {'actual_rate':>12} "
          f"{'predicted_err':>14} {'actual_err':>11} {'exp_grouped':>12} "
          f"{'max_share_z':>11} {'gbl':>3} {'ok':>4} {'sok':>4}")
    out = {"query": query, "sf": sf, "exact_wall_s": round(base_wall, 3), "runs": []}
    for r in ratios:
        if r >= 1.0:
            continue
        rows, wall, rep = run_once(spark, sf, table, pipeline, r)
        approx = spark.createDataFrame(rows).select(
            "key", (F.col("cnt") / F.lit(r)).alias("est")
        )
        err = rel_l1_error(base_df, approx, "key", exact_col="cnt", approx_col="est")
        predicted = rep.achieved_error
        # reference-style flag vs A4's GLOBAL proportion bound
        # (RandomSamplingUtil.java:376-378): A4 bounds only the global
        # count proportion, NOT the grouped rel-L1 measured here, so
        # this is recorded for visibility and never gated (VERDICT r8)
        global_bound_ok = err <= max(predicted, 0.02) * 3
        # correct expected grouped rel-L1 under Bernoulli(r) (module doc)
        expected_grouped = (
            (2.0 / math.pi) ** 0.5
            * ((1.0 - r) / r) ** 0.5
            * sum(c ** 0.5 for c in base_counts.values())
            / base_total
        )
        grouped_ok = err <= 3.0 * expected_grouped
        # per-group share errors standardized by their binomial std
        got = {row["key"]: row["cnt"] for row in rows}
        s_total = sum(got.values()) or 1
        max_share_err = 0.0
        max_share_z = 0.0
        for k, c in base_counts.items():
            p = c / base_total
            e = abs(got.get(k, 0) / s_total - p)
            max_share_err = max(max_share_err, e)
            denom = (p * (1 - p) * (1 - r) / max(s_total, 1)) ** 0.5
            if denom > 0:
                max_share_z = max(max_share_z, e / denom)
        share_ok = max_share_z <= 4.5
        print(f"{r:>7} {wall:>8.3f} {base_wall / wall:>7.2f}x {rep.actual_ratio:>12.4f} "
              f"{predicted:>14.5f} {err:>11.5f} {expected_grouped:>12.5f} "
              f"{max_share_z:>11.2f} {'y' if global_bound_ok else 'N'} "
              f"{'y' if grouped_ok else 'N'} {'y' if share_ok else 'N'}")
        out["runs"].append(
            {"ratio": r, "wall_s": round(wall, 3), "speedup": round(base_wall / wall, 2),
             "actual_rate": round(rep.actual_ratio, 5), "predicted_err": round(predicted, 6),
             "actual_err": round(err, 6),
             # ok == the gate on the measured metric (grouped rel-L1 vs
             # its correct closed-form expectation); global_bound_ok ==
             # the reference-style A4-global comparison, recorded only
             "ok": bool(grouped_ok),
             "global_bound_ok": bool(global_bound_ok),
             "expected_grouped_err": round(expected_grouped, 6),
             "grouped_ok": bool(grouped_ok),
             "max_share_err": round(max_share_err, 6),
             "max_share_z": round(max_share_z, 3), "share_ok": bool(share_ok)}
        )
    print(json.dumps(out))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--ratios", default="1.0,0.5,0.25,0.1,0.01")
    ap.add_argument("--query", default="word_count",
                    choices=sorted(EXPERIMENTS) + list(FAMILY_SWEEPS))
    ap.add_argument("--all", action="store_true", help="sweep every experiment")
    ap.add_argument("--out", default=None, help="write the combined JSON artifact here")
    ap.add_argument("--gate", action="store_true",
                    help="exit 1 if any run fails ok/grouped_ok (closed-form "
                    "grouped rel-L1 bound) or share_ok (per-group share "
                    "z-scores); the reference-style 'global_bound_ok' flag "
                    "is recorded but not gated — see the module docstring")
    args = ap.parse_args()
    ratios = [float(r) for r in args.ratios.split(",")]

    spark = get_spark("rsmr-accuracy-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = (
        sorted(EXPERIMENTS) + list(FAMILY_SWEEPS) if args.all else [args.query]
    )
    results = []
    for q in queries:
        if q == "stratified_daily":
            results.append(sweep_stratified(spark, args.sf, ratios))
        elif q == "joined_pairs":
            results.append(sweep_joined(spark, args.sf, ratios))
        else:
            results.append(sweep_query(spark, args.sf, q, ratios))
    doc = {"sf": args.sf, "ratios": ratios, "seed": 123, "queries": results}
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(doc, fh, indent=1)
        print(f"wrote {args.out}")
    spark.stop()
    if args.gate:
        bad = [
            (q["query"], run["ratio"],
             "grouped" if not run.get("grouped_ok", True) else "share")
            for q in results
            for run in q["runs"]
            if not (run.get("grouped_ok", True) and run.get("share_ok", True))
        ]
        if bad:
            print(f"ACCURACY GATE FAILED: {bad}")
            sys.exit(1)
        print("accuracy gate: all runs within bounds")


if __name__ == "__main__":
    main()
