#!/usr/bin/env python
"""Round-17 optimization profiler: per-query isolated timing + formatted plans.

For each headline bench query (bench.BENCH_QUERIES by default, or --only),
this runs the query through the noop sink (guide §1.4) N times after a
warmup, records min/median wall seconds AND the number of Spark jobs the
action scheduled (job-count delta via the status store — a cheap proxy for
"how many sequential passes / eager materializations this plan pays"), and
writes the formatted physical plan to plans/r17/<name>_<tag>.txt
(guide §1: capture .explain("formatted") for every query you touch).

ADVICE r16 fixes over profile_r16.py: ``spark.catalog.clearCache()`` runs
between timing passes, so queries that persist() intermediates are timed
on FRESH computations every pass instead of reading pass-1's cache (the
CacheManager dedupes identical plans, which silently turned passes 2..N of
dedup_clusters_blocked into cache reads); and the docstring no longer
claims stage/task deltas that were never recorded.

Usage:
  python tools/profile_r17.py --tag before [--only a,b] [--passes 3]
  python tools/profile_r17.py --tag after --only dedup_clusters_blocked

Writes a JSON summary to docs/bench/PROFILE_r17_<tag>.json so before/after
numbers are committed artifacts, not narration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, help="before|after|<label>")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf", default=SF_DIR)
    ap.add_argument(
        "--no-plans", action="store_true", help="skip writing plan files"
    )
    args = ap.parse_args()

    import bench
    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark

    names = args.only.split(",") if args.only else list(bench.BENCH_QUERIES)
    spark = get_spark("rsmr-profile-r17")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", "r17")
    os.makedirs(plans_dir, exist_ok=True)

    # warm up JVM/codegen + Python worker pool (same as bench.py)
    QUERIES["tpch_q1"].spark(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    def _warm_py(it):
        import numpy as np

        for pdf in it:
            np.dot(np.ones((2, 2)), np.ones((2, 2)))
            yield pdf

    spark.range(64).repartition(32).mapInPandas(_warm_py, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    jvm = spark._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    results: dict[str, dict] = {}
    for name in names:
        qd = QUERIES[name]
        sc.setJobDescription(f"profile:{name}")
        try:
            # plan-build phase (may run eager work: checkpoints, layout
            # builds, count probes) timed separately from the action
            t0 = time.monotonic()
            df = qd.spark(spark, args.sf)
            build_sec = time.monotonic() - t0
            n_jobs0 = sc._jsc.sc().statusStore().jobsList(None).size()
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            first_sec = time.monotonic() - t0
            n_jobs1 = sc._jsc.sc().statusStore().jobsList(None).size()
            times = []
            for _ in range(args.passes):
                # ADVICE r16: drop persisted intermediates so every pass
                # times a fresh computation, not pass-1's cache
                spark.catalog.clearCache()
                t0 = time.monotonic()
                qd.spark(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(time.monotonic() - t0)
            if not args.no_plans:
                plan = df._jdf.queryExecution().explainString(explain_mode)
                with open(
                    os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
                ) as fh:
                    fh.write(plan)
            results[name] = {
                "build_sec": round(build_sec, 3),
                "first_sec": round(first_sec, 3),
                "min_sec": round(min(times), 3),
                "all_sec": [round(t, 3) for t in times],
                "action_jobs": n_jobs1 - n_jobs0,
            }
            print(
                f"{name:40s} build={build_sec:6.2f} first={first_sec:6.2f} "
                f"min={min(times):6.2f} jobs={n_jobs1 - n_jobs0}"
            )
        except Exception as exc:  # noqa: BLE001 — profile the rest
            results[name] = {"error": f"{type(exc).__name__}: {exc}"}
            print(f"{name:40s} ERROR {exc}")
        finally:
            sc.setJobDescription(None)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    out_path = os.path.join(
        here, "docs", "bench", f"PROFILE_r17_{args.tag}.json"
    )
    with open(out_path, "w") as fh:
        json.dump(
            {"sf_dir": args.sf, "passes": args.passes, "queries": results},
            fh,
            indent=1,
        )
    total_min = sum(
        r["min_sec"] for r in results.values() if "min_sec" in r
    )
    print(f"\nTOTAL min: {total_min:.2f} s over {len(results)} queries")
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
