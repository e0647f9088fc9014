#!/usr/bin/env python
"""Serialized A/B timer for catalog queries across two checkouts
(VERDICT r13 "what's wrong" #1: log_host/log_dateweek drifted ~1.3-1.6x
above the sentinel in two independent r13 readings on a code path the
r13 diff does not touch — settle whether it's code or box).

One invocation times ONE checkout (fresh JVM, tpch_q1 warmup, N runs per
query, min+median reported). The A/B protocol is to run this alternately
against the two checkouts on the same box within minutes:

    git worktree add /tmp/rsmr_ab_r12 <r12-commit>
    for i in 1 2; do
      python tools/measure_ab_commits.py --repo /root/repo       --label head
      python tools/measure_ab_commits.py --repo /tmp/rsmr_ab_r12 --label r12
    done

and compare per-query mins; `word_count` rides along as the sentinel
(untouched plan, scales any box drift out). Both checkouts share the
same /tmp raw-log layout (raw_log_layout keys on sf_dir alone), so cache
state is identical.

Prints one JSON line per invocation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--label", default="head")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--queries", default="word_count,log_host,log_dateweek"
    )
    args = ap.parse_args()

    repo = os.path.abspath(args.repo)
    sys.path.insert(0, repo)
    # the checkout must win on the WORKERS too (review r14): sys.path
    # only swaps the driver, while PySpark workers resolve the package
    # from the ambient PYTHONPATH — a query whose plan runs worker-side
    # Python (the datasource-ladder provers) would otherwise execute a
    # different checkout than --repo, silently mixing A and B. Setting
    # PYTHONPATH before the JVM launches covers local-mode workers
    # (they inherit the driver JVM's environment).
    os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark

    spark = get_spark("rsmr-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py: JVM + codegen + parquet footers
    QUERIES["tpch_q1"].spark(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for name in args.queries.split(","):
        ts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            QUERIES[name].spark(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.monotonic() - t0, 3))
        s = sorted(ts)
        out[name] = {"min": s[0], "median": s[len(s) // 2], "all": ts}
    print(
        json.dumps(
            {"label": args.label, "repo": args.repo, "sf": args.sf,
             "runs": args.runs, "queries": out}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
