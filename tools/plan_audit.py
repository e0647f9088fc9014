#!/usr/bin/env python
"""Physical-plan quality audit over the whole query catalog.

For every catalog query, prints the plan features that matter at 100 TB:
join strategies (broadcast vs sort-merge), exchange count, parquet
pushed-filters, and whether any row-at-a-time Python eval sneaked in
(BatchEvalPython = the slow path; ArrowEvalPython/mapInPandas is the
sanctioned one).

Usage: python tools/plan_audit.py [--sf DIR] [--only a,b]
Exit code 1 if a RED flag appears (Python row UDF, or a cartesian product
outside the known brute-force queries).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries where a cartesian/nested-loop product is the DESIGNED plan shape
# (documented brute-force baselines over bounded inputs).
EXPECTED_CARTESIAN = {
    "dedup_embedding",      # all-pairs baseline, bounded corpus
    "dedup_simhash",        # near-pair step is test-scale all-pairs
    "knn_brute_force",      # broadcast queries x corpus (by design)
    "multimodal_knn",       # same shape over stub embeddings
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark

    spark = get_spark("rsmr-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    names = args.only.split(",") if args.only else sorted(QUERIES)
    failures = []
    for name in names:
        qd = QUERIES[name]
        if "streaming" in (qd.tags or ()):
            print(f"{name:32s} (streaming - audited via its batch twin)")
            continue
        try:
            plan = qd.spark(spark, args.sf)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - audit must cover the rest
            failures.append(name)
            print(f"{name:32s} PLAN ERROR: {exc}")
            continue
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        cart = plan.count("CartesianProduct") + plan.count("BroadcastNestedLoopJoin")
        exch = plan.count("Exchange")
        py_row = plan.count("BatchEvalPython")
        arrow = plan.count("ArrowEvalPython") + plan.count("MapInPandas")
        pushed = sum(1 for m in re.finditer(r"PushedFilters: \[([^\]]+)\]", plan) if m.group(1).strip())
        flags = []
        if py_row:
            flags.append("RED:row-python")
        if cart and name not in EXPECTED_CARTESIAN:
            flags.append("RED:cartesian")
        if cart and name in EXPECTED_CARTESIAN:
            flags.append("cartesian-by-design")
        if flags and any(f.startswith("RED") for f in flags):
            failures.append(name)
        print(
            f"{name:32s} bhj={bhj} smj={smj} exch={exch} pushed={pushed} "
            f"arrow={arrow} {' '.join(flags)}"
        )
    spark.stop()
    if failures:
        print(f"\nRED flags in: {failures}")
        sys.exit(1)
    print("\nplan audit clean")


if __name__ == "__main__":
    main()
