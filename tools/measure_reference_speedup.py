#!/usr/bin/env python
"""The reference's headline claim, as a SCALING SERIES: sampled-vs-exact
speedup for the two flagship workloads (word count, log host) at 1x /
10x / 100x the bench corpus.

The reference reports up to 97.5% time reduction (~40x) at GB scale
with r small (README.md:48). At sf0.1 on local[32] the fixed Spark
overheads (session, plan, task launch) bound the measurable speedup;
this series shows the trend as data grows — the sampled run's cost is
(fixed overhead) + r * (scan+parse work), so the ratio should RISE
toward 1/r as the data term dominates. bench.py records the 10x point
per round; this tool extends the series to 100x for docs/SCALE.md.

Usage: python tools/measure_reference_speedup.py [copies ...] (default 10 100)
Emits one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = sorted({int(a) for a in sys.argv[1:] if int(a) > 1}) or [10, 100]


def main() -> None:
    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark
    from random_sampling_based_approximate_mapreduce_spark.sources.scale_up import (
        ensure_scaled_tables,
    )

    spark = get_spark("rsmr-reference-speedup")
    spark.sparkContext.setLogLevel("ERROR")

    names = ["word_count", "word_count_sampled", "log_host", "log_host_sampled"]

    def measure(sf_dir):
        samples: dict[str, list[float]] = {n: [] for n in names}
        for _ in range(3):
            for n in names:
                t0 = time.monotonic()
                QUERIES[n].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples[n].append(time.monotonic() - t0)
        return {n: round(min(ts), 3) for n, ts in samples.items()}

    out = {"sf": SF_DIR, "runs": []}
    dirs = {1: SF_DIR}
    for c in COPIES:
        dirs[c] = ensure_scaled_tables(
            spark, SF_DIR, ("documents", "events"), copies=c
        )
    for c in sorted(dirs):
        m = measure(dirs[c])
        row = {
            "copies": c,
            **m,
            "speedup_word_count": round(m["word_count"] / m["word_count_sampled"], 2),
            "speedup_log_host": round(m["log_host"] / m["log_host_sampled"], 2),
        }
        out["runs"].append(row)
        print(f"copies={c}: {row}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
