#!/usr/bin/env python
"""End-to-end wall-clock for the .gzi sidecar on the flagship BGZF
layout (VERDICT r13 item 3).

Round 13 measured the sidecar's metadata cut in ISOLATION
(GZI_SCAN_COST_x16000.json: 51.5 s of ~893k scattered header hops ->
0.8 s through 6.8 MB of .gzi files) but the flagship cold-skip grid
never re-paid the scan inside a timed pass (the driver's block-table
cache absorbs it after the warmup), so the 64x cut never appeared in an
end-to-end number. This tool builds the word-count x{copies} BGZF
layout WITH sidecars (same corpus recipe as measure_cold_skip: the sf
documents.text replicated with per-copy entropy suffixes, 32 part
files) and times COLD PICK+READ end-to-end — the block-table cache
cleared and the page cache evicted before every timed pass, modeling a
fresh driver planning a job over the layout — in two rows per ratio:

  indexed   .gzi sidecars present  (scan = one index read per file)
  hop       sidecars stashed aside (scan = ~2 reads per 64 KiB block)

on IDENTICAL .gz bytes, plus the two scan-only rows for continuity with
the r13 isolation artifact. Downstream is sum(length(value)) — the
cold-skip grid's cheapest read-everything-delivered workload.

The layout lives in its own /tmp dir (not measure_cold_skip's): that
grid's JVM baseline reads every file of the dir as text, and .gzi
sidecars inside it would silently join the baseline's input.

Usage: python tools/measure_gzi_e2e.py [--copies 16000] [--passes 2]
Prints one JSON line; commit as docs/bench/GZI_E2E_x{copies}.json.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from measure_common import (  # noqa: E402
    clear_block_cache as _clear_block_cache,
    evict as _evict,
    input_files as _input_files,
    stash_sidecars as _stash_sidecars,
    timed_fresh_driver as _timed,
)
from random_sampling_based_approximate_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--copies", type=int, default=16000)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--ratios", type=float, nargs="*", default=[0.1, 0.025])
    args = ap.parse_args()

    spark = get_spark("measure-gzi-e2e")
    spark.sparkContext.setLogLevel("ERROR")

    from random_sampling_based_approximate_mapreduce_spark.sources.bgzf_text import (
        GZI_SUFFIX,
        convert_text_to_bgzf,
        pick_blocks,
        read_text_bgzf_sampled,
        scan_blocks,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import (
        ensure_layout,
    )

    key = hashlib.md5(f"{args.sf}:{args.copies}:gzie2e".encode()).hexdigest()[:10]
    bgzf_dir = f"/tmp/rsmr_gzie2e_bgzf_{key}"
    txt_dir = f"/tmp/rsmr_gzie2e_txt_{key}"

    def _build(d: str) -> None:
        # the measure_cold_skip corpus recipe: stream the replica side
        # 32-wide, broadcast the small documents table, per-copy entropy
        # suffixes so the compressed layout is full-entropy
        def build_txt(d2: str) -> None:
            (
                spark.range(args.copies)
                .repartition(32)
                .select(F.col("id").alias("__c"))
                .crossJoin(
                    F.broadcast(
                        spark.read.parquet(
                            os.path.join(args.sf, "documents.parquet")
                        ).select("text")
                    )
                )
                .select(
                    F.concat(
                        F.col("text"),
                        F.lit(" "),
                        F.md5(F.concat(F.col("text"), F.col("__c").cast("string"))),
                        F.lit(" "),
                        F.md5(F.col("__c").cast("string")),
                    ).alias("value")
                )
                .write.mode("overwrite")
                .text(d2)
            )

        ensure_layout(txt_dir, build_txt)
        convert_text_to_bgzf(txt_dir, d, index=True)
        # text is only a conversion source here — every measured row
        # reads the .gz files
        shutil.rmtree(txt_dir)

    ensure_layout(bgzf_dir, _build)
    os.sync()

    files = _input_files(bgzf_dir)
    gz_files = [f for f in files if not f.endswith(GZI_SUFFIX)]
    gz_mb = round(sum(os.path.getsize(f) for f in gz_files) / 1e6, 1)
    gzi_bytes = sum(os.path.getsize(f) for f in files if f.endswith(GZI_SUFFIX))
    n_blocks = sum(sum(1 for e in scan_blocks(f) if e.d_size) for f in gz_files)

    def _consume(df):
        df.agg(F.sum(F.length("value"))).collect()

    def skip_fn(r: float):
        return lambda: _consume(read_text_bgzf_sampled(spark, bgzf_dir, r, seed=9).df)

    # ---- scan-only rows (continuity with GZI_SCAN_COST_x16000.json) ----
    def pick_all():
        _clear_block_cache()
        pick_blocks(bgzf_dir, 0.025, seed=9)

    _evict(files)
    t0 = time.monotonic()
    pick_all()
    gzi_scan_s = round(time.monotonic() - t0, 3)
    with _stash_sidecars(bgzf_dir):
        _evict(gz_files)
        t0 = time.monotonic()
        pick_all()
        hop_scan_s = round(time.monotonic() - t0, 3)

    results = []
    for r in args.ratios:
        _, picked, total = pick_blocks(bgzf_dir, r, seed=9)
        row = {
            "ratio": r,
            "picked_bytes": picked,
            "total_bytes": total,
            "achieved_ratio": round(picked / total, 5) if total else None,
            "indexed": {
                "warm_pickread_s": _timed(skip_fn(r), args.passes),
                "cold_pickread_s": _timed(skip_fn(r), args.passes, evict_paths=files),
            },
        }
        with _stash_sidecars(bgzf_dir):
            row["hop"] = {
                "warm_pickread_s": _timed(skip_fn(r), args.passes),
                "cold_pickread_s": _timed(
                    skip_fn(r), args.passes, evict_paths=gz_files
                ),
            }
        row["cold_cut"] = round(
            row["hop"]["cold_pickread_s"] / row["indexed"]["cold_pickread_s"], 2
        )
        row["warm_cut"] = round(
            row["hop"]["warm_pickread_s"] / row["indexed"]["warm_pickread_s"], 2
        )
        results.append(row)
        print(json.dumps(row), file=sys.stderr)

    print(
        json.dumps(
            {
                "layout": f"{bgzf_dir} (x{args.copies}, {gz_mb} MB compressed)",
                "sf": args.sf,
                "files": len(gz_files),
                "blocks": n_blocks,
                "gzi_sidecar_bytes_total": gzi_bytes,
                "passes": args.passes,
                "scan_only_cold": {
                    "gzi_scan_s": gzi_scan_s,
                    "hop_scan_s": hop_scan_s,
                    "scan_cut": round(hop_scan_s / gzi_scan_s, 1)
                    if gzi_scan_s
                    else None,
                },
                "downstream": "sum(length(value))",
                "eviction": "posix_fadvise(POSIX_FADV_DONTNEED) per timed "
                "pass; driver block-table cache cleared per pass (a fresh "
                "driver planning over the layout)",
                "results": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
