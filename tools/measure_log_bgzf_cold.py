#!/usr/bin/env python
"""Cold-cache wall-clock for the APACHE-LOG workload on the BGZF rung
(VERDICT r13 items 2+3).

Thirteen rounds of cold-skip measurement covered the byte-skip ladder on
word-count corpora only, while the reference's biggest example family —
the seven log tasks (RandomizedApacheLogAnalysis.java:34-47) — rode line
sampling, which reads (and decodes) every byte and saturates at ~6.8x
(REF_SPEEDUP_r13.json, log_file at x100/r=0.001). This tool measures the
SAME workload (regex parse -> per-host count, the log_host task) over a
BGZF access-log layout, where picked gzip blocks are the only partitions
and unpicked blocks are never read or inflated:

  skip      read_text_bgzf_sampled(r) -> parse_apache_log -> count by host
  baseline  spark.read.text(.gz).sample(r) -> parse -> count by host
            (the JVM decodes every member of every file, sampling after)
  exact     spark.read.text(.gz) -> parse -> count by host (full answer)

at r in {0.1, 0.01, 0.001}, warm (page-cached) and cold
(posix_fadvise(DONTNEED) per timed pass), min-of-N after an untimed
warmup. The value-correctness of the path is pinned separately by the
ratio-1.0 prover `log_host_gzip_exact` (plans/reference_tasks.py) — this
tool is only the wall-clock story.

It also carries the GZI SIDECAR comparison end-to-end (VERDICT r13 item
3): the layout is written `index=True`, and for each pick-metadata cell
the .gzi sidecars are temporarily STASHED into a sibling directory to
time the header-hop path on identical .gz bytes — so the 64x
metadata-scan cut measured in isolation (GZI_SCAN_COST_x16000.json)
shows up in an end-to-end pick+read wall number next to its hop row.
The driver-side block-table cache is cleared before every timed pass:
within one session the second pick is ~free, but the cell models a
fresh driver (the 100-TB planner pays the scan once per file per job).

Corpus: the sf events table -> synthesize_raw_log lines, replicated
--copies times with a per-copy ident token injected into the line
(`host - -` -> `host u<md5> -`), which (a) keeps every line parseable by
_LOG_RE with identical parse semantics and (b) makes replica blocks
byte-distinct so the compressed layout is full-entropy like the
cold-skip word corpora. The text layout is only a conversion source and
is deleted after the BGZF conversion (the baseline reads the same .gz
files as the skip path).

Eviction caveat (same as measure_cold_skip): fadvise drops the page
cache, not the device cache; local NVMe cold reads are a LOWER bound on
the gap vs object storage, where every unpicked byte is network
transfer and every hop read is a round trip.

Round 15 (VERDICT r14 item 3): ``--codec bzip2`` measures the SAME
workload over a replicated Hadoop-Bzip2Codec access-log layout through
the bzip2-block source (compressed byte ranges as partitions; the twin
the ratio-1.0 prover `log_host_bzip2_exact` value-oracles). Differences
from the BGZF rung, by construction: ranges are arithmetic on file size
(no per-file metadata scan, so no .gzi/hop cells), a contiguous cluster
is sized by --range-bytes rather than a run_blocks knob, and the exact
baseline is Spark's own SPLITTABLE Bzip2Codec scan (parallel decode —
a stronger baseline than gzip's whole-stream member walk).

Usage: python tools/measure_log_bgzf_cold.py [--codec bgzf|bzip2]
       [--copies 1000] [--passes 2]
Prints one JSON line; paste into docs/SCALE.md and commit the artifact
as docs/bench/LOG_{CODEC}_COLD_x{copies}.json.
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
    restore_and_assert_sidecars as _assert_sidecars,
    stash_sidecars as _stash_sidecars,
    timed_fresh_driver as _timed,
)
from random_sampling_based_approximate_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--codec", choices=["bgzf", "bzip2"], default="bgzf")
    ap.add_argument("--copies", type=int, default=1000)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--ratios", type=float, nargs="*", default=[0.1, 0.01, 0.001])
    ap.add_argument(
        "--run-blocks",
        type=int,
        nargs="*",
        default=None,
        help="(bgzf) also measure contiguous-run picks of these lengths "
        "at each ratio >= 0.01 (suggest_run_blocks guidance: ~1 MB "
        "clusters at moderate r; several values sweep the knob)",
    )
    ap.add_argument(
        "--range-bytes",
        type=int,
        nargs="+",
        default=[256 * 1024],
        help="(bzip2) compressed range size(s) — the cluster the pick "
        "accepts or skips whole; several values sweep the knob on one "
        "layout (ranges are arithmetic, so no rebuild)",
    )
    args = ap.parse_args()

    spark = get_spark("measure-log-bgzf-cold")
    spark.sparkContext.setLogLevel("ERROR")

    from random_sampling_based_approximate_mapreduce_spark.sources import apache_log as AL
    from random_sampling_based_approximate_mapreduce_spark.sources.bgzf_text import (
        GZI_SUFFIX,
        convert_text_to_bgzf,
        pick_blocks,
        read_text_bgzf_sampled,
        scan_blocks,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import (
        canonicalize_part_names,
        ensure_layout,
        load,
    )

    from random_sampling_based_approximate_mapreduce_spark.sources.bzip2_block_text import (
        pick_ranges,
        read_text_bzip2_sampled,
    )

    # v2 = canonical part names (round 15): the build recipe changed,
    # so the key moves with it — reusing a v1 layout would measure a
    # different byte/name draw than a fresh box builds
    key = hashlib.md5(f"{args.sf}:{args.copies}:v2".encode()).hexdigest()[:10]
    txt_dir = f"/tmp/rsmr_logcold_txt_{key}"
    data_dir = (
        f"/tmp/rsmr_logcold_bgzf_{key}"
        if args.codec == "bgzf"
        else f"/tmp/rsmr_logcold_bz2_{key}"
    )

    # replicated raw-log text, built by Spark 32-wide. Per-copy ident
    # token: `host - - [..` -> `host u<md5> - [..` keeps _LOG_RE
    # semantics identical (ident matches \S+) while making every
    # replica's bytes distinct (full-entropy compressed layout, the
    # cold-skip corpora rule). Injected by string surgery on the fixed
    # format — host is everything before the first " - - ", which never
    # occurs elsewhere in the synthesized line (paths/queries have no
    # spaces).
    def _replicated_lines():
        lines = AL.synthesize_raw_log(load(spark, args.sf, "events"))
        return (
            spark.range(args.copies)
            .repartition(32)
            .select(F.col("id").alias("__c"))
            .crossJoin(F.broadcast(lines))
            .select(
                F.concat(
                    F.substring_index("line", " - - ", 1),
                    F.lit(" u"),
                    F.md5(F.concat("line", F.col("__c").cast("string"))),
                    F.lit(" - "),
                    F.substring_index("line", " - - ", -1),
                ).alias("value")
            )
        )

    def _build_bgzf(d: str) -> None:
        def build_txt(d2: str) -> None:
            _replicated_lines().write.mode("overwrite").text(d2)
            canonicalize_part_names(d2)  # stable names -> stable picks

        ensure_layout(txt_dir, build_txt)
        # BGZF conversion WITH .gzi sidecars (default 64 KiB blocks,
        # the production block size)
        parts = convert_text_to_bgzf(txt_dir, d, index=True)
        missing = [p for p in parts if not os.path.exists(p + GZI_SUFFIX)]
        if missing:
            raise ValueError(f"missing sidecars: {missing}")
        # the text layout is only a conversion source — the baseline
        # reads the same compressed files as the skip path
        shutil.rmtree(txt_dir)

    def _build_bz2(d: str) -> None:
        # Hadoop-Bzip2Codec parts straight from the writer — the codec
        # IS the layout (no conversion step; same recipe family as the
        # log_host_bzip2_exact prover's layout)
        _replicated_lines().write.mode("overwrite").option(
            "compression", "bzip2"
        ).text(d)
        canonicalize_part_names(d)  # stable names -> stable picks

    ensure_layout(
        data_dir, _build_bgzf if args.codec == "bgzf" else _build_bz2
    )
    if args.codec == "bgzf":
        # a REUSED layout may have been orphaned mid-stash by a hard
        # kill — restore any leftover stash and re-require one .gzi per
        # part, or the 'indexed' rows below silently measure the hop
        _assert_sidecars(data_dir)
    os.sync()  # flush dirty pages so fadvise can evict them

    files = _input_files(data_dir)
    gz_files = [f for f in files if not f.endswith(GZI_SUFFIX)]
    gz_mb = round(sum(os.path.getsize(f) for f in gz_files) / 1e6, 1)
    gzi_bytes = sum(os.path.getsize(f) for f in files if f.endswith(GZI_SUFFIX))
    if args.codec == "bgzf":
        n_blocks = sum(
            sum(1 for e in scan_blocks(f) if e.d_size) for f in gz_files
        )
    else:
        # compressed ranges are file-size arithmetic — so is the count
        # (reported at the first grid size)
        n_blocks = sum(
            -(-os.path.getsize(f) // args.range_bytes[0]) for f in gz_files
        )

    def _host_count(df):
        # the log_host task (G3 over P6): regex parse, drop malformed,
        # count per host — collect is <=256 host rows
        AL.parse_apache_log(df, col="value").groupBy("host").count().collect()

    def skip_fn(r: float, run_blocks: int = 1, rb: int | None = None):
        if args.codec == "bgzf":
            return lambda: _host_count(
                read_text_bgzf_sampled(
                    spark, data_dir, r, seed=9, run_blocks=run_blocks
                ).df
            )
        return lambda: _host_count(
            read_text_bzip2_sampled(
                spark, data_dir, r, range_bytes=rb, seed=9
            ).df
        )

    def pick(r: float, run_blocks: int = 1, rb: int | None = None):
        if args.codec == "bgzf":
            return pick_blocks(data_dir, r, seed=9, run_blocks=run_blocks)
        return pick_ranges(data_dir, r, range_bytes=rb, seed=9)

    # baseline/exact read ONLY the .gz parts (review r14): a bare
    # directory read would include the .gzi sidecars as raw binary
    # 'text' lines — garbage the parse drops, but then the baseline's
    # input set differs from the skip path's
    gz_glob = os.path.join(
        data_dir, "*.gz" if args.codec == "bgzf" else "*.bz2"
    )

    def base_fn(r: float):
        return lambda: _host_count(spark.read.text(gz_glob).sample(r, seed=9))

    exact_fn = lambda: _host_count(spark.read.text(gz_glob))  # noqa: E731

    # ---- pick-metadata cells: .gzi index scan vs header hop, cold
    # (bgzf only — bzip2 range picks are file-size arithmetic with no
    # per-file metadata scan to measure) ----
    gzi_pick_s = hop_pick_s = None
    if args.codec == "bgzf":

        def pick_all():
            _clear_block_cache()
            pick_blocks(data_dir, 0.01, seed=9)

        _evict(files)
        t0 = time.monotonic()
        pick_all()
        gzi_pick_s = round(time.monotonic() - t0, 3)
        with _stash_sidecars(data_dir):
            _evict(gz_files)
            t0 = time.monotonic()
            pick_all()
            hop_pick_s = round(time.monotonic() - t0, 3)

    results: list[dict] = []
    exact_cold_s = _timed(exact_fn, args.passes, evict_paths=files)
    grid = (
        [(r, None) for r in args.ratios]
        if args.codec == "bgzf"
        else [(r, rb) for rb in args.range_bytes for r in args.ratios]
    )
    base_cache: dict = {}
    for r, rb in grid:
        _, picked, total = pick(r, rb=rb)
        if r not in base_cache:
            # the decode-all baseline is range-size independent —
            # measure once per ratio across the range grid
            base_cache[r] = (
                _timed(base_fn(r), args.passes),
                _timed(base_fn(r), args.passes, evict_paths=files),
            )
        row = {
            "ratio": r,
            **({"range_bytes": rb} if rb is not None else {}),
            "picked_bytes": picked,
            "total_bytes": total,
            "achieved_ratio": round(picked / total, 5) if total else None,
            "warm_skip_s": _timed(skip_fn(r, rb=rb), args.passes),
            "warm_base_s": base_cache[r][0],
            "cold_skip_s": _timed(
                skip_fn(r, rb=rb), args.passes, evict_paths=files
            ),
            "cold_base_s": base_cache[r][1],
        }
        row["warm_speedup"] = round(row["warm_base_s"] / row["warm_skip_s"], 2)
        row["cold_speedup"] = round(row["cold_base_s"] / row["cold_skip_s"], 2)
        row["cold_speedup_vs_exact"] = round(exact_cold_s / row["cold_skip_s"], 2)
        results.append(row)
        print(json.dumps(row), file=sys.stderr)
        for K in (args.run_blocks or []) if (
            args.codec == "bgzf" and r >= 0.01
        ) else []:
            _, rpicked, rtotal = pick(r, K)
            rrow = {
                "ratio": r,
                "run_blocks": K,
                "picked_bytes": rpicked,
                "total_bytes": rtotal,
                "achieved_ratio": round(rpicked / rtotal, 5) if rtotal else None,
                "warm_skip_s": _timed(skip_fn(r, K), args.passes),
                "warm_base_s": row["warm_base_s"],
                "cold_skip_s": _timed(skip_fn(r, K), args.passes, evict_paths=files),
                "cold_base_s": row["cold_base_s"],
                "base_reused_from": "run_blocks=1 row",
            }
            rrow["warm_speedup"] = round(rrow["warm_base_s"] / rrow["warm_skip_s"], 2)
            rrow["cold_speedup"] = round(rrow["cold_base_s"] / rrow["cold_skip_s"], 2)
            rrow["cold_speedup_vs_exact"] = round(
                exact_cold_s / rrow["cold_skip_s"], 2
            )
            results.append(rrow)
            print(json.dumps(rrow), file=sys.stderr)

    # ---- end-to-end hop comparison row (VERDICT r13 item 3): the same
    # cold pick+read with the sidecars stashed, at the middle ratio
    # (bgzf only) ----
    r_mid = args.ratios[min(1, len(args.ratios) - 1)]
    hop_cold_skip_s = None
    if args.codec == "bgzf":
        with _stash_sidecars(data_dir):
            hop_cold_skip_s = _timed(
                skip_fn(r_mid), args.passes, evict_paths=gz_files
            )

    codec_label = (
        "BGZF" if args.codec == "bgzf" else "Hadoop-Bzip2Codec"
    )
    out = {
        "workload": "log_host (regex parse -> per-host count) on "
        f"{codec_label} access log",
        "codec": args.codec,
        "sf": args.sf,
        "copies": args.copies,
        "passes": args.passes,
        "files": len(gz_files),
        "input_mb": gz_mb,
        "blocks": n_blocks,
        "exact_cold_s": exact_cold_s,
        "eviction": "posix_fadvise(POSIX_FADV_DONTNEED) per timed pass; "
        "driver block-table cache cleared per pass",
        "results": results,
    }
    if args.codec == "bgzf":
        out["gzi_sidecar_bytes_total"] = gzi_bytes
        out["pick_metadata_cold"] = {
            "gzi_scan_s": gzi_pick_s,
            "hop_scan_s": hop_pick_s,
            "scan_cut": round(hop_pick_s / gzi_pick_s, 1) if gzi_pick_s else None,
        }
        out["e2e_hop_row"] = {
            "ratio": r_mid,
            "cold_skip_s_no_gzi": hop_cold_skip_s,
            "cold_skip_s_with_gzi": next(
                rr["cold_skip_s"]
                for rr in results
                if rr["ratio"] == r_mid and "run_blocks" not in rr
            ),
        }
    else:
        out["range_bytes_grid"] = args.range_bytes
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
