#!/usr/bin/env python
"""Cold-cache wall-clock for the byte-skip source ladder (VERDICT r9 item 2;
the seekable-zstd source joined the ladder in round 10).

The engine's flagship parity claim with the reference (README.md:5, up to
~40x by skipping input before decode) is an I/O-REGIME claim: the win
comes from not READING (and not decoding) the unpicked bytes. On a local
box every prior measurement ran against a hot page cache, which refunds
the read cost to the full scan and hides exactly the axis the claim is
about. This tool measures the skip sources in BOTH regimes:

- warm: inputs fully page-cached (the prior rounds' regime),
- cold: `posix_fadvise(POSIX_FADV_DONTNEED)` on every input file before
  each timed pass (real block-device reads; verified effective on this
  box — a 200 MB file reads 2-3x slower evicted than cached).

For each of the three skip sources it times, min-of-N with an untimed
JVM/codegen warmup pass first:

  source               skip read (ratio r)        post-read baseline
  byteblock_text       picked byte blocks only    spark.read.text + sample(r)
  bzip2_block_text     picked compressed ranges   spark.read.text(.bz2) + sample(r)
  zstd_seekable_text   picked seekable frames     spark.read.text(.zst) + sample(r)
  bgzf_text            picked gzip blocks only    spark.read.text(.gz) + sample(r)
  rowgroup_parquet     picked row groups only     spark.read.parquet + sample(r)

at r in {0.1, 0.01}, over a text corpus built by replicating
documents.text `--copies` times with per-copy entropy suffixes (without
them bzip2/parquet fold the replicas to ~nothing and there is nothing to
skip). Downstream is sum(length(value)) — the cheapest downstream that still
forces every path to READ the data column (a bare count() lets the
parquet baseline answer from footer metadata with an empty projection,
comparing a real read against a no-op); any real parse/agg downstream
only adds work proportional to rows delivered, which favors the skip
further.

Eviction caveat (honesty): fadvise drops the page cache, not the device's
own cache, and a single local NVMe reads ~2 GB/s — the cold/warm gap here
is a LOWER bound on the gap against 100 TB object storage, where unpicked
bytes are network transfer. The per-source bytes-opened accounting (from
the pickers' exact bookkeeping) is printed alongside so the wall-clock
numbers can be projected onto slower storage.

Usage: python tools/measure_cold_skip.py [--copies 1000] [--passes 2]
Prints one JSON line; paste the table into docs/SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from random_sampling_based_approximate_mapreduce_spark.session import get_spark  # noqa: E402


def _input_files(path: str) -> list[str]:
    out = []
    for root, _, files in os.walk(path):
        for f in files:
            if not f.startswith((".", "_")):
                out.append(os.path.join(root, f))
    return sorted(out)


def _evict(paths: list[str]) -> None:
    """Drop the page cache for every file (clean pages only — callers
    must os.sync() once after building the inputs)."""
    for p in paths:
        fd = os.open(p, os.O_RDONLY)
        try:
            os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
        finally:
            os.close(fd)


def _timed(fn, n: int, evict_paths: list[str] | None = None) -> float:
    """min-of-n with one untimed warmup pass (JVM/codegen warm; in cold
    mode the warmup ALSO pre-faults the cache, so the eviction before
    each timed pass is what makes the pass cold — not session state)."""
    fn()
    best = float("inf")
    for _ in range(n):
        if evict_paths is not None:
            _evict(evict_paths)
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--copies", type=int, default=1000)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--ratios", type=float, nargs="*", default=[0.1, 0.01])
    ap.add_argument(
        "--sources",
        nargs="*",
        default=None,
        help="measure only these sources; only the layouts those sources "
        "need are built (a --copies 16000 bzip2-only cell then skips the "
        "~25 GB text/parquet twins)",
    )
    ap.add_argument(
        "--bgzf-run-blocks",
        type=int,
        default=None,
        help="also measure the bgzf_text skip with the contiguous-run "
        "pick (run_blocks=K): one extra row per ratio, reusing the plain "
        "row's baseline timings (same workload). The knob trades pick "
        "granularity for sequential cold reads at moderate r (VERDICT "
        "r11 item 4: singleton 64 KiB picks measured 0.52x cold at "
        "r=0.1).",
    )
    ap.add_argument(
        "--zstd-run-frames",
        type=int,
        default=None,
        help="also measure the zstd_seekable_text skip with the "
        "contiguous-run pick (run_frames=K): one extra row per ratio, "
        "reusing the plain row's baseline timings (same workload). The "
        "BGZF run knob generalized to the frame rung (VERDICT r12 "
        "item 2); at the writer's 4 MB default frame a singleton pick "
        "is already ~1 MB sequential, so expect smaller deltas than "
        "the bgzf rows.",
    )
    ap.add_argument(
        "--drop-text",
        action="store_true",
        help="delete the uncompressed text layout after the compressed "
        "conversions are built (only legal when byteblock_text is not "
        "being measured) — a --copies 16000 bgzf+zstd run then holds "
        "~14 GB instead of ~43 GB",
    )
    args = ap.parse_args()

    _ALL_SOURCES = (
        "byteblock_text",
        "bzip2_block_text",
        "zstd_seekable_text",
        "bgzf_text",
        "rowgroup_parquet",
    )
    wanted = set(args.sources or _ALL_SOURCES)
    unknown = wanted - set(_ALL_SOURCES)
    if unknown:
        raise SystemExit(f"unknown sources {sorted(unknown)}; have {list(_ALL_SOURCES)}")
    # no-silent-skip (ADVICE r12, low): the run-pick rows only emit inside
    # their source's branch, so a run flag without its source measured
    # would silently produce no run rows — refuse loudly instead,
    # matching the --drop-text guard's style
    if (args.bgzf_run_blocks or 1) > 1 and "bgzf_text" not in wanted:
        raise SystemExit(
            "--bgzf-run-blocks only emits rows for bgzf_text, which is "
            "not among the measured sources — add bgzf_text to --sources "
            "or drop the flag"
        )
    if (args.zstd_run_frames or 1) > 1 and "zstd_seekable_text" not in wanted:
        raise SystemExit(
            "--zstd-run-frames only emits rows for zstd_seekable_text, "
            "which is not among the measured sources — add it to "
            "--sources or drop the flag"
        )

    spark = get_spark("measure-cold-skip")
    spark.sparkContext.setLogLevel("ERROR")

    from random_sampling_based_approximate_mapreduce_spark.sources.byteblock_text import (
        pick_blocks,
        read_text_byteblock_sampled,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.bzip2_block_text import (
        pick_ranges,
        read_text_bzip2_sampled,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.rowgroup_parquet import (
        pick_row_groups,
        read_parquet_rowgroup_sampled,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.zstd_seekable_text import (
        pick_frames,
        read_text_zstd_sampled,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.bgzf_text import (
        pick_blocks as pick_bgzf_blocks,
        read_text_bgzf_sampled,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import (
        ensure_layout,
    )

    import hashlib

    key = hashlib.md5(f"{args.sf}:{args.copies}:v2".encode()).hexdigest()[:10]

    def corpus_df():
        # stream the REPLICA side with 32 partitions and broadcast the
        # small documents table: the expansion then runs 32-wide instead
        # of inside one task (a 1-partition crossJoin expanded 20M rows
        # single-threaded at --copies 4000)
        return (
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
            # per-copy entropy suffix: without it bzip2/parquet fold the
            # replicas to ~nothing and the skip has nothing to skip
            .select(
                F.concat(
                    F.col("text"),
                    F.lit(" "),
                    F.md5(F.concat(F.col("text"), F.col("__c").cast("string"))),
                    F.lit(" "),
                    F.md5(F.col("__c").cast("string")),
                ).alias("value")
            )
        )



    # corpus_df() already leaves 32 evenly-split partitions (the range
    # side is repartitioned before the broadcast expansion) — a second
    # repartition here would shuffle the full expanded corpus again for
    # the same file layout (review r10). Only the layouts the requested
    # sources need are built: text feeds byteblock AND the zst
    # conversion; bz2/parquet stand alone.
    def _published(d: str) -> bool:
        return os.path.exists(os.path.join(d, "_SUCCESS"))

    # the text layout is only a CONVERSION SOURCE for the zst/bgzf
    # rungs: when their layouts are already published (e.g. a prior
    # --drop-text run kept the 7 GB conversions but reclaimed the
    # 29 GB text), don't rebuild 29 GB of text nobody will read
    need_text = "byteblock_text" in wanted or any(
        s in wanted and not _published(f"/tmp/rsmr_cold_{tag}_{key}")
        for s, tag in (("zstd_seekable_text", "zst"), ("bgzf_text", "bgzf"))
    )
    text_dir = bz2_dir = pq_dir = None
    if need_text:
        text_dir = ensure_layout(
            f"/tmp/rsmr_cold_txt_{key}",
            lambda d: corpus_df().write.mode("overwrite").text(d),
        )
    if "bzip2_block_text" in wanted:
        bz2_dir = ensure_layout(
            f"/tmp/rsmr_cold_bz2_{key}",
            lambda d: corpus_df()
            .write.mode("overwrite")
            .option("compression", "bzip2")
            .text(d),
        )
    if "rowgroup_parquet" in wanted:
        pq_dir = ensure_layout(
            f"/tmp/rsmr_cold_pq_{key}",
            lambda d: corpus_df()
            .write.mode("overwrite")
            # small row groups so a 1% pick has >=1 group per file to keep
            .option("parquet.block.size", str(2 * 1024 * 1024))
            .parquet(d),
        )

    def _build_zst(d: str) -> None:
        # seekable-zstd conversion of the text layout, driver-side but
        # parallel across part files (pyarrow's codec releases the GIL);
        # streamed per frame so peak memory is 8 x frame_bytes, not
        # 8 x part size (review r10 ADVICE: fh.read() per thread OOMed
        # the builder headroom at large --copies)
        from concurrent.futures import ThreadPoolExecutor

        from random_sampling_based_approximate_mapreduce_spark.sources.zstd_seekable_text import (
            stream_seekable_zstd,
        )

        os.makedirs(d, exist_ok=True)

        def conv(f: str) -> None:
            with open(os.path.join(text_dir, f), "rb") as fh:
                stream_seekable_zstd(fh, os.path.join(d, f + ".zst"))

        parts = [
            f
            for f in sorted(os.listdir(text_dir))
            if os.path.isfile(os.path.join(text_dir, f))
            and not f.startswith(("_", "."))
        ]
        with ThreadPoolExecutor(8) as ex:
            list(ex.map(conv, parts))
        # ensure_layout's published-check (a markerless layout would be
        # rebuilt and replaced on every invocation)
        with open(os.path.join(d, "_SUCCESS"), "w"):
            pass

    zst_dir = (
        ensure_layout(f"/tmp/rsmr_cold_zst_{key}", _build_zst)
        if "zstd_seekable_text" in wanted
        else None
    )

    def _build_bgzf(d: str) -> None:
        # BGZF conversion of the text layout — same parallel streaming
        # shape as the zst builder (O(block_bytes) peak memory per
        # thread; zlib releases the GIL during compression)
        from concurrent.futures import ThreadPoolExecutor

        from random_sampling_based_approximate_mapreduce_spark.sources.bgzf_text import (
            stream_bgzf,
        )

        os.makedirs(d, exist_ok=True)

        def conv(f: str) -> None:
            with open(os.path.join(text_dir, f), "rb") as fh:
                stream_bgzf(fh, os.path.join(d, f + ".gz"))

        parts = [
            f
            for f in sorted(os.listdir(text_dir))
            if os.path.isfile(os.path.join(text_dir, f))
            and not f.startswith(("_", "."))
        ]
        with ThreadPoolExecutor(8) as ex:
            list(ex.map(conv, parts))
        with open(os.path.join(d, "_SUCCESS"), "w"):
            pass

    bgzf_dir = (
        ensure_layout(f"/tmp/rsmr_cold_bgzf_{key}", _build_bgzf)
        if "bgzf_text" in wanted
        else None
    )
    if args.drop_text and text_dir is not None:
        if "byteblock_text" in wanted:
            raise SystemExit("--drop-text would delete byteblock_text's own layout")
        import shutil

        shutil.rmtree(text_dir)
        text_dir = None
    os.sync()  # flush dirty pages so fadvise(DONTNEED) can evict them

    layout_dirs = {
        "byteblock_text": text_dir,
        "bzip2_block_text": bz2_dir,
        "zstd_seekable_text": zst_dir,
        "bgzf_text": bgzf_dir,
        "rowgroup_parquet": pq_dir,
    }
    layouts = {
        name: (d, _input_files(d))
        for name, d in layout_dirs.items()
        if name in wanted and d is not None
    }
    sizes = {
        name: round(sum(os.path.getsize(f) for f in files) / 1e6, 1)
        for name, (_, files) in layouts.items()
    }

    def _consume(df):
        # sum(length(value)): forces the value column to be materialized
        # in every path (count() on parquet plans an empty projection)
        df.agg(F.sum(F.length("value"))).collect()

    def workloads(name: str, path: str, r: float):
        if name == "byteblock_text":
            skip = lambda: _consume(read_text_byteblock_sampled(spark, path, r, seed=9).df)  # noqa: E731
            base = lambda: _consume(spark.read.text(path).sample(r, seed=9))  # noqa: E731
            _, picked, total = pick_blocks(path, r, seed=9)
        elif name == "bzip2_block_text":
            skip = lambda: _consume(read_text_bzip2_sampled(spark, path, r, seed=9).df)  # noqa: E731
            base = lambda: _consume(spark.read.text(path).sample(r, seed=9))  # noqa: E731
            _, picked, total = pick_ranges(path, r, seed=9)
        elif name == "zstd_seekable_text":
            skip = lambda: _consume(read_text_zstd_sampled(spark, path, r, seed=9).df)  # noqa: E731
            # the JVM reads .zst transparently (whole-stream decode)
            base = lambda: _consume(spark.read.text(path).sample(r, seed=9))  # noqa: E731
            _, picked, total = pick_frames(path, r, seed=9)
        elif name == "bgzf_text":
            skip = lambda: _consume(read_text_bgzf_sampled(spark, path, r, seed=9).df)  # noqa: E731
            # the JVM reads multi-member .gz transparently (Hadoop's
            # codec concatenates members — verified against the writer)
            base = lambda: _consume(spark.read.text(path).sample(r, seed=9))  # noqa: E731
            _, picked, total = pick_bgzf_blocks(path, r, seed=9)
        else:
            skip = lambda: _consume(read_parquet_rowgroup_sampled(spark, path, r, seed=9).df)  # noqa: E731
            base = lambda: _consume(spark.read.parquet(path).sample(r, seed=9))  # noqa: E731
            _, picked, total = pick_row_groups(path, r, seed=9)
        return skip, base, picked, total

    results = []
    for name, (path, files) in layouts.items():
        for r in args.ratios:
            skip, base, picked, total = workloads(name, path, r)
            row = {
                "source": name,
                "ratio": r,
                "input_mb": sizes[name],
                # rowgroup accounting is rows, the others bytes
                "picked_unit": "rows" if name == "rowgroup_parquet" else "bytes",
                "picked": picked,
                "total": total,
                "warm_skip_s": _timed(skip, args.passes),
                "warm_base_s": _timed(base, args.passes),
                "cold_skip_s": _timed(skip, args.passes, evict_paths=files),
                "cold_base_s": _timed(base, args.passes, evict_paths=files),
            }
            row["warm_speedup"] = (
                round(row["warm_base_s"] / row["warm_skip_s"], 2)
                if row["warm_skip_s"]
                else None
            )
            row["cold_speedup"] = (
                round(row["cold_base_s"] / row["cold_skip_s"], 2)
                if row["cold_skip_s"]
                else None
            )
            results.append(row)
            print(json.dumps(row), file=sys.stderr)  # progress
            if name == "bgzf_text" and (args.bgzf_run_blocks or 1) > 1:
                K = args.bgzf_run_blocks
                from random_sampling_based_approximate_mapreduce_spark.sources.bgzf_text import (
                    read_text_bgzf_sampled as _bgzf_read,
                )

                run_skip = lambda: _consume(  # noqa: E731
                    _bgzf_read(spark, path, r, seed=9, run_blocks=K).df
                )
                _, rpicked, rtotal = pick_bgzf_blocks(
                    path, r, seed=9, run_blocks=K
                )
                rrow = {
                    "source": name,
                    "ratio": r,
                    "run_blocks": K,
                    "input_mb": sizes[name],
                    "picked_unit": "bytes",
                    "picked": rpicked,
                    "total": rtotal,
                    "warm_skip_s": _timed(run_skip, args.passes),
                    # the baseline workload is identical — reuse the
                    # plain row's timings rather than re-pay ~4 full
                    # cold scans per ratio
                    "warm_base_s": row["warm_base_s"],
                    "cold_skip_s": _timed(run_skip, args.passes, evict_paths=files),
                    "cold_base_s": row["cold_base_s"],
                    "base_reused_from": "run_blocks=1 row",
                }
                rrow["warm_speedup"] = (
                    round(rrow["warm_base_s"] / rrow["warm_skip_s"], 2)
                    if rrow["warm_skip_s"]
                    else None
                )
                rrow["cold_speedup"] = (
                    round(rrow["cold_base_s"] / rrow["cold_skip_s"], 2)
                    if rrow["cold_skip_s"]
                    else None
                )
                results.append(rrow)
                print(json.dumps(rrow), file=sys.stderr)  # progress
            if name == "zstd_seekable_text" and (args.zstd_run_frames or 1) > 1:
                K = args.zstd_run_frames
                run_skip = lambda: _consume(  # noqa: E731
                    read_text_zstd_sampled(spark, path, r, seed=9, run_frames=K).df
                )
                _, rpicked, rtotal = pick_frames(path, r, seed=9, run_frames=K)
                rrow = {
                    "source": name,
                    "ratio": r,
                    "run_frames": K,
                    "input_mb": sizes[name],
                    "picked_unit": "bytes",
                    "picked": rpicked,
                    "total": rtotal,
                    "warm_skip_s": _timed(run_skip, args.passes),
                    # baseline workload identical — reuse the plain row's
                    "warm_base_s": row["warm_base_s"],
                    "cold_skip_s": _timed(run_skip, args.passes, evict_paths=files),
                    "cold_base_s": row["cold_base_s"],
                    "base_reused_from": "run_frames=1 row",
                }
                rrow["warm_speedup"] = (
                    round(rrow["warm_base_s"] / rrow["warm_skip_s"], 2)
                    if rrow["warm_skip_s"]
                    else None
                )
                rrow["cold_speedup"] = (
                    round(rrow["cold_base_s"] / rrow["cold_skip_s"], 2)
                    if rrow["cold_skip_s"]
                    else None
                )
                results.append(rrow)
                print(json.dumps(rrow), file=sys.stderr)  # progress

    print(
        json.dumps(
            {
                "copies": args.copies,
                "passes": args.passes,
                "input_mb": sizes,
                "eviction": "posix_fadvise(POSIX_FADV_DONTNEED) per timed pass",
                "downstream": "sum(length(value)) (cheapest downstream that "
                "still reads the data column in every path)",
                "results": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
