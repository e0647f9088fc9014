#!/usr/bin/env python
"""The reference's headline claim, as a SCALING SERIES over BOTH axes:
sampled-vs-exact speedup for the flagship workloads at 1x/10x/100x the
bench corpus AND across the reference's own ratio grid.

The reference reports up to 97.5% time reduction (~40x) at GB scale
with r small; its comparator grid is r in {1.0, 0.5, 0.25, 0.1, 0.01,
0.001} (README.md:48) and the 40x headline lives at r~0.025-0.001.
Round 10 measured only r=0.1; this round adds a --ratios column
(VERDICT r10 item 2) so the engine's numbers land on the reference's
actual operating points. The sampled run's cost is (fixed overhead) +
r * (scan+parse work), so the speedup should RISE toward 1/r as the
data term dominates — and the series records where the fixed floor
caps it instead (the honest statement the verdict asks for).

Four workload series (all min-of-3 with the JVM warm; exact run
measured once per corpus size, sampled runs once per ratio):

- word_count — parquet documents input, row-Bernoulli below the scan
  (the reference's randwordcount semantics on columnar input).
- log_file — the reference's ACTUAL input shape: raw access-log text
  on disk (written once at layout time), exact regex-parse count vs
  line-Bernoulli sample below the parse.
- xml_bzip2 — the reference's LITERAL flagship workload (randwordcount
  over wiki.xml.bz2, randWordCount.sh:5-7): <page> records inside
  .bz2, exact JVM splittable-codec scan + extract + word count vs the
  bzip2-block source (compressed ranges skipped before ANY decode —
  RandomizedXMLRecordReader.java:76-106's byte-skip semantics) with
  HT-scaled counts.
- zstd — the same shape through the seekable-zstd frame source
  (VERDICT r10 item 3: the fourth byte-skip ladder rung gets the same
  curve as the other three): exact JVM whole-stream .zst scan vs
  picked frames only.
- gzip — the same shape through the BGZF blocked-gzip source (round
  11: the fifth rung joins the series the day it lands): exact JVM
  whole-stream .gz scan (Hadoop's codec reads multi-member gzip
  fully — verified) vs picked blocks only.

The byte-skip series also record the ACHIEVED byte ratio per
(corpus, ratio) cell: the never-empty pick floor means a tiny r on a
small corpus opens more bytes than nominal, and the speedup must be
read against the ratio actually achieved (at cluster scale unit counts
are large, so achieved converges to r).

A fixed-ratio legacy block (word_count/log_host catalog queries at
their registered ratios) is kept per corpus size for continuity with
the r<=10 series (REF_SPEEDUP_r10.json and earlier).

Usage: python tools/measure_reference_speedup.py [--copies 10 100]
       [--ratios 0.1 0.01 0.001]
Emits one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# 256 KB byte-skip units: the shared layouts write 4 part files, and
# with the sources' 4 MB defaults a ~20 MB x100 corpus has ~5 units —
# the never-empty-pick floor then OPENS ~80% of the bytes at nominal
# r=0.1 and caps the measurable speedup at ~1.25x regardless of the
# engine. Finer units put the achieved byte ratio near r (recorded per
# cell). At cluster scale units are HDFS-split-sized and file counts
# are large, so achieved converges to r without this adjustment.
RANGE_BYTES = 256 * 1024
FRAME_BYTES = 256 * 1024


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, nargs="*", default=[10, 100])
    ap.add_argument(
        "--ratios", type=float, nargs="*", default=[0.1, 0.01, 0.001]
    )
    ap.add_argument(
        "--log-boost",
        type=int,
        default=3,
        help="extra events-replication factor for the log_file corpus "
        "(round 15, VERDICT r14 'what's wrong' #1: the log workload is "
        "per-line cheaper than the word/XML rungs, so at x100 its exact "
        "cell read ~4.5 s — noise-dominated. The boost sizes the log "
        "corpus so the graded denominator is >=10 s at the top of the "
        "grid; exact and sampled share the corpus, so speedups stay "
        "honest, and each row records log_file_copies)",
    )
    args = ap.parse_args()
    copies_grid = sorted({c for c in args.copies if c > 1}) or [10, 100]
    ratios = sorted({r for r in args.ratios if 0 < r < 1}, reverse=True)

    from pyspark.sql import functions as F

    from random_sampling_based_approximate_mapreduce_spark.functions import text as T
    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
    from random_sampling_based_approximate_mapreduce_spark.plans.reference_tasks import (
        raw_log_layout,
        xml_bzip2_layout,
    )
    from random_sampling_based_approximate_mapreduce_spark.sampling.config import (
        SamplingConfig,
    )
    from random_sampling_based_approximate_mapreduce_spark.sampling.sampled_frame import (
        SampledFrame,
    )
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark
    from random_sampling_based_approximate_mapreduce_spark.sources import apache_log as AL
    from random_sampling_based_approximate_mapreduce_spark.sources import xml_pages as XP
    from random_sampling_based_approximate_mapreduce_spark.sources.bzip2_block_text import (
        pick_ranges,
        read_text_bzip2_sampled,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.scale_up import (
        ensure_scaled_tables,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import (
        assert_layout_shape,
        canonicalize_part_names,
        ensure_layout,
        load,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.zstd_seekable_text import (
        convert_text_to_seekable,
        parse_seek_table,
        pick_frames,
        read_text_zstd_sampled,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.bgzf_text import (
        GZI_SUFFIX,
        convert_text_to_bgzf,
        pick_blocks,
        read_text_bgzf_sampled,
        scan_blocks,
        write_gzi,
    )

    spark = get_spark("rsmr-reference-speedup")
    spark.sparkContext.setLogLevel("ERROR")

    def run_noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timed_min3(fn) -> float:
        samples = []
        for _ in range(3):
            t0 = time.monotonic()
            fn()
            samples.append(time.monotonic() - t0)
        return round(min(samples), 3)

    # --- seekable-zstd layout of documents.text, one-time per corpus dir
    def zstd_text_layout(sf_dir: str) -> str:
        import hashlib

        # ':canon1' moves the key with the deterministic-write recipe
        key = hashlib.md5(f"{sf_dir}:{FRAME_BYTES}:canon1".encode()).hexdigest()[:10]

        def _build(d: str) -> None:
            import shutil
            import tempfile

            tmp = tempfile.mkdtemp(prefix="rsmr_spd_zstd_src_")
            try:
                # content-keyed placement + sort (round 15, VERDICT r14
                # "what's wrong" #2): bit-stable layout bytes so seeded
                # achieved-pick ratios are comparable across rounds —
                # see raw_log_layout's determinism note
                load(spark, sf_dir, "documents").select("text").repartition(
                    4, "text"
                ).sortWithinPartitions("text").write.mode("overwrite").text(tmp)
                # stable part names -> stable converted names -> stable
                # path-seeded picks (sources.tables.canonicalize_part_names)
                canonicalize_part_names(tmp)
                convert_text_to_seekable(tmp, d, frame_bytes=FRAME_BYTES)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
            # measurement layout (not an oracle): require multiple parts
            # and at least one frame seam somewhere; achieved byte ratio
            # is recorded per cell, so a coarse layout shows up in the
            # numbers rather than invalidating them
            assert_layout_shape(
                d,
                min_parts=2,
                count_units=lambda p: len(parse_seek_table(p)),
                min_units=2,
                what="speedup zstd layout",
            )

        return ensure_layout(f"/tmp/rsmr_spd_zstd_{key}", _build)

    # --- BGZF layout of documents.text, one-time per corpus dir. Block
    # size is the spec's 64 KiB ceiling (BSIZE is uint16), so this rung
    # has ~4x more units than the 256 KB zstd/bzip2 rungs at the same
    # corpus — a LOWER pick floor (achieved ratio recorded per cell).
    def bgzf_text_layout(sf_dir: str) -> str:
        import hashlib

        # ':canon1' moves the key with the deterministic-write recipe
        key = hashlib.md5(f"{sf_dir}:bgzf:canon1".encode()).hexdigest()[:10]

        def _build(d: str) -> None:
            import shutil
            import tempfile

            tmp = tempfile.mkdtemp(prefix="rsmr_spd_bgzf_src_")
            try:
                # content-keyed placement + sort: bit-stable layout (see
                # the zstd builder's determinism note)
                load(spark, sf_dir, "documents").select("text").repartition(
                    4, "text"
                ).sortWithinPartitions("text").write.mode("overwrite").text(tmp)
                canonicalize_part_names(tmp)  # stable names -> stable picks
                # index=True (round 14): the flagship layouts carry .gzi
                # sidecars like production layouts should — pick metadata
                # is the O(1) index scan, not the header hop. Same layout
                # key and same .gz bytes, so every seeded pick (and every
                # achieved ratio in the committed series) is unchanged.
                convert_text_to_bgzf(tmp, d, index=True)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
            assert_layout_shape(
                d,
                min_parts=2,
                count_units=lambda p: sum(1 for e in scan_blocks(p) if e.d_size),
                min_units=2,
                what="speedup bgzf layout",
                # metadata sidecars are not part files
                skip=lambda p: p.endswith(GZI_SUFFIX),
            )

        d = ensure_layout(f"/tmp/rsmr_spd_bgzf_{key}", _build)
        # the layout key predates index=True (round 14), so a box still
        # holding the older generation would reuse it and this tool
        # would silently measure the header hop while the committed
        # series claims the indexed posture (review r14). Indexing is a
        # pure sidecar add — the .gz bytes (and thus every seeded pick)
        # are untouched — so backfill missing .gzi in place.
        for f in sorted(os.listdir(d)):
            p = os.path.join(d, f)
            if (
                os.path.isfile(p)
                and not f.startswith(("_", "."))
                and not f.endswith(GZI_SUFFIX)
                and not os.path.exists(p + GZI_SUFFIX)
            ):
                write_gzi(scan_blocks(p), p + GZI_SUFFIX)
        return d

    # --- per-series exact and sampled plans (identical downstreams)
    def word_count_exact(sf_dir):
        return QUERIES["word_count"].spark(spark, sf_dir)

    def word_count_sampled(sf_dir, r):
        docs = load(spark, sf_dir, "documents")
        sf = SampledFrame.from_dataframe(
            docs, SamplingConfig(ratio=r, seed=42), observe=False
        )
        words = sf.transform(
            lambda df: T.explode_words(T.drop_digit_lines(df, "text"), "text")
        )
        return words.approx_count("word", alias="est_cnt")

    def log_file_exact(src):
        parsed = AL.parse_apache_log(
            spark.read.text(src).withColumnRenamed("value", "line")
        )
        return parsed.groupBy("host").agg(F.count(F.lit(1)).alias("cnt"))

    def log_file_sampled(src, r):
        raw = spark.read.text(src).withColumnRenamed("value", "line")
        sf = SampledFrame.from_dataframe(
            raw, SamplingConfig(ratio=r, seed=42), observe=False
        )
        parsed = sf.transform(lambda df: AL.parse_apache_log(df))
        return parsed.approx_count("host", ci=True, alias="est_cnt")

    def xml_word_counts(pages_df):
        extracted = XP.extract_fields(pages_df)
        return T.explode_words(extracted, "text").groupBy("word").agg(
            F.count(F.lit(1)).alias("cnt")
        )

    def xml_exact(src):
        # Spark/Hadoop's own splittable Bzip2Codec scan — the exact run a
        # reference user gets from a plain job on the same file
        return xml_word_counts(
            spark.read.text(src).select(F.col("value").alias("page_xml"))
        )

    def xml_sampled(src, r):
        sf = read_text_bzip2_sampled(spark, src, r, range_bytes=RANGE_BYTES, seed=42)
        words = sf.transform(
            lambda df: T.explode_words(
                XP.extract_fields(df.select(F.col("value").alias("page_xml"))),
                "text",
            )
        )
        return words.approx_count("word", alias="est_cnt")

    def zstd_exact(src):
        # the JVM reads .zst transparently (whole-stream decode of every
        # frame; the seek table rides in an ignored skippable frame)
        lines = spark.read.text(src)
        kept = T.drop_digit_lines(lines, "value")
        return T.explode_words(kept, "value").groupBy("word").agg(
            F.count(F.lit(1)).alias("cnt")
        )

    def zstd_sampled(src, r):
        sf = read_text_zstd_sampled(spark, src, r, seed=42)
        words = sf.transform(
            lambda df: T.explode_words(T.drop_digit_lines(df, "value"), "value")
        )
        return words.approx_count("word", alias="est_cnt")

    def gzip_exact(src):
        # the JVM reads multi-member .gz transparently (Hadoop's codec
        # concatenates members — verified against the writer)
        lines = spark.read.text(src)
        kept = T.drop_digit_lines(lines, "value")
        return T.explode_words(kept, "value").groupBy("word").agg(
            F.count(F.lit(1)).alias("cnt")
        )

    def gzip_sampled(src, r):
        sf = read_text_bgzf_sampled(spark, src, r, seed=42)
        words = sf.transform(
            lambda df: T.explode_words(T.drop_digit_lines(df, "value"), "value")
        )
        return words.approx_count("word", alias="est_cnt")

    out = {
        "sf": SF_DIR,
        "range_bytes": RANGE_BYTES,
        "frame_bytes": FRAME_BYTES,
        "ratios": ratios,
        "runs": [],
    }
    boost = max(1, args.log_boost)
    out["log_boost"] = boost
    dirs = {1: SF_DIR}
    log_dirs = {1: SF_DIR}
    for c in copies_grid:
        dirs[c] = ensure_scaled_tables(
            spark, SF_DIR, ("documents", "events"), copies=c
        )
        log_dirs[c] = (
            ensure_scaled_tables(spark, SF_DIR, ("events",), copies=c * boost)
            if boost > 1
            else dirs[c]
        )
    for c in sorted(dirs):
        sf_dir = dirs[c]
        log_src = raw_log_layout(spark, log_dirs[c])
        xml_src = xml_bzip2_layout(spark, sf_dir)
        zst_src = zstd_text_layout(sf_dir)
        gz_src = bgzf_text_layout(sf_dir)

        # fixed-ratio legacy block: catalog queries at their registered
        # ratios, for continuity with the pre-r11 series
        legacy = {}
        for name in ("word_count", "word_count_sampled", "log_host", "log_host_sampled"):
            legacy[name] = timed_min3(
                lambda name=name: run_noop(QUERIES[name].spark(spark, sf_dir))
            )
        legacy["speedup_word_count"] = (
            round(legacy["word_count"] / legacy["word_count_sampled"], 2)
            if legacy["word_count_sampled"]
            else None
        )
        legacy["speedup_log_host"] = (
            round(legacy["log_host"] / legacy["log_host_sampled"], 2)
            if legacy["log_host_sampled"]
            else None
        )

        exact = {
            "word_count": timed_min3(lambda: run_noop(word_count_exact(sf_dir))),
            "log_file": timed_min3(lambda: run_noop(log_file_exact(log_src))),
            "xml_bzip2": timed_min3(lambda: run_noop(xml_exact(xml_src))),
            "zstd": timed_min3(lambda: run_noop(zstd_exact(zst_src))),
            "gzip": timed_min3(lambda: run_noop(gzip_exact(gz_src))),
        }

        ratio_rows = []
        for r in ratios:
            _, xml_picked, xml_total = pick_ranges(xml_src, r, RANGE_BYTES, seed=42)
            _, zst_picked, zst_total = pick_frames(zst_src, r, seed=42)
            _, gz_picked, gz_total = pick_blocks(gz_src, r, seed=42)
            cell = {
                "ratio": r,
                "word_count_sampled": timed_min3(
                    lambda: run_noop(word_count_sampled(sf_dir, r))
                ),
                "log_file_sampled": timed_min3(
                    lambda: run_noop(log_file_sampled(log_src, r))
                ),
                "xml_bz2_sampled_block": timed_min3(
                    lambda: run_noop(xml_sampled(xml_src, r))
                ),
                "zstd_sampled_frames": timed_min3(
                    lambda: run_noop(zstd_sampled(zst_src, r))
                ),
                "gzip_sampled_blocks": timed_min3(
                    lambda: run_noop(gzip_sampled(gz_src, r))
                ),
                "xml_achieved_ratio": round(xml_picked / xml_total, 5)
                if xml_total
                else None,
                "zstd_achieved_ratio": round(zst_picked / zst_total, 5)
                if zst_total
                else None,
                "gzip_achieved_ratio": round(gz_picked / gz_total, 5)
                if gz_total
                else None,
            }
            for series, sampled_key in (
                ("word_count", "word_count_sampled"),
                ("log_file", "log_file_sampled"),
                ("xml_bzip2", "xml_bz2_sampled_block"),
                ("zstd", "zstd_sampled_frames"),
                ("gzip", "gzip_sampled_blocks"),
            ):
                cell[f"speedup_{series}"] = (
                    round(exact[series] / cell[sampled_key], 2)
                    if cell[sampled_key]
                    else None
                )
            ratio_rows.append(cell)
            print(f"copies={c} ratio={r}: {cell}", file=sys.stderr)

        row = {
            "copies": c,
            "log_file_copies": c * boost if c > 1 else 1,
            "legacy": legacy,
            "exact": exact,
            "ratios": ratio_rows,
        }
        out["runs"].append(row)
        print(f"copies={c}: exact={exact} legacy={legacy}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
