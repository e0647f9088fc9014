#!/usr/bin/env python
"""The reference's headline claim, as a SCALING SERIES: sampled-vs-exact
speedup for the flagship workloads at 1x / 10x / 100x the bench corpus.

The reference reports up to 97.5% time reduction (~40x) at GB scale
with r small (README.md:48). At sf0.1 on local[32] the fixed Spark
overheads (session, plan, task launch) bound the measurable speedup;
this series shows the trend as data grows — the sampled run's cost is
(fixed overhead) + r * (scan+parse work), so the ratio should RISE
toward 1/r as the data term dominates. bench.py records the 10x point
per round; this tool extends the series to 100x for docs/SCALE.md.

Three series (all min-of-3 with the JVM warm):

- word_count / log_host — the original parquet-input series (the
  log_host sampled twin pays a per-run raw-line synthesis above the
  sample, documented at plans/reference_tasks.py::q_log_host_sampled;
  its speedup is floored by that fixture term).
- log_file — the reference's ACTUAL input shape: raw access-log text
  on disk (written once at layout time), exact regex-parse count vs
  line-Bernoulli sample below the parse (log_host_file_sampled).
- xml_bzip2 — the reference's LITERAL flagship workload
  (randwordcount over wiki.xml.bz2, randWordCount.sh:5-7): <page>
  records inside .bz2, exact JVM splittable-codec scan + extract +
  word count vs the round-9 bzip2-block source at r=0.1 (compressed
  ranges skipped before ANY decode — RandomizedXMLRecordReader.java:
  76-106's byte-skip semantics) with HT-scaled counts.

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
XML_SAMPLE_RATIO = 0.1


def main() -> None:
    from pyspark.sql import functions as F

    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
    from random_sampling_based_approximate_mapreduce_spark.plans.reference_tasks import (
        raw_log_layout,
        xml_bzip2_layout,
    )
    from random_sampling_based_approximate_mapreduce_spark.functions import text as T
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
        read_text_bzip2_sampled,
    )
    from random_sampling_based_approximate_mapreduce_spark.sources.scale_up import (
        ensure_scaled_tables,
    )

    spark = get_spark("rsmr-reference-speedup")
    spark.sparkContext.setLogLevel("ERROR")

    def timed_min3(fns: dict) -> dict:
        samples: dict[str, list[float]] = {n: [] for n in fns}
        for _ in range(3):
            for n, fn in fns.items():
                t0 = time.monotonic()
                fn()
                samples[n].append(time.monotonic() - t0)
        return {n: round(min(ts), 3) for n, ts in samples.items()}

    def run_noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def measure(sf_dir):
        names = ["word_count", "word_count_sampled", "log_host", "log_host_sampled"]
        return timed_min3(
            {n: (lambda n=n: run_noop(QUERIES[n].spark(spark, sf_dir))) for n in names}
        )

    # --- the disk-shape log series (raw text layout built once per dir)
    def measure_log_file(sf_dir):
        src = raw_log_layout(spark, sf_dir)

        def exact():
            parsed = AL.parse_apache_log(
                spark.read.text(src).withColumnRenamed("value", "line")
            )
            run_noop(parsed.groupBy("host").agg(F.count(F.lit(1)).alias("cnt")))

        def sampled():
            run_noop(QUERIES["log_host_file_sampled"].spark(spark, sf_dir))

        return timed_min3({"log_file_exact": exact, "log_file_sampled": sampled})

    # --- the bzip2 XML flagship series (VERDICT r9 item 3)
    # 256 KB ranges: the shared layout writes 4 .bz2 part files, and with
    # the source's 4 MB default a 19.5 MB x100 corpus has ~5 ranges — the
    # never-empty-pick floor then OPENS ~80% of the bytes at nominal
    # r=0.1 and caps the measurable speedup at ~1.25x regardless of the
    # engine. Finer ranges put the achieved byte ratio near r (recorded
    # below as xml_bz2_achieved_ratio so the speedup can be read against
    # the ratio actually achieved, not the nominal one). At cluster scale
    # ranges are HDFS-split-sized and file counts are large, so achieved
    # converges to r without this adjustment.
    XML_RANGE_BYTES = 256 * 1024

    def measure_xml_bzip2(sf_dir):
        src = xml_bzip2_layout(spark, sf_dir)

        def word_counts(pages_df):
            extracted = XP.extract_fields(pages_df)
            return T.explode_words(extracted, "text").groupBy("word").agg(
                F.count(F.lit(1)).alias("cnt")
            )

        def exact_jvm():
            # Spark/Hadoop's own splittable Bzip2Codec scan — the exact
            # run a reference user gets from a plain job on the same file
            run_noop(
                word_counts(
                    spark.read.text(src).select(F.col("value").alias("page_xml"))
                )
            )

        def sampled_block():
            # compressed byte-ranges skipped BEFORE any decode, pages
            # extracted after the byte-level read, HT-scaled counts
            sf = read_text_bzip2_sampled(
                spark, src, XML_SAMPLE_RATIO, range_bytes=XML_RANGE_BYTES, seed=42
            )
            words = sf.transform(
                lambda df: T.explode_words(
                    XP.extract_fields(df.select(F.col("value").alias("page_xml"))),
                    "text",
                )
            )
            run_noop(words.approx_count("word", alias="est_cnt"))

        from random_sampling_based_approximate_mapreduce_spark.sources.bzip2_block_text import (
            pick_ranges,
        )

        _, picked_b, total_b = pick_ranges(
            src, XML_SAMPLE_RATIO, XML_RANGE_BYTES, seed=42
        )
        out = timed_min3(
            {"xml_bz2_exact_jvm": exact_jvm, "xml_bz2_sampled_block": sampled_block}
        )
        out["xml_bz2_achieved_ratio"] = round(picked_b / total_b, 4) if total_b else None
        return out

    out = {"sf": SF_DIR, "xml_sample_ratio": XML_SAMPLE_RATIO, "runs": []}
    dirs = {1: SF_DIR}
    for c in COPIES:
        dirs[c] = ensure_scaled_tables(
            spark, SF_DIR, ("documents", "events"), copies=c
        )
    for c in sorted(dirs):
        m = measure(dirs[c])
        m.update(measure_log_file(dirs[c]))
        m.update(measure_xml_bzip2(dirs[c]))
        row = {
            "copies": c,
            **m,
            "speedup_word_count": round(m["word_count"] / m["word_count_sampled"], 2),
            "speedup_log_host": round(m["log_host"] / m["log_host_sampled"], 2),
            "speedup_log_file": round(
                m["log_file_exact"] / m["log_file_sampled"], 2
            )
            if m["log_file_sampled"]
            else None,
            "speedup_xml_bzip2": round(
                m["xml_bz2_exact_jvm"] / m["xml_bz2_sampled_block"], 2
            )
            if m["xml_bz2_sampled_block"]
            else None,
        }
        out["runs"].append(row)
        print(f"copies={c}: {row}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
