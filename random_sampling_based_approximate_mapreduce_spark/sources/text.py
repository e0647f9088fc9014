"""Sampled text source + TSV sink (S1/S2/S5).

The reference's ``RandomizedTextInputFormat`` plugs a Bernoulli-sampling
line reader under any MapReduce job (RandomizedLineRecordReader.java:56-83).
Spark-first equivalent: ``spark.read.text`` composes with ``SampledFrame``
— the sample node sits directly above the scan, so rejected lines are
dropped before any parse/shuffle cost (the reference's entire speedup,
SURVEY.md §4.1), while an Observation counts every line seen (the
reference's ``lines++``/``sampled++`` ZK bookkeeping, :74-78, :86-94).

Compression (S4) is transparent: Spark's text source handles
gzip/bzip2/zstd by extension, like the reference's codec detection
(RandomizedXMLRecordReader.java:76-106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sampling.config import SamplingConfig
from ..sampling.sampled_frame import SampledFrame


def read_text_sampled(
    spark: SparkSession,
    path: str,
    config: SamplingConfig | None = None,
) -> SampledFrame:
    """Line-oriented text scan with scan-level Bernoulli sampling.

    Returns a SampledFrame over ``[value: string]`` — one row per line,
    sampled at the resolved ratio with exact totals observed.
    """
    return SampledFrame.from_dataframe(spark.read.text(path), config)


def read_xml_pages_sampled(
    spark: SparkSession,
    path: str,
    config: SamplingConfig | None = None,
) -> SampledFrame:
    """XML ``<page>`` scan with record-level sampling (S3).

    Reads whole files, splits into page records, samples page-wise BEFORE
    any field extraction — the reference's skip-without-parse semantics
    (RandomizedXMLRecordReader.java:117-123) at record granularity.
    """
    from .xml_pages import split_pages

    blobs = spark.read.text(path, wholetext=True)
    pages = split_pages(blobs, "value")
    return SampledFrame.from_dataframe(pages, config)


def write_tsv(df: DataFrame, path: str, *, sort_by: str | None = None) -> None:
    """S5: tab-separated text sink (the reference's TextOutputFormat
    ``key \\t value`` part-files; RSMRResultComparator.java:35,47).

    ``sort_by`` reproduces the key-sorted output MapReduce guarantees
    (O1); omit for unordered (faster, no global sort exchange).
    """
    out = df.orderBy(sort_by) if sort_by else df
    out.write.mode("overwrite").option("sep", "\t").csv(path)
