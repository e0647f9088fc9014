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


def read_text_file_sampled(
    spark: SparkSession,
    path: str,
    file_ratio: float,
    row_config: SamplingConfig | None = None,
    seed: int = 42,
) -> SampledFrame:
    """Two-stage CLUSTER sampling: skip whole FILES, then Bernoulli-sample
    rows within the survivors.

    Row-level sampling (the reference's design, and ``read_text_sampled``)
    still READS every line — the scan is its floor (measured: a 410 MB log
    row-samples no faster than ~0.7 s however small the ratio). Sampling
    at file granularity skips the I/O itself: listing happens driver-side,
    a deterministic hash of each file name keeps ``file_ratio`` of them,
    and only those files enter the plan — scan cost scales with
    ``file_ratio``, the thing no row sampler can do. Combined ratio
    ``file_ratio x row_ratio`` drives the HT scale-up.

    Statistics honesty: stage one is CLUSTER sampling, unbiased only in
    expectation over files; per-file heterogeneity (time-ordered logs,
    sharded-by-key corpora) inflates variance beyond the Bernoulli A4
    bound, which assumes independent row draws. Use when files are
    exchangeable (hash-named shards, round-robin writers); keep
    ``file_ratio`` coarse and put the fine ratio in stage two.

    The reference has no analog (its reader samples records only,
    RandomizedLineRecordReader.java:67-81); this is the engine extending
    the same estimator algebra to the layout layer.
    """
    from .files import pick_files

    picked, actual_file_ratio = pick_files(spark, path, file_ratio, seed)
    row_cfg = row_config or SamplingConfig(ratio=1.0)
    combined = SamplingConfig(
        ratio=actual_file_ratio * row_cfg.resolve(),
        seed=seed if row_cfg.seed is None else row_cfg.seed,
    )
    sf = SampledFrame.from_dataframe(spark.read.text(picked), row_cfg)
    # estimators scale by 1/(file_ratio x row_ratio); the observation only
    # ever counts rows of SCANNED files (skipping the rest is the point),
    # so report() totals are per-surviving-file, not per-corpus
    return SampledFrame(
        df=sf.df,
        ratio=actual_file_ratio * sf.ratio,
        config=combined,
        observation=sf.observation,
        sample_observation=sf.sample_observation,
        job_id=sf.job_id,
        _start_time=sf._start_time,
    )


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
