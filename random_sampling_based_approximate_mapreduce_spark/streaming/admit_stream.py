"""Streaming corpus admission: stream-static dedup against the index.

The streaming twin of ``operators.corpus.dedup_incremental``: incoming
documents arrive as a stream and are admitted only if their canonical
fingerprint is absent from the STATIC corpus index. The join is
stream-static — Spark broadcasts/probes the static side per micro-batch
with NO stream-side state — and the within-stream rollup is a streaming
aggregation, so the only state is one counter per novel fingerprint.

At 100 TB the static side is the stored fingerprint index (two longs per
doc); re-reading it per micro-batch is a catalog-table scan, or pin it
with a persist. Output is the fp-level admission roster, which is
DETERMINISTIC (set semantics — no arrival-order dependence), so the
whole streaming query value-checks against a batch SQL oracle; row-level
"which duplicate arrived first" is the part that is inherently
order-dependent and stays rows-only in the batch operator.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint
from ..sources.tables import load


def _docs_stream_source(spark: SparkSession, sf_dir: str) -> str:
    """Documents table as a parquet dir the file-stream source can read
    (race-safe one-time /tmp materialization)."""
    from ..sources.tables import ensure_layout

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/rsmr_docs_stream_src_{key}"
    return ensure_layout(
        out,
        lambda staging: load(spark, sf_dir, "documents")
        .write.mode("overwrite")
        .parquet(staging),
    )


def admit_stream(incoming: DataFrame, existing_fp: DataFrame) -> DataFrame:
    """fp-level admission roster of a document stream.

    ``incoming``: streaming frame with a ``text`` column.
    ``existing_fp``: STATIC frame with one ``fp`` column (the corpus
    index). Returns a streaming aggregate (fp, n_incoming) of novel
    fingerprints only.
    """
    fps = incoming.withColumn("fp", fingerprint(F.col("text")))
    novel = fps.join(existing_fp, "fp", "left_anti")
    return novel.groupBy("fp").agg(F.count(F.lit(1)).alias("n_incoming"))


def dedup_incremental_stream_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-shot availableNow run of the admission stream; returns the
    final roster as a batch DataFrame for the correctness harness."""
    src = _docs_stream_source(spark, sf_dir)
    static_docs = load(spark, sf_dir, "documents")
    schema = static_docs.schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .where(F.col("doc_id") % 5 == 0)
        .select("doc_id", "text")
    )
    existing_fp = (
        static_docs.where(F.col("doc_id") % 5 != 0)
        .select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
    )
    roster = admit_stream(stream, existing_fp)
    name = f"admit_roster_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    q = (
        roster.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("fp").cast("long"), F.col("n_incoming").cast("long")
    )
