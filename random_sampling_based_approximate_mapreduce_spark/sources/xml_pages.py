"""XML ``<page>`` record source.

The reference's XML reader extracts everything between ``<page>`` and
``</page>`` byte-wise from (possibly compressed) splits, skipping whole
records on sampling rejects (RandomizedXMLRecordReader.java:113-151).

Engine version: pages as rows of a DataFrame; tag extraction is a DOTALL
regex projection (multi-line pages supported — FIXTURES.md F4). Spark's
text/parquet sources already handle compression (S4 is built-in), and
sampling composes by wrapping the raw page frame in a SampledFrame BEFORE
extraction — the "skip-without-parse" effect of the reference (§4.2) with
no custom DataSource needed.

``wrap_documents`` builds the XML blobs from the documents table so the
extract round-trip is oracle-checkable against plain document queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

START_TAG = "<page>"  # RandomizedXMLRecordReader.java:54
END_TAG = "</page>"   # RandomizedXMLRecordReader.java:55


def wrap_documents(docs: DataFrame) -> DataFrame:
    """documents -> DataFrame[page_xml: string] of <page> blobs."""
    xml = F.concat(
        F.lit("<page>\n  <title>doc-"),
        F.col("doc_id").cast("string"),
        F.lit("</title>\n  <text>"),
        F.col("text"),
        F.lit("</text>\n</page>"),
    )
    return docs.select(xml.alias("page_xml"))


def split_pages(blob: DataFrame, col: str = "value") -> DataFrame:
    """One big XML string column -> one row per <page>...</page> record.

    For files read with ``spark.read.text(..., wholetext=True)`` or any
    frame holding multi-page blobs. DOTALL so pages span lines.
    """
    pages = F.regexp_extract_all(F.col(col), F.lit(f"(?s){START_TAG}(.*?){END_TAG}"), F.lit(1))
    # explode_outer + IS NOT NULL: plain explode makes InferFiltersFromGenerate
    # push a size()>0 filter below with the regexp re-evaluated per row
    # (see operators/dedup.minhash_signatures).
    return blob.select(F.explode_outer(pages).alias("page_xml")).where(
        F.col("page_xml").isNotNull()
    )


def extract_fields(pages: DataFrame, col: str = "page_xml") -> DataFrame:
    """page_xml -> (title, text); missing tags -> empty -> dropped (P7)."""
    c = F.col(col)
    return pages.select(
        F.regexp_extract(c, r"(?s)<title>(.*?)</title>", 1).alias("title"),
        F.regexp_extract(c, r"(?s)<text>(.*?)</text>", 1).alias("text"),
    ).where(F.length("title") > 0)


def page_word_counts(docs: DataFrame) -> DataFrame:
    """Round-trip flagship: wrap docs in XML, extract back, word-count.

    Matches the reference's randwordcount-over-wiki.xml pipeline
    (randWordCount.sh:5-7 + RandomizedWordCount.java:30-39).
    """
    from ..functions import text as T

    extracted = extract_fields(wrap_documents(docs))
    return T.explode_words(extracted, "text").groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
