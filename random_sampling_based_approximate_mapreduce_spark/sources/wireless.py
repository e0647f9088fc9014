"""Wireless sensor CSV source: link-pair traffic analysis.

The reference reads a sensor CSV, takes the FIRST TWO comma fields as
(sender, receiver) ids (RandomizedWirelessLogAnalysis.java:29-32 — the
documented 7-column header at :27-28 notwithstanding), canonicalizes the
unordered pair (:34-40) and counts per link (:47-59).

Engine version: P13 (``split(line, ',')[0..1]``) + P14
(``concat_ws('->', greatest, least)``) + G3 — all JVM column expressions.
``synthesize_raw_csv`` derives deterministic CSV lines from ``events`` so
the round-trip is oracle-checkable (see ORACLE_WIRELESS_CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synthesize_raw_csv(events: DataFrame) -> DataFrame:
    """events -> DataFrame[line: string] shaped like the sensor CSV.

    sender = dev-(user_id % 40), receiver = dev-(event_id % 40); both
    orders (A,B)/(B,A) occur naturally so canonicalization is exercised
    (FIXTURES.md F3).
    """
    e = events
    snd = F.concat(F.lit("dev-"), (e.user_id % 40).cast("string"))
    rcv = F.concat(F.lit("dev-"), (e.event_id % 40).cast("string"))
    line = F.concat_ws(
        ",",
        snd,
        rcv,
        F.lit("phy1"),
        (e.event_id % 1000).cast("string"),
        F.format_string("-%d", (e.event_id % 60 + 30).cast("int")),
    )
    return events.select(line.alias("line"))


def parse_wireless(raw: DataFrame, col: str = "line") -> DataFrame:
    """P13: first two comma fields; malformed (fieldless) rows dropped (P7)."""
    parts = F.split(F.col(col), ",")
    return (
        raw.select(
            # try_element_at: rows with <2 fields -> null -> dropped (ANSI-safe)
            F.try_element_at(parts, F.lit(1)).alias("snd_id"),
            F.try_element_at(parts, F.lit(2)).alias("rcv_id"),
        )
        .where(F.col("snd_id").isNotNull() & (F.length("snd_id") > 0))
        .where(F.col("rcv_id").isNotNull() & (F.length("rcv_id") > 0))
    )


def canonical_link(snd, rcv):
    """P14: unordered pair -> 'bigger->smaller' canonical key
    (RandomizedWirelessLogAnalysis.java:34-40)."""
    return F.concat_ws("->", F.greatest(snd, rcv), F.least(snd, rcv))


def link_pairs(events: DataFrame) -> DataFrame:
    """Round-trip: synthesize CSV, parse, canonicalize, count per link."""
    parsed = parse_wireless(synthesize_raw_csv(events))
    return (
        parsed.select(canonical_link(F.col("snd_id"), F.col("rcv_id")).alias("link"))
        .groupBy("link")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


ORACLE_WIRELESS_CTE = """
WITH wireless AS (
  SELECT 'dev-' || (user_id % 40) AS snd_id,
         'dev-' || (event_id % 40) AS rcv_id
  FROM events
)
"""
