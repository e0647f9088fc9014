"""Declarative data-quality constraint suite (Deequ-style) over DataFrames.

A training-data pipeline gates every ingest on a battery of table
constraints — completeness, domain validity, key uniqueness, referential
integrity. The scale-relevant design decision is HOW the battery runs:

- All row-local predicates (null checks, range checks, accepted-values)
  fold into ONE aggregate over ONE scan — each check is a
  ``sum(case when violated then 1 end)`` that participates in the same
  map-side partial aggregation, so N checks cost one pass, not N passes.
  The wide 1-row result unpivots to long (check_name, violations) rows.
- Key uniqueness needs a distinct count; exact ``count - count(distinct)``
  plans an Expand (one extra shuffle). That is the correct exact form at
  test scale; the 100 TB swap is approx_count_distinct (documented at the
  call site) when a ppm-level false alarm rate is acceptable.
- Referential integrity is a LEFT ANTI join counting orphans — broadcast
  when the parent key set fits, shuffle otherwise; never a collect.

Output contract: long-format rows (check_name STRING, violations BIGINT,
passed BOOLEAN) so a gate can ``filter(NOT passed)`` and alert per check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violation_counts(df: DataFrame, preds: "dict[str, Column]") -> DataFrame:
    """One-pass violation counts: {check_name: violated_predicate}.

    All predicates aggregate in a single scan (module docstring); the
    1-row wide result unpivots to (check_name, violations) long rows.
    """
    aggs = [
        F.sum(F.when(p, 1).otherwise(0)).cast("long").alias(name)
        for name, p in preds.items()
    ]
    wide = df.agg(*aggs)
    return wide.unpivot([], list(preds), "check_name", "violations")


def uniqueness_violations(df: DataFrame, cols: "list[str]", check: str) -> DataFrame:
    """(check_name, violations) where violations = rows - distinct keys.

    Exact distinct (Expand + one shuffle); swap to approx_count_distinct
    at scales where an exact distinct shuffle is not worth a boolean.
    """
    return df.agg(
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
        .cast("long")
        .alias("violations")
    ).select(F.lit(check).alias("check_name"), "violations")


def referential_orphans(
    child: DataFrame, fk: str, parent: DataFrame, pk: str, check: str
) -> DataFrame:
    """(check_name, violations) counting child rows whose fk has no parent pk.

    NULL fks are excluded — a missing key is a COMPLETENESS violation
    (violation_counts with isNull), not a referential one; without the
    filter every null row would fail the anti-join's null-rejecting
    equality and double-count across the two checks.
    """
    orphans = child.where(child[fk].isNotNull()).join(
        F.broadcast(parent.select(pk)), child[fk] == F.col(pk), "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("violations")).select(
        F.lit(check).alias("check_name"), "violations"
    )


def quality_report(parts: "list[DataFrame]") -> DataFrame:
    """Union the (check_name, violations) relations and attach passed."""
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.select("check_name", "violations", (F.col("violations") == 0).alias("passed"))
