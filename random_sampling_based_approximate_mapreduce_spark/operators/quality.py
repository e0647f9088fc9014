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

from ..functions.rounding import sql_round


def violation_counts(df: DataFrame, preds: "dict[str, Column]") -> DataFrame:
    """One-pass violation counts: {check_name: violated_predicate}.

    All predicates aggregate in a single scan (module docstring); the
    1-row wide result unpivots to (check_name, violations) long rows.
    An EMPTY table yields 0 violations per check (coalesce over the
    null sum) — the gate must render a verdict on empty ingests, not a
    NULL that neither passes nor fails.
    """
    if not preds:
        raise ValueError("violation_counts needs at least one (name, predicate) check")
    aggs = [
        F.coalesce(F.sum(F.when(p, 1).otherwise(0)), F.lit(0)).cast("long").alias(name)
        for name, p in preds.items()
    ]
    wide = df.agg(*aggs)
    return wide.unpivot([], list(preds), "check_name", "violations")


def uniqueness_violations(df: DataFrame, cols: "list[str]", check: str) -> DataFrame:
    """(check_name, violations) = non-null-keyed rows - distinct keys.

    Rows with a NULL in any key column are EXCLUDED from the minuend:
    count(*) includes them but count_distinct drops them, so the naive
    difference would report every null-keyed row as a duplicate — null
    keys are the completeness check's finding, not this one (the same
    routing rule referential_orphans applies to null fks). Exact
    distinct (Expand + one shuffle); swap to approx_count_distinct at
    scales where an exact distinct shuffle is not worth a boolean.
    """
    key_present = F.lit(True)
    for c in cols:
        key_present = key_present & F.col(c).isNotNull()
    return df.agg(
        (
            F.coalesce(F.sum(F.when(key_present, 1).otherwise(0)), F.lit(0))
            - F.count_distinct(*[F.col(c) for c in cols])
        )
        .cast("long")
        .alias("violations")
    ).select(F.lit(check).alias("check_name"), "violations")


def referential_orphans(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    check: str,
    broadcast: bool = False,
) -> DataFrame:
    """(check_name, violations) counting child rows whose fk has no parent pk.

    NULL fks are excluded — a missing key is a COMPLETENESS violation
    (violation_counts with isNull), not a referential one; without the
    filter every null row would fail the anti-join's null-rejecting
    equality and double-count across the two checks. The parent key is
    re-aliased so fk == pk (self-referential FKs, denormalized facts)
    cannot trip AMBIGUOUS_REFERENCE. ``broadcast=True`` force-hints the
    parent side — only when the caller KNOWS the key set fits (a dim
    table); default lets AQE pick broadcast vs shuffle anti-join, which
    is the safe call for a billion-key parent.
    """
    keys = parent.select(F.col(pk).alias("__rsmr_pk"))
    if broadcast:
        keys = F.broadcast(keys)
    orphans = child.where(child[fk].isNotNull()).join(
        keys, child[fk] == F.col("__rsmr_pk"), "left_anti"
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


def psi_bucketize(events_df) -> DataFrame:
    """events -> (bucket, is_ref) rows; shared by the batch and streaming
    PSI queries (plans/catalog events_value_psi / streaming_value_psi)
    so both monitors bucket identically."""
    return events_df.select(
        F.least(F.lit(9), F.floor(F.col("value") / 50.0).cast("int")).alias("bucket"),
        F.when(F.col("ts") < "2024-01-16", 1).otherwise(0).alias("is_ref"),
    )


def psi_from_counts(c: DataFrame) -> DataFrame:
    """(bucket, n_ref, n_cur) -> the PSI long-format result.

    Totals via a global window over the bucket-bounded relation (the
    monthly-growth pattern — an unconditioned 1-row join would plan a
    nested loop); one-sided-empty buckets yield NULL terms.
    """
    from pyspark.sql.window import Window

    w_all = Window.partitionBy()
    ct = c.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(w_all).alias("tr"),
        F.sum("n_cur").over(w_all).alias("tc"),
    )
    p_ref = F.col("n_ref") / F.col("tr").cast("double")
    p_cur = F.col("n_cur") / F.col("tc").cast("double")
    return ct.select(
        "bucket",
        "n_ref",
        "n_cur",
        sql_round(p_ref, 6).alias("p_ref"),
        sql_round(p_cur, 6).alias("p_cur"),
        F.when(
            (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
            sql_round((p_ref - p_cur) * F.log(p_ref / p_cur), 6),
        ).alias("psi_term"),
    )
