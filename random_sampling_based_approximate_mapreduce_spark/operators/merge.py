"""Dataset maintenance: key-based upsert (merge) without a table format.

Training/reporting dimensions get corrected and appended between runs.
Lakehouse formats expose MERGE INTO; on plain parquet the same SCD-1
semantics ("updates win per key, everything else survives") is one
anti-join plus a union — no full-outer join, no coalesce-per-column:

    merged = base ⟕̸ updates (anti on key)  ∪  updates

100 TB shape: one shuffle of the base on the key — or none at all when
the update batch is broadcastable (the common case: corrections are tiny
against the dimension). The write side pairs with partition overwrite
(write only the partitions containing touched keys), which is the
idempotent-rewrite discipline the engine's layout docs describe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(base: DataFrame, updates: DataFrame, key_cols: list[str] | str) -> DataFrame:
    """SCD-1 merge: rows from ``updates`` replace base rows on key match;
    unmatched update rows are inserts; unmatched base rows survive.

    Schemas must align by name (unionByName). Updates with duplicate
    keys are the caller's bug — resolve precedence upstream (e.g.
    keep_best_by_fingerprint or max_by on a version column).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    kept = base.join(updates.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(updates)
