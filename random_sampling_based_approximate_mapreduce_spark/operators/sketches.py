"""Deterministic mergeable sketches with full SQL value oracles.

The engine already ships two sketch families: engine-RNG/engine-format
sketches (``hll_users_daily`` — Datasketches HLL, rows-only oracle by
nature) and the frozen-hash CountMin (``countmin_tokens`` — fully
value-oracled). This module adds the third classic: **KMV (k minimum
values)** distinct counting [Bar-Yossef et al. 2002, the theta-sketch
ancestor], built the same way as the CountMin: every hash is the frozen
md5-derived ``functions.hashing.hash64`` (deterministic, reproducible in
DuckDB), so unlike HLL the whole build + estimate path is value-oracled
bit-for-bit.

Estimator: with U_(k) the k-th smallest of the distinct keys' hashes
mapped into [0, 1) (here: h / 2^60), the unbiased distinct-count estimate
is ``(k-1) / U_(k)``; when a group holds fewer than k distinct hashes the
sketch IS the distinct set and the estimate is exact. Standard error is
~1/sqrt(k-2) (k=64 -> ~13%).

100 TB shape (why each stage is what it is):

1. ``distinct`` on (group, hash) — ONE shuffle with map-side partial
   dedup; this is the same cost as any exact per-group distinct and is
   unavoidable input to an order statistic.
2. Per-(group, salt) top-k with ``salt = h % fanout`` — a window
   row_number over a SORT-based (spillable) exchange. Salting by the hash
   itself splits each group's distinct set into ``fanout`` disjoint
   shards, so a hot group's sort runs ``fanout``-wide instead of on one
   reducer, and the survivor set is bounded at ``fanout * k`` rows per
   group.
3. Final per-group top-k over those <= fanout*k survivors — negligible.

Stage 2/3 is the classic two-stage distributed top-k; the disjointness of
hash-derived salts means no cross-shard dedup is ever needed (a general
sketch-merge would union + re-truncate, which is exactly what stage 3
does). Reference parity note: the reference engine has no distinct
sketches at all (its distinct counting is exact MapReduce); this is part
of the engine's approximate-analytics extension surface alongside
SURVEY.md §2 A1-A7.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import hash64, hash64_sql
from ..functions.rounding import sql_round

# hash64 yields 60-bit non-negative ints; (k-1) * 2^60 for k <= 65 has
# <= 7 significant bits so the double product below is EXACT, and the
# one IEEE division + round is engine-identical.
HASH_SPACE = float(2**60)


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    key: Column,
    k: int = 64,
    fanout: int = 8,
) -> DataFrame:
    """Per-group KMV distinct-count estimate (plus the exact count for
    accuracy display — drop ``exact_distinct`` in production to skip its
    extra aggregate).

    Returns ``group_cols + [exact_distinct, kmv_estimate]``.
    """
    d = df.select(*group_cols, hash64(key).alias("__h")).distinct()
    exact = d.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("exact_distinct"))

    salted = d.withColumn("__salt", F.pmod(F.col("__h"), F.lit(fanout)))
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy("__h")
    survivors = (
        salted.withColumn("__rk", F.row_number().over(w1))
        .where(F.col("__rk") <= k)
        .drop("__rk", "__salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("__h")
    kept = survivors.withColumn("__rk", F.row_number().over(w2)).where(F.col("__rk") <= k)
    sk = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.max("__h").alias("__kth"),
    )
    est = F.when(F.col("__n_kept") < k, F.col("__n_kept")).otherwise(
        sql_round(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("__kth").cast("double"), 0).cast(
            "long"
        )
    )
    # 31-row-scale dimension join: broadcast is exact, not a heuristic
    return exact.join(F.broadcast(sk), list(group_cols)).select(
        *group_cols, "exact_distinct", est.alias("kmv_estimate")
    )


def kmv_distinct_sql(
    table: str,
    group_expr: str,
    group_alias: str,
    key_expr: str,
    k: int = 64,
) -> str:
    """DuckDB mirror of :func:`kmv_distinct`.

    The two-stage salted top-k is a physical strategy only — the result is
    defined by "the k smallest distinct hashes per group", which the
    oracle computes with one window.
    """
    h = hash64_sql(key_expr)
    return f"""
    WITH d AS (
      SELECT DISTINCT {group_expr} AS {group_alias}, {h} AS h FROM {table}
    ),
    r AS (
      SELECT {group_alias}, h,
             row_number() OVER (PARTITION BY {group_alias} ORDER BY h) AS rk
      FROM d
    )
    SELECT {group_alias},
           count(*)::BIGINT AS exact_distinct,
           CASE WHEN count(*) FILTER (WHERE rk <= {k}) < {k}
                THEN count(*) FILTER (WHERE rk <= {k})
                ELSE CAST(round({float(k - 1)} * {HASH_SPACE} /
                          CAST(max(CASE WHEN rk <= {k} THEN h END) AS DOUBLE), 0) AS BIGINT)
           END AS kmv_estimate
    FROM r
    GROUP BY {group_alias}
    """
