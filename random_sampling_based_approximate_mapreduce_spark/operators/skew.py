"""Skew mitigation operators.

The engine's first line of defense at scale is AQE
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py): it splits
oversized shuffle partitions at runtime with no query change. This module
is the EXPLICIT fallback for pathological producers (one key holding
percents of 100 TB), where the planner must not funnel a hot key through
one task at all:

- ``salted_join``: replicate-and-salt broadcast-free equi-join. The big
  (skewed) side gets a deterministic per-row salt in [0, n); the small
  side is exploded once per salt value; the join key becomes (key, salt),
  spreading each hot key over n tasks. Results are EXACTLY those of the
  plain join — verified against the SQL oracle (catalog:
  salted_orders_join) and by tests.

- ``two_phase_agg``: pre-aggregate on (key, salt) then merge per key.
  NOTE Catalyst's hash aggregate already does map-side partial
  aggregation, which removes most count/sum skew; this exists for
  aggregates whose partial state is large (collect_list-ish) where the
  map-side combine doesn't shrink data. For plain count/sum prefer the
  built-in path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt: hash all columns (replayable, unlike
    rand(); uniform enough to spread a hot key)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast("int")


def suggest_n_salts(
    df: DataFrame,
    on: list[str] | str,
    shuffle_partitions: int | None = None,
    sample_ratio: float = 0.01,
    seed: int = 42,
    max_salts: int = 256,
) -> int:
    """Size ``n_salts`` from the OBSERVED hottest-key share.

    Estimates the hottest key's row share from a seeded Bernoulli sample
    (one cheap scan + small agg; at 100 TB run it on the sample you
    already maintain, or reuse table statistics), then picks the smallest
    n that spreads that key to roughly an average task's share:

        n = ceil(hot_share * shuffle_partitions)

    so the hot key's largest post-salt task holds ~1/P of the data like
    everyone else. Returns 1 when no salting is needed (hot share below
    the uniform share), and caps at ``max_salts`` — the small side is
    replicated n times, so past a point AQE skew-split or map-side
    (broadcast) joins are the better tool (docs/SCALE.md "one hot key").
    """
    import math

    keys = [on] if isinstance(on, str) else list(on)
    spark = df.sparkSession
    parts = shuffle_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    sampled = df.select(*keys) if sample_ratio >= 1.0 else df.select(*keys).sample(
        fraction=sample_ratio, seed=seed
    )
    top = (
        sampled.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n").alias("__hot"), F.sum("__n").alias("__total"))
        .first()
    )
    if not top or not top["__total"]:
        return 1
    hot_share = top["__hot"] / top["__total"]
    if hot_share <= 1.0 / parts:
        return 1
    return min(max_salts, max(1, math.ceil(hot_share * parts)))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Cost model: small side is shuffled n_salts times heavier — use only
    when `small` is orders of magnitude smaller than the hot key's row
    count but too big to broadcast outright. Output columns = the plain
    join's (salt column dropped).
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        # right/full would emit each unmatched replicated small row n_salts
        # times — semantically wrong; keep the small side on the right.
        raise ValueError(f"salted_join supports inner/left-ish joins, not {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_big = big.withColumn("__salt", _salt_col(big, n_salts))
    salts = F.explode_outer(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    replicated_small = small.select("*", salts).where(F.col("__salt").isNotNull())
    out = salted_big.join(replicated_small, keys + ["__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple],
    n_salts: int = 8,
) -> DataFrame:
    """Salted two-phase aggregation: groupBy(key, salt) -> groupBy(key).

    ``aggs`` maps output column -> ("count" | "sum", input column or None).
    Only count/sum (re-mergeable) are supported; avg = sum/count at the
    call site.
    """
    salted = df.withColumn("__salt", _salt_col(df, n_salts))
    partial_exprs = []
    final_exprs = []
    for out_name, (kind, col) in aggs.items():
        if kind == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out_name}"))
        elif kind == "sum":
            partial_exprs.append(F.sum(F.col(col)).alias(f"__p_{out_name}"))
        else:
            raise ValueError(f"unsupported agg {kind!r}; use count or sum")
        final_exprs.append(F.sum(F.col(f"__p_{out_name}")).alias(out_name))
    partial = salted.groupBy(*key_cols, "__salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)
