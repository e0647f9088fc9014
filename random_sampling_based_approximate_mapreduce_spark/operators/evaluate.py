"""Accuracy evaluation harness (the reference's offline comparator).

RSMRResultComparator.java merge-joins key-sorted result files of an exact
run against HT-scaled sampled runs and reports the relative L1 error
(:43-73 merge, :66-71 accumulation, :80-82 metric). Spark-first: the
hand-rolled sorted merge is just a left outer join + one aggregate —
Catalyst picks broadcast/sort-merge physically (O2), and N sampled runs
fold into one pass (O3).

This doubles as the engine's statistical test oracle (SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_exact_approx(
    exact: DataFrame,
    approx: DataFrame,
    on: list[str] | str,
    exact_col: str = "cnt",
    approx_col: str = "est_count",
) -> DataFrame:
    """Left-join exact vs. approx on the group key; absent keys -> 0
    (the comparator's missing-key handling, RSMRResultComparator.java:48-56)."""
    keys = [on] if isinstance(on, str) else list(on)
    a = approx.select(*keys, F.col(approx_col).alias("__approx"))
    return exact.select(*keys, F.col(exact_col).alias("__exact")).join(a, keys, "left").select(
        *keys,
        F.col("__exact").alias("exact"),
        F.coalesce(F.col("__approx"), F.lit(0.0)).alias("approx"),
    )


def rel_l1_error(
    exact: DataFrame,
    approx: DataFrame,
    on: list[str] | str,
    exact_col: str = "cnt",
    approx_col: str = "est_count",
) -> float:
    """[Data error rate] = sum_k |exact_k - approx_k| / sum_k exact_k
    (RSMRResultComparator.java:66-71, 80-82)."""
    joined = join_exact_approx(exact, approx, on, exact_col, approx_col)
    row = joined.agg(
        F.sum(F.abs(F.col("exact") - F.col("approx"))).alias("err_sum"),
        F.sum("exact").alias("base_sum"),
    ).collect()[0]
    return float(row["err_sum"]) / float(row["base_sum"]) if row["base_sum"] else 0.0


def compare_runs(
    exact: DataFrame,
    approx_runs: dict[str, DataFrame],
    on: list[str] | str,
    exact_col: str = "cnt",
    approx_col: str = "est_count",
) -> dict[str, float]:
    """O3: one exact run vs. K sampled runs (the comparator's multi-ratio
    fan-out, RSMRResultComparator.java:21-42) -> {run_name: rel_l1}."""
    return {
        name: rel_l1_error(exact, run, on, exact_col, approx_col)
        for name, run in approx_runs.items()
    }
