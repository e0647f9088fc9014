"""Property-based check: the quality suite counts EXACTLY the violations
injected, for arbitrary corruption mixes.

hypothesis drives random (n_rows, n_null_keys, n_dup_rows, n_orphans)
combinations through operators/quality; the expected counts are computed
from the construction, so a counting bug in any check (the review pass
found two: null-keyed rows counted as duplicates, NULL verdicts on empty
input) fails here for some generated case.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)


@given(
    n_clean=st.integers(0, 30),
    n_null=st.integers(0, 5),
    n_dup=st.integers(0, 5),
    n_orphan=st.integers(0, 5),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_injected_violations_counted_exactly(spark_mod, n_clean, n_null, n_dup, n_orphan):
    import pyspark.sql.functions as F

    from random_sampling_based_approximate_mapreduce_spark.operators.quality import (
        quality_report,
        referential_orphans,
        uniqueness_violations,
        violation_counts,
    )

    rows = []
    key = 0
    for _ in range(n_clean):
        rows.append((key, key % 7))  # fk 0..6, parents exist
        key += 1
    dup_base = rows[:n_dup] if rows else []
    for k, fk in dup_base:  # duplicate existing keys
        rows.append((k, fk))
    extra_dups = max(0, n_dup - len(dup_base))
    for _ in range(extra_dups):
        rows.append((key, key % 7))
        rows.append((key, key % 7))
        key += 1
    for _ in range(n_null):
        rows.append((None, 0))
    for _ in range(n_orphan):
        rows.append((key, 999))  # fk with no parent
        key += 1
    if not rows:
        rows = []
    df = spark_mod.createDataFrame(rows, "k long, fk long") if rows else spark_mod.createDataFrame([], "k long, fk long")
    parent = spark_mod.createDataFrame([(i,) for i in range(7)], "pk long")

    report = {
        r.check_name: r.violations
        for r in quality_report(
            [
                violation_counts(df, {"k_null": F.col("k").isNull()}),
                uniqueness_violations(df, ["k"], "k_dups"),
                referential_orphans(df, "fk", parent, "pk", "orphans"),
            ]
        ).collect()
    }
    assert report["k_null"] == n_null
    # duplicates: each duplicated key contributes (copies - 1)
    expect_dups = len(dup_base) + extra_dups
    assert report["k_dups"] == expect_dups
    assert report["orphans"] == n_orphan


@pytest.fixture(scope="module")
def spark_mod(spark):
    return spark
