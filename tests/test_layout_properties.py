"""Property tests for the cross-engine bit-exact helpers (z-order,
md5 buckets): the Spark Column expression, the SQL mirror string run on
DuckDB, and a plain-Python reference must agree on arbitrary inputs."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def ref_z(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


class TestZValueSqlParity:
    @settings(max_examples=50, deadline=None)
    @given(
        st.integers(min_value=0, max_value=(1 << 21) - 1),
        st.integers(min_value=0, max_value=(1 << 21) - 1),
        st.sampled_from([4, 8, 16, 21]),
    )
    def test_duckdb_mirror_matches_reference(self, a, b, bits):
        from random_sampling_based_approximate_mapreduce_spark.functions.zorder import z_value_sql

        got = duckdb.sql(f"SELECT {z_value_sql(str(a), str(b), bits)}").fetchone()[0]
        assert got == ref_z(a & ((1 << bits) - 1), b & ((1 << bits) - 1), bits)


class TestMd5BucketSqlParity:
    @settings(max_examples=30, deadline=None)
    @given(st.integers(min_value=0, max_value=10**12), st.sampled_from([1, 2, 3]))
    def test_duckdb_mirror_in_range_and_matches_python(self, doc_id, n_hex):
        import hashlib

        from random_sampling_based_approximate_mapreduce_spark.operators.corpus import (
            md5_bucket_sql,
        )

        got = duckdb.sql(
            f"SELECT {md5_bucket_sql(str(doc_id), n_hex)}"
        ).fetchone()[0]
        expect = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:n_hex], 16)
        assert got == expect
        assert 0 <= got < 16**n_hex


class TestSparkSideParity:
    def test_spark_matches_duckdb_on_a_grid(self, spark):
        """One Spark job checks the Column forms against the same grid the
        SQL mirrors were property-tested on (keeps JVM launches to one)."""
        from pyspark.sql import functions as F

        from random_sampling_based_approximate_mapreduce_spark.functions.zorder import z_value
        from random_sampling_based_approximate_mapreduce_spark.operators.corpus import md5_bucket

        rows = [(a, b) for a in (0, 1, 7, 4095, 65535) for b in (0, 2, 9, 1023, 65535)]
        df = spark.createDataFrame(rows, ["a", "b"])
        got = df.select(
            "a",
            "b",
            z_value(F.col("a"), F.col("b"), 16).alias("z"),
            md5_bucket(F.col("a")).alias("bk"),
        ).collect()
        import hashlib

        for r in got:
            assert r["z"] == ref_z(r["a"], r["b"], 16)
            assert r["bk"] == int(hashlib.md5(str(r["a"]).encode()).hexdigest()[:2], 16)
