"""Semantic invariants for the second round-4 batch (sketches, spine,
SCD2, profiler, frozen-model scoring, Q15/Q17/Q7, JSONL round trip).

The DuckDB value oracle pins exact outputs; these tests assert the
data-independent properties — KMV error bounds and the salted-top-k =
true-top-k identity, spine contiguity, SCD2 interval chaining — so a
refactor that breaks both engines identically still fails.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES


def _run(name, spark, sf_dir):
    return QUERIES[name].spark(spark, sf_dir)


class TestKMV:
    def test_estimate_within_bound(self, spark, sf_correct_dir):
        # k=64 -> SE ~ 1/sqrt(62) ~ 12.7%; 4 sigma ~ 51%. The testdata's
        # 125-141 distinct users/day must keep every day's estimate inside
        # that envelope (and exercises the estimator branch, not the
        # exact fallback).
        rows = _run("kmv_users_daily", spark, sf_correct_dir).collect()
        assert len(rows) >= 28
        for r in rows:
            assert r.exact_distinct > 64, "estimator branch not exercised"
            rel = abs(r.kmv_estimate - r.exact_distinct) / r.exact_distinct
            assert rel < 0.51, (r.day, r.exact_distinct, r.kmv_estimate)

    def test_exact_fallback_below_k(self, spark):
        from random_sampling_based_approximate_mapreduce_spark.operators.sketches import (
            kmv_distinct,
        )

        df = spark.range(40).select(
            F.lit("g").alias("g"), F.col("id").cast("string").alias("k")
        )
        row = kmv_distinct(df, ["g"], F.col("k"), k=64, fanout=8).collect()[0]
        assert row.exact_distinct == 40
        assert row.kmv_estimate == 40  # sketch holds the whole distinct set

    def test_two_stage_matches_true_topk(self, spark):
        # The salted two-stage top-k is a physical strategy; its estimate
        # must equal the one computed from the true k smallest hashes.
        from random_sampling_based_approximate_mapreduce_spark.functions.hashing import (
            hash64,
        )
        from random_sampling_based_approximate_mapreduce_spark.operators.sketches import (
            HASH_SPACE,
            kmv_distinct,
        )

        k = 16
        df = spark.range(500).select(
            (F.col("id") % 2).cast("string").alias("g"),
            F.concat(F.lit("key_"), F.col("id")).alias("k"),
        )
        got = {
            r.g: r.kmv_estimate
            for r in kmv_distinct(df, ["g"], F.col("k"), k=k, fanout=4).collect()
        }
        hashes = df.select("g", hash64(F.col("k")).alias("h")).distinct().collect()
        by_g: dict[str, list[int]] = {}
        for r in hashes:
            by_g.setdefault(r.g, []).append(r.h)
        for g, hs in by_g.items():
            kth = sorted(hs)[k - 1]
            expect = int(round((k - 1) * HASH_SPACE / float(kth)))
            assert got[g] == expect, (g, got[g], expect)


class TestGapfill:
    def test_spine_contiguous_and_zero_filled(self, spark, sf_correct_dir):
        rows = _run("events_gapfill_hourly", spark, sf_correct_dir).collect()
        hours = sorted(r.hour for r in rows)
        span = (hours[-1] - hours[0]).total_seconds() / 3600
        assert len(rows) == int(span) + 1, "spine has holes or duplicates"
        zeros = [r for r in rows if r.cnt == 0]
        assert zeros, "filter was chosen to leave real gaps"
        for r in zeros:
            assert r.total_value == 0.0
        filtered = (
            _load_events(spark, sf_correct_dir)
            .where((F.col("event_type") == "purchase") & (F.col("value") >= 150.0))
            .count()
        )
        assert sum(r.cnt for r in rows) == filtered


class TestSCD2:
    def test_versions_chain_per_user(self, spark, sf_correct_dir):
        rows = _run("user_state_scd2", spark, sf_correct_dir).collect()
        by_user: dict = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        ev_counts = {
            r.user_id: r.n
            for r in _load_events(spark, sf_correct_dir)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for uid, versions in by_user.items():
            versions.sort(key=lambda r: r.valid_from)
            currents = [v for v in versions if v.is_current]
            assert len(currents) == 1 and versions[-1].is_current
            for a, b in zip(versions, versions[1:]):
                assert a.valid_to == b.valid_from  # half-open chain, no holes
                assert a.event_type != b.event_type  # runs were collapsed
            assert sum(v.n_events for v in versions) == ev_counts[uid]


class TestProfiler:
    def test_profile_shape_and_sanity(self, spark, sf_correct_dir):
        rows = _run("orders_profile", spark, sf_correct_dir).collect()
        got = {(r.column_name, r.metric): r.value for r in rows}
        assert len(got) == 20
        n_orders = _load(spark, sf_correct_dir, "orders").count()
        assert got[("o_orderkey", "distinct_count")] == float(n_orders)
        for (c, m), v in got.items():
            if m == "null_count":
                assert v == 0.0, (c, v)
        assert got[("o_totalprice", "min")] <= got[("o_totalprice", "max")]
        assert got[("o_orderdate", "min_epoch_us")] < got[("o_orderdate", "max_epoch_us")]


class TestLogisticQuality:
    def test_scores_and_threshold(self, spark, sf_correct_dir):
        rows = _run("doc_quality_logistic", spark, sf_correct_dir).collect()
        assert len(rows) == 500
        keeps = {r.keep for r in rows}
        assert keeps == {True, False}, "threshold should split the corpus"
        for r in rows:
            assert 0.0 < r.quality < 1.0
            assert r.keep == (r.quality >= 0.5)

    def test_sigmoid_monotone_in_length(self, spark):
        # Holding stopword/punct features fixed, longer docs score higher
        # (W_LEN > 0): score the same sentence repeated 1x vs 20x.
        from random_sampling_based_approximate_mapreduce_spark.plans.catalog import (
            _LQ_W_LEN,
        )

        assert _LQ_W_LEN > 0
        base = "the cat sat on the mat and it was that good "
        df = spark.createDataFrame(
            [(1, base, len(base)), (2, base * 20, len(base) * 20)],
            "doc_id long, text string, n_chars long",
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
            rows = {r.doc_id: r.quality for r in _run("doc_quality_logistic", spark, d).collect()}
        assert rows[2] > rows[1]


class TestTpchShapes:
    def test_q15_all_rows_share_max(self, spark, sf_correct_dir):
        rows = _run("top_supplier_revenue", spark, sf_correct_dir).collect()
        assert rows
        revs = {r.total_revenue for r in rows}
        assert len(revs) == 1  # only max-revenue suppliers survive

    def test_q17_aggregate_sane(self, spark, sf_correct_dir):
        row = _run("small_qty_revenue", spark, sf_correct_dir).collect()[0]
        assert row.n_lines > 0
        assert row.avg_yearly > 0
        assert not math.isnan(row.avg_yearly)

    def test_q7_pairs_and_years(self, spark, sf_correct_dir):
        rows = _run("volume_shipping_q7", spark, sf_correct_dir).collect()
        assert rows
        for r in rows:
            assert r.supp_nation != r.cust_nation
            assert r.supp_nation in ("NATION_1", "NATION_2")
            assert 1995 <= r.l_year <= 2001
            assert r.revenue > 0


class TestJsonlRoundtrip:
    def test_matches_parquet_aggregate(self, spark, sf_correct_dir):
        got = {
            r.lang: (r.n_docs, r.total_chars, r.total_text_len)
            for r in _run("documents_jsonl_roundtrip", spark, sf_correct_dir).collect()
        }
        want = {
            r.lang: (r.n_docs, r.total_chars, r.total_text_len)
            for r in _load(spark, sf_correct_dir, "documents")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
                F.sum(F.length("text")).alias("total_text_len"),
            )
            .collect()
        }
        assert got == want  # JSON write->read is lossless


def _load(spark, sf_dir, name):
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

    return load(spark, sf_dir, name)


def _load_events(spark, sf_dir):
    return _load(spark, sf_dir, "events")
