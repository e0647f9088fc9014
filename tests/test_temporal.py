"""As-of join and binned range join (operators/temporal.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from random_sampling_based_approximate_mapreduce_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


class TestAsofJoin:
    def test_picks_most_recent_at_or_before(self, spark):
        left = spark.createDataFrame(
            [(1, "u", _t(10)), (2, "u", _t(20)), (3, "u", _t(5))],
            ["event_id", "key", "ts"],
        )
        right = spark.createDataFrame(
            [("u", _t(8), 80.0), ("u", _t(20), 200.0), ("u", _t(15), 150.0)],
            ["key", "ts", "v"],
        )
        out = {
            r["event_id"]: (
                r["matched"]["ts"] if r["matched"] else None,
                r["matched"]["v"] if r["matched"] else None,
            )
            for r in asof_join(left, right, on="key", payload=["v"]).collect()
        }
        assert out[1] == (_t(8), 80.0)
        assert out[2] == (_t(20), 200.0)  # <= : equal timestamp matches
        assert out[3] == (None, None)  # nothing at or before -> left outer

    def test_keys_do_not_leak(self, spark):
        left = spark.createDataFrame([(1, "a", _t(10))], ["event_id", "key", "ts"])
        right = spark.createDataFrame([("b", _t(5), 1.0)], ["key", "ts", "v"])
        rows = asof_join(left, right, on="key", payload=["v"]).collect()
        assert rows[0]["matched"] is None

    def test_one_shuffle_no_join(self, spark):
        left = spark.createDataFrame([(1, "a", _t(10))], ["event_id", "key", "ts"])
        right = spark.createDataFrame([("a", _t(5), 1.0)], ["key", "ts", "v"])
        plan = asof_join(left, right, on="key", payload=["v"])._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan  # union + window, not a join
        assert plan.count("Exchange hashpartitioning") == 1


class TestRangeJoinBinned:
    @pytest.fixture(scope="class")
    def frames(self, spark):
        points = spark.createDataFrame(
            [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=7 * i)) for i in range(200)],
            ["pid", "ts"],
        )
        intervals = spark.createDataFrame(
            [
                (
                    j,
                    dt.datetime(2024, 1, 1) + dt.timedelta(minutes=30 * j),
                    dt.datetime(2024, 1, 1) + dt.timedelta(minutes=30 * j + 90),
                )
                for j in range(40)
            ],
            ["iid", "c_start", "c_end"],
        )
        return points, intervals

    def test_matches_naive_theta_join(self, spark, frames):
        points, intervals = frames
        binned = {
            (r["pid"], r["iid"])
            for r in range_join_binned(
                points, intervals, "ts", "c_start", "c_end", width_seconds=1800
            ).collect()
        }
        naive = {
            (r["pid"], r["iid"])
            for r in points.join(
                intervals,
                (points.ts >= intervals.c_start) & (points.ts < intervals.c_end),
            ).collect()
        }
        assert len(naive) > 400  # overlapping windows -> multiple matches/point
        assert binned == naive

    def test_no_nested_loop_join(self, spark, frames):
        points, intervals = frames
        plan = (
            range_join_binned(points, intervals, "ts", "c_start", "c_end", width_seconds=1800)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan

    def test_exclusive_end(self, spark):
        points = spark.createDataFrame([(0, dt.datetime(2024, 1, 1, 1, 0))], ["pid", "ts"])
        intervals = spark.createDataFrame(
            [(0, dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 1, 1, 0))],
            ["iid", "c_start", "c_end"],
        )
        assert (
            range_join_binned(points, intervals, "ts", "c_start", "c_end", 3600).count() == 0
        )


class TestAsofForward:
    def test_picks_earliest_at_or_after(self, spark):
        left = spark.createDataFrame(
            [(1, "u", _t(10)), (2, "u", _t(20)), (3, "u", _t(25))],
            ["event_id", "key", "ts"],
        )
        right = spark.createDataFrame(
            [("u", _t(12), 120.0), ("u", _t(20), 200.0), ("u", _t(8), 80.0)],
            ["key", "ts", "v"],
        )
        out = {
            r["event_id"]: (
                r["matched"]["ts"] if r["matched"] else None,
                r["matched"]["v"] if r["matched"] else None,
            )
            for r in asof_join(left, right, on="key", payload=["v"], direction="forward").collect()
        }
        assert out[1] == (_t(12), 120.0)
        assert out[2] == (_t(20), 200.0)  # >= : equal timestamp matches
        assert out[3] == (None, None)  # nothing at or after -> null

    def test_bad_direction_rejected(self, spark):
        left = spark.createDataFrame([(1, "u", _t(1))], ["event_id", "key", "ts"])
        with pytest.raises(ValueError):
            asof_join(left, left, on="key", direction="sideways")


class TestAsofNearest:
    def test_picks_closer_side_ties_backward(self, spark):
        left = spark.createDataFrame(
            [(1, "u", _t(10)), (2, "u", _t(16)), (3, "u", _t(30)), (4, "v", _t(5))],
            ["event_id", "key", "ts"],
        )
        right = spark.createDataFrame(
            [("u", _t(8), 80.0), ("u", _t(20), 200.0), ("v", _t(9), 90.0)],
            ["key", "ts", "v"],
        )
        out = {
            r["event_id"]: (r["matched"]["ts"], r["matched"]["v"])
            for r in asof_join(left, right, on="key", payload=["v"], direction="nearest").collect()
        }
        assert out[1] == (_t(8), 80.0)    # 2min back vs 10min fwd
        assert out[2] == (_t(20), 200.0)  # 8min back vs 4min fwd
        assert out[3] == (_t(20), 200.0)  # only backward exists
        assert out[4] == (_t(9), 90.0)    # only forward exists

    def test_exact_tie_goes_backward(self, spark):
        left = spark.createDataFrame([(1, "u", _t(10))], ["event_id", "key", "ts"])
        right = spark.createDataFrame(
            [("u", _t(8), 1.0), ("u", _t(12), 2.0)], ["key", "ts", "v"]
        )
        r = asof_join(left, right, on="key", payload=["v"], direction="nearest").collect()[0]
        assert r["matched"]["v"] == 1.0


class TestRangeJoinReviewR8:
    def test_left_join_keeps_unmatched_points(self, spark):
        """Review r8: the range predicate must live in the JOIN condition
        — a post-join WHERE nulls out and drops left-join unmatched rows,
        silently degrading how='left' to inner."""
        from random_sampling_based_approximate_mapreduce_spark.operators.temporal import (
            range_join_binned,
        )
        from pyspark.sql import functions as F

        points = spark.createDataFrame(
            [(1, "2024-01-01 00:30:00"), (2, "2024-01-05 00:00:00")],
            "pid int, ts string",
        ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
        intervals = spark.createDataFrame(
            [("c1", "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
            "cid string, s string, e string",
        ).select(
            "cid",
            F.col("s").cast("timestamp").alias("s"),
            F.col("e").cast("timestamp").alias("e"),
        )
        out = range_join_binned(points, intervals, "ts", "s", "e", 3600, how="left")
        rows = {r["pid"]: r for r in out.collect()}
        assert rows[1]["cid"] == "c1"
        assert 2 in rows and rows[2]["cid"] is None  # unmatched survives

    def test_subsecond_interval_end_matches(self, spark):
        """Review r8: bin arithmetic runs in microseconds — an interval
        ending a fraction past a bin boundary must still match points in
        that bin (unix_timestamp truncation lost the last bin)."""
        from random_sampling_based_approximate_mapreduce_spark.operators.temporal import (
            range_join_binned,
        )
        from pyspark.sql import functions as F

        points = spark.createDataFrame(
            [(1, "2024-01-01 01:00:00.200")], "pid int, ts string"
        ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
        intervals = spark.createDataFrame(
            [("c1", "2024-01-01 00:30:00", "2024-01-01 01:00:00.500")],
            "cid string, s string, e string",
        ).select(
            "cid",
            F.col("s").cast("timestamp").alias("s"),
            F.col("e").cast("timestamp").alias("e"),
        )
        out = range_join_binned(points, intervals, "ts", "s", "e", 3600).collect()
        assert len(out) == 1 and out[0]["cid"] == "c1"

    def test_rejects_unsupported_how(self, spark):
        from random_sampling_based_approximate_mapreduce_spark.operators.temporal import (
            range_join_binned,
        )

        df = spark.range(1).selectExpr("cast(id as timestamp) ts")
        with pytest.raises(ValueError, match="inner"):
            range_join_binned(df, df, "ts", "ts", "ts", 10, how="full")


class TestFractionalWidth:
    """ADVICE r8: int(width_seconds)*1e6 truncated fractional widths —
    0.5 became 0 (div-by-zero bin math) and 1.5 silently binned as 1s."""

    def test_half_second_width_matches_naive(self, spark):
        base = dt.datetime(2024, 1, 1)
        points = spark.createDataFrame(
            [(i, base + dt.timedelta(microseconds=250_000 * i)) for i in range(20)],
            ["pid", "ts"],
        )
        intervals = spark.createDataFrame(
            [
                (
                    j,
                    base + dt.timedelta(microseconds=500_000 * j),
                    base + dt.timedelta(microseconds=1_000_000 + 500_000 * j),
                )
                for j in range(6)
            ],
            ["iid", "c_start", "c_end"],
        )
        binned = {
            (r["pid"], r["iid"])
            for r in range_join_binned(
                points, intervals, "ts", "c_start", "c_end", width_seconds=0.5
            ).collect()
        }
        naive = {
            (r["pid"], r["iid"])
            for r in points.join(
                intervals,
                (points.ts >= intervals.c_start) & (points.ts < intervals.c_end),
            ).collect()
        }
        assert len(naive) > 0
        assert binned == naive

    def test_nonpositive_width_raises(self, spark):
        df = spark.createDataFrame([(0, dt.datetime(2024, 1, 1))], ["pid", "ts"])
        with pytest.raises(ValueError, match="non-positive"):
            range_join_binned(df, df, "ts", "ts", "ts", width_seconds=0.0)
        with pytest.raises(ValueError, match="non-positive"):
            range_join_binned(df, df, "ts", "ts", "ts", width_seconds=0.0000001)
