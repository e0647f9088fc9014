"""applyInPandas grouped operators: distributed result == local pandas."""

import pandas as pd
import pytest

from random_sampling_based_approximate_mapreduce_spark.operators.pandas_ops import grouped_ewma
from random_sampling_based_approximate_mapreduce_spark.sources.tables import load


class TestGroupedEwma:
    def test_matches_local_pandas(self, spark, sf_dir):
        e = load(spark, sf_dir, "events").where("event_type = 'purchase'")
        got = (
            grouped_ewma(e, "event_type", "ts", "value", alpha=0.1)
            .orderBy("ts")
            .toPandas()
        )
        local = e.select("ts", "value").orderBy("ts").toPandas()
        expected = local["value"].ewm(alpha=0.1, adjust=False).mean()
        assert len(got) == len(local)
        assert got["ewma"].values == pytest.approx(expected.values, rel=1e-9)

    def test_tiebreak_makes_tied_timestamps_deterministic(self, spark):
        # Two rows share ts=1; the tiebreak column fixes the recurrence
        # order regardless of shuffle arrival order, matching the closed
        # form s_3 = (1-a)^2 x_1 + a(1-a) x_2 + a x_3 over id order.
        rows = [("k", 1, 2, 30.0), ("k", 1, 1, 10.0), ("k", 2, 3, 50.0)]
        df = spark.createDataFrame(rows, ["g", "ts", "event_id", "value"])
        out = grouped_ewma(
            df, "g", "ts", "value", alpha=0.5, tiebreak_cols=("event_id",)
        ).collect()
        got = {r["event_id"]: r["ewma"] for r in out}
        assert got[1] == 10.0
        assert got[2] == pytest.approx(0.5 * 30.0 + 0.5 * 10.0)
        assert got[3] == pytest.approx(0.5 * 50.0 + 0.5 * got[2])

    def test_groups_are_independent(self, spark):
        rows = [("a", 1, 10.0), ("b", 1, 100.0), ("a", 2, 20.0), ("b", 2, 200.0)]
        df = spark.createDataFrame(rows, ["k", "ts", "value"])
        got = {
            (r["k"], r["ts"]): r["ewma"]
            for r in grouped_ewma(df, "k", "ts", "value", alpha=0.5).collect()
        }
        assert got[("a", 1)] == 10.0
        assert got[("a", 2)] == pytest.approx(15.0)
        assert got[("b", 1)] == 100.0
        assert got[("b", 2)] == pytest.approx(150.0)
