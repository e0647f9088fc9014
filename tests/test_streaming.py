"""Structured Streaming: sampled windowed counts + custom stateful op.

File source -> memory sink, processAllAvailable, compared against the
batch twin on the same rows.
"""

import pytest
from pyspark.sql import functions as F

from random_sampling_based_approximate_mapreduce_spark import SamplingConfig
from random_sampling_based_approximate_mapreduce_spark.sources.tables import load
from random_sampling_based_approximate_mapreduce_spark.streaming import sampled_stream as ST


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events re-written as a plain parquet dir a file stream can read."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    load(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def _read_stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    return spark.readStream.schema(schema).parquet(events_dir)


def _run_to_memory(df, name, output_mode):
    q = df.writeStream.format("memory").queryName(name).outputMode(output_mode).start()
    q.processAllAvailable()
    q.stop()
    return name


class TestWindowedCounts:
    def test_exact_stream_equals_batch(self, spark, events_dir):
        stream = _read_stream(spark, events_dir)
        out = ST.windowed_counts(stream, window="1 hour", watermark="1 minute")
        _run_to_memory(out, "wc_exact", "append")
        got = {
            (r["window_start"], r["event_type"]): r["est_cnt"]
            for r in spark.sql("SELECT * FROM wc_exact").collect()
        }
        batch = spark.read.parquet(events_dir)
        expected = {
            (r["hour"], r["event_type"]): float(r["cnt"])
            for r in batch.groupBy(
                F.date_trunc("hour", "ts").alias("hour"), "event_type"
            ).agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        # append mode emits only windows the watermark has closed; every
        # emitted window must match the batch result exactly
        assert len(got) > 0
        for k, v in got.items():
            assert expected[k] == v

    def test_sampled_stream_estimates(self, spark, events_dir):
        stream = _read_stream(spark, events_dir)
        cfg = SamplingConfig(ratio=0.5, seed=42)
        out = ST.sampled_windowed_counts(stream, cfg, window="24 hours", watermark="1 minute")
        _run_to_memory(out, "wc_sampled", "append")
        got = spark.sql("SELECT sum(est_cnt) AS s FROM wc_sampled").collect()[0]["s"]
        batch = spark.read.parquet(events_dir)
        # emitted (closed) windows cover all but the last day; estimate of
        # the covered mass should be within 10% of exact
        emitted_windows = spark.sql("SELECT window_start FROM wc_sampled").distinct().collect()
        starts = [r["window_start"] for r in emitted_windows]
        exact = batch.where(
            F.date_trunc("day", "ts").isin(starts)
        ).count()
        assert got == pytest.approx(exact, rel=0.1)


class TestEventsHourlyStream:
    def test_exact_stream_matches_batch_rollup(self, spark, sf_dir):
        from random_sampling_based_approximate_mapreduce_spark.streaming.sampled_stream import (
            events_hourly_stream,
        )

        got = {
            (r["hour"], r["event_type"]): (r["cnt"], round(r["total_value"], 2))
            for r in events_hourly_stream(spark, sf_dir, sampled=False).collect()
        }
        batch = load(spark, sf_dir, "events")
        expected = {
            (r["hour"], r["event_type"]): (r["cnt"], round(float(r["tv"]), 2))
            for r in batch.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("tv"),
            )
            .collect()
        }
        assert got == expected

    def test_sampled_stream_within_bound(self, spark, sf_dir):
        from random_sampling_based_approximate_mapreduce_spark.streaming.sampled_stream import (
            events_hourly_stream,
        )

        est = events_hourly_stream(spark, sf_dir, sampled=True, ratio=0.1)
        total_est = est.agg(F.sum("est_cnt")).collect()[0][0]
        total = load(spark, sf_dir, "events").count()
        assert total_est == pytest.approx(total, rel=0.15)


class TestStreamDedup:
    def test_duplicates_within_watermark_dropped(self, spark, tmp_path):
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            (1, base),
            (1, base + dt.timedelta(minutes=5)),   # dup within window
            (2, base + dt.timedelta(minutes=1)),
            (2, base + dt.timedelta(minutes=2)),   # dup within window
            (3, base + dt.timedelta(minutes=3)),
        ]
        src = str(tmp_path / "dedup_src")
        spark.createDataFrame(rows, ["doc_id", "ts"]).write.parquet(src)
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        out = ST.dedup_stream(stream, ["doc_id"], watermark="30 minutes")
        q = (
            out.writeStream.format("memory").queryName("dedup_mem")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        got = sorted(r["doc_id"] for r in spark.sql("SELECT doc_id FROM dedup_mem").collect())
        assert got == [1, 2, 3]


class TestStreamNearDedup:
    def test_formatting_noise_deduped(self, spark, tmp_path):
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            (1, "The quick brown fox!", base),
            (2, "the QUICK  brown fox", base + dt.timedelta(minutes=1)),  # near dup of 1
            (3, "something else entirely", base + dt.timedelta(minutes=2)),
        ]
        src = str(tmp_path / "near_src")
        spark.createDataFrame(rows, ["doc_id", "text", "ts"]).write.parquet(src)
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        out = ST.dedup_stream_near(stream, watermark="30 minutes")
        q = (
            out.writeStream.format("memory").queryName("near_dedup_mem")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        kept = sorted(r["doc_id"] for r in spark.sql("SELECT doc_id FROM near_dedup_mem").collect())
        assert len(kept) == 2 and 3 in kept and (1 in kept or 2 in kept)


class TestStatefulRunningTotals:
    def test_running_totals_match_batch(self, spark, events_dir):
        stream = _read_stream(spark, events_dir)
        out = ST.running_totals_stateful(stream)
        _run_to_memory(out, "rt", "update")
        # last update per key holds the cumulative totals
        rows = spark.sql(
            "SELECT key, max(total_count) AS cnt, max(total_value) AS val FROM rt GROUP BY key"
        ).collect()
        batch = spark.read.parquet(events_dir)
        expected = {
            r["event_type"]: (r["cnt"], r["val"])
            for r in batch.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("val"))
            .collect()
        }
        assert len(rows) == len(expected)
        for r in rows:
            ecnt, eval_ = expected[r["key"]]
            assert r["cnt"] == ecnt
            assert r["val"] == pytest.approx(eval_, rel=1e-9)


class TestStatefulMinhashDedup:
    def _docs(self):
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 12, 0, 0)
        long_a = "the quick brown fox jumps over the lazy dog while rain falls gently on the quiet village roofs at dusk and lights flicker"
        near_a = long_a.replace("flicker", "shimmer")  # high-Jaccard near dup
        other = "completely unrelated content about spark partitions shuffles and adaptive query execution plans at terabyte scale"
        return base, long_a, near_a, other

    def test_cross_micro_batch_state(self, spark, tmp_path):
        """A near-dup arriving in a LATER micro-batch is flagged against the
        owner from an earlier one — the state actually persists."""
        import datetime as dt
        import os
        import time

        from random_sampling_based_approximate_mapreduce_spark.streaming import minhash_state as MS

        base, long_a, near_a, other = self._docs()
        src = str(tmp_path / "mh_src")
        os.makedirs(src)
        # file 1: owner doc + an unrelated doc; file 2 (newer mtime): near dup
        spark.createDataFrame(
            [(1, long_a, base), (2, other, base + dt.timedelta(seconds=1))],
            ["doc_id", "text", "ts"],
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # file-source orders by modification time
        spark.createDataFrame(
            [(3, near_a, base + dt.timedelta(minutes=1))], ["doc_id", "text", "ts"]
        ).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)  # one file per micro-batch
            .parquet(src)
        )
        out = MS.dedup_stream_minhash(stream, watermark="30 days")
        q = (
            out.writeStream.format("memory").queryName("mh_state_mem")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        assert q.lastProgress is not None and q.lastProgress["batchId"] >= 1, (
            "expected multiple micro-batches"
        )
        flagged = {
            (r["doc_id"], r["dup_of"])
            for r in MS.dup_rollup(spark.table("mh_state_mem")).collect()
        }
        assert flagged == {(3, 1)}

    def test_stream_band_keys_match_batch(self, spark, sf_dir):
        """The stateless per-row banding equals the batch groupBy pipeline."""
        from random_sampling_based_approximate_mapreduce_spark.operators.dedup import (
            lsh_band_keys,
            minhash_signatures,
        )
        from random_sampling_based_approximate_mapreduce_spark.sources.tables import load
        from random_sampling_based_approximate_mapreduce_spark.streaming import minhash_state as MS

        docs = load(spark, sf_dir, "documents").limit(100).withColumn(
            "ts", F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id"))
        )
        got = {
            (r["doc_id"], r["band"], r["key"])
            for r in MS.band_keys_stream(docs).collect()
        }
        exp = {
            (r["doc_id"], r["band"], r["key"])
            for r in lsh_band_keys(minhash_signatures(docs)).collect()
        }
        assert got == exp

    def test_run_matches_batch_candidates(self, spark, sf_dir):
        """End-to-end streaming run equals the batch LSH min-partner rollup
        (the identity the DuckDB oracle checks at sf0.01)."""
        from random_sampling_based_approximate_mapreduce_spark.operators.dedup import (
            minhash_lsh_candidates,
        )
        from random_sampling_based_approximate_mapreduce_spark.sources.tables import load
        from random_sampling_based_approximate_mapreduce_spark.streaming.minhash_state import (
            dedup_minhash_stream_run,
        )

        got = {
            (r["doc_id"], r["dup_of"])
            for r in dedup_minhash_stream_run(spark, sf_dir).collect()
        }
        exp = {
            (r["doc_id"], r["dup_of"])
            for r in minhash_lsh_candidates(load(spark, sf_dir, "documents"))
            .groupBy(F.col("doc_b").alias("doc_id"))
            .agg(F.min("doc_a").alias("dup_of"))
            .collect()
        }
        assert len(exp) > 0 and got == exp


class TestMinhashBucketCap:
    def test_degenerate_bucket_capped(self, spark, tmp_path):
        """Past bucket_cap a bucket emits null owners: later arrivals in a
        degenerate (everything-matches) bucket are not flagged, earlier
        ones keep their verdicts."""
        import datetime as dt

        from random_sampling_based_approximate_mapreduce_spark.streaming import minhash_state as MS

        base = dt.datetime(2024, 1, 1, 12, 0, 0)
        text = "the quick brown fox jumps over the lazy dog again and again tonight"
        rows = [(i, text, base + dt.timedelta(seconds=i)) for i in range(6)]
        src = str(tmp_path / "cap_src")
        spark.createDataFrame(rows, ["doc_id", "text", "ts"]).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

        out = MS.dedup_stream_minhash(stream, watermark="30 days", bucket_cap=3)
        q = (
            out.writeStream.format("memory").queryName("cap_mem")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        verdicts = spark.table("cap_mem")
        flagged = {r["doc_id"] for r in MS.dup_rollup(verdicts).collect()}
        # identical docs -> every band shares one bucket; cap=3 admits
        # docs 0,1,2 (doc 0 owner, 1-2 flagged), 3-5 fall past the cap
        assert flagged == {1, 2}
        nulls = verdicts.where(F.col("owner").isNull()).count()
        assert nulls == 3 * 4  # 3 capped docs x NUM_BANDS


class TestStreamingIVF:
    def test_single_centroid_equals_global_mean(self, spark, tmp_path):
        """With one centroid the count-based learning rate makes the
        mini-batch update an exact running mean over the whole stream."""
        import numpy as np
        from random_sampling_based_approximate_mapreduce_spark.streaming.ivf_stream import StreamingIVFIndex

        rng = np.random.RandomState(3)
        X = rng.randn(300, 8)
        idx = StreamingIVFIndex(n_centroids=1)
        for lo in range(0, 300, 100):
            batch = spark.createDataFrame(
                [(row.tolist(),) for row in X[lo : lo + 100]], "v array<double>"
            )
            idx.update(batch, vec_col="v")
        got = np.array(idx.centroids[0])
        assert np.allclose(got, X.mean(axis=0), atol=1e-9)
        assert idx.n_seen == 300

    def test_streamed_index_recall_matches_batch_ivf(self, spark, sf_dir):
        from random_sampling_based_approximate_mapreduce_spark.operators.similarity import (
            ann_ivf,
            knn_brute_force,
        )
        from random_sampling_based_approximate_mapreduce_spark.sources.tables import load
        from random_sampling_based_approximate_mapreduce_spark.streaming.ivf_stream import (
            streaming_ivf_cells_run,
            streaming_ivf_index,
        )

        out = streaming_ivf_cells_run(spark, sf_dir, n_centroids=8)
        rows = out.collect()
        emb = load(spark, sf_dir, "embeddings")
        total = emb.count()
        assert sum(r["n_vectors"] for r in rows) == total
        assert 1 < len(rows) <= 8

        # recall of ANN with the STREAM-learned centroids vs brute force
        import hashlib

        key = hashlib.md5(f"{sf_dir}|8".encode()).hexdigest()[:10]
        idx = streaming_ivf_index(spark, f"/tmp/rsmr_stream_emb_{key}", n_centroids=8)
        queries = emb.orderBy("vec_id").limit(3)
        exact = knn_brute_force(emb, queries, k=5)
        approx = ann_ivf(emb, queries, k=5, n_probe=4, centroids=idx.centroids)
        e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
        a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        assert len(e & a) / len(e) >= 0.6


class TestStreamAdmission:
    def test_roster_matches_batch_incremental_dedup(self, spark, sf_dir):
        """The streaming fp-level admission roster equals the batch
        dedup_incremental operator's surviving fingerprint set."""
        from pyspark.sql import functions as F

        from random_sampling_based_approximate_mapreduce_spark.functions.text import fingerprint
        from random_sampling_based_approximate_mapreduce_spark.operators.corpus import (
            dedup_incremental,
        )
        from random_sampling_based_approximate_mapreduce_spark.sources.tables import load
        from random_sampling_based_approximate_mapreduce_spark.streaming.admit_stream import (
            dedup_incremental_stream_run,
        )

        roster = dedup_incremental_stream_run(spark, sf_dir)
        got = {(r["fp"], r["n_incoming"]) for r in roster.collect()}

        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        incoming = docs.where(F.col("doc_id") % 5 == 0)
        existing = docs.where(F.col("doc_id") % 5 != 0)
        admitted = dedup_incremental(incoming, existing)
        # batch keeps one row per novel fp; recount the incoming batch at
        # fp level to mirror the roster
        inc_fp = incoming.withColumn("fp", fingerprint(F.col("text")))
        expected = {
            (r["fp"], r["n"])
            for r in inc_fp.join(
                admitted.withColumn("fp", fingerprint(F.col("text"))).select("fp"),
                "fp",
                "left_semi",
            )
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == expected and len(got) > 0


class TestStreamingSessions:
    def test_sessions_match_batch_islands(self, spark, sf_dir):
        """Native session_window stream == batch gaps-and-islands twin.

        The catalog oracle proves value parity vs DuckDB; this pins the
        INTERNAL stream/batch identity (streaming_user_sessions vs the
        user_sessions lag+cumsum form) including the boundary-inclusive
        merge and end = max(ts) + gap.
        """
        import pyspark.sql.functions as F
        from pyspark.sql.window import Window

        from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
        from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

        streamed = QUERIES["streaming_user_sessions"].spark(spark, sf_dir)

        e = load(spark, sf_dir, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
        is_new = F.when(gap <= 1_800_000_000, F.lit(0)).otherwise(F.lit(1))
        sess = e.select(
            "user_id", "ts", "value", is_new.alias("is_new"), "event_id"
        ).select(
            "user_id",
            "ts",
            "value",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("sid"),
        )
        batch = sess.groupBy("user_id", "sid").agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        ).drop("sid")

        got = sorted(
            streamed.collect(),
            key=lambda r: (r.user_id, r.session_start),
        )
        want = sorted(batch.collect(), key=lambda r: (r.user_id, r.session_start))
        assert len(got) == len(want) > 0
        for g, b in zip(got, want):
            assert (g.user_id, g.session_start, g.session_end, g.n_events) == (
                b.user_id,
                b.session_start,
                b.session_end,
                b.n_events,
            )
            assert abs(g.total_value - b.total_value) < 1e-9


def test_streaming_stratified_counts_equals_batch(spark, sf_dir):
    """Stream/batch parity for the stratified weighted estimates: the
    complete-mode streaming aggregate must emit exactly the batch twin's
    rows (same deterministic hash sample, same stratum-bounded state)."""
    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import (
        QUERIES,
        _STRAT_FRACTIONS,
    )
    from random_sampling_based_approximate_mapreduce_spark.streaming.sampled_stream import (
        stratified_weighted_counts_stream,
    )

    got = {
        r["event_type"]: r.asDict()
        for r in stratified_weighted_counts_stream(
            spark, sf_dir, _STRAT_FRACTIONS
        ).collect()
    }
    want = {
        r["event_type"]: r.asDict()
        for r in QUERIES["stratified_events_hash_sampled"].spark(spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_stratified_mean_equals_batch(spark, sf_dir):
    """Stream/batch parity for the weighted MEAN + Taylor CI (round 8):
    every moment the interval needs is a sum, so the complete-mode
    streaming aggregate must emit exactly the batch twin's rows —
    including the CI doubles, since the combine uses identical literals
    and association on exact-integer moments."""
    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import (
        QUERIES,
        _STRAT_FRACTIONS,
    )
    from random_sampling_based_approximate_mapreduce_spark.streaming.sampled_stream import (
        stratified_weighted_mean_stream,
    )

    got = {
        r["d"]: r.asDict()
        for r in stratified_weighted_mean_stream(
            spark, sf_dir, _STRAT_FRACTIONS
        ).collect()
    }
    want = {
        r["d"]: r.asDict()
        for r in QUERIES["stratified_value_mean_hash_sampled"].spark(spark, sf_dir).collect()
    }
    assert got == want
    assert any(v["est_mean_ci"] is not None for v in got.values())


class TestStatePartitionKnob:
    """VERDICT r16 item 9: the production state-partition knob must (a)
    change ONLY the state-store partition count — results identical to the
    default run — and (b) restore the session's shuffle-partition setting
    afterwards. Default (knob unset) is a no-op by construction."""

    def test_knob_result_identical_and_conf_restored(self, spark, sf_dir, monkeypatch):
        from random_sampling_based_approximate_mapreduce_spark.streaming.sampled_stream import (
            events_hourly_stream,
        )

        base = {
            (r["hour"], r["event_type"]): (r["cnt"], round(r["total_value"], 2))
            for r in events_hourly_stream(spark, sf_dir, sampled=False).collect()
        }
        before = spark.conf.get("spark.sql.shuffle.partitions")
        monkeypatch.setenv("RSMR_STREAM_STATE_PARTITIONS", "4")
        got = {
            (r["hour"], r["event_type"]): (r["cnt"], round(r["total_value"], 2))
            for r in events_hourly_stream(spark, sf_dir, sampled=False).collect()
        }
        assert spark.conf.get("spark.sql.shuffle.partitions") == before
        assert got == base

    def test_malformed_knob_ignored(self, spark, sf_dir, monkeypatch):
        from random_sampling_based_approximate_mapreduce_spark.streaming.sampled_stream import (
            _state_partitions,
        )

        monkeypatch.setenv("RSMR_STREAM_STATE_PARTITIONS", "not-a-number")
        before = spark.conf.get("spark.sql.shuffle.partitions")
        with _state_partitions(spark):
            assert spark.conf.get("spark.sql.shuffle.partitions") == before
