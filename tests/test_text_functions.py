"""Direct coverage of text/hashing utility functions."""

import pytest
from pyspark.sql import functions as F

from random_sampling_based_approximate_mapreduce_spark.functions import text as T
from random_sampling_based_approximate_mapreduce_spark.functions.hashing import minhash_signature


class TestCharNgrams:
    def test_distinct_trigrams(self, spark):
        df = spark.createDataFrame([("abcabc",)], ["s"])
        out = df.select(T.char_ngrams(F.col("s"), 3).alias("g")).collect()[0]["g"]
        assert sorted(out) == ["abc", "bca", "cab"]

    def test_short_string_yields_empty(self, spark):
        df = spark.createDataFrame([("ab",)], ["s"])
        out = df.select(T.char_ngrams(F.col("s"), 3).alias("g")).collect()[0]["g"]
        assert out == []


class TestMinhashForms:
    def test_column_form_equals_grouped_form(self, spark):
        """The one-shot Column minhash_signature (slow path, per-row) and the
        explode+groupBy minhash_signatures (plan-optimized) must produce the
        SAME signatures — same hash family, different plan shape."""
        from random_sampling_based_approximate_mapreduce_spark.operators.dedup import (
            NUM_HASHES,
            SHINGLE_K,
            minhash_signatures,
        )

        rows = [
            (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
            (1, "completely different words describing spark engines and distributed plans"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        grouped = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
        oneshot = {
            r["doc_id"]: r["sig"]
            for r in docs.select(
                "doc_id",
                minhash_signature(T.word_shingles(F.col("text"), SHINGLE_K), NUM_HASHES).alias("sig"),
            ).collect()
        }
        assert grouped == oneshot
