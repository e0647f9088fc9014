"""Custom Python DataSource: reader-level sampling plug-in (S1/S2 parity)."""

import gzip

import pytest

from random_sampling_based_approximate_mapreduce_spark.sources.sampled_text_source import (
    register_sampled_text,
)


@pytest.fixture(scope="module")
def source(spark, tmp_path_factory):
    register_sampled_text(spark)
    d = tmp_path_factory.mktemp("ds")
    plain = d / "input.txt"
    plain.write_text("".join(f"line {i}\n" for i in range(5000)))
    gz = d / "input2.txt.gz"
    with gzip.open(gz, "wt") as f:
        for i in range(1000):
            f.write(f"gz {i}\n")
    return spark, str(plain), str(gz)


class TestSampledTextSource:
    def test_sampling_rate_and_determinism(self, source):
        spark, plain, _ = source
        df = (
            spark.read.format("sampled_text")
            .option("path", plain).option("ratio", "0.2").option("seed", "42").load()
        )
        n = df.count()
        assert 800 < n < 1200  # ~20% of 5000
        assert df.count() == n  # hash-deterministic: replay-stable
        rows = set(r["line"] for r in df.collect())
        again = set(
            r["line"]
            for r in spark.read.format("sampled_text")
            .option("path", plain).option("ratio", "0.2").option("seed", "42").load()
            .collect()
        )
        assert rows == again

    def test_seed_changes_selection(self, source):
        spark, plain, _ = source
        a = set(
            r["line"] for r in spark.read.format("sampled_text")
            .option("path", plain).option("ratio", "0.1").option("seed", "1").load().collect()
        )
        b = set(
            r["line"] for r in spark.read.format("sampled_text")
            .option("path", plain).option("ratio", "0.1").option("seed", "2").load().collect()
        )
        assert a != b

    def test_exact_mode_reads_everything(self, source):
        spark, plain, _ = source
        df = spark.read.format("sampled_text").option("path", plain).load()
        assert df.count() == 5000

    def test_gzip_by_extension(self, source):
        spark, _, gz = source
        df = (
            spark.read.format("sampled_text")
            .option("path", gz).option("ratio", "0.5").load()
        )
        assert 350 < df.count() < 650

    def test_composes_with_engine_pipeline(self, source):
        from pyspark.sql import functions as F

        from random_sampling_based_approximate_mapreduce_spark.functions import text as T

        spark, plain, _ = source
        df = (
            spark.read.format("sampled_text")
            .option("path", plain).option("ratio", "0.3").load()
        )
        words = T.explode_words(df, "line").groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
        got = {r["word"]: r["cnt"] for r in words.collect()}
        assert got["line"] == pytest.approx(1500, rel=0.2)
