"""CLI surface: program parity (wordcount/compare/solve-ratio) end-to-end."""

import pytest

from random_sampling_based_approximate_mapreduce_spark.cli import build_parser, cmd_solve_ratio


def test_parser_covers_reference_programs():
    p = build_parser()
    for argv in (
        ["wordcount", "in", "out", "0.1"],
        ["charcount", "in", "out"],
        ["loganalysis", "host", "in", "out", "0.95,0.02,6"],
        ["compare", "1.0:base", "0.1:run"],
        ["solve-ratio", "0.95,0.01,6"],
        ["list"],
        ["run", "word_count"],
    ):
        args = p.parse_args(argv)
        assert callable(args.fn)


def test_solve_ratio_prints_cochran(capsys):
    p = build_parser()
    cmd_solve_ratio(p.parse_args(["solve-ratio", "0.95,0.01,6"]))
    out = capsys.readouterr().out
    # r = 1/(1 + 4*N*e^2/z^2) with N=1e6, e=0.01, z=1.96 -> ~0.0095
    assert "[Resolved sample rate] 0.0095" in out


def test_wordcount_roundtrip_exact_vs_sampled(spark, tmp_path):
    from pyspark.sql import functions as F

    from random_sampling_based_approximate_mapreduce_spark.cli import (
        _finish,
        _sampled_lines,
    )
    from random_sampling_based_approximate_mapreduce_spark.functions import text as T
    from random_sampling_based_approximate_mapreduce_spark.operators.evaluate import rel_l1_error

    src = tmp_path / "input.txt"
    src.write_text("the quick brown fox\n" * 200 + "jumps over the lazy dog\n" * 100)

    def run(spec, out):
        sf = _sampled_lines(spark, str(src), spec)
        words = sf.transform(lambda df: T.explode_words_reference(df, "value"))
        counts = words.df.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
        _finish(sf, counts, str(tmp_path / out))
        return tmp_path / out

    base_dir = run(None, "rate1.0")
    samp_dir = run("0.5", "rate0.5")

    def read(d, scale):
        return (
            spark.read.option("sep", "\t").csv(str(d)).toDF("word", "cnt")
            .select("word", (F.col("cnt").cast("double") * scale).alias("cnt"))
        )

    err = rel_l1_error(read(base_dir, 1.0), read(samp_dir, 2.0), "word",
                       exact_col="cnt", approx_col="cnt")
    assert err < 0.25  # ratio 0.5 over 300 lines: well inside the A4 bound
