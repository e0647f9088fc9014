"""Engine CLI — the reference's program-driver surface, Spark-first.

Subcommand parity map (reference file:line):
- ``wordcount/charcount/loganalysis`` -> the four ``rand*`` programs the
  reference registers in its ProgramDriver (ExampleDriver.java:39-46, C5),
  with the same positional contract ``<in> <out> [ratio | conf,err,bits]``
  (RandomizedWordCount.java:74-78, RandomSamplingUtil.java:125-153, C3).
  Output is key-sorted TSV part files (S5, TextOutputFormat parity) and the
  sampling report printed to stdout (RandomSamplingUtil.java:318-323, A5) —
  pipe/tail it exactly like the reference's shell scripts do
  (randWordCount.sh:25-26).
- ``compare`` -> RSMRResultComparator.java: scale-up sampled TSV runs by
  1/ratio and print the relative-L1 [Data error rate] per run (:66-82).
- ``solve-ratio`` -> the accuracy->ratio planner alone (A2/A3,
  RandomSamplingUtil.java:380-382).
- ``list``/``run`` -> the engine's catalog (every SURVEY.md §2 query).
"""

from __future__ import annotations

import argparse
import sys

from .sampling.config import SamplingConfig


def _spark(args):
    from .session import get_spark

    return get_spark("rsmr-cli", master=getattr(args, "master", None))


def _sampled_lines(spark, path: str, spec: str | None):
    from .sources.text import read_text_sampled

    cfg = SamplingConfig.from_cli(spec) if spec else SamplingConfig.exact()
    return read_text_sampled(spark, path, cfg)


def _finish(sf, counts, out_dir: str) -> None:
    """Write key-sorted TSV (raw sampled counts, like the reference — the
    comparator applies the scale-up), print the sampling report, and
    persist it as a JSON run-manifest beside the part files (the engine's
    replacement for the reference's ZooKeeper report znode,
    RandomSamplingUtil.java:318-324)."""
    import json
    import os

    from .sources.text import write_tsv

    key = counts.columns[0]
    write_tsv(counts, out_dir, sort_by=key)
    report = sf.report()
    print(report)
    with open(os.path.join(out_dir, "_SAMPLING_REPORT.json"), "w") as f:
        json.dump(report.as_dict(), f, indent=2)


def cmd_wordcount(args) -> None:
    from pyspark.sql import functions as F

    from .functions import text as T

    spark = _spark(args)
    sf = _sampled_lines(spark, args.input, args.sampling)
    words = sf.transform(
        lambda df: T.explode_words_reference(df, "value")
    )
    counts = words.df.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    _finish(sf, counts, args.output)


def cmd_charcount(args) -> None:
    from pyspark.sql import functions as F

    from .functions import text as T

    spark = _spark(args)
    sf = _sampled_lines(spark, args.input, args.sampling)
    chars = sf.transform(lambda df: T.explode_chars(df, "value"))
    counts = chars.df.groupBy("ch").agg(F.count(F.lit(1)).alias("cnt"))
    _finish(sf, counts, args.output)


def cmd_loganalysis(args) -> None:
    from .sources.apache_log import LOG_TASKS, parse_apache_log

    spark = _spark(args)
    sf = _sampled_lines(spark, args.input, args.sampling)
    log = sf.transform(lambda df: parse_apache_log(df, "value"))
    counts = LOG_TASKS[args.task](log.df)
    _finish(sf, counts, args.output)


def cmd_compare(args) -> None:
    """[Data error rate] of each sampled TSV run vs the base run.

    ``runs`` are ``ratio:dir`` pairs; the first is the base (the reference
    passes the base ratio first, RSMRResultComparator.java:16-19)."""
    from pyspark.sql import functions as F

    from .operators.evaluate import rel_l1_error

    spark = _spark(args)

    def read_run(d):
        df = spark.read.option("sep", "\t").csv(d).toDF("key", "cnt")
        return df.select("key", F.col("cnt").cast("double").alias("cnt"))

    (base_ratio, base_dir), rest = _parse_runs(args.runs)
    base = read_run(base_dir).select(
        "key", (F.col("cnt") / base_ratio).alias("cnt")
    )
    for ratio, d in rest:
        approx = read_run(d).select("key", (F.col("cnt") / ratio).alias("est"))
        err = rel_l1_error(base, approx, "key", exact_col="cnt", approx_col="est")
        print(f"[Sample rate] {ratio}")
        print(f"[Data error rate] {err}")


def _parse_runs(runs: list[str]) -> tuple[tuple[float, str], list[tuple[float, str]]]:
    parsed = []
    for r in runs:
        ratio, _, d = r.partition(":")
        if not d:
            raise SystemExit(f"expected ratio:dir, got {r!r}")
        parsed.append((float(ratio), d))
    return parsed[0], parsed[1:]


def cmd_solve_ratio(args) -> None:
    cfg = SamplingConfig.from_cli(args.spec)
    print(f"[Resolved sample rate] {cfg.resolve()}")
    print(f"[Predicted error rate] {cfg.predicted_error()}")
    print(f"[Confidence level] {cfg.confidence}")


def cmd_list(args) -> None:
    from .plans.catalog import QUERIES

    for name, q in sorted(QUERIES.items()):
        oracle = "sql-oracle" if q.oracle else "rows-only"
        print(f"{name:32s} [{oracle}] {q.doc}")


def cmd_run(args) -> None:
    from .plans.catalog import QUERIES
    from .sources.text import write_tsv

    spark = _spark(args)
    if args.query not in QUERIES:
        raise SystemExit(f"unknown query {args.query!r}; see `list`")
    df = QUERIES[args.query].spark(spark, args.sf_dir)
    if args.output:
        write_tsv(df, args.output, sort_by=df.columns[0])
    else:
        df.show(args.show, truncate=False)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="random_sampling_based_approximate_mapreduce_spark",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("--master", default=None, help="Spark master (default local[$SPARK_GRAFT_CPUS])")
    sub = p.add_subparsers(dest="cmd", required=True)

    for name, fn, extra in (
        ("wordcount", cmd_wordcount, None),
        ("charcount", cmd_charcount, None),
        ("loganalysis", cmd_loganalysis, "task"),
    ):
        sp = sub.add_parser(name, help=f"randomized {name} over a text file")
        if extra:
            sp.add_argument("task", choices=["hack", "host", "dateweek", "size", "totalsize", "pagesize", "page"])
        sp.add_argument("input")
        sp.add_argument("output")
        sp.add_argument("sampling", nargs="?", default=None, help="ratio or conf,err,bits (default exact)")
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("compare", help="data-error-rate of sampled runs vs base")
    sp.add_argument("runs", nargs="+", help="ratio:dir pairs, base first")
    sp.set_defaults(fn=cmd_compare)

    sp = sub.add_parser("solve-ratio", help="accuracy spec -> sampling ratio")
    sp.add_argument("spec", help="ratio or conf,err,bits")
    sp.set_defaults(fn=cmd_solve_ratio)

    sp = sub.add_parser("list", help="list catalog queries")
    sp.set_defaults(fn=cmd_list)

    sp = sub.add_parser("run", help="run a catalog query")
    sp.add_argument("query")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sp.add_argument("--output", default=None, help="write key-sorted TSV here instead of show()")
    sp.add_argument("--show", type=int, default=20)
    sp.set_defaults(fn=cmd_run)
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
