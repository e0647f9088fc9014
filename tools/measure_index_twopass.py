#!/usr/bin/env python
"""Measure the two-pass inverted-index build vs the naive one-pass form.

plans/catalog.py (bigram_inverted_index) claims: computing df first and
aggregating posting lists ONLY for surviving rare grams avoids ever running
collect_list on a stopword-gram key. The naive one-pass form aggregates a
posting list for EVERY gram and filters afterwards — at scale the heavy
grams' lists are the memory hazard, and their rows dominate the shuffle.

This tool replicates the documents corpus (distinct doc_ids, same text, so
every gram's df scales by the factor) and measures both forms' shuffle
bytes and walls; results asserted identical. The df band is kept at the
catalog's absolute <= 5, so replication ALSO models the selectivity shift
at scale: heavier corpus -> rarer band -> the two-pass filter drops a
larger fraction before the expensive aggregate.

Usage: python tools/measure_index_twopass.py [replicas] [df_cap]
(defaults 20 and 5*replicas — the scaled cap keeps the same gram band
selected as at 1x, so the posting-list aggregate genuinely runs; pass 5
to model the absolute band, where scale-up empties it and the two-pass
filter drops everything before the expensive aggregate)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from measure_shuffle import measure  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(spark, label, df):
    from statistics import median

    df.write.format("noop").mode("overwrite").save()  # unmeasured warmup
    walls = []
    for i in range(3):
        t0 = time.monotonic()
        if i == 0:
            measure(spark, label, df)
        else:
            df.write.format("noop").mode("overwrite").save()
        walls.append(time.monotonic() - t0)
    print(f"{'':>22}  wall median {median(walls):6.2f} s  (runs: "
          + ", ".join(f"{w:.2f}" for w in walls) + ")")


def main() -> None:
    from pyspark.sql import functions as F

    from random_sampling_based_approximate_mapreduce_spark.functions import text as T
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    df_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 5 * replicas
    spark = get_spark("index-twopass-audit", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    base = load(spark, SF_DIR, "documents").select("doc_id", "text")
    n_base = base.count()
    docs = (
        spark.range(replicas)
        .crossJoin(base)
        .select((F.col("doc_id") * replicas + F.col("id")).alias("doc_id"), "text")
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    print(f"corpus: {docs.count()} docs ({replicas}x of {n_base})")

    bg = (
        T.with_word_shingles(docs, "text", 2)
        .select("doc_id", F.explode_outer("shingles").alias("bigram"))
        .where(F.col("bigram").isNotNull())
    )
    postings = F.concat_ws(
        ",", F.transform(F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string"))
    ).alias("postings")

    two_pass_df = (
        bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") <= df_cap)
    )
    two_pass = bg.join(F.broadcast(two_pass_df), "bigram").groupBy("bigram", "df").agg(postings)

    one_pass = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("df"), postings)
        .where(F.col("df") <= df_cap)
    )

    a = {tuple(r) for r in two_pass.collect()}
    b = {tuple(r) for r in one_pass.collect()}
    assert a == b, "index forms disagree"
    n_grams = bg.select("bigram").distinct().count()
    n_rare = two_pass_df.count()
    print(f"results identical: {len(a)} rare grams of {n_grams} total "
          f"(band keeps {n_rare / max(1, n_grams):.1%}); measuring...")

    _timed(spark, "two-pass (df first)", two_pass)
    _timed(spark, "one-pass collect_all", one_pass)

    # production two-pass: materialize the gram relation once so the df
    # pass and the posting pass share ONE tokenize (locally the double
    # tokenize is what the plain two-pass pays; at scale it's a second
    # full scan of the corpus)
    bg_ck = bg.localCheckpoint(eager=True)
    dfx_ck = (
        bg_ck.groupBy("bigram").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") <= df_cap)
    )
    two_pass_ck = (
        bg_ck.join(F.broadcast(dfx_ck), "bigram").groupBy("bigram", "df").agg(postings)
    )
    assert {tuple(r) for r in two_pass_ck.collect()} == a
    _timed(spark, "two-pass + checkpoint", two_pass_ck)
    spark.stop()


if __name__ == "__main__":
    main()
