#!/usr/bin/env python
"""Shuffle-byte accounting for the Bloom semi-join reduction.

operators/bloom.py claims the md5-bucket broadcast semi-join sheds the
fact side's non-joining rows BEFORE the join exchange, cutting shuffle
volume by ~the dim predicate's selectivity at the cost of one map-side
hash probe. This tool measures that in bytes on the bloom_semi_join
query's exact shape (urgent orders ~20% selectivity, merge-hinted SMJ):
the same aggregate is run with and without the prefilter and per-stage
shuffle write/read bytes are summed via the Spark UI REST API.

Usage: python tools/measure_bloom.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from measure_shuffle import measure  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from random_sampling_based_approximate_mapreduce_spark.operators.bloom import bloom_semi_join
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

    # the engine session disables the UI; this tool needs the REST API
    spark = get_spark("bloom-audit", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linestatus", "l_quantity")
    urgent = (
        load(spark, SF_DIR, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    n_li, n_urgent = li.count(), urgent.count()
    print(f"lineitem {n_li} rows; urgent orders {n_urgent}")

    def agg(left):
        j = left.join(urgent.hint("merge"), left["l_orderkey"] == urgent["o_orderkey"])
        return j.groupBy("l_linestatus").agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )

    reduced = bloom_semi_join(li, "l_orderkey", urgent, "o_orderkey")
    n_reduced = reduced.count()
    matching = li.join(urgent, li.l_orderkey == urgent.o_orderkey, "left_semi").count()
    print(
        f"bloom keeps {n_reduced} rows ({n_reduced / n_li:.1%}); exact "
        f"semi-join {matching} ({matching / n_li:.1%}); false-positive "
        f"overhead {(n_reduced - matching) / max(1, n_li):.2%} of the table"
    )

    measure(spark, "plain merge join", agg(li))
    measure(spark, "bloom-prefiltered", agg(reduced))


if __name__ == "__main__":
    main()
