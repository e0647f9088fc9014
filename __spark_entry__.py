"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``random_sampling_based_approximate_mapreduce_spark``
package (imported as ``rsmr``); this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from random_sampling_based_approximate_mapreduce_spark.plans import catalog as _catalog
from random_sampling_based_approximate_mapreduce_spark.session import configure_existing

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's flagship pipeline: sampled scan -> word explode ->
    HT-scaled counts (RandomizedWordCount end-to-end), exact-mode so the
    result is deterministic.
    """
    configure_existing(spark)
    return _catalog.QUERIES["word_count"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-able query."""
    return _catalog.oracle_sql()
