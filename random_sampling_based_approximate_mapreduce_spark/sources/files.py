"""Generic file-format sources with scan-level sampling.

The reference plugs its sampling reader under text and XML inputs only;
on Spark, ``sample()`` composes with ANY DataFrame source, so every
format a training pipeline ingests gets the same observe -> sample ->
transform contract for free. DROPMALFORMED mode mirrors the
reference's silent malformed-row drop (P7) at the parser, before the
sample — so observed totals count parseable rows only.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sampling.config import SamplingConfig
from ..sampling.sampled_frame import SampledFrame

def read_csv_sampled(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    config: SamplingConfig | None = None,
    header: bool = True,
    drop_malformed: bool = True,
    **options,
) -> SampledFrame:
    """CSV scan -> SampledFrame. With a ``schema`` string, DROPMALFORMED
    discards unparseable lines (P7) before sampling, so totals count
    parseable rows."""
    mode = "DROPMALFORMED" if (schema is not None and drop_malformed) else "PERMISSIVE"
    reader = spark.read.option("header", str(header).lower()).option("mode", mode)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return SampledFrame.from_dataframe(reader.csv(path), config)


def read_json_sampled(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    config: SamplingConfig | None = None,
    drop_malformed: bool = True,
    **options,
) -> SampledFrame:
    """JSON-lines scan -> SampledFrame; same DROPMALFORMED contract."""
    mode = "DROPMALFORMED" if (schema is not None and drop_malformed) else "PERMISSIVE"
    reader = spark.read.option("mode", mode)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return SampledFrame.from_dataframe(reader.json(path), config)


def read_parquet_sampled(
    spark: SparkSession,
    path: str,
    config: SamplingConfig | None = None,
) -> SampledFrame:
    """Parquet scan -> SampledFrame (column pruning/pushdown still apply
    below the Sample node — project/filter ``.df`` and check the plan)."""
    return SampledFrame.from_dataframe(spark.read.parquet(path), config)
