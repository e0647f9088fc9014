"""Data-layout writers: multi-dimensional clustering for scan pruning.

A single-column sort gives min/max file skipping on that column only.
``write_zordered`` range-writes by a Morton key over two columns so every
file's footer bounds BOTH dimensions — filters on either column prune
files/row-groups at the scan (tests/test_scale_layout.py measures the
footers directly). This is the lakehouse layout move for tables queried
by more than one predicate column (events by user OR by time).

At 100 TB the min/max normalization pass is a catalog statistic (or one
cheap column agg); everything else is one range shuffle + a parquet
write — the same cost as any sorted write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.zorder import z_value


def zorder_key(
    df: DataFrame,
    dim_a: str,
    dim_b: str,
    bits: int = 12,
    bounds_a: tuple[int, int] | None = None,
    bounds_b: tuple[int, int] | None = None,
) -> DataFrame:
    """Add a ``__zval`` Morton key over two numeric columns.

    Each dimension is scaled onto its FULL ``bits``-wide lane from its
    (lo, hi) bounds. Comparable lane widths are REQUIRED: an unscaled
    narrow dimension fills only low bits and the interleave degenerates
    into a sort on the wide one.

    ``bounds_a`` / ``bounds_b``: precomputed (lo, hi) per dimension — at
    cluster scale these come from catalog statistics, skipping the
    min/max scan entirely. When omitted, ONE driver-side agg over ``df``
    computes them (an extra full scan per call — fine for a one-time
    layout write, wasteful in a loop: pass bounds there).
    """
    if bounds_a is None or bounds_b is None:
        b = df.agg(
            F.min(dim_a), F.max(dim_a), F.min(dim_b), F.max(dim_b)
        ).first()
        scanned_a, scanned_b = (b[0], b[1]), (b[2], b[3])
        bounds_a = bounds_a or scanned_a
        bounds_b = bounds_b or scanned_b
    a_lo, a_hi = bounds_a
    b_lo, b_hi = bounds_b
    if a_lo is None or a_hi is None or b_lo is None or b_hi is None:
        raise ValueError(
            f"zorder_key needs non-null ({dim_a}, {dim_b}) bounds; got "
            f"{bounds_a} / {bounds_b} — empty input frame or all-null "
            "dimension column (nothing to lay out)"
        )
    lane = 1 << bits
    a_span = max(1, int(a_hi) - int(a_lo) + 1)
    b_span = max(1, int(b_hi) - int(b_lo) + 1)
    # Clamp to [0, lane-1]: caller-supplied catalog bounds can be stale
    # relative to the data, and an out-of-range value would otherwise
    # scale past its lane (or go negative, leaking sign bits through the
    # interleave) and alias into the wrong z cell, silently degrading
    # clustering and footer pruning.
    # cast the difference to LONG before the lane multiply: a 32-bit
    # dimension with span > 2^31/lane would overflow the int-preserving
    # product (ANSI error, or silent negative lanes without ANSI) —
    # the same hazard replicate_table guards (review r8)
    ua = (
        (F.col(dim_a) - F.lit(a_lo)).cast("long") * lane / F.lit(a_span)
    ).cast("long")
    ub = (
        (F.col(dim_b) - F.lit(b_lo)).cast("long") * lane / F.lit(b_span)
    ).cast("long")
    ua = F.greatest(F.lit(0), F.least(F.lit(lane - 1), ua))
    ub = F.greatest(F.lit(0), F.least(F.lit(lane - 1), ub))
    return df.withColumn("__zval", z_value(ua, ub, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    dim_a: str,
    dim_b: str,
    bits: int = 12,
    n_files: int | None = None,
    bounds_a: tuple[int, int] | None = None,
    bounds_b: tuple[int, int] | None = None,
) -> None:
    """Range-write ``df`` to parquet clustered by the (dim_a, dim_b)
    Morton key; drop the key from the stored schema.

    ``n_files`` controls pruning granularity: each output file covers a
    contiguous z-range, i.e. an approximate rectangle in (a, b) space —
    more files, finer rectangles, better skipping (and smaller tasks).
    ``bounds_a``/``bounds_b`` forward to ``zorder_key`` (catalog stats
    instead of a min/max scan).
    """
    spark = df.sparkSession
    n = n_files or spark.sparkContext.defaultParallelism
    keyed = zorder_key(df, dim_a, dim_b, bits, bounds_a=bounds_a, bounds_b=bounds_b)
    (
        keyed.repartitionByRange(n, "__zval")
        .sortWithinPartitions("__zval")
        .drop("__zval")
        .write.mode("overwrite")
        .parquet(path)
    )


_FOOTER_SAMPLE = 64


def _footer_sample(paths: list) -> list:
    """Evenly-strided sample of at most ``_FOOTER_SAMPLE`` paths.

    Ceil-based stride so the bound actually holds: a floored stride
    (``n // 64``) reads up to ~2x the budget — n=127 gives stride 1,
    i.e. all 127 footers (ADVICE r5). The trailing slice guards the
    one-over case ceil division can still produce.
    """
    n = len(paths)
    if n <= _FOOTER_SAMPLE:
        return paths
    return paths[:: -(-n // _FOOTER_SAMPLE)][:_FOOTER_SAMPLE]


def compact_files(
    spark,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
    sort_by: "list[str] | None" = None,
) -> int:
    """Small-files compaction — the table-maintenance job every long-lived
    lake table needs: streaming sinks and incremental appends accumulate
    tiny files, and at 100 TB the NAMENODE listing plus per-file open cost
    dominates scans long before data volume does (a 100k-file partition
    costs 100k S3 GETs per reader just to start).

    Reads the parquet layout at ``src``, rewrites it to ``dst`` sized at
    ``target_file_bytes`` per output file (estimated from the INPUT's
    on-disk bytes — compression-representative, no data scan needed for
    the estimate), optionally re-sorting within files to restore
    clustering stats. Returns the output file count.

    Deliberately a REWRITE to a new path + atomic swap by the caller, not
    an in-place mutation: readers of ``src`` stay consistent during the
    compaction (the poor man's snapshot isolation; a table format's
    commit protocol replaces the swap at production scale).
    """
    import os

    import pyarrow.parquet as pq

    paths = [
        os.path.join(root, f)
        for root, _, files in os.walk(src)
        for f in files
        if f.endswith(".parquet")
    ]
    total_bytes = sum(os.path.getsize(p) for p in paths)
    n_in = len(paths)
    if n_in == 0:
        # fail here with a layout-level message instead of letting
        # spark.read.parquet raise an opaque path error (ADVICE r4)
        raise FileNotFoundError(
            f"compact_files: no .parquet files under {src!r} — nothing to "
            "compact (wrong path, or the table was written with a "
            "different extension/layout?)"
        )
    # rows-per-byte rate for the skew cap below: footer reads are one
    # driver round trip per file, so SAMPLE a bounded number (size stats
    # are cheap; footers are not at 100k files on object storage) and
    # extrapolate — the cap is advisory, not exact
    sample = _footer_sample(paths)
    sampled_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in sample)
    sampled_bytes = sum(os.path.getsize(p) for p in sample)
    rows_in = (
        int(sampled_rows * total_bytes / sampled_bytes) if sampled_bytes else 0
    )
    import math

    # ceil, not round: the target is a per-file MAXIMUM (block/split
    # alignment) — round() would let a 190 MB input produce one 190 MB
    # file against a 128 MB target
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(src)
    # n_out splits by ROWS while the target is BYTES: under row-size skew
    # a partition can exceed the per-file target, so belt-and-braces cap
    # each file's row count at the input's observed rows-per-byte rate
    # (maxRecordsPerFile makes the writer roll a new file past the cap;
    # approximate by design, exact enough to bound the skew overshoot).
    # rows_in comes from the parquet footers read above — no Spark job.
    writer = df.repartition(n_out)
    if sort_by:
        writer = writer.sortWithinPartitions(*sort_by)
    opts = writer.write.mode("overwrite")
    if rows_in > 0 and total_bytes > 0:
        rows_per_file_cap = max(1, int(rows_in * target_file_bytes / total_bytes * 1.25))
        opts = opts.option("maxRecordsPerFile", rows_per_file_cap)
    opts.parquet(dst)
    return sum(
        1
        for root, _, files in os.walk(dst)
        for f in files
        if f.endswith(".parquet")
    )
