"""Z-order (Morton) interleaving for multi-dimensional data layout.

At 100 TB, sorting/partitioning by ONE column gives min/max file skipping
on that column only; interleaving the bits of two (or more) columns into
one sort key gives useful min/max pruning on EACH dimension at once —
the standard lakehouse layout trick for workloads that filter on either
``user_id`` or ``ts`` (or both). The engine exposes the z-value as a pure
Column expression so it can feed ``repartitionByRange``/``sortWithin
Partitions`` before a parquet write; Catalyst folds the whole bit chain
into codegen (no UDF).

The same bit arithmetic is emitted as ANSI SQL for the DuckDB oracle —
z-values are deterministic, so layout queries are VALUE-checkable, unlike
RNG-based layout demos.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints (a even lanes,
    b odd lanes) into a single Morton key.

    Expression size is O(bits) shift-and-mask terms — folded by codegen
    into straight-line JVM bytecode; keep ``bits`` <= 21 so 2*bits stays
    inside a long's positive range with headroom.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(abit, 2 * i) + F.shiftleft(bbit, 2 * i + 1)
    return z


def z_value_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB mirror of :func:`z_value` (same lanes, same bit order)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({b} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
