"""Engine-exact decimal rounding for value-oracled float outputs.

Why ``F.round`` is NOT cross-engine stable: Spark's ``Round`` converts a
double to ``BigDecimal.valueOf(v)`` — i.e. the value's SHORTEST decimal
representation (``Double.toString``) — and then rounds that string
HALF_UP. DuckDB (and C/C++ engines generally) round the RAW double:
``sign(x) * floor(|v * 10^d| + 0.5) / 10^d`` — half away from zero on
the double PRODUCT. The two agree almost everywhere, but whenever a
rational quotient's shortest repr terminates exactly on a half-grid tie
(``263.07075`` at 4 digits, ``3.075`` at 2) the engines pick opposite
sides: the double below the tie reads "…075" to Java's shortest-repr
HALF_UP (rounds up) while DuckDB sees the raw "…074999…" (rounds down).
With a handful of rows the tie is never hit; at sf0.1 row counts it is —
two driver-oracle mismatches across rounds (``embedding_dim_stats`` r5,
``weighted_sampled_tokens`` r6) were exactly this class.

``sql_round`` reproduces the DuckDB recipe in pure double arithmetic so
every rounded output hashes identically against a DuckDB oracle that
uses its native ``round`` — no SQL-side changes needed. The recipe was
pinned empirically against DuckDB over 6k+ random and adversarial
values at 4 precisions (zero mismatches, including exact half-integer
products, negatives, and magnitudes where +0.5 is absorbed).

Implementation notes:
- floor is computed as ``y - pmod(y, 1.0)`` (exact: fmod introduces no
  rounding), NOT ``F.floor`` — Spark's floor returns LONG, which under
  ANSI mode throws on products beyond int64 range; this stays double
  end-to-end exactly like the C recipe.
- Everything is built-in Column arithmetic — whole-stage codegen, no
  UDF, negligible cost over ``F.round``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_round(col: "Column | str", digits: int = 0) -> Column:
    """Round a double Column to ``digits`` decimals with C/DuckDB
    semantics (half away from zero on the raw double product). Drop-in
    replacement for ``F.round`` in value-oracled outputs."""
    c = F.col(col) if isinstance(col, str) else col
    scale = F.lit(float(10.0 ** digits))
    x = c.cast("double") * scale
    y = F.abs(x) + F.lit(0.5)
    fl = y - F.pmod(y, F.lit(1.0))
    return F.when(x < F.lit(0.0), -fl).otherwise(fl) / scale
