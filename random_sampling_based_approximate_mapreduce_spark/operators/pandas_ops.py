"""Grouped Pandas operators (applyInPandas) — the escape hatch for
per-group algorithms Spark's built-ins can't express.

Discipline (SURVEY.md §7 / docs/SCALE.md): built-in Column expressions
first, Arrow-batched Pandas second, row-Python never. ``applyInPandas``
shuffles once on the group key and hands each group to a Python worker as
one pandas frame — right for ITERATIVE per-group recurrences (EWMA, state
machines) where window functions can't reach, and only when a single
group fits worker memory (true for per-key time series; NOT for "group =
whole table").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def grouped_ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.1,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-key EWMA over event-time order: s_t = alpha*x_t + (1-alpha)*s_{t-1}.

    The recurrence makes every output depend on ALL earlier rows of the
    key — inexpressible as a window aggregate (Spark has no recursive
    window) — so this is a legitimate applyInPandas case: one shuffle on
    the key, pandas ``ewm`` per group, event-time sorted within the group.

    ``tiebreak_cols`` extends the within-group sort beyond ``ts_col`` so
    the recurrence order is DETERMINISTIC under timestamp ties (pandas'
    stable sort would otherwise inherit arbitrary shuffle arrival order).
    Pass a unique key (e.g. ``("event_id",)``) whenever timestamps can
    collide — it is also what makes the closed-form SQL oracle
    (catalog ``events_ewma``) reproducible.
    """
    cols = [key_col, ts_col, *tiebreak_cols, value_col]
    out_schema = StructType(
        [df.schema[c] for c in cols] + [StructField("ewma", DoubleType())]
    )

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, *tiebreak_cols], kind="stable")
        out = pdf[cols].copy()
        out["ewma"] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return out

    return df.select(*cols).groupBy(key_col).applyInPandas(ewma, schema=out_schema)
