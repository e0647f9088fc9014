"""Hash-deterministic sampling — reproducible across engines and replays.

The reference's RNG sampling (and ``df.sample``) is only reproducible
within one engine given one seed. Hash-based sampling decides each row
from a HASH of its key: the same rows are selected on any engine that
computes the same hash — so these samplers are value-checkable against
the DuckDB oracle end-to-end (the RNG path can only ever get rows-only
checks), replay-stable under task retries, and stable across cluster
topologies. The trade-off: rows with equal keys sample together
(select a unique key), and the "randomness" is fixed by the seed — no
fresh draw per run.

- ``hash_bernoulli``: keep a row iff hash(key, seed) mod M < ratio*M.
  The batch twin of streaming.sample_stream (which uses xxhash64 for
  speed; here md5-derived hash64 buys SQL reproducibility).
- ``exact_k_sample``: the k rows with the smallest hash priorities — an
  exact-size uniform sample. Plans as TakeOrderedAndProject (per-
  partition top-k then driver merge), NOT a full sort-shuffle, so it
  scales to any corpus for k up to millions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql

_BUCKETS = 1_000_000


def _priority(key: Column, seed: int) -> Column:
    return hash64(F.concat(key.cast("string"), F.lit(f"#{seed}")))


def _priority_sql(key_expr: str, seed: int) -> str:
    return hash64_sql(f"({key_expr})::VARCHAR || '#{seed}'")


def hash_bernoulli(df: DataFrame, key_col: str, ratio: float, seed: int = 42) -> DataFrame:
    """Deterministic Bernoulli(ratio) by key hash; HT scale-up = 1/ratio."""
    pri = F.pmod(_priority(F.col(key_col), seed), F.lit(_BUCKETS))
    return df.where(pri < int(ratio * _BUCKETS))


def hash_bernoulli_sql(key_expr: str, ratio: float, seed: int = 42) -> str:
    """DuckDB WHERE-clause mirror of hash_bernoulli."""
    return f"(({_priority_sql(key_expr, seed)}) % {_BUCKETS}) < {int(ratio * _BUCKETS)}"


def exact_k_sample(df: DataFrame, key_col: str, k: int, seed: int = 42) -> DataFrame:
    """Exactly-k uniform sample: k smallest hash priorities (ties by key).

    ``orderBy(priority).limit(k)`` plans as TakeOrderedAndProject — each
    partition keeps its local top-k and the driver merges, no global
    sort exchange (verify with .explain).
    """
    pri = _priority(F.col(key_col), seed)
    return df.orderBy(pri.asc(), F.col(key_col).asc()).limit(k)


def exact_k_sample_sql(table: str, key_expr: str, k: int, seed: int = 42) -> str:
    """DuckDB mirror (ORDER BY the same hash priority)."""
    return f"SELECT * FROM {table} ORDER BY {_priority_sql(key_expr, seed)}, {key_expr} LIMIT {k}"
