"""Deterministic Poisson bootstrap — CIs for aggregates WITHOUT a
closed-form variance, in one distributed pass.

The engine's closed-form CI surfaces (approx_count/sum/mean/ratio,
weighted_count/sum, the order-statistic quantile interval) cover the
estimators whose variance has a derivation. The bootstrap is the
general-purpose fallback practitioners reach for when it does not —
and the POISSON bootstrap is its scalable form (the classic streaming/
MapReduce reformulation): instead of drawing B multinomial resamples
(which needs the global row count and B passes), every row carries B
independent Poisson(1) multipliers, and replicate b's estimate is the
aggregate weighted by multiplier b. E[m]=1 reproduces the sample;
Var[m]=1 reproduces multinomial resampling variability asymptotically.
One pass, map-side partial aggregation; the shuffle carries (group,
replicate) partials — B times more GROUP ROWS, not data rows.

Determinism discipline: the multipliers are NOT engine RNG — multiplier
b of a row is the inverse-CDF of Poisson(1) applied to the row-key +
replicate hash uniform (the same md5 chain as hash_bernoulli), so the
entire replicate table — and therefore the CI itself — reproduces
bit-for-bit in DuckDB. The variance is computed from exact integer
replicate sums via explicit moments (sum, sum of squares), one sqrt at
the end; the catalog twin keeps every Sr^2 below 2^53 so even the
squared sums are exact integer-valued doubles in both engines.

Statistical honesty: the bootstrap estimates the MULTINOMIAL-resampling
variability of the aggregate over the GIVEN frame. For a Bernoulli(r)
sample it therefore over-states the HT sampling variance by the missing
finite-population factor (no (1-r): resampling can't know the frame is
a without-replacement draw) — conservative, ~5% wide at r=0.1, pinned
against the closed form in tests. Use the closed forms where they
exist; bootstrap what they don't cover.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import stats
from .deterministic import _BUCKETS, _priority, _priority_sql

# cumulative Poisson(1) CDF, k = 0..7; P(K >= 8) ~ 1e-6 truncated to 8
# (bias ~1e-6 on E[m], far below replicate noise). Python-computed
# doubles, embedded identically in the Spark plan and the SQL mirror.
_POISSON1_CUM = []
_acc = 0.0
for _k in range(8):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POISSON1_CUM.append(_acc)


def _uniform(key: Column, rep: Column, seed: int) -> Column:
    # F.concat (NULL-propagating, like SQL ||), NOT concat_ws (which
    # skips NULLs): a NULL key then yields a NULL uniform, every CASE
    # branch misses, and BOTH engines land on the constant tail
    # multiplier — mirror-consistent, though statistically degenerate;
    # callers must provide row-identifying non-null keys (docstring).
    keyrep = F.concat(key.cast("string"), F.lit("|"), rep.cast("string"))
    return F.pmod(_priority(keyrep, seed), F.lit(_BUCKETS)).cast("double") / F.lit(
        float(_BUCKETS)
    )


def _uniform_sql(key_expr: str, rep_expr: str, seed: int) -> str:
    keyrep = f"({key_expr})::VARCHAR || '|' || ({rep_expr})::VARCHAR"
    return (
        f"(CAST(({_priority_sql(keyrep, seed)}) % {_BUCKETS} AS DOUBLE)"
        f" / {float(_BUCKETS)})"
    )


def _multiplier(u: Column) -> Column:
    m = None
    for k, c in enumerate(_POISSON1_CUM):
        m = F.when(u < F.lit(c), F.lit(k)) if m is None else m.when(
            u < F.lit(c), F.lit(k)
        )
    return m.otherwise(F.lit(8))


def _multiplier_sql(u_expr: str) -> str:
    whens = " ".join(
        f"WHEN {u_expr} < {c!r} THEN {k}" for k, c in enumerate(_POISSON1_CUM)
    )
    return f"CASE {whens} ELSE 8 END"


def poisson_bootstrap_sum(
    df: DataFrame,
    value_col: str,
    key_col: str,
    *group_cols: str,
    n_replicates: int = 64,
    seed: int = 42,
    confidence: float = 0.95,
    alias: str = "est_sum",
) -> DataFrame:
    """Per-group sum with a deterministic Poisson-bootstrap CI.

    Output: ``alias`` (the plain sum, untouched by the bootstrap) and
    ``{alias}_ci`` = z * sd over ``n_replicates`` multiplier-weighted
    replicate sums. ``key_col`` names the RESAMPLING UNIT and seeds the
    multiplier hash; replicate b of a row is a pure function of
    (key, b, seed), so the whole computation is value-oracle-able via
    ``poisson_bootstrap_sum_sql``-style mirrors.

    CLUSTER bootstrap for free: rows sharing a key draw the SAME
    multiplier (the hash sees only the key value), so passing a
    cluster id — e.g. the LEFT-row id over a ``join_weighted_left``
    frame, where a kept left row's matched pairs and its signed
    correction row are one dependent unit — resamples whole clusters
    together. That is the standard cluster bootstrap, and it is the
    interval for the weighted-join estimands whose closed forms the
    engine deliberately refuses (the signed-weight honesty guards):
    valid when clusters are independent, i.e. the join key is unique
    on the clustered side (PK-FK). Pass a row-unique key only when
    rows genuinely are independent.

    The point estimate is computed ONCE, inside replicate 0's partial
    aggregate (every replicate covers the same rows, so any replicate's
    unweighted sum is THE sum) — not as a max over all replicates,
    which for non-integer doubles would pick the largest
    rounding-ordering of the same value (upward-biased in last ulps)
    and compute it B times redundantly (ADVICE r7).

    100 TB shape: one explode by replicate id (xB CPU on the value
    column only — the inherent bootstrap cost) into a partial-aggregated
    shuffle keyed (group, replicate); the final per-group reduction sees
    B rows per group. No second pass, no driver math, no RNG state.
    """
    if n_replicates < 2:
        raise ValueError(f"n_replicates must be >= 2, got {n_replicates}")
    gs = [F.col(c) for c in group_cols]
    z = stats.z_score(confidence)
    reps = F.explode(F.array(*[F.lit(i) for i in range(n_replicates)]))
    d = df.select(
        *gs,
        F.col(key_col).alias("__bk"),
        F.col(value_col).alias("__x"),
    ).withColumn("__rep", reps)
    m = _multiplier(_uniform(F.col("__bk"), F.col("__rep"), seed))
    per = d.groupBy(*gs, F.col("__rep")).agg(
        F.sum(F.col("__x") * m).alias("__sr"),
        # plain sum materialized only in replicate 0's row; NULL elsewhere
        F.sum(F.when(F.col("__rep") == F.lit(0), F.col("__x"))).alias("__s"),
    )
    srd = F.col("__sr").cast("double")
    rn = float(n_replicates)
    base = per.groupBy(*gs) if group_cols else per.groupBy()
    agged = base.agg(
        F.max("__s").alias(alias),  # max over {the one non-NULL}: a pick, not a compare
        F.sum(srd).alias("__ssum"),
        F.sum(srd * srd).alias("__ssq"),
    )
    var = (
        F.col("__ssq") - F.col("__ssum") * F.col("__ssum") / F.lit(rn)
    ) / F.lit(rn - 1.0)
    return agged.select(
        *gs,
        F.col(alias),
        (F.lit(z) * F.sqrt(F.greatest(var, F.lit(0.0)))).alias(f"{alias}_ci"),
    )


def weighted_quantile_bootstrap(
    df: DataFrame,
    value_col: str,
    p,
    *group_cols: str,
    key_col: str,
    weight_col: str = "__weight",
    n_replicates: int = 64,
    seed: int = 42,
    confidence: float = 0.95,
    min_support: int | None = None,
    alias: str = "est_quantile",
    scale_bits: int = 20,
) -> DataFrame:
    """``weighted_quantile`` + a deterministic Poisson-bootstrap CI —
    the interval the closed forms cannot supply (VERDICT r6/r7 item:
    the weighted CDF inverse was the one point-estimate-only estimator;
    the distribution-free binomial interval assumes EQUAL weights, so
    a stratified sample needs resampling instead).

    Output per group: ``{alias}{_pNN}`` (the plain weighted quantile,
    untouched by the bootstrap), ``..._ci_lo``/``..._ci_hi`` (the
    percentile-bootstrap interval: the discrete order statistics at
    ranks ceil(a/2*B) and ceil((1-a/2)*B) of the B replicate
    quantiles), plus the usual ``n_sampled``/``low_support`` honesty
    pair when ``min_support`` is set.

    Mechanics: every row is exploded into replicate -1 (multiplier 1 —
    the original sample, yielding the point estimate) and replicates
    0..B-1 with the same hash-deterministic Poisson(1) multipliers as
    ``poisson_bootstrap_sum`` (``key_col`` must identify rows); each
    replicate's weighted quantile is the CDF inverse over weights
    w * m, computed by the SAME ``weighted_quantile`` arithmetic
    (floor-quantized integer weights, RANGE cumulative frame), so the
    whole computation — point estimate, every replicate, and the rank
    selection — reproduces bit-for-bit in a DuckDB mirror.

    Statistical honesty: the percentile bootstrap estimates the
    multinomial-resampling variability of the weighted quantile over
    the GIVEN sample — asymptotically valid, conservative for
    Bernoulli designs (no finite-population shrink), and degrading on
    thin groups or extreme p exactly where ``low_support`` fires.
    Replicates where a group's every multiplier is 0 yield a NULL
    replicate quantile and drop out of the rank selection (B shrinks
    for that group rather than admitting a fabricated value).

    100 TB shape: one explode by replicate id (x(B+1) rows into the
    quantile's hash-shuffle, partitioned by (group, replicate) — B
    more SORT TASKS, not a bigger sort), then a per-group reduction
    over <= B+1 rows. The bootstrap's inherent cost; sample harder if
    it hurts.
    """
    from .sampled_frame import _normalize_quantile_ps, weighted_quantile

    if n_replicates < 2:
        raise ValueError(f"n_replicates must be >= 2, got {n_replicates}")
    ps, sfx = _normalize_quantile_ps(p)
    gs = [F.col(c) for c in group_cols]
    reps = F.explode(F.array(*[F.lit(i) for i in range(-1, n_replicates)]))
    d = df.select(
        *gs,
        F.col(key_col).alias("__bk"),
        F.col(value_col).alias("__v"),
        F.col(weight_col).cast("double").alias("__w"),
    ).withColumn("__rep", reps)
    m = F.when(F.col("__rep") == F.lit(-1), F.lit(1)).otherwise(
        _multiplier(_uniform(F.col("__bk"), F.col("__rep"), seed))
    )
    d = d.withColumn("__wm", F.col("__w") * m.cast("double"))
    per = weighted_quantile(
        d,
        "__v",
        p,  # pass the ORIGINAL p: suffix derivation must agree between
        # the inner call and this function's own sfx ([0.5] is a list,
        # so it gets '_p50' suffixes; review r8: unwrapping it to a
        # scalar here made the inner aliases unsuffixed and the outer
        # column references crash)
        *(list(group_cols) + ["__rep"]),
        weight_col="__wm",
        min_support=min_support,
        alias="__q",
        scale_bits=scale_bits,
    )
    alpha = 1.0 - confidence
    base = per.groupBy(*gs) if group_cols else per.groupBy()
    aggs: list = []
    for q in ps:
        qc = F.col(f"__q{sfx(q)}")
        est = F.max(F.when(F.col("__rep") == F.lit(-1), qc))
        arr = F.array_sort(
            F.collect_list(F.when(F.col("__rep") >= F.lit(0), qc))
        )
        # ranks scale with the surviving replicate count (NULL replicate
        # quantiles drop out of collect_list)
        nrep = F.size(arr).cast("double")
        lo_k = F.greatest(
            F.lit(1), F.ceil(F.lit(0.5 * alpha) * nrep).cast("int")
        )
        hi_k = F.greatest(
            F.lit(1), F.ceil(F.lit(1.0 - 0.5 * alpha) * nrep).cast("int")
        )
        aggs.append(est.alias(f"{alias}{sfx(q)}"))
        # the CI bounds inherit the signed-weight guard through the
        # rep=-1 quantile: replicate m=0 draws zero out a negative
        # weight (-w * 0 == -0.0, quantized to 0), so SOME replicates
        # of a poisoned group pass the per-replicate guard — but the
        # original sample (m=1) always sees the negative weight, so a
        # NULL point estimate nullifies the interval too.
        aggs.append(
            F.when(est.isNotNull(), F.get(arr, lo_k - F.lit(1))).alias(
                f"{alias}{sfx(q)}_ci_lo"
            )
        )
        aggs.append(
            F.when(est.isNotNull(), F.get(arr, hi_k - F.lit(1))).alias(
                f"{alias}{sfx(q)}_ci_hi"
            )
        )
    if min_support is not None:
        n0 = F.max(F.when(F.col("__rep") == F.lit(-1), F.col("n_sampled")))
        aggs.append(n0.alias("n_sampled"))
        aggs.append((n0 < F.lit(int(min_support))).alias("low_support"))
    return base.agg(*aggs)
