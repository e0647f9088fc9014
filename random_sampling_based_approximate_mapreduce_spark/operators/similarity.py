"""Similarity search over embedding columns (array<float>).

- ``knn_brute_force``: exact top-k cosine neighbors — the correctness
  baseline, and genuinely the right plan when the query set is small
  (broadcast queries x one scan of the corpus; no shuffle of the corpus).
- ``ann_lsh``: random-hyperplane LSH (sign bits -> bucket key) — the scale
  path: candidates only within matching buckets, multi-probe via several
  independent tables. Recall vs. brute force is asserted in tests.

At 100 TB: brute force is O(corpus x queries) but embarrassingly parallel
and shuffle-free (queries broadcast); LSH turns it into a bucket-join whose
fan-out is controlled by planes/tables. An IVF variant would replace the
random planes with k-means centroids; the plumbing (bucket -> join -> rank)
is identical, so LSH is the representative implementation here.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vectors as V
from ..functions.rounding import np_sql_round, sql_round

_PLANE_SEED = 1234


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def knn_brute_force(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    arrow: bool = True,
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, rank, neighbor_id, cosine) — cosine rounded to 6dp
    BEFORE ranking so ordering is engine-stable; ties break on neighbor id.

    ``arrow=True`` (default): queries are collected driver-side (the small
    dim table they are — ENFORCED: the collect is probed with
    ``limit(max_queries + 1)`` and refused beyond ``max_queries`` rows,
    the dedup_clusters driver-guard pattern, so a caller passing a large
    frame gets a clear error instead of a driver OOM; raise the cap
    explicitly or use ``ann_lsh``/``knn_ivf`` for query sets that big),
    normalized once, and closed over a mapInPandas
    scorer — one numpy matmul per Arrow batch of the corpus, emitting only
    each batch's top-k candidates per query. Exact because top-k is
    decomposable: the global winner set is a subset of the per-batch
    winner sets under the same (-cosine, neighbor_id) order, which the
    final window re-applies. Shuffle volume drops from |corpus| x |queries|
    scored rows to k x |queries| per batch, and the scoring is BLAS rather
    than per-element interpreted HOF folds. The DuckDB brute-force oracle
    checks the result value-for-value.

    ``arrow=False`` keeps the pure-Column broadcast crossJoin + HOF cosine
    (the plan the SQL oracle mirrors literally).
    """
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    if not arrow:
        q = queries.select(
            F.col(id_col).alias(query_id_col), _as_double(F.col(vec_col)).alias("qv")
        )
        c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
        scored = F.broadcast(q).crossJoin(c).select(
            query_id_col,
            "neighbor_id",
            sql_round(V.cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
        return (
            scored.select(query_id_col, "neighbor_id", "cosine", F.row_number().over(w).alias("rank"))
            .where(F.col("rank") <= k)
        )

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    # limit-probed collect (VERDICT r8 item 4): one row past the cap is
    # enough to prove the frame is too big — never pull an unbounded
    # query side to the driver
    q_rows = (
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .limit(max_queries + 1)
        .collect()
    )
    if len(q_rows) > max_queries:
        raise ValueError(
            f"knn_brute_force(arrow=True): query frame exceeds "
            f"max_queries={max_queries} rows; it is collected to the "
            "driver and closed over the corpus scorer, so this would "
            "risk a driver OOM. Use ann_lsh/knn_ivf for large query "
            "sets, or raise max_queries explicitly if the driver has "
            "the memory."
        )
    if not q_rows:
        empty = corpus.sparkSession.createDataFrame(
            [], f"{query_id_col} long, neighbor_id long, cosine double, rank int"
        )
        return empty
    qids = np.array([r["qid"] for r in q_rows], dtype="int64")
    Q = np.vstack([np.asarray(r["qv"], dtype="float64") for r in q_rows])
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    Qn = (Q / np.where(qn == 0, 1.0, qn)).T  # dim x n_queries

    out_schema = StructType(
        [
            StructField(query_id_col, LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.vstack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            norms = np.linalg.norm(M, axis=1, keepdims=True)
            S = np_sql_round((M / np.where(norms == 0, 1.0, norms)) @ Qn, 6)
            ids = pdf[id_col].to_numpy(dtype="int64")
            out_q, out_n, out_c = [], [], []
            for j in range(S.shape[1]):
                # batch-local winners under the exact global order:
                # (-cosine, neighbor_id) ascending
                order = np.lexsort((ids, -S[:, j]))[:k]
                out_q.extend([int(qids[j])] * len(order))
                out_n.extend(ids[order].tolist())
                out_c.extend(S[order, j].tolist())
            yield pd.DataFrame({query_id_col: out_q, "neighbor_id": out_n, "cosine": out_c})

    cand = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    return (
        cand.select(query_id_col, "neighbor_id", "cosine", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
    )


def knn_brute_force_sql(k: int = 5, n_queries: int = 3) -> str:
    """DuckDB mirror over the embeddings view (queries = vec_id < n_queries)."""
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {n_queries}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_dot_product(q.qv, e.v) /
                   (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
      FROM q, e
    )
    SELECT query_id::BIGINT AS query_id, neighbor_id::BIGINT AS neighbor_id, cosine,
           rank::INT AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def hyperplanes(dim: int, n_planes: int, table: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (frozen seed per table)."""
    rnd = random.Random(_PLANE_SEED + 7919 * table)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id of a vector against fixed hyperplanes (a Column)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = V.dot(vec_col, plane)
        bucket = bucket + F.when(d >= 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    sample_cap: int = 4096,
    n_iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """k-means centroids trained driver-side on a bounded corpus sample.

    This is the standard IVF recipe (FAISS trains its coarse quantizer on a
    sample too): the TRAINING set is capped (deterministic hash-order
    sample, one small collect), so driver work is O(sample_cap x dim x
    iters) regardless of corpus size; the ASSIGNMENT stays distributed.
    Deterministic: seeded init, hash-ordered sample.
    """
    import numpy as np

    sample = (
        corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(sample_cap)
        .collect()
    )
    X = np.array([r["v"] for r in sample])
    rnd = np.random.RandomState(_PLANE_SEED)
    centroids = X[rnd.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(n_iters):
        # cosine k-means: assign by normalized dot, recenter, renormalize
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        Cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(Xn @ Cn.T, axis=1)
        for j in range(len(centroids)):
            members = X[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return [[float(x) for x in c] for c in centroids]



def assign_ivf(
    df: DataFrame,
    centroids: list[list[float]],
    n_probe: int = 1,
    vec_col: str = "v",
    round_dp: int | None = None,
) -> DataFrame:
    """Add ``cell`` (int) rows for the ``n_probe`` nearest centroids.

    n_probe=1 -> one row per vector (corpus-side inverted list); n_probe>1
    -> probe fan-out (query side).

    Scoring is a vectorized Pandas UDF: one numpy matmul per Arrow batch
    ((batch x dim) @ (dim x n_centroids)) + argsort top-n. Spark's
    higher-order array functions are interpreted per ELEMENT (not
    codegen'd), so the pure-Column form measured ~3s for just 2000x16x64
    multiplies; the Arrow/numpy path is the sanctioned fast lane for dense
    vector math (see pyspark_guide: Pandas UDFs beat row-Python 10-100x —
    the same applies vs per-element HOF evaluation).

    ``round_dp``: round assignment scores to this many decimals before the
    argsort (ties then break on cell index). Frozen-centroid twins set 6 so
    the DuckDB mirror (``ann_ivf_sql``) reproduces the identical cell
    choice despite numpy-vs-SQL summation-order ulp drift — the same
    stability idiom as the rounded cosine in ``knn_brute_force``.
    """
    import math as _math

    from pyspark.sql.types import ArrayType, IntegerType

    normed = []
    for c in centroids:
        n = _math.sqrt(sum(x * x for x in c)) or 1.0
        normed.append([x / n for x in c])
    cents_t = np.array(normed, dtype="float64").T  # dim x n_centroids
    probe = min(n_probe, len(centroids))

    @F.pandas_udf(ArrayType(IntegerType()))
    def top_cells(vs: pd.Series) -> pd.Series:
        M = np.vstack([np.asarray(v, dtype="float64") for v in vs])
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        scores = M @ cents_t
        if round_dp is not None:
            scores = np_sql_round(scores, round_dp)
        # argsort descending; ties broken by cell index (stable ordering)
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :probe]
        return pd.Series([row.astype("int32").tolist() for row in idx])

    cells = df.withColumn("__cells", top_cells(F.col(vec_col)))
    return (
        cells.select(*df.columns, F.explode_outer("__cells").alias("cell"))
        .where(F.col("cell").isNotNull())
    )


def ann_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[list[float]] | None = None,
    round_dp: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into centroid
    cells (one row each), probe each query's ``n_probe`` nearest cells,
    rank only within probed cells.

    Scale shape: corpus-side assignment is a narrow projection (scores
    against broadcast centroid literals, no shuffle); the candidate join is
    an equi-join on ``cell`` with the tiny query side broadcast; cost ~
    corpus x (n_probe / n_centroids) per query. Recall vs brute force is
    asserted in tests (>= 0.8 at 16 cells / 4 probes on testdata).

    With explicit frozen ``centroids`` and ``round_dp=6`` the whole query
    is deterministic and value-oracled by ``ann_ivf_sql`` (the
    knn_ivf_frozen / multimodal_knn_frozen catalog twins); with trained
    centroids it stays rows-only (data-trained state has no static SQL
    mirror).
    """
    # No ensure_parallelism here: assignment is an Arrow/numpy batch UDF,
    # so per-row cost is tiny and a test-scale repartition just multiplies
    # Python-worker startup; at cluster scale the scan brings its own
    # partitions and the UDF parallelizes with them.
    if centroids is None:
        centroids = train_ivf_centroids(corpus, n_centroids, id_col=id_col, vec_col=vec_col)
    q = queries.select(F.col(id_col).alias(query_id_col), _as_double(F.col(vec_col)).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
    qc = assign_ivf(q, centroids, n_probe=n_probe, vec_col="qv", round_dp=round_dp)
    cc = assign_ivf(c, centroids, n_probe=1, vec_col="cv", round_dp=round_dp)
    scored = (
        F.broadcast(qc)
        .join(cc, "cell")
        .select(
            query_id_col,
            "neighbor_id",
            sql_round(V.cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select(query_id_col, "neighbor_id", "cosine", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
    )


def ann_ivf_sql(
    centroids: list[list[float]],
    k: int,
    n_probe: int,
    corpus_sql: str,
    query_where: str,
    query_id_col: str = "query_id",
    round_dp: int = 6,
) -> str:
    """DuckDB mirror of ``ann_ivf(centroids=..., round_dp=...)``.

    ``corpus_sql`` must SELECT columns ``(id, v)`` with v a DOUBLE[];
    ``query_where`` filters it to the query set. The mirror reproduces,
    literal-for-literal, the four stages of the frozen-centroid plan:

      1. centroid normalization — done HERE in the same Python float64
         arithmetic as ``assign_ivf``, then embedded via repr() so both
         engines dot against bit-identical centroid values;
      2. cell assignment — score = round(dot(v, cn) / max(|v|, 1e-12), dp)
         with ties broken by cell index (row_number ORDER BY score DESC,
         cell), matching numpy's stable argsort of rounded scores;
      3. probe fan-out — rn <= n_probe on the query side, rn = 1 corpus;
      4. exact rescore + rank — the same rounded-cosine / neighbor-id
         tie-break as ``knn_brute_force_sql``.
    """
    import math

    normed = []
    for c in centroids:
        n = math.sqrt(sum(x * x for x in c)) or 1.0
        normed.append([x / n for x in c])
    cent_rows = ",\n        ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(normed)
    )
    score = (
        f"round(list_dot_product(t.v, c.cv) / "
        f"greatest(sqrt(list_dot_product(t.v, t.v)), 1e-12), {round_dp})"
    )
    cos = (
        "round(list_dot_product(q.v, e.v) / "
        "(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))), 6)"
    )
    return f"""
    WITH corpus AS ({corpus_sql}),
    cents(cell, cv) AS (VALUES
        {cent_rows}
    ),
    corpus_cells AS (
      SELECT id, cell FROM (
        SELECT t.id, c.cell,
               row_number() OVER (PARTITION BY t.id
                                  ORDER BY {score} DESC, c.cell) AS rn
        FROM corpus t, cents c
      ) WHERE rn = 1
    ),
    query_cells AS (
      SELECT id, cell FROM (
        SELECT t.id, c.cell,
               row_number() OVER (PARTITION BY t.id
                                  ORDER BY {score} DESC, c.cell) AS rn
        FROM (SELECT * FROM corpus WHERE {query_where}) t, cents c
      ) WHERE rn <= {n_probe}
    ),
    scored AS (
      SELECT qc.id AS {query_id_col}, cc.id AS neighbor_id, {cos} AS cosine
      FROM query_cells qc
      JOIN corpus_cells cc ON qc.cell = cc.cell
      JOIN corpus q ON q.id = qc.id
      JOIN corpus e ON e.id = cc.id
    )
    SELECT {query_id_col}::BIGINT AS {query_id_col},
           neighbor_id::BIGINT AS neighbor_id, cosine, rank::INT AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY {query_id_col}
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def ann_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: rank only candidates sharing an LSH bucket with
    the query in ANY of ``n_tables`` independent tables.

    Per table: one narrow bucket projection on each side + an equi-join on
    (table, bucket) — the corpus never cross-joins. Expected bucket
    occupancy n/2^planes controls cost; recall grows with n_tables.
    """
    from ..sources.tables import ensure_parallelism

    q = queries.select(F.col(id_col).alias(query_id_col), _as_double(F.col(vec_col)).alias("qv"))
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
    )

    q_buckets = []
    c_buckets = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, table=t)
        q_buckets.append(q.select(query_id_col, "qv", F.lit(t).alias("tbl"), lsh_bucket(F.col("qv"), planes).alias("bucket")))
        c_buckets.append(c.select("neighbor_id", "cv", F.lit(t).alias("tbl"), lsh_bucket(F.col("cv"), planes).alias("bucket")))
    qb = q_buckets[0]
    for x in q_buckets[1:]:
        qb = qb.unionAll(x)
    cb = c_buckets[0]
    for x in c_buckets[1:]:
        cb = cb.unionAll(x)

    cand = (
        F.broadcast(qb)
        .join(cb, ["tbl", "bucket"])
        .select(query_id_col, "neighbor_id", "qv", "cv")
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    scored = cand.select(
        query_id_col, "neighbor_id", sql_round(V.cosine(F.col("qv"), F.col("cv")), 6).alias("cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select(query_id_col, "neighbor_id", "cosine", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
    )


def ann_lsh_sql(
    k: int = 5,
    n_queries: int = 3,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
) -> str:
    """DuckDB mirror of ``ann_lsh`` (queries = vec_id < n_queries): the
    same frozen hyperplane literals produce the same sign-bit buckets, so
    the approximate result is VALUE-oracled, not just rows-counted —
    the mirror reproduces candidate generation, dedup, exact rescoring,
    and the (cosine DESC, neighbor_id) tie-break rank."""

    def arms(src: str, id_alias: str) -> str:
        out = []
        for t in range(n_tables):
            planes = hyperplanes(dim, n_planes, table=t)
            bits = []
            for i, p in enumerate(planes):
                lit = "[" + ", ".join(repr(float(x)) for x in p) + "]"
                bits.append(
                    f"(CASE WHEN list_dot_product(v, {lit}) >= 0 THEN {2 ** i} ELSE 0 END)"
                )
            out.append(
                f"SELECT vec_id AS {id_alias}, {t} AS tbl, ({' + '.join(bits)}) AS bucket FROM {src}"
            )
        return "\n      UNION ALL ".join(out)

    cos = (
        "round(list_dot_product(x.v, y.v) / "
        "(sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6)"
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id, v FROM e WHERE vec_id < {n_queries}),
    qb AS (
      {arms("q", "query_id")}
    ),
    cb AS (
      {arms("e", "neighbor_id")}
    ),
    cand AS (
      SELECT DISTINCT qb.query_id, cb.neighbor_id
      FROM qb JOIN cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id, {cos} AS cosine
      FROM cand c JOIN e x ON x.vec_id = c.query_id
                  JOIN e y ON y.vec_id = c.neighbor_id
    )
    SELECT query_id::BIGINT AS query_id, neighbor_id::BIGINT AS neighbor_id,
           cosine, rank::INT AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """
