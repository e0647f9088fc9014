"""Similarity search: brute-force correctness + LSH recall."""

import pytest
from pyspark.sql import functions as F

from random_sampling_based_approximate_mapreduce_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


class TestBruteForce:
    def test_self_is_rank_one(self, emb):
        out = S.knn_brute_force(emb, emb.where(F.col("vec_id") < 3), k=5).collect()
        rank1 = {r["query_id"]: r["neighbor_id"] for r in out if r["rank"] == 1}
        assert rank1 == {0: 0, 1: 1, 2: 2}  # cosine(v,v)=1 with id tiebreak

    def test_k_rows_per_query(self, emb):
        out = S.knn_brute_force(emb, emb.where(F.col("vec_id") < 3), k=5)
        counts = out.groupBy("query_id").count().collect()
        assert all(r["count"] == 5 for r in counts)

    def test_matches_numpy_ground_truth(self, emb):
        """Top-5 for query 0 must equal a local numpy brute-force ranking."""
        import numpy as np

        rows = emb.orderBy("vec_id").collect()
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        ids = np.array([r["vec_id"] for r in rows])
        q = mat[ids == 0][0]
        cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        order = sorted(zip(np.round(cos, 6), -ids), reverse=True)[:5]
        expected = [int(-i) for _, i in order]

        out = S.knn_brute_force(emb, emb.where(F.col("vec_id") == 0), k=5).orderBy("rank").collect()
        assert [r["neighbor_id"] for r in out] == expected


class TestLSH:
    def test_recall_vs_brute_force(self, emb):
        queries = emb.where(F.col("vec_id") < 10)
        exact = S.knn_brute_force(emb, queries, k=5)
        approx = S.ann_lsh(emb, queries, k=5, dim=64, n_planes=4, n_tables=8)
        hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        total = exact.count()
        assert total == 50
        # testdata embeddings are near-orthogonal (worst case for LSH);
        # 4 planes x 8 tables measured at 0.82 recall with seed 1234
        assert hits / total >= 0.7

    def test_bucket_determinism(self, emb):
        a = sorted(S.ann_lsh(emb, emb.where(F.col("vec_id") < 2), k=3).collect())
        b = sorted(S.ann_lsh(emb, emb.where(F.col("vec_id") < 2), k=3).collect())
        assert a == b


class TestIVF:
    def test_recall_vs_brute_force(self, emb):
        queries = emb.where(F.col("vec_id") < 10)
        exact = S.knn_brute_force(emb, queries, k=5)
        approx = S.ann_ivf(emb, queries, k=5, n_centroids=16, n_probe=6)
        hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        total = exact.count()
        assert total == 50
        # near-orthogonal testdata is IVF's worst case; measured 0.80 recall
        # at 6/16 cells probed (0.9 at 8/16) with the frozen training seed
        assert hits / total >= 0.7

    def test_centroid_training_deterministic(self, emb):
        a = S.train_ivf_centroids(emb, n_centroids=4, sample_cap=256, n_iters=3)
        b = S.train_ivf_centroids(emb, n_centroids=4, sample_cap=256, n_iters=3)
        assert a == b

    def test_corpus_assignment_is_single_cell(self, emb):
        cents = S.train_ivf_centroids(emb, n_centroids=8, sample_cap=256, n_iters=3)
        c = emb.select(F.col("vec_id"), S._as_double(F.col("embedding")).alias("v"))
        assigned = S.assign_ivf(c, cents, n_probe=1)
        assert assigned.count() == emb.count()  # exactly one cell per vector
        assert assigned.select("cell").distinct().count() <= 8


class TestIVFFrozen:
    def test_frozen_centroid_shapes(self):
        from random_sampling_based_approximate_mapreduce_spark.operators import ivf_frozen as IVF

        assert len(IVF.EMBEDDINGS_CENTROIDS) == 16
        assert all(len(c) == 64 for c in IVF.EMBEDDINGS_CENTROIDS)
        assert len(IVF.DOC_HASH_CENTROIDS) == 16
        assert all(len(c) == 16 for c in IVF.DOC_HASH_CENTROIDS)

    def test_frozen_recall_vs_brute_force(self, emb):
        from random_sampling_based_approximate_mapreduce_spark.operators import ivf_frozen as IVF

        queries = emb.where(F.col("vec_id") < 10)
        exact = S.knn_brute_force(emb, queries, k=5)
        approx = S.ann_ivf(
            emb, queries, k=5, n_probe=6,
            centroids=IVF.EMBEDDINGS_CENTROIDS, round_dp=6,
        )
        hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        # centroids are trained on sf0.01 (tools/freeze_ivf.py) and this
        # test corpus is sf0.001 — transfer on near-orthogonal testdata
        # measured 0.66 recall at 6/16 probes (0.70 on the training
        # corpus, same as the train-at-query-time path)
        assert hits / exact.count() >= 0.6

    def test_frozen_is_deterministic(self, emb):
        from random_sampling_based_approximate_mapreduce_spark.operators import ivf_frozen as IVF

        q = emb.where(F.col("vec_id") < 3)
        a = sorted(
            tuple(r)
            for r in S.ann_ivf(
                emb, q, k=5, n_probe=4, centroids=IVF.EMBEDDINGS_CENTROIDS, round_dp=6
            ).collect()
        )
        b = sorted(
            tuple(r)
            for r in S.ann_ivf(
                emb, q, k=5, n_probe=4, centroids=IVF.EMBEDDINGS_CENTROIDS, round_dp=6
            ).collect()
        )
        assert a == b and len(a) == 15


class TestHashEmbedding:
    def test_matches_closed_form(self, spark):
        """The Arrow-batch encoder reproduces the documented md5 formula
        exactly (the same arithmetic hash_embedding_sql renders in SQL)."""
        import hashlib

        from random_sampling_based_approximate_mapreduce_spark.sources import multimodal as MM

        df = spark.createDataFrame([(1, "hello world"), (2, "")], "doc_id long, text string")
        assets = MM.attach_binary_content(df)
        rows = {r["doc_id"]: list(r["embedding"]) for r in MM.extract_embeddings_hash(assets, dim=4).collect()}

        def expect(text: str) -> list[float]:
            h = hashlib.md5(text.encode()).hexdigest()
            out = []
            for i in range(4):
                u = int(hashlib.md5(f"{h}:emb{i}".encode()).hexdigest()[:15], 16)
                out.append((u % 2048 - 1024) / 1024.0)
            return out

        assert rows[1] == expect("hello world")
        assert rows[2] == expect("")

    def test_features_are_exact_float32(self, spark):
        """Every component is a multiple of 2^-10 in [-1, 1) — exactly
        representable in float32, which is what makes the SQL mirror
        bit-exact."""
        from random_sampling_based_approximate_mapreduce_spark.sources import multimodal as MM

        df = spark.createDataFrame([(i, f"doc {i}") for i in range(20)], "doc_id long, text string")
        vals = [
            x
            for r in MM.extract_embeddings_hash(MM.attach_binary_content(df), dim=8).collect()
            for x in r["embedding"]
        ]
        assert all(-1.0 <= x < 1.0 for x in vals)
        assert all(float(x) * 1024.0 == round(float(x) * 1024.0) for x in vals)


class TestBruteForceArrow:
    def test_arrow_equals_column_plan(self, emb):
        """mapInPandas matmul + per-batch top-k == the broadcast crossJoin
        HOF plan, including rank order and rounded cosines."""
        qs = emb.where(F.col("vec_id") < 5)
        got = {tuple(r) for r in S.knn_brute_force(emb, qs, k=7).collect()}
        exp = {tuple(r) for r in S.knn_brute_force(emb, qs, k=7, arrow=False).collect()}
        assert len(got) == 35
        assert got == exp

    def test_arrow_no_queries(self, emb):
        assert S.knn_brute_force(emb, emb.where(F.col("vec_id") < 0)).count() == 0


class TestKnnQueryCollectGuard:
    """VERDICT r8 item 4: the arrow path collects the query side to the
    driver; an oversized query frame must be refused (limit-probed), not
    collected into a driver OOM."""

    def test_oversized_query_frame_refused(self, spark, sf_dir):
        from random_sampling_based_approximate_mapreduce_spark.operators.similarity import (
            knn_brute_force,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        with pytest.raises(ValueError, match="max_queries"):
            knn_brute_force(emb, emb, k=2, arrow=True, max_queries=3)

    def test_within_cap_still_works(self, spark, sf_dir):
        from random_sampling_based_approximate_mapreduce_spark.operators.similarity import (
            knn_brute_force,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.where(F.col("vec_id") < 2)
        out = knn_brute_force(emb, q, k=3, arrow=True, max_queries=2).collect()
        assert len(out) == 6
