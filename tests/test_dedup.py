"""Dedup operator semantics on constructed near-dup corpora."""

import pytest
from pyspark.sql import functions as F

from random_sampling_based_approximate_mapreduce_spark.operators import dedup as D


class TestConnectedComponents:
    def test_chain_and_island_components(self, spark):
        # chain 1-2-3-4, pair 10-11, pair 20-21; min label wins
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], ["doc_a", "doc_b"]
        )
        got = {r["node"]: r["component"] for r in D.connected_components(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    def test_long_chain_reaches_fixpoint(self, spark):
        # a 15-node chain needs many propagation rounds — exercises the loop
        pairs = spark.createDataFrame([(i, i + 1) for i in range(15)], ["doc_a", "doc_b"])
        got = {r["node"]: r["component"] for r in D.connected_components(pairs).collect()}
        assert set(got.values()) == {0}

    def test_distributed_path_matches_driver_path(self, spark):
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (11, 99)], ["doc_a", "doc_b"]
        )
        driver = {r["node"]: r["component"] for r in D.connected_components(pairs).collect()}
        # driver_threshold=0 forces the distributed min-label loop
        dist = {
            r["node"]: r["component"]
            for r in D.connected_components(pairs, driver_threshold=0).collect()
        }
        assert driver == dist


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again until dusk falls over the quiet valley"
    near = base.replace("quiet valley", "silent valley")  # one-word change
    other = "completely different content about spark engines and distributed queries at massive scale every day"
    rows = [
        (0, base),
        (1, base),        # exact dup of 0
        (2, near),        # near dup of 0
        (3, other),
        (4, "tiny"),      # too short for 3-shingles
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestMinHashLSH:
    def test_exact_dups_always_candidates(self, corpus):
        pairs = {(r["doc_a"], r["doc_b"]) for r in D.minhash_lsh_candidates(corpus).collect()}
        assert (0, 1) in pairs

    def test_near_dup_found_distinct_doc_not(self, corpus):
        pairs = {(r["doc_a"], r["doc_b"]) for r in D.minhash_lsh_candidates(corpus).collect()}
        assert (0, 2) in pairs  # jaccard ~0.85 >> 0.63 s-curve threshold
        assert (0, 3) not in pairs and (1, 3) not in pairs and (2, 3) not in pairs

    def test_short_doc_dropped(self, corpus):
        sigs = D.minhash_signatures(corpus)
        assert sigs.where(F.col("doc_id") == 4).count() == 0

    def test_signature_deterministic(self, corpus):
        a = D.minhash_signatures(corpus).orderBy("doc_id").collect()
        b = D.minhash_signatures(corpus).orderBy("doc_id").collect()
        assert [r["sig"] for r in a] == [r["sig"] for r in b]


class TestSimHash:
    def test_identical_texts_identical_hash(self, corpus):
        rows = {r["doc_id"]: r["simhash"] for r in D.simhash(corpus).collect()}
        assert rows[0] == rows[1]

    def test_near_dup_small_hamming(self, corpus, spark):
        pairs = D.simhash_near_pairs(corpus, max_hamming=6).collect()
        by_pair = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
        assert by_pair.get((0, 1)) == 0
        assert (0, 2) in by_pair  # near dup within 6 bits
        assert (0, 3) not in by_pair

    def test_blocked_equals_all_pairs(self, spark, sf_dir):
        """Pigeonhole blocking is complete: chunk-join candidates + exact
        Hamming filter == the all-pairs result, on real documents."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        blocked = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in D.simhash_near_pairs(docs, max_hamming=3, blocked=True).collect()
        }
        brute = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in D.simhash_near_pairs(docs, max_hamming=3, blocked=False).collect()
        }
        assert blocked == brute


class TestNgramJaccard:
    def test_exact_dup_jaccard_one(self, corpus):
        rows = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in D.ngram_jaccard_pairs(corpus, 0.5).collect()}
        assert rows[(0, 1)] == 1.0

    def test_near_dup_high_jaccard(self, corpus):
        rows = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in D.ngram_jaccard_pairs(corpus, 0.5).collect()}
        assert 0.7 < rows[(0, 2)] < 1.0
        assert (0, 3) not in rows


class TestEmbeddingDup:
    def test_finds_identical_vectors(self, spark):
        rows = [
            (0, [1.0, 2.0, 3.0]),
            (1, [1.0, 2.0, 3.0]),
            (2, [2.0, 4.0, 6.0]),   # colinear -> cosine 1
            (3, [-1.0, 0.5, 0.0]),
        ]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        pairs = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in D.embedding_dup_pairs(emb, 0.99).collect()}
        assert pairs[(0, 1)] == 1.0
        assert pairs[(0, 2)] == 1.0
        assert (0, 3) not in pairs

    def test_lsh_candidates_superset_check_on_testdata(self, spark, sf_dir):
        # MinHash candidate set must contain every exact-text duplicate pair
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        exact_dups = (
            docs.alias("a")
            .join(docs.alias("b"), (F.col("a.text") == F.col("b.text")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        )
        cand = D.minhash_lsh_candidates(docs)
        missing = exact_dups.join(cand, ["doc_a", "doc_b"], "left_anti").count()
        assert missing == 0

    def test_blocked_equals_hof_baseline(self, spark, sf_dir):
        """Blocked-GEMM all-pairs == the joined HOF-cosine baseline,
        value-for-value, on a NON-EMPTY result set (threshold 0.3 yields
        ~1000 pairs on the near-orthogonal testdata); small block_size
        forces several block-pair groups including cross-block ones."""
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        new = {tuple(r) for r in D.embedding_dup_pairs(emb, 0.3, block_size=128).collect()}
        old = {tuple(r) for r in D.embedding_dup_pairs(emb, 0.3, blocked=False).collect()}
        assert len(new) > 100
        assert new == old


class TestBlockedClustering:
    def test_blocked_pipeline_matches_all_pairs(self, spark, sf_dir):
        """LSH-block -> verify -> components == all-pairs -> components on
        testdata (no candidate above the 0.5 cut slips past the bands)."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        exact = {
            (r["node"], r["component"])
            for r in D.connected_components(D.ngram_jaccard_pairs(docs, 0.5)).collect()
        }
        blocked_pairs = D.ngram_jaccard_verify(docs, D.minhash_lsh_candidates(docs), 0.5)
        blocked = {
            (r["node"], r["component"])
            for r in D.connected_components(blocked_pairs).collect()
        }
        assert len(blocked) > 0
        assert blocked == exact


class TestEmbeddingLSHBlocked:
    def test_precision_exact_and_recall_vs_all_pairs(self, spark, sf_dir):
        """LSH-blocked embedding dedup: every returned pair is a true pair
        with the identical cosine (exact verify => precision 1.0), and
        recall vs the all-pairs ground truth meets the analytic bound for
        2 planes x 8 tables at threshold 0.3 (~0.97 expected)."""
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        truth = {tuple(r) for r in D.embedding_dup_pairs(emb, 0.3).collect()}
        got = {
            tuple(r)
            for r in D.embedding_dup_pairs_lsh(emb, 0.3, n_planes=2, n_tables=8).collect()
        }
        assert got <= truth  # exact verify: no false positives, same cosines
        assert len(truth) > 0
        assert len(got) / len(truth) >= 0.9

    def test_no_allpairs_join_in_plan(self, spark, sf_dir):
        """The candidate join is an equi-join on (tbl, bucket): no cartesian
        and no BroadcastNestedLoopJoin anywhere in the physical plan."""
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        plan = (
            D.embedding_dup_pairs_lsh(emb, 0.3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestBlockedDupClustersCollapse:
    """blocked_dup_clusters' exact-duplicate collapse must be value-
    identical to running LSH -> verify -> CC on the raw corpus, on a
    corpus with heavy duplicate mass (where the collapse matters) and
    with the short-doc edge (identical sub-k-token docs must stay
    excluded, as the raw pipeline never emits them)."""

    @pytest.fixture(scope="class")
    def dup_heavy(self, spark):
        rows = []
        # 5 base texts x 8 exact copies each; text 1 is a near-dup of 0
        base = [
            "the quick brown fox jumps over the lazy dog again and again",
            "the quick brown fox jumps over the lazy cat again and again",
            "completely different words about spark catalyst and shuffles",
            "a third unrelated document mentioning parquet row groups",
            "short doc",  # < 3 tokens after tokenize -> no shingles
        ]
        i = 0
        for t in base:
            for _ in range(8):
                rows.append((i, t))
                i += 1
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def _raw_pipeline(self, docs):
        cand = D.minhash_lsh_candidates(docs).localCheckpoint(eager=True)
        verified = D.ngram_jaccard_verify(docs, cand, 0.5).localCheckpoint(eager=True)
        return D.connected_components(verified)

    def test_value_identical_to_raw_pipeline(self, dup_heavy):
        raw = {(r["node"], r["component"]) for r in self._raw_pipeline(dup_heavy).collect()}
        fast = {
            (r["node"], r["component"])
            for r in D.blocked_dup_clusters(dup_heavy).collect()
        }
        assert fast == raw
        # sanity on the shape: the two near-dup base texts form ONE
        # 16-doc component; the short docs are absent from BOTH
        assert len({c for _, c in raw if c == 0}) == 1
        nodes = {n for n, _ in raw}
        assert all(n < 32 for n in nodes), "short-doc copies must not appear"

    def test_candidate_pairs_collapse(self, dup_heavy):
        """The point of the collapse: candidates over representatives are
        O(distinct texts), not O(sum f^2) over duplicate groups."""
        raw_cand = D.minhash_lsh_candidates(dup_heavy).count()
        fp = F.md5(F.col("text")).alias("__fp")
        reps = (
            dup_heavy.select(F.col("doc_id"), F.col("text"), fp)
            .groupBy("__fp")
            .agg(F.min("doc_id").alias("doc_id"), F.first("text").alias("text"))
            .select("doc_id", "text")
        )
        rep_cand = D.minhash_lsh_candidates(reps).count()
        # raw: every in-group pair (C(8,2)=28 per group, 4 shingleable
        # groups) + any cross near-dup collisions; reps: at most C(5,2)
        # cross pairs (the 0.54-Jaccard near-dup pair sits at ~50% on the
        # 4x3 banding s-curve, so it may or may not appear — determinism
        # of the fixed hash makes whichever outcome stable)
        assert raw_cand >= 4 * 28
        assert rep_cand <= 10


def test_blocked_dup_clusters_custom_column_names(spark, sf_dir):
    """Review regression: text_col/id_col were dead parameters — the
    verify stage hardcoded (doc_id, text) and threw on any other names.
    Renamed inputs must now produce the identical clustering."""
    from pyspark.sql import functions as F

    from random_sampling_based_approximate_mapreduce_spark.operators.dedup import blocked_dup_clusters
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    default = sorted(map(str, blocked_dup_clusters(docs).collect()))
    renamed = docs.select(F.col("doc_id").alias("id"), F.col("text").alias("body"))
    custom = sorted(
        map(str, blocked_dup_clusters(renamed, text_col="body", id_col="id").collect())
    )
    assert default == custom and len(default) > 0


class TestComponentsConvergenceGuard:
    def test_non_convergence_raises_instead_of_splitting(self, spark):
        """Review r8: exhausting max_iters with labels still moving means
        a deep component would be silently SPLIT — the distributed loop
        must refuse loudly instead."""
        from random_sampling_based_approximate_mapreduce_spark.operators.dedup import (
            connected_components,
        )

        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(10)], "doc_a bigint, doc_b bigint"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(chain, max_iters=2, driver_threshold=0)
        # with a sufficient budget the same chain converges to one label
        out = connected_components(chain, max_iters=20, driver_threshold=0)
        comps = {r["component"] for r in out.collect()}
        assert comps == {0}
