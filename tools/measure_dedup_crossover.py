#!/usr/bin/env python
"""All-pairs vs LSH-blocked near-dup dedup at growing corpus size.

VERDICT r1 flagged the all-pairs shingle self-join (ngram_jaccard_pairs)
as the scale-killer and asked for the measured crossover: at sf0.1
(5k docs) the blocked LSH->verify pipeline is near-parity because
shingle buckets are tiny; this tool grows the corpus (base docs x R
near-dup replicas, deterministic word-level perturbation) and times

  allpairs - explode shingles, self-join on shingle, exact-Jaccard
             filter: candidate pairs grow ~quadratically inside every
             shared-shingle bucket
  blocked  - MinHash-LSH band candidates -> exact-Jaccard verify of the
             candidates only: candidates grow ~linearly with true dups

plus the blocked pipeline's recall of true (>= threshold) pairs.

Usage: python tools/measure_dedup_crossover.py [--mode borderline|operating]
                                               [replicas ...]
Defaults to R in (1, 3, 6, 10). Deterministic; prints a wall-time table
for docs/SCALE.md. The all-pairs arm is skipped once a previous size took
longer than ALLPAIRS_BUDGET_S (it only gets worse).

Two corpus modes, because the two questions are different:

- ``borderline`` (default): every replica perturbs every 8th word ->
  ~67% of shingles survive, replica-pair Jaccard sits AT the 0.5
  threshold. This is the all-pairs killer: enormous shared-shingle mass
  whose pairs mostly FAIL the threshold, so the shingle self-join feeds
  a huge intersection count for little output. LSH banding rejects the
  borderline mass before any join (its S-curve midpoint for 4 bands x 3
  rows is J = (1/4)^(1/3) ~= 0.63), so measured recall AGAINST
  BORDERLINE TRUTH is ~0.6 — the S-curve working as specified, not a
  defect; the blocked arm's wall-clock stays flat.

- ``operating``: replicas perturb every 48th word -> Jaccard ~0.85+,
  the regime MinHash dedup is built for (clear near-dups above the
  S-curve midpoint). Measures recall ~0.98 and shows both arms'
  wall-clock dominated by the genuinely quadratic TRUE OUTPUT (every
  replica pair is a real dup), i.e. no blocking scheme can beat the
  output size itself.

A middle variant (heavy perturbation every 4th-6th word, J ~0.3-0.4)
was also measured: shared-shingle mass shrinks enough that all-pairs
stays cheap — the explosion needs NEAR-threshold sharing, which is
exactly what a real re-crawled/boilerplate-heavy web corpus has.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ALLPAIRS_BUDGET_S = 240.0

MODES = {
    # name: (threshold, perturb period, per-replica offset stride)
    "borderline": (0.5, 8, 1),
    "operating": (0.8, 48, 7),
}


def build_corpus(spark, replicas: int, period: int, stride: int):
    from pyspark.sql import functions as F

    from random_sampling_based_approximate_mapreduce_spark.sources.tables import load

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    if replicas == 1:
        return docs
    reps = spark.range(replicas).select(F.col("id").cast("int").alias("rep"))
    combo = docs.crossJoin(F.broadcast(reps))
    toks = F.split(F.lower(F.col("text")), r"[^a-z0-9']+")
    perturbed = F.transform(
        toks,
        lambda t, i: F.when(
            (F.col("rep") > 0)
            & (F.pmod(i + F.col("rep") * stride, F.lit(period)) == 0),
            F.concat(t, F.lit("x"), F.col("rep").cast("string")),
        ).otherwise(t),
    )
    return combo.select(
        (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
        F.array_join(perturbed, " ").alias("text"),
    )


def main() -> None:
    from random_sampling_based_approximate_mapreduce_spark.operators import dedup as D
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark

    args = sys.argv[1:]
    mode = "borderline"
    if "--mode" in args:
        i = args.index("--mode")
        mode = args[i + 1]
        args = args[:i] + args[i + 2:]
    threshold, period, stride = MODES[mode]
    sizes = [int(x) for x in args] or [1, 3, 6, 10]
    spark = get_spark("dedup-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"mode={mode} threshold={threshold} perturb=1/{period}")
    print(f"{'docs':>8} {'allpairs_s':>11} {'true_pairs':>11} "
          f"{'blocked_s':>10} {'cand_pairs':>11} {'recall':>7}")
    skip_allpairs = False
    for r in sizes:
        corpus = (
            build_corpus(spark, r, period, stride)
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        n_docs = corpus.count()

        ap_s, true_pairs, truth = float("nan"), -1, None
        if not skip_allpairs:
            t0 = time.monotonic()
            truth = D.ngram_jaccard_pairs(corpus, threshold).localCheckpoint(eager=True)
            true_pairs = truth.count()
            ap_s = time.monotonic() - t0
            if ap_s > ALLPAIRS_BUDGET_S:
                skip_allpairs = True

        t0 = time.monotonic()
        cand = D.minhash_lsh_candidates(corpus)
        verified = D.ngram_jaccard_verify(corpus, cand, threshold).localCheckpoint(
            eager=True
        )
        blocked_pairs = verified.count()
        bl_s = time.monotonic() - t0

        recall = float("nan")
        if truth is not None and true_pairs > 0:
            hit = verified.join(truth, ["doc_a", "doc_b"], "left_semi").count()
            recall = hit / true_pairs
        print(f"{n_docs:>8} {ap_s:>11.1f} {true_pairs:>11} "
              f"{bl_s:>10.1f} {blocked_pairs:>11} {recall:>7.3f}")
        corpus.unpersist()


if __name__ == "__main__":
    main()
