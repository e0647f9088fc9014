#!/usr/bin/env python
"""Dedup-crossover measurement behind docs/SCALE.md "Measured: dedup".

Synthesizes a ZIPF-ish corpus (each word position draws from a 30-word
hot head with p=0.5, else from a 50k tail — so common shingles recur
across documents, as in real text) with PLANTED near-duplicates (every
5th doc is its predecessor with one word in ~100 mutated, Jaccard ~0.97),
then times the two clustering plans the catalog ships:

  all-pairs : ngram_jaccard_pairs (shingle self-join, quadratic per
              shingle bucket) -> connected_components
  blocked   : minhash_lsh_candidates -> ngram_jaccard_verify (candidates
              only) -> connected_components  [the 100 TB shape]

At sf0.1 bench scale the two are near-parity (tiny shingle buckets;
blocking pays an extra tokenize pass — docs/ROUND2_NOTES.md). This
script measures where the candidate-restricted verify pulls away as the
corpus grows and the N^2 term dominates.

Both plans must find the SAME planted pair count — printed as a check.

Round-6 extension (VERDICT r5 item 5): default sizes are now the
10x/40x/100x multiples of the sf0.1 documents table (5,000 docs ->
50k/200k/500k) so the dedup family joins the TPC-H/reference families on
the measured scaling curve (docs/SCALE.md), and at the LARGEST size the
connected-components distributed fallback is exercised explicitly
(driver_threshold=0 forces the min-label loop on the same edge list;
cluster count must match the driver union-find path) — the 1M-edge probe
boundary is otherwise never crossed by honest near-dup pair lists.
Emits one JSON line for the SCALE.md table.

Usage: python tools/measure_dedup_scale.py [sizes_csv]
Deterministic generation (hash words, no RNG).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["50000", "200000", "500000"])]
ALLPAIRS_MAX = 50_000
WORDS_PER_DOC = 100
VOCAB = 50_000


HEAD = 20  # hot-head vocabulary: the source of shared (bucket-exploding) shingles
_WORD = (
    f"CASE WHEN pmod(xxhash64(src_id, j, 7), 10) < 7 "
    f"THEN concat('h', pmod(xxhash64(src_id, j), {HEAD})) "
    f"ELSE concat('w', pmod(xxhash64(src_id, j), {VOCAB})) END"
)


def corpus(spark, n: int):
    """doc_id, text: ~100 words each, Zipf-ish (50% from a 30-word head);
    doc_id % 5 == 1 docs copy doc doc_id-1 with ONE word replaced
    (planted near-dup, Jaccard ~0.97)."""
    from pyspark.sql import functions as F

    base = F.expr(
        f"array_join(transform(sequence(0, {WORDS_PER_DOC - 1}), j -> {_WORD}), ' ')"
    )
    mutated = F.expr(
        f"array_join(transform(sequence(0, {WORDS_PER_DOC - 1}), "
        f"j -> CASE WHEN j = pmod(xxhash64(id), {WORDS_PER_DOC}) "
        f"THEN concat('m', id) ELSE {_WORD} END), ' ')"
    )
    return (
        spark.range(0, n, numPartitions=32)
        .withColumn("is_dup", F.pmod("id", F.lit(5)) == 1)
        .withColumn("src_id", F.when(F.col("is_dup"), F.col("id") - 1).otherwise(F.col("id")))
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("is_dup"), mutated).otherwise(base).alias("text"),
        )
    )


def run(docs, blocked: bool) -> tuple[float, int, int, "DataFrame"]:
    from random_sampling_based_approximate_mapreduce_spark.operators import dedup as D

    t0 = time.monotonic()
    if blocked:
        cand = D.minhash_lsh_candidates(docs).localCheckpoint(eager=True)
        pairs = D.ngram_jaccard_verify(docs, cand, 0.5).localCheckpoint(eager=True)
    else:
        pairs = D.ngram_jaccard_pairs(docs, 0.5).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    comps = D.connected_components(pairs)
    n_comps = comps.count()
    return time.monotonic() - t0, n_pairs, n_comps, pairs


def main():
    import json

    from random_sampling_based_approximate_mapreduce_spark.operators import dedup as D
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark

    spark = get_spark("measure-dedup", master=f"local[{os.cpu_count()}]")
    out = {"sizes": []}
    for n in SIZES:
        docs = corpus(spark, n).localCheckpoint(eager=True)  # exclude gen cost
        expect_pairs = len([i for i in range(n) if i % 5 == 1])
        b_wall, b_pairs, b_comps, pairs = run(docs, blocked=True)
        rec = {
            "n_docs": n, "planted": expect_pairs,
            "blocked_wall_s": round(b_wall, 1), "pairs": b_pairs,
            "recall": round(b_pairs / max(expect_pairs, 1), 4), "comps": b_comps,
        }
        line = (
            f"n={n:>7,}  planted={expect_pairs:,}  "
            f"blocked: {b_wall:6.1f}s ({b_pairs:,} pairs, recall "
            f"{b_pairs / max(expect_pairs, 1):.3f}, {b_comps:,} comps)"
        )
        if n <= ALLPAIRS_MAX:
            a_wall, a_pairs, a_comps, _ = run(docs, blocked=False)
            line += f"  all-pairs: {a_wall:6.1f}s ({a_pairs:,} pairs)"
            rec["allpairs_wall_s"] = round(a_wall, 1)
            rec["allpairs_pairs"] = a_pairs
        else:
            line += "  all-pairs: skipped (quadratic)"
        if n == max(SIZES):
            # force the distributed min-label loop on the SAME edge list
            # (driver_threshold=0) — proves the >1M-edge path produces the
            # identical clustering and records its cost at the largest size
            t0 = time.monotonic()
            d_comps = D.connected_components(pairs, driver_threshold=0).count()
            d_wall = time.monotonic() - t0
            assert d_comps == b_comps, (d_comps, b_comps)
            line += f"  CC-distributed: {d_wall:6.1f}s ({d_comps:,} comps, matches driver path)"
            rec["cc_distributed_wall_s"] = round(d_wall, 1)
            rec["cc_distributed_comps"] = d_comps
        print(line, flush=True)
        out["sizes"].append(rec)
        docs.unpersist()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
