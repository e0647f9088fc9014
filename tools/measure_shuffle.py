#!/usr/bin/env python
"""Shuffle-byte accounting for the two near-dup dedup plans.

docs/SCALE.md argues the blocked (MinHash-LSH -> verify) pipeline's real
advantage over the all-pairs shingle self-join is SHUFFLE VOLUME — the
all-pairs form shuffles one row per shingle occurrence while blocked
shuffles 12 band keys per doc — and that local NVMe wall-clock
underweights it. This tool measures the claim in bytes: it runs both
plans on the same replicated corpus and sums shuffle write bytes across
the stages each job ran (Spark UI REST API, stdlib urllib only).

Usage: python tools/measure_shuffle.py [replicas]   (default 10)
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ui_base(spark) -> str:
    return spark.sparkContext.uiWebUrl


def _app_id(spark) -> str:
    return spark.sparkContext.applicationId


def _stage_totals(spark) -> dict[int, tuple[int, int]]:
    """stageId -> (shuffleWriteBytes, shuffleReadBytes) for completed stages."""
    url = f"{_ui_base(spark)}/api/v1/applications/{_app_id(spark)}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return {
        s["stageId"]: (s.get("shuffleWriteBytes", 0), s.get("shuffleReadBytes", 0))
        for s in stages
    }


def measure(spark, label: str, df) -> None:
    before = _stage_totals(spark)
    df.write.format("noop").mode("overwrite").save()
    after = _stage_totals(spark)
    new = [sid for sid in after if sid not in before]
    w = sum(after[s][0] for s in new)
    r = sum(after[s][1] for s in new)
    print(
        f"{label:>22}: shuffle write {w / 1e6:10.1f} MB   "
        f"read {r / 1e6:10.1f} MB   ({len(new)} stages)"
    )


def main() -> None:
    from measure_dedup_crossover import MODES, build_corpus

    from random_sampling_based_approximate_mapreduce_spark.operators import dedup as D
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    threshold, period, stride = MODES["borderline"]
    # the engine session disables the UI; this tool needs the REST API
    spark = get_spark("shuffle-audit", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    corpus = (
        build_corpus(spark, replicas, period, stride)
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    n = corpus.count()
    print(f"corpus: {n} docs (borderline mode, threshold {threshold})")

    measure(spark, "allpairs shingle join", D.ngram_jaccard_pairs(corpus, threshold))
    cand = D.minhash_lsh_candidates(corpus)
    measure(
        spark,
        "blocked LSH->verify",
        D.ngram_jaccard_verify(corpus, cand, threshold),
    )


if __name__ == "__main__":
    main()
