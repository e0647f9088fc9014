#!/usr/bin/env python
"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Execution is forced through the noop sink (full plan runs, nothing
collected to the driver). A tiny warmup query absorbs JVM/codegen
startup so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the reference's workloads (word/char/log/wireless/xml),
# the relational surface, the training-data operators, and the sampled
# variants whose speedup-vs-exact is the engine's reason to exist.
BENCH_QUERIES = [
    "word_count",
    "char_count",
    "word_count_sampled",
    "log_host",
    "log_dateweek",
    "log_totalsize",
    "log_host_sampled",
    "wireless_link_pairs",
    "xml_page_words",
    "tpch_q1",
    "tpch_q3_topk",
    "revenue_by_nation",
    "top_orders_per_priority",
    "user_sessions",
    "events_asof_purchase",
    "events_in_campaigns",
    "events_hourly",
    "approx_events_by_type",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "knn_brute_force",
    "dedup_embedding_blocked",
    "multimodal_meta",
    "token_stats",
    "streaming_events_hourly",
    "salted_orders_join",
    "skewed_events_salted_join",
    "bloom_semi_join",
    "order_price_quantiles",
    "knn_ivf",
    "training_pipeline",
    # corpus-preparation family
    "pii_redaction",
    "heavy_hitter_tokens",
    "sequence_packing",
    "dedup_keep_best",
    "decontaminate_ngrams",
    "cross_doc_dup_spans",
    "doc_repetition",
    "dataset_split_md5",
    "docs_cap_per_lang",
    "corpus_pipeline_full",
    # round-4 additions: frozen-quantizer IVF twins, video container
    # metadata, CI families (each value-oracled; see VERDICT r3 items 3/5/6)
    "knn_ivf_frozen",
    "multimodal_knn_frozen",
    "video_container_meta",
    "approx_sum_ci_families",
    # round-4 widening: representative of the analytic-join batch (Q13/Q18
    # shapes), the oracled CountMin sketch, and the TF-IDF df shuffle
    "order_counts_distribution",
    "large_orders_topk",
    "countmin_tokens",
    "tfidf_top_terms",
    # round-4 second batch representatives: the deterministic KMV sketch
    # (distinct shuffle + salted top-k), the one-exchange SCD2 window
    # build, and the Q7 two-role-dim multi-join
    "kmv_users_daily",
    "user_state_scd2",
    "volume_shipping_q7",
    # round-4 behavioral/governance representatives: three per-nation
    # ntile windows on one exchange (RFM), the last(ignorenulls)
    # attribution window, and the one-scan PSI drift gate
    "customer_rfm_segments",
    "purchase_attribution_last_touch",
    "events_value_psi",
    # round-4 third batch (TPC-H completion) representatives: the pure
    # pushdown scan-agg (Q6), the big-big join + TakeOrderedAndProject
    # top-k (Q10), and the one-pass window decorrelation of the double
    # self-join (Q21)
    "forecast_revenue_q6",
    "returned_items_topk_q10",
    "waiting_suppliers_q21",
    # the scale-correct LSH->verify->CC composition is the headline
    # clustering number; the all-pairs forms (dedup_clusters,
    # dedup_embedding) stay in the catalog as oracle-only baselines.
    # Measured crossover: at sf0.1 the blocked form pays a second tokenize
    # pass and ties/loses; on a skewed 100x corpus the all-pairs shingle
    # self-join explodes quadratically while blocked stays band-bounded.
    "dedup_clusters_blocked",
]


def main() -> None:
    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark

    spark = get_spark("rsmr-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer caches, AND the Python/Arrow
    # worker pool — without the latter, the first mapInPandas query pays
    # ~2-3 s of worker + BLAS startup and its min-of-two is startup, not
    # steady state (observed on knn_brute_force: 3.5 s cold, 0.7 s warm)
    QUERIES["tpch_q1"].spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    def _warm_py(it):
        import numpy as np

        for pdf in it:
            np.dot(np.ones((2, 2)), np.ones((2, 2)))
            yield pdf

    spark.range(64).repartition(32).mapInPandas(_warm_py, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # three passes, per-query MEDIAN: single-shot numbers on a shared
    # machine varied by up to 1.7x run-to-run (and the same commit
    # measured 38.6-51.8 s across a day under the driver — documented
    # lockstep box noise). The median of 3 tolerates one polluted pass in
    # either direction, where a min hides sustained regressions and a
    # single shot reports noise (VERDICT r3 item 7).
    samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for _ in range(3):
        for name in BENCH_QUERIES:
            qd = QUERIES[name]
            t0 = time.monotonic()
            qd.spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples[name].append(time.monotonic() - t0)
        # drop dead localCheckpoint/broadcast blocks between passes: the
        # ContextCleaner only frees them after a driver GC notices the
        # dead refs, and 40+ queries of accumulated blocks otherwise
        # bleed executor memory into later passes (observed: the
        # checkpoint-heavy clustering query 3.4 s isolated vs 7.8 s late
        # in a pressured pass)
        spark.sparkContext._jvm.System.gc()
    from statistics import median

    timings = {name: round(median(ts), 3) for name, ts in samples.items()}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "rsmr-spark headline queries, total wall sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
