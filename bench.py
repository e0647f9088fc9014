#!/usr/bin/env python
"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints the FULL result as one JSON line, then a COMPACT aggregate summary
line (VERDICT r5 item 2: the round driver keeps only the last ~2000 chars
of stdout, which truncated the head of the full line and left
BENCH_r05.json with ``parsed: null``), then — as the FINAL stdout line —
a compact per-query map ``{"metric", "value", "unit", "sf", "queries":
{name: min_sec}}`` sized to fit the driver's tail window (VERDICT r16
item 2: without per-query times in the tail, PERF_r*.json could never
populate ``per_query``/``scaling``). The aggregate line carries every
graded aggregate (total, vs_prev, 10x-block totals/speedups) plus the path
and sha256 of the full artifact, which is also WRITTEN to
``docs/bench/BENCH_r{N}_full.json`` so the judge can recompute any ratio
from committed files alone. Full-line shape:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: median_sec, ...}, "queries_min": {name: min_sec, ...},
   "vs_prev": {...}, "tpch_x10": {...}, "sf": <sf>}

- ``queries`` stays the per-query MEDIAN of 3 passes (the graded series).
- ``queries_min`` is the per-query MIN of the same passes (VERDICT r4
  item 5): min is robust to transient box pollution, so sustained
  regressions separate from one-off noise machine-checkably — a query
  whose median doubles while its min holds was hit by the box, not the
  code (the r4 log_host_sampled episode, docs/SCALE.md).
- ``vs_prev`` compares this run's mins against the newest BENCH_r*.json
  medians on the shared query set, so the round-over-round ratio is in
  the artifact itself instead of hand-computed in round notes.
- ``tpch_x10`` runs the 22 TPC-H shapes on a 10x key-consistent
  replication of the bench corpus (~sf1; sources/scale_up.py), min-of-2
  (VERDICT r4 item 7): at sf0.1 every TPC-H query sits on the plan floor,
  so THIS block is where data-dependent scaling shows per round.
- ``sentinel`` is a PINNED constant battery (synthetic range CPU sum,
  one 1024-key shuffle, and a parquet scan-agg over a PINNED sf0.1 path
  — never $SPARK_GRAFT_SF_DIR, which would confound dataset size with
  box drift) measured min-of-3 BEFORE AND AFTER the headline passes,
  per-component min; its round-over-round ratio isolates BOX drift, and
  ``vs_prev`` reports ``ratio_code_normalized`` = raw ratio / sentinel
  ratio once the prior artifact carries a sentinel (VERDICT r8 item 3).
- ``reference_x10`` runs the reference's flagship workloads (word count,
  log-host count: exact, engine-RNG sampled, hash-deterministic sampled)
  on 10x events/documents replicas and reports the sampled-vs-exact
  speedups. The reference's thesis is that input-sampling wins GROW with
  input size (BASELINE.md's ~40x-at-GB-scale regime); this block makes
  that trend a per-round series instead of a one-off docs measurement.

- ``--bracket N`` (VERDICT r10 item 6) repeats the headline battery
  (sentinel-pre, 3 passes, sentinel-post) N times SERIALIZED in one
  process and records per-run aggregates under ``bracket``, so one
  artifact brackets the box's drift over the window; ``queries_min``
  (what vs_prev compares) becomes the min over all runs. Default 1 —
  the driver's invocation shape is unchanged.

Execution is forced through the noop sink (full plan runs, nothing
collected to the driver). A tiny warmup query absorbs JVM/codegen
startup so per-query numbers reflect steady state.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Is this a reduced-core SCALING re-run? The driver benches the round at
# the box's full core count, records BENCH_r{N}.json, then re-runs at a
# LOWER $SPARK_GRAFT_CPUS to measure per-query scaling. That second run
# must not mint the next round's artifact name (VERDICT r16 item 2) —
# detect it here and (a) keep the round number of the newest recorded
# round, (b) suffix the full artifact with the core count.
try:
    _ENV_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 0))
except ValueError:
    _ENV_CPUS = 0
_SCALING_RERUN = 0 < _ENV_CPUS < (os.cpu_count() or _ENV_CPUS)

# the 22 TPC-H query shapes (catalog names), run on the 10x replica
TPCH_SUITE = [
    "tpch_q1",
    "cheapest_supplier_per_part",  # Q2 shape
    "tpch_q3_topk",
    "priority_wait_orders_q4",
    "local_supplier_volume_q5",
    "forecast_revenue_q6",
    "volume_shipping_q7",
    "market_share_q8",
    "product_profit_q9",
    "returned_items_topk_q10",
    "important_parts_q11",
    "priority_case_count_q12",
    "order_counts_distribution",  # Q13 shape
    "promo_revenue_share",  # Q14 shape
    "top_supplier_revenue",  # Q15 shape
    "supplier_cnt_by_brand",  # Q16 shape
    "small_qty_revenue",  # Q17 shape
    "large_orders_topk",  # Q18 shape
    "disjunctive_parts_q19",
    "promo_parts_suppliers_q20",
    "waiting_suppliers_q21",
    "idle_rich_customers",  # Q22 shape
]

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
    # round-6 additions: the weighted join compositions (LEFT: matched
    # pairs at 1/(r1*r2) + per-left-row null corrections; FULL: both
    # sides corrected), the sampled-quantile estimator, and the sampled
    # top-k heavy hitters with rank-stability flags
    "sampled_left_join_hash_twin",
    "sampled_full_join_hash_twin",
    "order_price_quantile_hash_sampled",
    "sampled_topk_tokens",
    # round-8 additions: the cluster-variance join CI (two extra
    # (group, row-id) partial-agg shuffles over the joined pairs) and
    # the bootstrap weighted quantile (x33 replicate explode into
    # per-(group, rep) window sorts)
    "sampled_join_cluster_ci",
    "stratified_quantile_bootstrap_ci",
    "stratified_value_mean_hash_sampled",
    "stratified_purchase_share_hash_sampled",
    # round-9 addition: the bzip2-block source at ratio 1.0 (compressed
    # ranges as partitions, per-block fabricated-stream decode) — the
    # per-byte decode path that must stay within ~20% of the JVM's own
    # splittable bzip2 scan (docs/SCALE.md round-9 section)
    "word_count_bzip2_exact",
    # the scale-correct LSH->verify->CC composition is the headline
    # clustering number; the all-pairs forms (dedup_clusters,
    # dedup_embedding) stay in the catalog as oracle-only baselines.
    # Measured crossover: at sf0.1 the blocked form pays a second tokenize
    # pass and ties/loses; on a skewed 100x corpus the all-pairs shingle
    # self-join explodes quadratically while blocked stays band-bounded.
    "dedup_clusters_blocked",
]


def main() -> None:
    import argparse

    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--bracket",
        type=int,
        default=1,
        help="number of SERIALIZED headline measurement runs (VERDICT r10 "
        "item 6): each run is its own sentinel-pre + 3 passes + "
        "sentinel-post battery, so the artifact itself brackets box "
        "drift over the measurement window instead of narrating N "
        "separate files in round notes. queries_min becomes the "
        "min-over-all-runs (what vs_prev compares); per-run aggregates "
        "land in the 'bracket' field. Default 1 = the driver's shape.",
    )
    args = ap.parse_args()
    n_runs = max(1, args.bracket)

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

    # Fixed SENTINEL workload (VERDICT r8 item 3): three rounds of
    # uniform upward drift were indistinguishable from a real per-round
    # code regression because every measured query also changes hands
    # between rounds. This battery is PINNED — synthetic range input
    # (explicit 32 slices, independent of box CPU count), pure JVM
    # codegen + one 1024-key shuffle + one parquet scan-agg over the
    # unchanging testdata (the page-cache/I-O axis the synthetic parts
    # miss), zero engine code on any path — so its round-over-round
    # ratio measures the BOX, and vs_prev reports a sentinel-normalized
    # code ratio. Measured BEFORE AND AFTER the headline passes (the
    # box can drift within one bench run; observed 10% swings between
    # two back-to-back r9 runs), per-component min. NEVER change the
    # constants below; a changed sentinel is a broken series.
    def _sentinel_cpu() -> float:
        t0 = time.monotonic()
        # modulo keeps the sum < 2^53 at 6e9 rows (id*3 overflowed long)
        spark.range(0, 6_000_000_000, 1, 32).selectExpr(
            "sum(id % 1000003 + id % 7) AS s"
        ).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    def _sentinel_shuffle() -> float:
        t0 = time.monotonic()
        spark.range(0, 600_000_000, 1, 32).selectExpr(
            "id % 1024 AS k", "id AS v"
        ).groupBy("k").agg({"v": "sum"}).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.monotonic() - t0

    # the scan component reads a PINNED path, not $SPARK_GRAFT_SF_DIR —
    # an env-var-sized input would confound dataset changes with box
    # drift and fake a code speedup in ratio_code_normalized (review r9)
    _SENTINEL_SCAN_PATH = "/root/testdata/sf0.1/lineitem.parquet"

    def _sentinel_scan() -> float:
        t0 = time.monotonic()
        spark.read.parquet(_SENTINEL_SCAN_PATH).selectExpr(
            "l_returnflag AS k", "l_quantity + l_extendedprice AS v"
        ).groupBy("k").agg({"v": "sum"}).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.monotonic() - t0

    _sentinel_has_scan = os.path.exists(_SENTINEL_SCAN_PATH)

    def _sentinel_battery(warm: bool = True) -> dict:
        if warm:  # the post-pass call is already maximally warm
            _sentinel_cpu(), _sentinel_shuffle()
            if _sentinel_has_scan:
                _sentinel_scan()
        out = {
            "cpu_sec": round(min(_sentinel_cpu() for _ in range(3)), 3),
            "shuffle_sec": round(min(_sentinel_shuffle() for _ in range(3)), 3),
        }
        if _sentinel_has_scan:
            out["scan_sec"] = round(min(_sentinel_scan() for _ in range(3)), 3)
        return out

    from statistics import median

    # three passes per run, per-query MEDIAN: single-shot numbers on a
    # shared machine varied by up to 1.7x run-to-run (and the same commit
    # measured 38.6-51.8 s across a day under the driver — documented
    # lockstep box noise). The median of 3 tolerates one polluted pass in
    # either direction, where a min hides sustained regressions and a
    # single shot reports noise (VERDICT r3 item 7). With --bracket N the
    # whole battery (sentinel-pre, 3 passes, sentinel-post) repeats N
    # times SERIALIZED, per-run aggregates recorded, so one artifact
    # brackets the box's drift over the window (VERDICT r10 item 6).
    samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    bracket_runs: list[dict] = []
    sentinel_batteries: list[dict] = []
    for run_i in range(n_runs):
        run_sentinel_pre = _sentinel_battery() if run_i == 0 else _sentinel_battery(warm=False)
        run_samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
        for _ in range(3):
            for name in BENCH_QUERIES:
                qd = QUERIES[name]
                t0 = time.monotonic()
                qd.spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                run_samples[name].append(time.monotonic() - t0)
            # drop dead localCheckpoint/broadcast blocks between passes:
            # the ContextCleaner only frees them after a driver GC notices
            # the dead refs, and 40+ queries of accumulated blocks
            # otherwise bleed executor memory into later passes (observed:
            # the checkpoint-heavy clustering query 3.4 s isolated vs
            # 7.8 s late in a pressured pass)
            # ALSO clear the SQL cache (declared measurement-bug fix,
            # round 17 / ADVICE r16): CacheManager dedupes persist()ed
            # plans by canonicalized form, so a query that persists an
            # intermediate had passes 2..3 silently reading pass-1's
            # cache and its reported min measured CACHE HITS, not the
            # computation (r15/r16 dedup_clusters_blocked mins were
            # inflated this way; its honest fresh-run number at r17 HEAD
            # is ~3.3-3.8 s, not 2.5-2.9 s). Every pass now computes
            # from the parquet inputs.
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        run_sentinel_post = _sentinel_battery(warm=False)
        sentinel_batteries.extend((run_sentinel_pre, run_sentinel_post))
        for name, ts in run_samples.items():
            samples[name].extend(ts)
        run_sent_min = {
            k: min(run_sentinel_pre[k], run_sentinel_post[k])
            for k in run_sentinel_pre
        }
        bracket_runs.append(
            {
                "value": round(
                    sum(median(ts) for ts in run_samples.values()), 3
                ),
                "value_min_sum": round(
                    sum(min(ts) for ts in run_samples.values()), 3
                ),
                "sentinel_sec": round(sum(run_sent_min.values()), 3),
                "sentinel": {k: round(v, 3) for k, v in run_sent_min.items()},
            }
        )

    # graded series: median over ALL pooled passes (3 x n_runs);
    # queries_min (what vs_prev compares) is the min over all runs
    timings = {name: round(median(ts), 3) for name, ts in samples.items()}
    timings_min = {name: round(min(ts), 3) for name, ts in samples.items()}

    # the reported sentinel is the per-component min across every
    # pre/post battery of every run (the bench's min-robustness
    # convention); first-pre and last-post kept for drift forensics
    sentinel = {
        k: min(b[k] for b in sentinel_batteries) for k in sentinel_batteries[0]
    }
    sentinel["sec"] = round(sum(sentinel.values()), 3)
    sentinel["pre"] = sentinel_batteries[0]
    sentinel["post"] = sentinel_batteries[-1]
    sentinel["scan_path"] = _SENTINEL_SCAN_PATH if _sentinel_has_scan else None

    # round-over-round comparison against the newest recorded BENCH file
    # of a PRIOR round, on the shared query set, using THIS run's min
    # (noise-robust) and the prior run's recorded values. The current
    # round defaults to (newest recorded round + 1) — the driver records
    # BENCH_r{N}.json only at round end, so during a round the newest file
    # IS the previous round's. When re-running within an already-recorded
    # round, set SPARK_GRAFT_ROUND so the run does not silently compare
    # against its own round's artifact and report ~1.0 as round-over-round
    # (ADVICE r5).
    vs_prev = None
    here = os.path.dirname(os.path.abspath(__file__))
    cur_round = 0  # safe fallback for the artifact path if detection fails
    try:
        # everything below is advisory; a stray non-matching BENCH_r*
        # filename or a malformed SPARK_GRAFT_ROUND must never abort the
        # benchmark itself (review r6: the glob key and int() had drifted
        # out of the try block)
        # parse each filename's round number ONCE into (round, path)
        # (review r9: the same regex was re-applied at five sites, with
        # .group(1) correctness depending on a filter elsewhere)
        rounds = sorted(
            (int(m.group(1)), p)
            for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        )
        try:
            env_round = int(os.environ.get("SPARK_GRAFT_ROUND", 0))
        except ValueError:
            env_round = 0  # malformed env var -> fall back to glob detection
        if env_round < 0:
            env_round = 0  # a negative round would name a junk artifact
        # A reduced-core run (the driver's scaling pass: SPARK_GRAFT_CPUS
        # below the box's core count) happens AFTER the round's BENCH_r{N}
        # .json is recorded, so "newest + 1" would squat the NEXT round's
        # artifact name (r16: the 8-core run minted BENCH_r17_full.json).
        # It is a re-measurement OF the newest recorded round — name it so.
        cur_round = env_round or (
            rounds[-1][0] + (0 if _SCALING_RERUN else 1) if rounds else 1
        )
        rounds = [(n, p) for n, p in rounds if n < cur_round]
        if rounds:
            prev_round, prev_path = rounds[-1]
            with open(prev_path) as fh:
                prev_doc = json.load(fh)
            parsed_prev = prev_doc.get("parsed") or prev_doc
            # fallback chain when the driver-recorded file is tail-only
            # (parsed: null, as in BENCH_r05.json): the full artifact this
            # script commits per round, else the one-time partial
            # reconstruction of r5's tail
            if not (parsed_prev.get("queries_min") or parsed_prev.get("queries")):
                for alt in (
                    f"docs/bench/BENCH_r{prev_round:02d}_full.json",
                    f"docs/bench/BENCH_r{prev_round:02d}_partial.json",
                ):
                    alt_path = os.path.join(here, alt)
                    if os.path.exists(alt_path):
                        with open(alt_path) as fh:
                            parsed_prev = json.load(fh)
                        prev_path = alt_path
                        break
            # compare like with like: min-to-min once the previous round
            # recorded queries_min (r5+), else min-vs-median with the
            # basis recorded — min-of-3 sits below median-of-3 in
            # expectation, so a min/median ratio reads ~0.8-0.9 even on
            # identical code and must not be read as a speedup
            prev_q = parsed_prev.get("queries_min") or parsed_prev.get("queries", {})
            basis = "min_vs_min" if parsed_prev.get("queries_min") else "min_vs_median"
            shared = sorted(set(prev_q) & set(timings_min))
            if not shared:
                # say WHY the graded ratio is missing instead of a silent
                # null indistinguishable from "no prior round" (review r9)
                vs_prev = {
                    "error": f"round {prev_round} has no per-query data "
                    f"(checked {os.path.basename(prev_path)} and the "
                    "docs/bench fallbacks)"
                }
            if shared:
                cur = sum(timings_min[q] for q in shared)
                prv = sum(float(prev_q[q]) for q in shared)
                vs_prev = {
                    "prev_file": os.path.basename(prev_path),
                    "basis": basis,
                    "shared_queries": len(shared),
                    "prev_sec": round(prv, 3),
                    "this_min_sec": round(cur, 3),
                    "ratio_min_vs_prev": round(cur / prv, 3) if prv else None,
                }
                # sentinel normalization (VERDICT r8 item 3): the raw
                # ratio confounds box drift with code drift; dividing by
                # the pinned sentinel's own ratio removes the box term.
                # Available once the prior round's artifact carries a
                # sentinel (r9+). The ratio is computed over the
                # INTERSECTION of component keys present in both rounds
                # (review r10): if e.g. the pinned scan path exists in
                # one round but not the other, a sec/sec ratio would be
                # silently skewed by the missing component; the shared
                # components are recorded so a partial basis is visible.
                prev_sent = parsed_prev.get("sentinel") or {}
                comp_keys = sorted(
                    k
                    for k in sentinel
                    if k.endswith("_sec")
                    and isinstance(prev_sent.get(k), (int, float))
                )
                if comp_keys and prv:
                    prv_sent_sum = sum(float(prev_sent[k]) for k in comp_keys)
                    cur_sent_sum = sum(sentinel[k] for k in comp_keys)
                    if prv_sent_sum and cur_sent_sum:
                        sent_ratio = cur_sent_sum / prv_sent_sum
                        vs_prev["sentinel_ratio"] = round(sent_ratio, 3)
                        vs_prev["sentinel_components"] = comp_keys
                        vs_prev["ratio_code_normalized"] = round(
                            (cur / prv) / sent_ratio, 3
                        )
                elif prev_sent and prv:
                    vs_prev["sentinel_ratio_error"] = (
                        "no sentinel components shared between rounds: "
                        f"prev={sorted(k for k in prev_sent if k.endswith('_sec'))} "
                        f"this={sorted(k for k in sentinel if k.endswith('_sec'))}"
                    )
    except Exception as exc:  # comparison is advisory; never fail the bench
        vs_prev = {"error": f"{type(exc).__name__}: {exc}"}

    # TPC-H at 10x replication (~sf1): data-dominated scaling block
    tpch_x10: dict = {}
    try:
        from random_sampling_based_approximate_mapreduce_spark.sources.scale_up import (
            ensure_scaled_tpch,
        )

        t0 = time.monotonic()
        scaled_dir = ensure_scaled_tpch(spark, SF_DIR, copies=10)
        build_sec = round(time.monotonic() - t0, 3)
        x10_samples: dict[str, list[float]] = {n: [] for n in TPCH_SUITE}
        for _ in range(2):
            for name in TPCH_SUITE:
                t0 = time.monotonic()
                QUERIES[name].spark(spark, scaled_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                x10_samples[name].append(time.monotonic() - t0)
            spark.catalog.clearCache()  # same fresh-pass rule as the headline loop
            spark.sparkContext._jvm.System.gc()
        x10 = {n: round(min(ts), 3) for n, ts in x10_samples.items()}
        tpch_x10 = {
            "copies": 10,
            "build_sec": build_sec,
            "total_sec": round(sum(x10.values()), 3),
            "queries": x10,
        }
    except Exception as exc:  # scaled block is additive; never fail the bench
        tpch_x10 = {"error": f"{type(exc).__name__}: {exc}"}

    # reference workloads at 10x: the sampled-speedup trend series
    reference_x10: dict = {}
    try:
        from random_sampling_based_approximate_mapreduce_spark.sources.scale_up import (
            ensure_scaled_tables,
        )

        t0 = time.monotonic()
        ref_dir = ensure_scaled_tables(
            spark, SF_DIR, ("events", "documents"), copies=10
        )
        build_sec = round(time.monotonic() - t0, 3)
        ref_queries = [
            "word_count",
            "word_count_sampled",
            "word_count_hash_sampled",
            "log_host",
            "log_host_sampled",
            "log_host_hash_sampled",
        ]
        ref_samples: dict[str, list[float]] = {n: [] for n in ref_queries}
        # min-of-3 (VERDICT r9 item 5): these are sub-second queries at
        # x10 whose single-shot speedups measured 1.8-3.7x on identical
        # code across r8/r9 runs — the spread was the box, not the
        # engine. Three passes narrow it; the block stays labeled
        # indicative because the meaningful series is the committed x100
        # one (docs/SCALE.md, tools/measure_reference_speedup.py).
        for _ in range(3):
            for name in ref_queries:
                t0 = time.monotonic()
                QUERIES[name].spark(spark, ref_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                ref_samples[name].append(time.monotonic() - t0)
            spark.catalog.clearCache()  # same fresh-pass rule as the headline loop
            spark.sparkContext._jvm.System.gc()
        refm = {n: round(min(ts), 3) for n, ts in ref_samples.items()}
        reference_x10 = {
            "copies": 10,
            "build_sec": build_sec,
            "basis": "min_of_3",
            "stability": "indicative-only: sub-second queries at x10 "
            "measure box noise; the graded series is docs/SCALE.md x100",
            "queries": refm,
            # a 0.0 rounded min (sub-ms sampled plan) must not raise and
            # discard the whole measured block (review r9)
            "speedup_sampled": {
                "word_count": round(refm["word_count"] / refm["word_count_sampled"], 2)
                if refm["word_count_sampled"]
                else None,
                "log_host": round(refm["log_host"] / refm["log_host_sampled"], 2)
                if refm["log_host_sampled"]
                else None,
            },
        }
    except Exception as exc:  # additive; never fail the bench
        reference_x10 = {"error": f"{type(exc).__name__}: {exc}"}

    # only a trailing sfN path component is a parseable scale factor;
    # anything else records as the raw basename, not path garbage
    base = os.path.basename(SF_DIR.rstrip("/"))
    if re.fullmatch(r"sf[\d.]+", base):
        try:
            sf_val: float | str = float(base[2:])
        except ValueError:
            sf_val = base
    else:
        sf_val = base
    bracket = {
        "runs": n_runs,
        "passes_per_run": 3,
        "per_run": bracket_runs,
        "value_min_over_runs": round(
            min(r["value_min_sum"] for r in bracket_runs), 3
        ),
        "value_median_over_runs": round(
            median(r["value"] for r in bracket_runs), 3
        ),
    }
    full_doc = {
        "metric": "rsmr-spark headline queries, total wall sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        "bracket": bracket,
        "sentinel": sentinel,
        "vs_prev": vs_prev,
        "tpch_x10": tpch_x10,
        "reference_x10": reference_x10,
        "sf": sf_val,
    }
    full_json = json.dumps(full_doc)
    # persist the complete artifact so per-query numbers survive the
    # driver's stdout tail-truncation (VERDICT r5 item 2); sha256 in the
    # compact line binds the committed file to this exact run
    import hashlib

    full_rel = None
    sha = hashlib.sha256(full_json.encode()).hexdigest()[:16]
    try:
        suffix = f"_c{_ENV_CPUS}" if _SCALING_RERUN else ""
        full_rel = f"docs/bench/BENCH_r{cur_round:02d}{suffix}_full.json"
        full_path = os.path.join(here, full_rel)
        os.makedirs(os.path.dirname(full_path), exist_ok=True)
        with open(full_path, "w") as fh:
            fh.write(full_json + "\n")
    except OSError:
        full_rel = None
    print(full_json)
    compact = {
        "metric": full_doc["metric"],
        "value": full_doc["value"],
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "value_min_sum": round(sum(timings_min.values()), 3),
        "bracket_runs": n_runs,
        "bracket_value_min_over_runs": bracket["value_min_over_runs"],
        "sentinel_sec": sentinel["sec"],
        "vs_prev": vs_prev,
        "tpch_x10_total_sec": tpch_x10.get("total_sec"),
        "reference_x10_speedup_sampled": reference_x10.get("speedup_sampled"),
        "full_artifact": full_rel,
        "full_sha256_16": sha,
    }
    print(json.dumps(compact))
    # FINAL line: the driver-parseable per-query map (VERDICT r16 item 2:
    # PERF_r*.json had per_query/scaling permanently empty because neither
    # printed line carried {"queries": ...} inside the driver's ~2000-char
    # stdout tail). Values are the per-query MIN of all passes (the
    # noise-robust series vs_prev already compares), rounded to 10 ms and
    # compact-separated so the whole 69-query line stays under the tail
    # window (measured 1926 bytes on the r16 name set; 10 ms keeps every
    # scaling/regression ratio faithful on 0.1 s+ queries). Medians, full
    # precision, and the artifact sha stay in the aggregate line above and
    # in the committed full artifact. This ADDS a line — the full-doc and
    # aggregate compact lines above are unchanged.
    print(
        json.dumps(
            {
                "metric": full_doc["metric"],
                "value": full_doc["value"],
                "unit": "sec",
                "sf": sf_val,
                "queries": {k: round(v, 2) for k, v in timings_min.items()},
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
