"""Relational surface beyond the reference: joins, windows, rollup, set-ops, subqueries (SURVEY.md 2.5).

Split out of the single-file catalog (round 8, VERDICT r7 item 6);
query text is unchanged. Entries self-register into the shared
``QUERIES`` registry on import — ``plans.catalog`` imports every
family module in the original source order.
"""

from __future__ import annotations

from ._base import (
    DataFrame,
    F,
    SamplingConfig,
    SparkSession,
    T,
    _WORD_SPLIT_SQL,
    _dec,
    _ensure_layout,
    load,
    register,
    sql_round,
)

# ===========================================================================
# 4. Relational surface (beyond the reference: joins/windows/rollup/set-ops
#    — "free with DataFrame", SURVEY.md §2.5, but judged as capability)
# ===========================================================================


@register(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2))) * (1.00 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(sum(l_quantity::BIGINT) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: multi-agg groupBy with exact decimal math",
)
def q_tpch_q1(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
    price, disc, tax = _dec("l_extendedprice"), _dec("l_discount", 4, 2), _dec("l_tax", 4, 2)
    one = F.lit("1.00").cast("decimal(4,2)")
    qty_l = F.col("l_quantity").cast("bigint")
    n = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty_l).alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
        (F.sum(qty_l).cast("double") / n).alias("avg_qty"),
        (F.sum(price).cast("double") / n).alias("avg_price"),
        (F.sum(disc).cast("double") / n).alias("avg_disc"),
        n.cast("long").alias("count_order"),
    )


@register(
    "tpch_q3_topk",
    """
    SELECT o.o_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: 3-way join + agg + deterministic top-k (broadcast dim, "
    "shuffle on orderkey)",
)
def q_tpch_q3(spark, sf_dir):
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    one = F.lit("1.00").cast("decimal(4,2)")
    rev = F.sum(_dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))).cast("double")
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "revenue_by_nation",
    """
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM region r
      JOIN nation n   ON n.n_regionkey = r.r_regionkey
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-style 5-way star join; dims broadcast, fact shuffles once",
)
def q_revenue_by_nation(spark, sf_dir):
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    one = F.lit("1.00").cast("decimal(4,2)")
    rev = F.sum(_dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))).cast("double")
    dims = F.broadcast(
        c.join(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "n_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(rev.alias("revenue"))
    )


@register(
    "top_orders_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="Window top-k per group (absent from the reference; SURVEY.md §2.5)",
)
def q_top_orders_per_priority(spark, sf_dir):
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_orderpriority", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


@register(
    "order_rollup",
    """
    SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS cnt,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP grouping-sets aggregate (absent from the reference)",
)
def q_order_rollup(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total"),
    )


@register(
    "urgent_only_customers",
    """
    SELECT c_nationkey, count(*)::BIGINT AS cnt
    FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    )
    GROUP BY c_nationkey
    """,
    doc="Set ops (EXCEPT) + semi/anti join: customers with URGENT orders but "
    "no LOW orders, counted per nation",
)
def q_urgent_only_customers(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.where(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    keys = urgent.subtract(low)  # EXCEPT DISTINCT
    return (
        c.join(keys, c.c_custkey == keys.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "exists_subquery_customers",
    """
    SELECT c_mktsegment, count(*)::BIGINT AS cnt
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 1000)
    GROUP BY c_mktsegment
    """,
    doc="Correlated EXISTS / NOT EXISTS subqueries through the SQL surface: "
    "Catalyst decorrelates them into a left-semi + left-anti join pair (no "
    "per-row subquery execution anywhere) — the rewrite the reference's "
    "hand-wired pipelines could never get",
)
def q_exists_subquery_customers(spark, sf_dir):
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS cnt
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 1000)
        GROUP BY c_mktsegment
        """
    )


@register(
    "events_grouping_sets",
    """
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
           count(*)::BIGINT AS cnt
    FROM events
    GROUP BY GROUPING SETS ((event_type), (strftime(ts, '%Y-%m-%d')), ())
    """,
    doc="GROUPING SETS (Expand operator): per-type totals, per-day totals, "
    "and the grand total in ONE pass over the input — three aggregations "
    "for one scan+shuffle",
)
def q_events_grouping_sets(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type, date_format(ts, 'yyyy-MM-dd') AS day, count(*) AS cnt
        FROM events
        GROUP BY GROUPING SETS ((event_type), (date_format(ts, 'yyyy-MM-dd')), ())
        """
    )


@register(
    "priority_distinct_customers",
    """
    SELECT o_orderpriority, count(DISTINCT o_custkey)::BIGINT AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Distinct aggregation (absent from the reference)",
)
def q_priority_distinct_customers(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(F.count_distinct("o_custkey").alias("n_customers"))


@register(
    "salted_orders_join",
    """
    SELECT c.c_mktsegment, count(*)::BIGINT AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Explicit salted join (skew fallback beyond AQE): big side salted, "
    "small side replicated per salt; results identical to the plain join "
    "- the oracle proves salting is semantics-preserving",
)
def q_salted_orders_join(spark, sf_dir):
    from ..operators.skew import salted_join

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(o, c, "o_custkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
    )


# Deterministic Zipf-head key: 75% of events funnel to user 0, the rest
# keep their uniform user_id — the "one mega-key" shape that breaks plain
# shuffle joins/aggs at 100 TB (one task owns the hot key). Derived, not
# stored, so both engines compute it identically.
_SKEW_USER_SQL = "CASE WHEN event_id % 4 < 3 THEN 0 ELSE user_id END"


def _skew_user():
    return (
        F.when(F.pmod(F.col("event_id"), F.lit(4)) < 3, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("skew_user")
    )


@register(
    "skewed_events_salted_join",
    f"""
    SELECT c.c_mktsegment, count(*)::BIGINT AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM (SELECT {_SKEW_USER_SQL} AS skew_user, value FROM events) e
    JOIN customer c ON e.skew_user = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Salted join under REAL skew: a deterministic Zipf-head key (75% "
    "of events on one user) joined to the customer dim with the big side "
    "salted 8 ways, so the hot key spreads over 8 tasks instead of "
    "funneling through one. The oracle is the plain join - salting is "
    "semantics-preserving; docs/SCALE.md holds the straggler measurement",
)
def q_skewed_events_salted_join(spark, sf_dir):
    from ..operators.skew import salted_join

    ev = load(spark, sf_dir, "events").select(_skew_user(), "value")
    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("skew_user"), "c_mktsegment"
    )
    joined = salted_join(ev, dim, "skew_user", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("total_value"),
    )


@register(
    "skewed_events_suggested_salts",
    f"""
    SELECT c.c_mktsegment, count(*)::BIGINT AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM (SELECT {_SKEW_USER_SQL} AS skew_user, value FROM events) e
    JOIN customer c ON e.skew_user = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="The salted join again, but n_salts is chosen by "
    "skew.suggest_n_salts from the OBSERVED hottest-key share (seeded "
    "sample + ceil(hot_share x shuffle_partitions)) instead of a "
    "caller-picked constant — the auto-tuned form a 100 TB job wants. "
    "The oracle is the plain join: whatever n the probe picks, salting "
    "is semantics-preserving, so correctness never depends on the "
    "suggestion",
)
def q_skewed_events_suggested_salts(spark, sf_dir):
    from ..operators.skew import salted_join, suggest_n_salts

    ev = load(spark, sf_dir, "events").select(_skew_user(), "value")
    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("skew_user"), "c_mktsegment"
    )
    n = suggest_n_salts(ev, "skew_user", sample_ratio=0.1)
    joined = salted_join(ev, dim, "skew_user", n_salts=n)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("total_value"),
    )


@register(
    "skewed_events_two_phase",
    f"""
    SELECT skew_user, count(*)::BIGINT AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM (SELECT {_SKEW_USER_SQL} AS skew_user, value FROM events)
    GROUP BY skew_user
    """,
    doc="Two-phase (salted) aggregation over the same Zipf-head key: "
    "groupBy(key, salt) partials then merge per key. For count/sum "
    "Catalyst's map-side partial agg already absorbs most skew; this "
    "demonstrates the explicit form used when partial state is too wide "
    "to combine map-side. Decimal sums keep both phases order-exact, so "
    "the plain-SQL oracle hash-matches",
)
def q_skewed_events_two_phase(spark, sf_dir):
    from ..operators.skew import two_phase_agg

    ev = load(spark, sf_dir, "events").select(
        _skew_user(), _dec("value").alias("value_dec")
    )
    out = two_phase_agg(
        ev,
        ["skew_user"],
        {"n_events": ("count", None), "total_value": ("sum", "value_dec")},
        n_salts=16,
    )
    return out.select(
        "skew_user", "n_events", F.col("total_value").cast("double").alias("total_value")
    )


@register(
    "bucketed_orders_join",
    """
    SELECT c.c_mktsegment, count(*)::BIGINT AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Co-bucketed join: both sides bucketBy(8, o_custkey) saved as "
    "managed tables (one-time per sf_dir), joined bucket-to-bucket - the "
    "exchange-free SMJ plan shape is asserted in tests/test_scale_layout"
    ".py; here the oracle hash-checks that bucketed results equal the "
    "plain join's",
)
def q_bucketed_orders_join(spark, sf_dir):
    import hashlib
    import os
    import shutil

    # Per-PID table names: bucket metadata lives in each session's catalog
    # but all sessions share the warehouse DIRECTORY, so a shared name lets
    # two concurrent sessions race on the same table path. One extra
    # materialization per process is the price of isolation.
    suffix = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_{os.getpid()}"
    ot, ct = f"rsmr_b_orders_{suffix}", f"rsmr_b_customer_{suffix}"
    if not spark.catalog.tableExists(ot) or not spark.catalog.tableExists(ct):
        # Bucket metadata lives in the (session-local) catalog, not the files:
        # a fresh session can find a stale warehouse dir from a prior run whose
        # table entry is gone. Clear it so saveAsTable can recreate both sides.
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for name in (ot, ct):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").write.bucketBy(
            8, "o_custkey"
        ).sortBy("o_custkey").saveAsTable(ot)
        load(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
        ).write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(ct)
    return (
        spark.table(ot)
        .join(spark.table(ct), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )


@register(
    "bloom_semi_join",
    """
    SELECT l.l_linestatus AS l_linestatus,
           sum(l.l_quantity::BIGINT)::BIGINT AS sum_qty,
           count(*)::BIGINT AS cnt
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
    doc="Bloom-filter semi-join reduction (operators/bloom.py): the urgent "
    "orders' DISTINCT md5 key buckets broadcast as a one-hash Bloom "
    "bitmap relation; lineitem is LEFT-SEMI filtered on the bucket "
    "INSIDE its scan stage, so non-joining rows never reach the "
    "l_orderkey exchange (~selectivity-fold fewer shuffle bytes). "
    "Bucket collisions (false positives) are dropped by the real join "
    "that follows, so the composition equals the plain join EXACTLY — "
    "the oracle is the plain-join SQL and correctness never depends on "
    "the filter. The merge hint pins the big-side shuffle the filter "
    "exists to shrink (without it the tiny sf dim would broadcast and "
    "hide the point); tests/test_bloom.py asserts the semi-join sits "
    "below the exchange in the executed plan",
)
def q_bloom_semi_join(spark, sf_dir):
    from ..operators.bloom import bloom_semi_join

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus", "l_quantity")
    urgent = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    reduced = bloom_semi_join(li, "l_orderkey", urgent, "o_orderkey")
    j = reduced.join(urgent.hint("merge"), reduced["l_orderkey"] == urgent["o_orderkey"])
    return j.groupBy("l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "word_count_multifile",
    f"""
    SELECT word, count(*)::BIGINT AS cnt
    FROM (
      SELECT unnest(string_split_regex(lower(text), '{_WORD_SPLIT_SQL}')) AS word
      FROM documents
      WHERE NOT regexp_matches(text, '[0-9]')
    )
    WHERE word <> '' AND NOT regexp_matches(word, '^[0-9]+$')
    GROUP BY word
    """,
    doc="word_count over a MULTI-FILE raw-text layout (documents.text "
    "split across 8 .txt part files, one-time per sf_dir): the scan "
    "parallelizes per file split with no repartition needed — the layout "
    "a 100 TB text corpus actually arrives in. Value-oracled against the "
    "single-table word_count SQL (text is newline-free, so the text-file "
    "round trip is line-faithful)",
)
def q_word_count_multifile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    src = _ensure_layout(
        f"/tmp/rsmr_text_multifile_{key}",
        lambda d: load(spark, sf_dir, "documents")
        .select("text")
        .repartition(8)
        .write.mode("overwrite")
        .text(d),
    )
    lines = spark.read.text(src)
    kept = T.drop_digit_lines(lines, "value")
    return T.explode_words(kept, "value").groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "word_count_byteblock_sampled",
    None,
    doc="BYTE-BLOCK cluster sampling over the 8-file text layout "
    "(sources/byteblock_text.py): hash-picked byte blocks become the "
    "scan's only partitions, so unpicked blocks cost zero I/O even "
    "within a single huge file — the raw-text transplant of the "
    "reference's byte-level skip (RandomizedXMLRecordReader.java:"
    "117-123) one level below file-sampling. Rows-only ceiling: a "
    "line's cluster membership is its byte offset's block, which no "
    "SQL oracle can recompute; the skip semantics are value-proven "
    "against a pure-Python ownership oracle in "
    "tests/test_byteblock_text.py instead",
    tags=("sampled",),
)
def q_word_count_byteblock_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from ..sources.byteblock_text import read_text_byteblock_sampled

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    src = _ensure_layout(
        f"/tmp/rsmr_text_multifile_{key}",
        lambda d: load(spark, sf_dir, "documents")
        .select("text")
        .repartition(8)
        .write.mode("overwrite")
        .text(d),
    )
    # 64 KiB blocks so the small test layout still has blocks to skip;
    # at corpus scale use the 16 MiB default (the natural text split)
    sf = read_text_byteblock_sampled(spark, src, 0.5, block_bytes=64 * 1024, seed=11)
    words = sf.transform(lambda df: T.explode_words(T.drop_digit_lines(df, "value"), "value"))
    return words.approx_count("word", alias="est_cnt")


@register(
    "word_count_file_sampled",
    None,
    doc="TWO-STAGE cluster sampling over the 8-file text layout: skip "
    "whole files (scan cost ~ file_ratio — the win no row sampler gets), "
    "Bernoulli rows within survivors, HT scale-up at the composed ratio. "
    "Measured 3x faster than row-only sampling at the same nominal ratio "
    "on a 410 MB corpus (docs/SCALE.md). Cluster-sampling variance is "
    "honest-flagged in the source docstring (sampled -> rows-only check)",
    tags=("sampled",),
)
def q_word_count_file_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from ..sources.text import read_text_file_sampled

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    src = _ensure_layout(
        f"/tmp/rsmr_text_multifile_{key}",
        lambda d: load(spark, sf_dir, "documents")
        .select("text")
        .repartition(8)
        .write.mode("overwrite")
        .text(d),
    )
    sf = read_text_file_sampled(spark, src, 0.5, SamplingConfig(ratio=0.5, seed=42))
    words = sf.transform(lambda df: T.explode_words(T.drop_digit_lines(df, "value"), "value"))
    return words.approx_count("word", alias="est_cnt")


def _bz2_text_layout(spark: SparkSession, sf_dir: str) -> str:
    """documents.text as 4 .bz2 part files (Hadoop Bzip2Codec output),
    one-time per sf_dir — real codec-written files, not Python bz2, so
    the block reader is exercised against the format as produced in the
    wild."""
    import hashlib

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]

    def _build(d: str) -> None:
        from ..sources.bzip2_block_text import assert_bz2_layout_shape

        load(spark, sf_dir, "documents").select("text").repartition(
            4
        ).write.mode("overwrite").option("compression", "bzip2").text(d)
        assert_bz2_layout_shape(d, "bz2 text layout")

    return _ensure_layout(f"/tmp/rsmr_text_bz2_{key}", _build)


@register(
    "word_count_bzip2_exact",
    f"""
    SELECT word, count(*)::BIGINT AS cnt
    FROM (
      SELECT unnest(string_split_regex(lower(text), '{_WORD_SPLIT_SQL}')) AS word
      FROM documents
      WHERE NOT regexp_matches(text, '[0-9]')
    )
    WHERE word <> '' AND NOT regexp_matches(word, '^[0-9]+$')
    GROUP BY word
    """,
    doc="word_count through the BZIP2-BLOCK source at ratio 1.0 "
    "(sources/bzip2_block_text.py): compressed byte ranges become the "
    "scan's partitions, each decoding only its own bzip2 blocks via "
    "independently-fabricated single-block streams — the splittable-"
    "compressed entry the reference gets from Hadoop's codec "
    "(RandomizedXMLRecordReader.java:76-106). At ratio 1.0 the read is "
    "the exact file, so this is VALUE-ORACLED against the same "
    "word_count SQL as the uncompressed layouts — proving the "
    "block-seam algebra on real Bzip2Codec-written files, not just the "
    "pytest fixtures (round 9, VERDICT r8 missing #2)",
)
def q_word_count_bzip2_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.bzip2_block_text import read_text_bzip2_sampled

    src = _bz2_text_layout(spark, sf_dir)
    # 64 KiB ranges so even the small test layout crosses many seams
    sf = read_text_bzip2_sampled(spark, src, 1.0, range_bytes=64 * 1024)
    kept = T.drop_digit_lines(sf.df, "value")
    return T.explode_words(kept, "value").groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "word_count_bzip2_sampled",
    None,
    doc="BZIP2-BLOCK cluster sampling (sources/bzip2_block_text.py): "
    "hash-picked COMPRESSED ranges are the only partitions, so unpicked "
    "ranges cost zero I/O inside a single .bz2 — the reference's "
    "sampled-split-of-compressed-stream semantics "
    "(RandomizedXMLRecordReader.java:76-106) restored for the one "
    "mainstream codec with independently-decodable blocks. Rows-only "
    "ceiling: a line's cluster is its block's compressed offset, which "
    "no SQL oracle can recompute; the ownership algebra is value-proven "
    "in tests/test_bzip2_block_text.py and the ratio-1.0 twin "
    "word_count_bzip2_exact is fully value-oracled",
    tags=("sampled",),
)
def q_word_count_bzip2_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.bzip2_block_text import read_text_bzip2_sampled

    src = _bz2_text_layout(spark, sf_dir)
    sf = read_text_bzip2_sampled(spark, src, 0.5, range_bytes=64 * 1024, seed=11)
    words = sf.transform(lambda df: T.explode_words(T.drop_digit_lines(df, "value"), "value"))
    return words.approx_count("word", alias="est_cnt")


def _zstd_text_layout(spark: SparkSession, sf_dir: str) -> str:
    """documents.text as seekable-zstd part files (zstd seekable_format:
    independent frames + skippable-frame seek table), one-time per
    sf_dir: text written by Spark, converted driver-side by the module's
    own spec-conforming writer. Small frames so even the test layout
    crosses many seams."""
    import hashlib

    from ..sources.tables import ensure_layout
    from ..sources.zstd_seekable_text import convert_text_to_seekable

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]

    def _build(d: str) -> None:
        import shutil
        import tempfile

        from ..sources.tables import assert_layout_shape
        from ..sources.zstd_seekable_text import parse_seek_table

        tmp = tempfile.mkdtemp(prefix="rsmr_zstd_txt_src_")
        try:
            load(spark, sf_dir, "documents").select("text").repartition(
                4
            ).write.mode("overwrite").text(tmp)
            convert_text_to_seekable(tmp, d, frame_bytes=16 * 1024)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        # build-time shape assertion (review r10: a dropped frame_bytes
        # collapsed this layout to one frame per file and the oracle
        # silently stopped crossing seams): every part must split into
        # multiple frames, and there must be multiple parts
        assert_layout_shape(
            d,
            min_parts=2,
            count_units=lambda p: len(parse_seek_table(p)),
            what="zstd text layout",
        )

    return ensure_layout(f"/tmp/rsmr_text_zstd_{key}", _build)


@register(
    "word_count_zstd_exact",
    f"""
    SELECT word, count(*)::BIGINT AS cnt
    FROM (
      SELECT unnest(string_split_regex(lower(text), '{_WORD_SPLIT_SQL}')) AS word
      FROM documents
      WHERE NOT regexp_matches(text, '[0-9]')
    )
    WHERE word <> '' AND NOT regexp_matches(word, '^[0-9]+$')
    GROUP BY word
    """,
    doc="word_count through the SEEKABLE-ZSTD frame source at ratio 1.0 "
    "(sources/zstd_seekable_text.py): the seek table (zstd contrib "
    "seekable_format, a public spec) gives exact per-frame offsets, so "
    "picked frames become the scan's partitions with zero scanning — "
    "closing the codec gap the byteblock source refuses (plain "
    "gzip/zstd stay refused; VERDICT r9 missing #2's named extension). "
    "At ratio 1.0 the read is the exact file, so this is VALUE-ORACLED "
    "against the same word_count SQL as the uncompressed and bzip2 "
    "layouts — proving the frame-seam algebra on Spark-written text "
    "converted by the module's spec-conforming writer (round 10)",
)
def q_word_count_zstd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.zstd_seekable_text import read_text_zstd_sampled

    src = _zstd_text_layout(spark, sf_dir)
    sf = read_text_zstd_sampled(spark, src, 1.0)
    kept = T.drop_digit_lines(sf.df, "value")
    return T.explode_words(kept, "value").groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "word_count_zstd_sampled",
    None,
    doc="SEEKABLE-ZSTD frame cluster sampling: hash-picked frames are "
    "the only partitions — unpicked frames are never opened, read, or "
    "decoded (the seek table is the skip index, exact by construction, "
    "no magic-number scanning). Rows-only ceiling: a line's cluster is "
    "its frame index in the compressed layout, which no SQL oracle can "
    "recompute; the ownership algebra is value-proven in "
    "tests/test_zstd_seekable_text.py and the ratio-1.0 twin "
    "word_count_zstd_exact is fully value-oracled",
    tags=("sampled",),
)
def q_word_count_zstd_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.zstd_seekable_text import read_text_zstd_sampled

    src = _zstd_text_layout(spark, sf_dir)
    sf = read_text_zstd_sampled(spark, src, 0.5, seed=11)
    words = sf.transform(lambda df: T.explode_words(T.drop_digit_lines(df, "value"), "value"))
    return words.approx_count("word", alias="est_cnt")


@register(
    "word_count_zstd_runs_exact",
    f"""
    SELECT word, count(*)::BIGINT AS cnt
    FROM (
      SELECT unnest(string_split_regex(lower(text), '{_WORD_SPLIT_SQL}')) AS word
      FROM documents
      WHERE NOT regexp_matches(text, '[0-9]')
    )
    WHERE word <> '' AND NOT regexp_matches(word, '^[0-9]+$')
    GROUP BY word
    """,
    doc="word_count through the SEEKABLE-ZSTD source at ratio 1.0 with "
    "the CONTIGUOUS-RUN pick (run_frames=4, round 13 / VERDICT r12 "
    "item 2): the sampling cluster is a run of 4 adjacent frames, "
    "picked by run key and decoded in one sequential pass per run — "
    "the BGZF run_blocks knob generalized to the frame rung (the "
    "seek-table frame list is the same SpanEntry offsets shape as the "
    "block hop). At ratio 1.0 every run is picked, so the result is "
    "the exact file and this query VALUE-ORACLES the run pick + run "
    "decode + seam ownership composition end-to-end against the same "
    "word_count SQL as word_count_zstd_exact — a wrong run boundary, a "
    "double-decoded interior seam line, or a dropped file-tail run "
    "would hash-mismatch here, exactly as word_count_gzip_runs_exact "
    "pins the BGZF twin. Like every ratio-1.0 ladder prover this is a "
    "CORRECTNESS path, never a performance story",
)
def q_word_count_zstd_runs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.zstd_seekable_text import read_text_zstd_sampled

    src = _zstd_text_layout(spark, sf_dir)
    sf = read_text_zstd_sampled(spark, src, 1.0, run_frames=4)
    kept = T.drop_digit_lines(sf.df, "value")
    return T.explode_words(kept, "value").groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def _bgzf_text_layout(spark: SparkSession, sf_dir: str) -> str:
    """documents.text as BGZF part files (SAM spec 4.1 blocked gzip:
    independent gzip members whose headers carry their own compressed
    size), one-time per sf_dir: text written by Spark, converted
    driver-side by the module's own spec-conforming writer. Small
    blocks so even the test layout crosses many seams."""
    import hashlib

    from ..sources.tables import ensure_layout
    from ..sources.bgzf_text import convert_text_to_bgzf

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]

    def _build(d: str) -> None:
        import shutil
        import tempfile

        from ..sources.tables import assert_layout_shape
        from ..sources.bgzf_text import scan_blocks

        tmp = tempfile.mkdtemp(prefix="rsmr_bgzf_txt_src_")
        try:
            load(spark, sf_dir, "documents").select("text").repartition(
                4
            ).write.mode("overwrite").text(tmp)
            convert_text_to_bgzf(tmp, d, block_bytes=16 * 1024)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        # build-time shape assertion (review r10): every part must split
        # into multiple DATA blocks (the EOF marker doesn't count), and
        # there must be multiple parts
        assert_layout_shape(
            d,
            min_parts=2,
            count_units=lambda p: sum(1 for e in scan_blocks(p) if e.d_size),
            what="bgzf text layout",
        )

    return ensure_layout(f"/tmp/rsmr_text_bgzf_{key}", _build)


@register(
    "word_count_gzip_exact",
    f"""
    SELECT word, count(*)::BIGINT AS cnt
    FROM (
      SELECT unnest(string_split_regex(lower(text), '{_WORD_SPLIT_SQL}')) AS word
      FROM documents
      WHERE NOT regexp_matches(text, '[0-9]')
    )
    WHERE word <> '' AND NOT regexp_matches(word, '^[0-9]+$')
    GROUP BY word
    """,
    doc="word_count through the BGZF BLOCKED-GZIP source at ratio 1.0 "
    "(sources/bgzf_text.py): the block hop (SAM spec 4.1 — every gzip "
    "member's header carries its compressed size in the BC FEXTRA "
    "subfield) gives exact per-block offsets, so picked blocks become "
    "the scan's partitions with ~18 bytes of header read per block — "
    "closing the LAST codec gap in the byte-skip ladder (plain "
    "monolithic .gz stays refused; the files here are valid gzip that "
    "zcat reads whole). At ratio 1.0 the read is the exact file, so "
    "this is VALUE-ORACLED against the same word_count SQL as the "
    "uncompressed, bzip2 and zstd layouts — proving the shared "
    "seam_text ownership algebra through a third codec (round 11). "
    "Like word_count_zstd_exact, this is a CORRECTNESS prover, not a "
    "performance path: the JVM reads multi-member .gz natively and "
    "faster; the source's wins live at small ratios (docs/SCALE.md). "
    "Reference parity: Hadoop-splittable-codec semantics "
    "(RandomizedXMLRecordReader.java:76-106) extended to gzip, which "
    "Hadoop itself cannot split",
)
def q_word_count_gzip_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.bgzf_text import read_text_bgzf_sampled

    src = _bgzf_text_layout(spark, sf_dir)
    sf = read_text_bgzf_sampled(spark, src, 1.0)
    kept = T.drop_digit_lines(sf.df, "value")
    return T.explode_words(kept, "value").groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "word_count_gzip_sampled",
    None,
    doc="BGZF block cluster sampling: hash-picked gzip members are the "
    "only partitions — unpicked blocks are never inflated (the header "
    "hop is the skip index; CRC32 verified by zlib on every block "
    "actually read). Rows-only ceiling: a line's cluster is its block "
    "index in the compressed layout, which no SQL oracle can recompute; "
    "the ownership algebra is value-proven in tests/test_bgzf_text.py "
    "and the ratio-1.0 twin word_count_gzip_exact is fully "
    "value-oracled",
    tags=("sampled",),
)
def q_word_count_gzip_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.bgzf_text import read_text_bgzf_sampled

    src = _bgzf_text_layout(spark, sf_dir)
    sf = read_text_bgzf_sampled(spark, src, 0.5, seed=11)
    words = sf.transform(lambda df: T.explode_words(T.drop_digit_lines(df, "value"), "value"))
    return words.approx_count("word", alias="est_cnt")


@register(
    "word_count_gzip_runs_exact",
    f"""
    SELECT word, count(*)::BIGINT AS cnt
    FROM (
      SELECT unnest(string_split_regex(lower(text), '{_WORD_SPLIT_SQL}')) AS word
      FROM documents
      WHERE NOT regexp_matches(text, '[0-9]')
    )
    WHERE word <> '' AND NOT regexp_matches(word, '^[0-9]+$')
    GROUP BY word
    """,
    doc="word_count through the BGZF source at ratio 1.0 with the "
    "CONTIGUOUS-RUN pick (run_blocks=4, round 12 / VERDICT r11 item 4): "
    "the sampling cluster is a run of 4 adjacent blocks, picked by run "
    "key and decoded in one sequential pass per run. At ratio 1.0 every "
    "run is picked, so the result is the exact file and this query "
    "VALUE-ORACLES the run pick + run decode + seam ownership "
    "composition end-to-end against the same word_count SQL as "
    "word_count_gzip_exact — a wrong run boundary, a double-decoded "
    "interior seam line, or a dropped file-tail run would hash-mismatch "
    "here. The knob's purpose is sequential cold I/O at moderate "
    "ratios (docs/SCALE.md round-12 addendum has the measured cells); "
    "this prover pins its correctness the same way the ratio-1.0 twins "
    "pin the other four ladder rungs",
)
def q_word_count_gzip_runs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.bgzf_text import read_text_bgzf_sampled

    src = _bgzf_text_layout(spark, sf_dir)
    sf = read_text_bgzf_sampled(spark, src, 1.0, run_blocks=4)
    kept = T.drop_digit_lines(sf.df, "value")
    return T.explode_words(kept, "value").groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def _bgzf_indexed_text_layout(spark: SparkSession, sf_dir: str) -> str:
    """documents.text as BGZF part files WITH htslib .gzi sidecars
    (round 13): same blocks as _bgzf_text_layout, plus the index the
    scanner prefers — the build asserts every part has its sidecar, so
    the layout genuinely exercises the O(1) index-scan path."""
    import hashlib
    import os

    from ..sources.tables import ensure_layout
    from ..sources.bgzf_text import GZI_SUFFIX, convert_text_to_bgzf

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]

    def _build(d: str) -> None:
        import shutil
        import tempfile

        from ..sources.tables import assert_layout_shape
        from ..sources.bgzf_text import scan_blocks

        tmp = tempfile.mkdtemp(prefix="rsmr_bgzfidx_txt_src_")
        try:
            load(spark, sf_dir, "documents").select("text").repartition(
                4
            ).write.mode("overwrite").text(tmp)
            parts = convert_text_to_bgzf(tmp, d, block_bytes=16 * 1024, index=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        missing = [p for p in parts if not os.path.exists(p + GZI_SUFFIX)]
        if missing:
            raise ValueError(f"bgzf indexed layout missing sidecars: {missing}")
        assert_layout_shape(
            d,
            min_parts=2,
            count_units=lambda p: sum(1 for e in scan_blocks(p) if e.d_size),
            what="bgzf indexed text layout",
            # sidecars sit beside the parts but are not parts
            skip=lambda p: p.endswith(GZI_SUFFIX),
        )

    return ensure_layout(f"/tmp/rsmr_text_bgzfidx_{key}", _build)


@register(
    "word_count_gzip_indexed_exact",
    f"""
    SELECT word, count(*)::BIGINT AS cnt
    FROM (
      SELECT unnest(string_split_regex(lower(text), '{_WORD_SPLIT_SQL}')) AS word
      FROM documents
      WHERE NOT regexp_matches(text, '[0-9]')
    )
    WHERE word <> '' AND NOT regexp_matches(word, '^[0-9]+$')
    GROUP BY word
    """,
    doc="word_count through the BGZF source at ratio 1.0 on a layout "
    "carrying htslib .gzi SIDECAR INDEXES (round 13): scan_blocks "
    "prefers the index when it sits next to the file, so the block "
    "table comes from O(1) metadata reads per file instead of the "
    "O(blocks) header hop — the zstd seek table's pick-cost model for "
    "the gzip rung (at 100 TB the hop is ~1.6B driver-side seeks on "
    "object storage; the indexed scan is one small GET per file). The "
    "layout build asserts every part has its sidecar, so this query "
    "VALUE-ORACLES the index parse -> block table -> pick -> batched "
    "read -> seam ownership composition end-to-end against the same "
    "word_count SQL as word_count_gzip_exact; index/hop table identity "
    "is additionally pinned by a Hypothesis sweep in "
    "tests/test_bgzf_text.py::TestGziIndex. Like every ratio-1.0 "
    "ladder prover this is a CORRECTNESS path, not a performance story",
)
def q_word_count_gzip_indexed_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.bgzf_text import read_text_bgzf_sampled

    src = _bgzf_indexed_text_layout(spark, sf_dir)
    sf = read_text_bgzf_sampled(spark, src, 1.0)
    kept = T.drop_digit_lines(sf.df, "value")
    return T.explode_words(kept, "value").groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "docs_partitioned_lang",
    """
    SELECT lang, source, count(*)::BIGINT AS n_docs,
           CAST(avg(n_chars) AS DOUBLE) AS avg_chars
    FROM documents WHERE lang IN ('en', 'fr')
    GROUP BY lang, source
    """,
    doc="Documents re-laid-out as hive-partitioned parquet (PARTITIONED BY "
    "lang, one-time per sf_dir); the lang IN (...) filter prunes to 2 of 5 "
    "partition directories at planning time (PartitionFilters, asserted in "
    "tests/test_scale_layout.py) — the layout+pruning path that turns a "
    "100 TB scan into a 2-partition scan. Value-oracled against the flat "
    "table",
)
def q_docs_partitioned_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _partitioned_docs(spark, sf_dir)
    return (
        part.where(F.col("lang").isin("en", "fr"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("n_chars").cast("double").alias("avg_chars"),
        )
    )


def _partitioned_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned (by lang) copy of the documents table, written once
    per sf_dir; returns the partition-discovering read."""
    import hashlib

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    src = _ensure_layout(
        f"/tmp/rsmr_docs_bylang_{key}",
        lambda d: load(spark, sf_dir, "documents")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(d),
    )
    return spark.read.parquet(src)


@register(
    "order_price_quantiles",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact interpolated quantiles per group (percentile <-> DuckDB "
    "quantile_cont); the sampled/sketch path is approx_quantile_events",
)
def q_order_price_quantiles(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        sql_round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        sql_round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        sql_round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@register(
    "approx_quantile_events",
    None,
    doc="KLL/Greenwald-Khanna approximate quantiles (approx_percentile "
    "sketch, mergeable across partitions - the 100 TB path; accuracy vs "
    "exact percentile asserted in tests)",
    tags=("approx",),
)
def q_approx_quantile_events(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 1000)").alias("p50"),
        F.expr("approx_percentile(value, 0.99, 1000)").alias("p99"),
    )
