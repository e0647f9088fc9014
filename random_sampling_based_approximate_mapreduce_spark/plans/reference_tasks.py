"""Reference surface: word/char counting, the 7 Apache-log tasks, wireless link pairs, XML page words.

Split out of the single-file catalog (round 8, VERDICT r7 item 6);
query text is unchanged. Entries self-register into the shared
``QUERIES`` registry on import — ``plans.catalog`` imports every
family module in the original source order.
"""

from __future__ import annotations

from ._base import (
    AL,
    DataFrame,
    F,
    SampledFrame,
    SamplingConfig,
    SparkSession,
    T,
    WL,
    XP,
    _CHEAP_PIPE_BYTES,
    _WORD_SPLIT_SQL,
    ensure_parallelism,
    load,
    register,
)

# ===========================================================================
# 1. Reference surface — word/char counting (RandomizedWordCount /
#    RandomizedCharacterCount)
# ===========================================================================





@register(
    "word_count",
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
    doc="P2+P3+P4+G3: digit-line drop, tokenize, numeric-token drop, count "
    "(RandomizedWordCount.java:30-39)",
)
def q_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(
        load(spark, sf_dir, "documents").select("text"), skip_below_bytes=_CHEAP_PIPE_BYTES
    )
    kept = T.drop_digit_lines(docs, "text")
    return T.explode_words(kept, "text").groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "char_count",
    """
    SELECT ch, count(*)::BIGINT AS cnt
    FROM (SELECT unnest(string_split_regex(text, '')) AS ch FROM documents)
    WHERE ch <> ''
    GROUP BY ch
    """,
    doc="P5+G3: per-character counts (RandomizedCharacterCount.java:27-33)",
)
def q_char_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(
        load(spark, sf_dir, "documents").select("text"), skip_below_bytes=_CHEAP_PIPE_BYTES
    )
    return T.explode_chars(docs, "text").groupBy("ch").agg(F.count(F.lit(1)).alias("cnt"))


def _ref_delims_sql() -> str:
    return T.REFERENCE_DELIMS_RE.replace("'", "''")


@register(
    "word_count_reference_delims",
    f"""
    SELECT word, count(*)::BIGINT AS cnt
    FROM (
      SELECT unnest(string_split_regex(lower(text), '{_ref_delims_sql()}')) AS word
      FROM documents
      WHERE NOT regexp_matches(text, '[0-9]')
    )
    WHERE word <> '' AND NOT regexp_matches(word, '^[0-9]+$')
    GROUP BY word
    """,
    doc="P1+P2+P3+P4+G3 with the reference's EXACT delimiter set and "
    "normalize path (lower + percent-repair + url_decode, "
    "RandomizedWordCount.java:31,41-53). The corpus contains no "
    "percent-escapes, so the DuckDB mirror lowers without decoding (RE2 "
    "has no lookahead and DuckDB no url_decode); the decode/repair "
    "semantics are value-tested with crafted escapes in "
    "tests/test_text_functions.py",
)
def q_word_count_reference_delims(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(
        load(spark, sf_dir, "documents").select("text"), skip_below_bytes=_CHEAP_PIPE_BYTES
    )
    return (
        T.explode_words_reference(docs, "text")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "word_count_rowgroup_sampled",
    f"""
    SELECT word, count(*)::DOUBLE AS est_cnt
    FROM (
      SELECT unnest(string_split_regex(lower(text), '{_WORD_SPLIT_SQL}')) AS word
      FROM documents
      WHERE NOT regexp_matches(text, '[0-9]')
    )
    WHERE word <> '' AND NOT regexp_matches(word, '^[0-9]+$')
    GROUP BY word
    """,
    doc="Row-group cluster sampling (sources/rowgroup_parquet.py): the "
    "reference's skip-without-materialize (RandomizedXMLRecordReader.java:"
    "117-123) at the columnar layer — unpicked parquet row groups are "
    "never read; achieved ratio is exact from footer counts; HT-scaled "
    "word count on the sample. Value-oracle-able BECAUSE the testdata "
    "files hold a single row group: the never-empty pick guarantees that "
    "group, the footer-derived achieved ratio is exactly 1.0, and the HT "
    "estimate degenerates to the exact count — so word_count's own SQL "
    "(est_cnt = cnt::DOUBLE) is an exact mirror. The measured >2x "
    "scan-floor win on a 1.9 GB multi-row-group file is in docs/SCALE.md",
    tags=("sampled",),
)
def q_word_count_rowgroup_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.rowgroup_parquet import read_parquet_rowgroup_sampled

    sf = read_parquet_rowgroup_sampled(spark, f"{sf_dir}/documents.parquet", 0.5)
    words = sf.transform(lambda df: T.explode_words(T.drop_digit_lines(df, "text"), "text"))
    return words.approx_count("word", alias="est_cnt")


@register(
    "word_count_sampled",
    None,
    doc="A1+A6: sampled word count with HT scale-up (ratio=0.1, seed=42); "
    "accuracy asserted statistically in tests (non-SQL-oracle-able)",
    tags=("sampled",),
)
def q_word_count_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sf = SampledFrame.from_dataframe(docs, SamplingConfig(ratio=0.1, seed=42), observe=False)
    words = sf.transform(lambda df: T.explode_words(T.drop_digit_lines(df, "text"), "text"))
    return words.approx_count("word", alias="est_cnt")


@register(
    "word_count_unseeded_sampled",
    None,
    doc="A1 in the reference's UNSEEDED mode (round 9, VERDICT r8 item 6): "
    "SamplingConfig(seed=None) draws a fresh engine seed per run — the "
    "behavior of the reference's no-arg java.util.Random "
    "(RandomizedTextInputFormat uses an unseeded Random unless "
    "configured) — so two runs return DIFFERENT samples of the same "
    "design. Rows-only by nature (nondeterministic); the seeded twin "
    "word_count_sampled and the statistical accuracy tests cover the "
    "estimator, tests/test_sampled_frame.py pins that unseeded draws "
    "actually differ and still report honestly",
    tags=("sampled",),
)
def q_word_count_unseeded_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sf = SampledFrame.from_dataframe(docs, SamplingConfig(ratio=0.1, seed=None), observe=False)
    words = sf.transform(lambda df: T.explode_words(T.drop_digit_lines(df, "text"), "text"))
    return words.approx_count("word", alias="est_cnt")


# ===========================================================================
# 2. Reference surface — the 7 Apache-log tasks, via raw-line round-trip
#    (synthesize -> parse -> aggregate; oracle computes directly)
# ===========================================================================

def _log(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AL.access_log(load(spark, sf_dir, "events"))


@register(
    "log_hack",
    AL.ORACLE_ACCESS_LOG_CTE
    + """
    SELECT host, count(*)::BIGINT AS cnt FROM access_log
    WHERE """
    + " OR ".join(f"starts_with(path, '{p}')" for p in AL.HACK_PREFIXES)
    + " GROUP BY host",
    doc="P6+P8+G3: hack-probe hits per host (RandomizedApacheLogAnalysis.java:56-75)",
)
def q_log_hack(spark, sf_dir):
    return AL.task_hack(_log(spark, sf_dir))


@register(
    "log_host",
    AL.ORACLE_ACCESS_LOG_CTE + "SELECT host, count(*)::BIGINT AS cnt FROM access_log GROUP BY host",
    doc="P6+G3: requests per host (:77-79)",
)
def q_log_host(spark, sf_dir):
    return AL.task_host(_log(spark, sf_dir))


@register(
    "log_dateweek",
    AL.ORACLE_ACCESS_LOG_CTE
    + "SELECT strftime(ts, '%a %H') AS dateweek, count(*)::BIGINT AS cnt FROM access_log GROUP BY 1",
    doc="P9+G3: requests per weekday+hour (:82-86)",
)
def q_log_dateweek(spark, sf_dir):
    return AL.task_dateweek(_log(spark, sf_dir))


@register(
    "log_size",
    AL.ORACLE_ACCESS_LOG_CTE
    + "SELECT (floor(bytes / 100) * 100)::BIGINT AS size_bucket, count(*)::BIGINT AS cnt "
    "FROM access_log GROUP BY 1",
    doc="P10+G3: 100-byte response-size histogram (:89-91)",
)
def q_log_size(spark, sf_dir):
    return AL.task_size(_log(spark, sf_dir))


@register(
    "log_totalsize",
    AL.ORACLE_ACCESS_LOG_CTE + "SELECT sum(bytes)::BIGINT AS total_bytes FROM access_log",
    doc="P12+G4: global byte sum (:93-95)",
)
def q_log_totalsize(spark, sf_dir):
    return AL.task_totalsize(_log(spark, sf_dir))


@register(
    "log_pagesize",
    AL.ORACLE_ACCESS_LOG_CTE
    + "SELECT path, sum(bytes)::BIGINT AS total_bytes FROM access_log GROUP BY path",
    doc="P11+G4: bytes per page (:97-101)",
)
def q_log_pagesize(spark, sf_dir):
    return AL.task_pagesize(_log(spark, sf_dir))


@register(
    "log_page",
    AL.ORACLE_ACCESS_LOG_CTE + "SELECT path, count(*)::BIGINT AS cnt FROM access_log GROUP BY path",
    doc="P11+G3: hits per page (:104-107)",
)
def q_log_page(spark, sf_dir):
    return AL.task_page(_log(spark, sf_dir))


@register(
    "log_host_sampled",
    None,
    doc="The reference's flagship mode: sampled log scan (ratio=0.1) + per-host "
    "HT-scaled count with CI columns",
    tags=("sampled",),
)
def q_log_host_sampled(spark, sf_dir):
    # Bench-fixture caveat (VERDICT r9 item 6): synthesize_raw_log
    # builds the raw line from parquet ABOVE the sample, a cost the
    # reference never pays (it reads log text from disk) and one the
    # sample cannot skip — sampling correctly sits below the expensive
    # regex PARSE, but this query's measured sampled-speedup is floored
    # by the synthesis term and must not be read as the engine's
    # ceiling. log_host_file_sampled below is the disk-shape twin
    # (pre-written text, the fixture cost paid once at layout time).
    raw = AL.synthesize_raw_log(load(spark, sf_dir, "events"))
    sf = SampledFrame.from_dataframe(raw, SamplingConfig(ratio=0.1, seed=42), observe=False)
    parsed = sf.transform(lambda df: AL.parse_apache_log(df))
    return parsed.approx_count("host", ci=True, alias="est_cnt")


def raw_log_layout(spark, sf_dir: str) -> str:
    """The synthesized Apache access log written ONCE as plain text files
    — the reference's actual input shape (a log corpus on disk, not rows
    synthesized per run). Shared by log_host_file_sampled and
    tools/measure_reference_speedup.py."""
    import hashlib

    from ..sources.tables import canonicalize_part_names, ensure_layout

    # ':canon1' = the content-keyed deterministic write below; the key
    # must move with the recipe or boxes holding the old generation
    # would keep measuring a different byte draw (review r14)
    key = hashlib.md5(f"{sf_dir}:canon1".encode()).hexdigest()[:10]

    def _build(d: str) -> None:
        from ..sources.tables import assert_layout_shape

        # hash-partition + sort BY CONTENT (round 15, VERDICT r14
        # "what's wrong" #2): a bare round-robin repartition writes a
        # row placement that depends on upstream scan split planning,
        # so every rebuild of the layout is a different byte draw and
        # seeded byte-ratio picks drift across rounds. Keyed on the
        # line itself, placement and order are functions of the DATA
        # alone (ties are identical lines — byte-equal output either
        # way): same corpus -> bit-stable layout -> comparable picks.
        AL.synthesize_raw_log(load(spark, sf_dir, "events")).repartition(
            8, "line"
        ).sortWithinPartitions("line").write.mode("overwrite").text(d)
        # stable part names: the pick algebra seeds on the file path,
        # and Spark's per-job UUID in part names would redraw every
        # pick on every rebuild (sources.tables.canonicalize_part_names)
        canonicalize_part_names(d)
        # build-time shape assertion (review r10): the disk-shape twin is
        # only honest if the corpus actually spans multiple part files
        assert_layout_shape(d, min_parts=2, what="raw log layout")

    return ensure_layout(f"/tmp/rsmr_raw_log_{key}", _build)


@register(
    "log_host_file_sampled",
    None,
    doc="The reference's flagship shape end-to-end: raw access-log TEXT "
    "read from disk (written once at layout time), line-level Bernoulli "
    "sample (ratio=0.1) BELOW the regex parse — exactly where "
    "RandomizedRecordReader skips — then per-host HT-scaled count with "
    "CI. Unlike log_host_sampled there is no per-run synthesis above "
    "the sample, so its measured speedup is the engine's honest one "
    "(engine-RNG sample -> rows-only check; log_host_hash_sampled is "
    "the value-oracled estimator twin)",
    tags=("sampled",),
)
def q_log_host_file_sampled(spark, sf_dir):
    src = raw_log_layout(spark, sf_dir)
    raw = spark.read.text(src).withColumnRenamed("value", "line")
    sf = SampledFrame.from_dataframe(raw, SamplingConfig(ratio=0.1, seed=42), observe=False)
    parsed = sf.transform(lambda df: AL.parse_apache_log(df))
    return parsed.approx_count("host", ci=True, alias="est_cnt")


def bgzf_log_layout(spark, sf_dir: str) -> str:
    """The synthesized Apache access log as BGZF part files WITH htslib
    .gzi sidecars (round 14, VERDICT r13 item 2): the raw-log text
    layout converted by the module's own spec-conforming writer, so the
    reference's biggest example family (the seven log tasks,
    RandomizedApacheLogAnalysis.java:34-47) can ride the byte-skip
    ladder — the one workload where line sampling saturates (~6.8x at
    r=0.001, REF_SPEEDUP_r13.json) because it still reads every byte.
    Small blocks so even the test layout crosses many seams; sidecars
    asserted so the pick metadata path is the O(1) index scan."""
    import hashlib
    import os

    from ..sources.tables import ensure_layout
    from ..sources.bgzf_text import GZI_SUFFIX, convert_text_to_bgzf

    # 4 KiB blocks (vs the word-count layouts' 16 KiB): the sf0.001 raw
    # log is ~10 KB per part, and every part must cross >= 2 seams for
    # the prover to prove anything (assert_layout_shape below). Block
    # size is in the cache key so retuning invalidates the layout.
    block_bytes = 4 * 1024
    # ':canon1': the conversion source (raw_log_layout) moved to the
    # deterministic content-keyed write, so this derived layout's bytes
    # moved too — the key tracks it
    key = hashlib.md5(f"{sf_dir}:{block_bytes}:canon1".encode()).hexdigest()[:10]

    def _build(d: str) -> None:
        from ..sources.tables import assert_layout_shape
        from ..sources.bgzf_text import scan_blocks

        src = raw_log_layout(spark, sf_dir)
        parts = convert_text_to_bgzf(src, d, block_bytes=block_bytes, index=True)
        missing = [p for p in parts if not os.path.exists(p + GZI_SUFFIX)]
        if missing:
            raise ValueError(f"bgzf log layout missing sidecars: {missing}")
        assert_layout_shape(
            d,
            min_parts=2,
            count_units=lambda p: sum(1 for e in scan_blocks(p) if e.d_size),
            what="bgzf log layout",
            skip=lambda p: p.endswith(GZI_SUFFIX),
        )

    return ensure_layout(f"/tmp/rsmr_log_bgzf_{key}", _build)


@register(
    "log_host_gzip_exact",
    AL.ORACLE_ACCESS_LOG_CTE
    + "SELECT host, count(*)::BIGINT AS cnt FROM access_log GROUP BY host",
    doc="P6+G3 (log_host) through the BGZF BLOCKED-GZIP source at ratio "
    "1.0 (round 14, VERDICT r13 item 2): the access-log family routed "
    "over the byte-skip ladder — the reference's biggest example family "
    "(RandomizedApacheLogAnalysis.java:34-47) on the rung where the "
    "flagship line-sampling mode saturates (it reads every byte; "
    "picked gzip blocks are the only partitions, unpicked blocks never "
    "inflated). At ratio 1.0 the read is the exact log, so this "
    "VALUE-ORACLES block pick -> batched read -> seam ownership -> "
    "regex parse -> per-host count end-to-end against the SAME SQL as "
    "log_host — a wrong seam or a dropped block tail would "
    "hash-mismatch. Layout carries .gzi sidecars (pick metadata is the "
    "O(1) index scan). Like every ratio-1.0 ladder prover this is a "
    "CORRECTNESS path, never a performance story; the measured cells "
    "live in docs/SCALE.md (round-14 addendum)",
)
def q_log_host_gzip_exact(spark, sf_dir):
    from ..sources.bgzf_text import read_text_bgzf_sampled

    src = bgzf_log_layout(spark, sf_dir)
    sf = read_text_bgzf_sampled(spark, src, 1.0)
    parsed = AL.parse_apache_log(sf.df, col="value")
    return AL.task_host(parsed)


def bz2_log_layout(spark, sf_dir: str) -> str:
    """The synthesized Apache access log as Hadoop-Bzip2Codec part
    files (round 14): the bzip2 twin of ``bgzf_log_layout``, so the log
    family is value-oracled on BOTH blocked rungs — real codec-written
    files, not Python bz2, like every other .bz2 fixture."""
    import hashlib

    from ..sources.tables import canonicalize_part_names, ensure_layout

    # ':canon1' moves the key with the deterministic-write recipe
    # (see raw_log_layout)
    key = hashlib.md5(f"{sf_dir}:canon1".encode()).hexdigest()[:10]

    def _build(d: str) -> None:
        from ..sources.bzip2_block_text import assert_bz2_layout_shape

        AL.synthesize_raw_log(load(spark, sf_dir, "events")).repartition(
            4, "line"
        ).sortWithinPartitions("line").write.mode("overwrite").option(
            "compression", "bzip2"
        ).text(d)
        canonicalize_part_names(d)  # stable names -> stable picks
        assert_bz2_layout_shape(d, "bz2 log layout")

    return ensure_layout(f"/tmp/rsmr_log_bz2_{key}", _build)


@register(
    "log_host_bzip2_exact",
    AL.ORACLE_ACCESS_LOG_CTE
    + "SELECT host, count(*)::BIGINT AS cnt FROM access_log GROUP BY host",
    doc="P6+G3 (log_host) through the BZIP2-BLOCK source at ratio 1.0 "
    "(round 14): the bzip2 twin of log_host_gzip_exact — compressed "
    "byte ranges become the scan's partitions, each decoding only its "
    "own bzip2 blocks, with range-boundary line ownership resolved by "
    "the shared seam algebra. Small ranges (16 KiB) so even the sf0.01 "
    "fixture crosses multiple range seams per part. VALUE-ORACLES range "
    "pick -> block decode -> seam ownership -> regex parse -> per-host "
    "count against the SAME SQL as log_host; a wrong seam or a dropped "
    "range tail would hash-mismatch. Like every ratio-1.0 ladder prover "
    "this is a CORRECTNESS path, never a performance story — the log "
    "family's measured cells live in docs/bench/LOG_BGZF_COLD_x1000."
    "json and docs/SCALE.md (round-14 addendum)",
)
def q_log_host_bzip2_exact(spark, sf_dir):
    from ..sources.bzip2_block_text import read_text_bzip2_sampled

    src = bz2_log_layout(spark, sf_dir)
    sf = read_text_bzip2_sampled(spark, src, 1.0, range_bytes=16 * 1024)
    parsed = AL.parse_apache_log(sf.df, col="value")
    return AL.task_host(parsed)


# ===========================================================================
# 3. Reference surface — wireless link pairs + XML page words
# ===========================================================================


@register(
    "wireless_link_pairs",
    WL.ORACLE_WIRELESS_CTE
    + """
    SELECT greatest(snd_id, rcv_id) || '->' || least(snd_id, rcv_id) AS link,
           count(*)::BIGINT AS cnt
    FROM wireless GROUP BY 1
    """,
    doc="P13+P14+G1: canonical unordered link-pair traffic "
    "(RandomizedWirelessLogAnalysis.java:29-59)",
)
def q_wireless_link_pairs(spark, sf_dir):
    return WL.link_pairs(load(spark, sf_dir, "events"))


@register(
    "xml_page_words",
    f"""
    SELECT word, count(*)::BIGINT AS cnt
    FROM (
      SELECT unnest(string_split_regex(lower(text), '{_WORD_SPLIT_SQL}')) AS word
      FROM documents
    )
    WHERE word <> '' AND NOT regexp_matches(word, '^[0-9]+$')
    GROUP BY word
    """,
    doc="S3 round-trip: wrap docs as <page> XML, extract text back, word-count "
    "(randwordcount-over-wiki.xml; RandomizedXMLRecordReader.java:113-151)",
)
def q_xml_page_words(spark, sf_dir):
    return XP.page_word_counts(load(spark, sf_dir, "documents"))


@register(
    "xml_page_words_sampled",
    None,
    doc="S3+A1: page-level Bernoulli sampling BEFORE field extraction "
    "(the reference XML reader's skip-without-parse, RandomizedXMLRecord"
    "Reader.java:117-123) with HT-scaled word counts (ratio=0.25)",
    tags=("sampled",),
)
def q_xml_page_words_sampled(spark, sf_dir):
    pages = XP.wrap_documents(load(spark, sf_dir, "documents"))
    sf = SampledFrame.from_dataframe(pages, SamplingConfig(ratio=0.25, seed=42), observe=False)
    words = sf.transform(
        lambda df: T.explode_words(XP.extract_fields(df, "page_xml"), "text")
    )
    return words.approx_count("word", alias="est_cnt")


def xml_bzip2_layout(spark, sf_dir: str) -> str:
    """One single-line ``<page>`` record per document, as a bzip2-
    compressed text corpus (Hadoop Bzip2Codec output) — the reference's
    literal wiki.xml.bz2 input shape, built once per source dir. Shared
    by q_xml_page_words_bzip2 and tools/measure_reference_speedup.py
    (the x10/x100 flagship series measures THIS layout)."""
    import hashlib

    from ..sources.tables import canonicalize_part_names, ensure_layout

    # ':canon1' moves the key with the deterministic-write recipe
    # (see raw_log_layout)
    key = hashlib.md5(f"{sf_dir}:canon1".encode()).hexdigest()[:10]

    def _build(d: str) -> None:
        from ..sources.bzip2_block_text import assert_bz2_layout_shape

        load(spark, sf_dir, "documents").select(
            F.concat(
                F.lit("<page><title>doc-"),
                F.col("doc_id").cast("string"),
                F.lit("</title><text>"),
                F.col("text"),
                F.lit("</text></page>"),
            ).alias("value")
        ).repartition(4, "value").sortWithinPartitions(
            "value"
        ).write.mode("overwrite").option(
            "compression", "bzip2"
        ).text(d)  # content-keyed placement: bit-stable layout (see
        # raw_log_layout's determinism note)
        canonicalize_part_names(d)  # stable names -> stable picks
        assert_bz2_layout_shape(d, "xml bz2 layout")

    return ensure_layout(f"/tmp/rsmr_xml_bz2_{key}", _build)


@register(
    "xml_page_words_bzip2",
    f"""
    SELECT word, count(*)::BIGINT AS cnt
    FROM (
      SELECT unnest(string_split_regex(lower(text), '{_WORD_SPLIT_SQL}')) AS word
      FROM documents
    )
    WHERE word <> '' AND NOT regexp_matches(word, '^[0-9]+$')
    GROUP BY word
    """,
    doc="The reference's LITERAL flagship input shape: <page> XML records "
    "inside a .bz2 (randwordcount-over-wiki.xml.bz2), read through the "
    "round-9 bzip2-block source — compressed ranges are the partitions, "
    "each decoding only its own bzip2 blocks, page records extracted "
    "AFTER the byte-level read exactly as RandomizedXMLRecordReader "
    "does inside Hadoop's splittable codec (:76-106). One page per "
    "line (documents.text is newline-free), ratio 1.0 -> VALUE-ORACLED "
    "against the same SQL as xml_page_words; range-cluster sampling "
    "composes identically to word_count_bzip2_sampled",
)
def q_xml_page_words_bzip2(spark, sf_dir):
    from ..sources.bzip2_block_text import read_text_bzip2_sampled

    src = xml_bzip2_layout(spark, sf_dir)
    sf = read_text_bzip2_sampled(spark, src, 1.0, range_bytes=64 * 1024)
    pages = sf.df.select(F.col("value").alias("page_xml"))
    extracted = XP.extract_fields(pages)
    return T.explode_words(extracted, "text").groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )
