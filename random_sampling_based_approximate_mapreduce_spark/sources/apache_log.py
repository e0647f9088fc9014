"""Apache combined-log source: deterministic synthesis + schema-on-read parse
+ the reference's 7 log-analysis tasks.

The reference parses raw Apache combined-format lines positionally inside a
mapper (RandomizedApacheLogAnalysis.java:34-47) and dispatches 7 tasks
(hack/host/dateweek/size/totalsize/pagesize/page, dispatch at :54-111).

Our engine does the same schema-on-read as null-safe column expressions
(P6/P7): one ``regexp_extract`` per field, malformed lines -> null -> drop
(PERMISSIVE semantics, reference :113-115). Parsing is whole-stage-codegen
JVM work — no Python in the loop — and because the parse is a projection
over a single string column, sampling composes BELOW it (SampledFrame on
the raw lines, parse after: the 40x-speedup trick of the reference's
sampling reader, SURVEY.md §4.1).

``synthesize_raw_log`` derives a deterministic log line per ``events`` row
so correctness is oracle-checkable: the DuckDB oracle computes each task
directly from ``events`` with the same arithmetic, while the engine goes
the long way — format a raw line, parse it back, aggregate — proving the
parser faithful (tools/check_oracle.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The reference's 9 hack-probe path prefixes (RandomizedApacheLogAnalysis.java:61-62).
HACK_PREFIXES = (
    "/w00tw00t",
    "/phpMyAdmin",
    "/pma",
    "/myadmin",
    "/MyAdmin",
    "/phpTest",
    "/cgi-bin/php",
    "/cgi-bin/php5",
    "/cgi-bin/php-cgi",
)

# Concrete probe paths synthesized onto 'error' events (indexed by event_id % 9).
HACK_PATHS = (
    "/w00tw00t/attack",
    "/phpMyAdmin/index.php",
    "/pma/setup.php",
    "/myadmin/scripts",
    "/MyAdmin/admin.php",
    "/phpTest/zologize",
    "/cgi-bin/php",
    "/cgi-bin/php5",
    "/cgi-bin/php-cgi",
)

APACHE_TS_FMT = "dd/MMM/yyyy:HH:mm:ss Z"

# Combined-log parse regex (field walk mirrors RandomizedApacheLogAnalysis.java:34-47).
_LOG_RE = r'^(\S+) \S+ \S+ \[([^\]]+)\] "(\S+) (\S+) ([^"]+)" (\d{3}) (\S+)'


def _derived_cols(events: DataFrame) -> dict[str, Column]:
    """Deterministic access-log field derivations from the events table.

    Mirrored verbatim in ``ORACLE_ACCESS_LOG_CTE`` — keep in sync.
    """
    e = events
    is_hack = (e.event_type == "error") & (e.event_id % 7 < 3)
    hack_path = F.element_at(F.array(*[F.lit(p) for p in HACK_PATHS]), (e.event_id % 9 + 1).cast("int"))
    page_path = F.concat(F.lit("/page/"), e.event_type, F.lit("/"), (e.event_id % 20).cast("string"))
    path = F.when(is_hack, hack_path).otherwise(page_path)
    query = F.when(e.event_id % 5 == 0, F.concat(F.lit("?q="), e.user_id.cast("string"))).otherwise(F.lit(""))
    return {
        "host": F.concat(F.lit("host-"), (e.user_id % 50).cast("string")),
        "ts": e.ts,
        "method": F.when(e.event_type.isin("purchase", "signup"), "POST").otherwise("GET"),
        "path": path,
        "query": query,
        "status": F.when(e.event_type == "error", F.when(e.event_id % 2 == 0, 404).otherwise(500))
        .when(e.event_type == "purchase", 201)
        .otherwise(200)
        .cast("int"),
        "bytes": (F.floor(e.value * 37) + 100).cast("long"),
    }


def synthesize_raw_log(events: DataFrame) -> DataFrame:
    """events -> DataFrame[line: string] of Apache combined-format lines."""
    c = _derived_cols(events)
    line = F.format_string(
        '%s - - [%s] "%s %s%s HTTP/1.1" %d %d',
        c["host"],
        F.date_format(c["ts"], APACHE_TS_FMT),
        c["method"],
        c["path"],
        c["query"],
        c["status"],
        c["bytes"],
    )
    return events.select(line.alias("line"))


def parse_apache_log(
    raw: DataFrame, col: str = "line", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Raw lines -> typed access_log frame; malformed lines dropped (P7).

    Schema: host, ts, method, path (query stripped, P11), query, proto,
    status, bytes. ``keep`` names input columns carried through unchanged
    (e.g. a cluster/provenance id), so per-partition oracles can group
    parsed fields by origin without re-deriving the parse.

    Plan-shape note (measured): one regexp_extract per field looks like 7x
    regex work, but the alternative — packing all groups in one
    regexp_replace pass and splitting — benches 40% SLOWER end-to-end
    (3.6s vs 2.5s at sf0.1) because the malformed-row filter below is
    predicate-pushed with its input expression SUBSTITUTED: the packed
    mega-expression then re-evaluates inside a Filter under the exchange,
    single-threaded, erasing the single-pass win. Seven independent
    extracts keep the substituted filter down to three cheap regexes.

    Also measured: a regex-free positional parse (substring_index chains,
    semantically identical on the synthesized corpus) benches the same or
    slightly slower (2.8-3.6s vs 2.3-2.6s warm at sf0.1) — the cost here
    is try_to_timestamp, not regex matching, so there is nothing left to
    win in the field extraction.
    """
    c = F.col(col)
    extracted = raw.select(
        *[F.col(k) for k in keep],
        F.nullif(F.regexp_extract(c, _LOG_RE, 1), F.lit("")).alias("host"),
        # try_to_timestamp: malformed datetimes -> null -> dropped (P7),
        # instead of to_timestamp's ANSI-mode exception
        F.try_to_timestamp(F.regexp_extract(c, _LOG_RE, 2), F.lit(APACHE_TS_FMT)).alias("ts"),
        F.regexp_extract(c, _LOG_RE, 3).alias("method"),
        F.regexp_extract(c, _LOG_RE, 4).alias("request_path"),
        F.regexp_extract(c, _LOG_RE, 5).alias("proto"),
        F.regexp_extract(c, _LOG_RE, 6).cast("int").alias("status"),
        # non-numeric bytes field ('-') -> null via try_cast (ANSI-safe),
        # like the reference's permissive drop
        F.regexp_extract(c, _LOG_RE, 7).try_cast("long").alias("bytes"),
    )
    return extracted.select(
        *keep,
        "host",
        "ts",
        "method",
        # P11: path = request sans query string
        F.regexp_extract(F.col("request_path"), r"^([^?]*)", 1).alias("path"),
        F.nullif(F.regexp_extract(F.col("request_path"), r"\?(.*)$", 1), F.lit("")).alias("query"),
        "proto",
        "status",
        "bytes",
    ).where(F.col("host").isNotNull() & F.col("ts").isNotNull() & F.col("status").isNotNull())


def access_log(events: DataFrame) -> DataFrame:
    """The full round-trip: synthesize raw lines, parse them back.

    Synthesis (date_format) and parse (7 regexp matches/line) are both
    CPU-bound projections, and projections are never pushed below an
    exchange — so spread the INPUT across cores first and both run
    parallel (no-op when the scan already has enough partitions; see
    sources.tables.ensure_parallelism).
    """
    from .tables import ensure_parallelism

    return parse_apache_log(synthesize_raw_log(ensure_parallelism(events)))


# --- the 7 tasks (RandomizedApacheLogAnalysis.java:54-111) -----------------


def task_hack(log: DataFrame) -> DataFrame:
    """P8+G3: hack-probe requests counted per host."""
    probe = F.col("path").rlike("^(" + "|".join(HACK_PREFIXES) + ")")
    return log.where(probe).groupBy("host").agg(F.count(F.lit(1)).alias("cnt"))


def task_host(log: DataFrame) -> DataFrame:
    return log.groupBy("host").agg(F.count(F.lit(1)).alias("cnt"))


def task_dateweek(log: DataFrame) -> DataFrame:
    """P9+G3: requests per (day-of-week, hour) bucket 'EEE HH'."""
    return (
        log.select(F.date_format("ts", "EEE HH").alias("dateweek"))
        .groupBy("dateweek")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def task_size(log: DataFrame) -> DataFrame:
    """P10+G3: response sizes histogrammed to 100-byte buckets."""
    return (
        log.select((F.floor(F.col("bytes") / 100) * 100).cast("long").alias("size_bucket"))
        .groupBy("size_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def task_totalsize(log: DataFrame) -> DataFrame:
    """P12+G4: global byte sum (the reference's constant-'Total'-key trick
    becomes a plain global aggregate)."""
    return log.agg(F.sum("bytes").alias("total_bytes"))


def task_pagesize(log: DataFrame) -> DataFrame:
    return log.groupBy("path").agg(F.sum("bytes").alias("total_bytes"))


def task_page(log: DataFrame) -> DataFrame:
    return log.groupBy("path").agg(F.count(F.lit(1)).alias("cnt"))


LOG_TASKS = {
    "hack": task_hack,
    "host": task_host,
    "dateweek": task_dateweek,
    "size": task_size,
    "totalsize": task_totalsize,
    "pagesize": task_pagesize,
    "page": task_page,
}

# ---------------------------------------------------------------------------
# DuckDB oracle: the same derivations, straight from events (keep in sync
# with _derived_cols). Used as a WITH-prefix by catalog oracle queries.
# ---------------------------------------------------------------------------

_HACK_LIST_SQL = "[" + ", ".join(f"'{p}'" for p in HACK_PATHS) + "]"

ORACLE_ACCESS_LOG_CTE = f"""
WITH access_log AS (
  SELECT
    'host-' || (user_id % 50) AS host,
    ts,
    CASE WHEN event_type IN ('purchase','signup') THEN 'POST' ELSE 'GET' END AS method,
    CASE WHEN event_type = 'error' AND event_id % 7 < 3
         THEN {_HACK_LIST_SQL}[(event_id % 9) + 1]
         ELSE '/page/' || event_type || '/' || (event_id % 20)
    END AS path,
    CASE WHEN event_type = 'error' THEN (CASE WHEN event_id % 2 = 0 THEN 404 ELSE 500 END)
         WHEN event_type = 'purchase' THEN 201
         ELSE 200 END AS status,
    (floor(value * 37))::BIGINT + 100 AS bytes
  FROM events
)
"""
