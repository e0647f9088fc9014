#!/usr/bin/env python
"""Local replica of the round driver's t2 correctness gate.

Runs every catalog query on Spark AND its DuckDB oracle SQL on the same
parquet tables, then compares row count, schema (column names), and sorted
values (exact equality; NaN==NaN). Queries without an oracle get a
rows-only check: the query must EXECUTE and collect (>=0 rows, >=1
column); no schema baseline is stored, so schema drift on rows-only
queries is caught by pytest, not here.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [--only name1,name2]
       [--plain-session] [--head N]

--plain-session builds a BARE SparkSession (no engine defaults at all),
replicating the round driver's environment — the round-1 nanos failure
was exactly an engine-session-only assumption, so the gate must also
pass with zero session preparation (tables.load carries the runtime
fixups). --head N checks only the first N catalog entries (the driver's
check budget is ~50).

Gate honesty (review r9): a run that checks ZERO queries exits 1 (a
typo'd --only must not read as green), unknown --only names exit 1, and
compare/normalize crashes count as that query's FAIL instead of
aborting the loop.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(df):
    """Sort columns by name, canonicalize values, sort rows."""

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype(float)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name, spark_pdf, duck_pdf):
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"schema: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems  # value comparison needs equal lengths anyway
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        va, vb = a[c].values, b[c].values
        if a[c].dtype.kind == "f":
            bad = [
                (x, y)
                for x, y in zip(va, vb)
                if not (x == y or (math.isnan(x) and math.isnan(y)))
            ]
        else:
            bad = [(x, y) for x, y in zip(va, vb) if x != y]
        if bad:
            problems.append(f"values[{c}]: e.g. {bad[:3]}")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--plain-session", action="store_true")
    ap.add_argument("--head", type=int, default=None)
    args = ap.parse_args()

    import duckdb

    from random_sampling_based_approximate_mapreduce_spark.plans.catalog import QUERIES
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark
    from random_sampling_based_approximate_mapreduce_spark.sources.tables import TABLES

    if args.plain_session:
        from pyspark.sql import SparkSession

        # getOrCreate() would silently reuse an already-configured
        # session and defeat the bare-session guarantee (review r9) —
        # refuse instead of quietly testing the wrong environment
        if SparkSession.getActiveSession() is not None:
            sys.exit(
                "--plain-session requires a fresh process: an active "
                "SparkSession already exists and getOrCreate() would "
                "reuse its configuration"
            )
        spark = (
            SparkSession.builder.appName("check-oracle-plain")
            .master("local[8]")
            .getOrCreate()
        )
    else:
        spark = get_spark("check-oracle", master="local[8]")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    only = set(args.only.split(",")) if args.only else None
    if only:
        unknown = only - set(QUERIES)
        if unknown:
            sys.exit(f"unknown --only names (not in the catalog): {sorted(unknown)}")
    n_pass = n_fail = 0
    for i, (name, qd) in enumerate(QUERIES.items()):
        if args.head is not None and i >= args.head:
            break
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = qd.spark(spark, args.sf)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if qd.oracle is None:
            if len(spdf.columns) < 1:
                print(f"FAIL  {name}: rows-only query returned zero columns")
                n_fail += 1
            else:
                print(f"ok    {name}: rows-only ({len(spdf)} rows, {len(spdf.columns)} cols) [{time.monotonic()-t0:.1f}s]")
                n_pass += 1
            continue
        try:
            dpdf = con.execute(qd.oracle).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        try:
            # inside the per-query guard: a pathological result shape
            # (duplicate column names, tz-aware dtypes) must count as
            # THIS query's FAIL, not abort the whole gate (review r9)
            problems = compare(name, spdf, dpdf)
        except Exception as e:
            print(f"FAIL  {name}: compare error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(spdf)} rows) [{time.monotonic()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    if n_pass + n_fail == 0:
        # a gate that checked nothing is NOT green (typo'd --only,
        # --head 0, or an over-filtered combination)
        sys.exit("no queries were checked — refusing to report success")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
