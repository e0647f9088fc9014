#!/usr/bin/env python
"""Measure the degree-ordered-orientation claim in operators/graph.py.

Compares the WEDGE count (the intermediate join size that dominates
triangle counting) between:
  naive    — undirected edge list self-joined at the shared vertex;
             every vertex contributes d*(d-1) ordered wedges, so a hub
             of degree d costs O(d^2)
  oriented — edges directed toward the higher (degree,id) rank; each
             vertex's out-degree is O(sqrt(m))-bounded, total wedges
             O(m^1.5)

Graph: a hub-and-spoke core (one vertex of degree HUB) over a sparse
random background — the skew shape real communication graphs have.
Both strategies must agree on the triangle count (asserted).

Usage: python tools/measure_triangle.py [--hub 2000] [--background 20000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hub", type=int, default=2000, help="hub degree")
    ap.add_argument("--background", type=int, default=20000, help="random background edges")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from random_sampling_based_approximate_mapreduce_spark.operators.graph import (
        canonical_edges,
        oriented_edges,
        triangle_count,
    )
    from random_sampling_based_approximate_mapreduce_spark.session import get_spark

    spark = get_spark("rsmr-measure-triangle")
    spark.sparkContext.setLogLevel("ERROR")

    n_nodes = args.hub + args.background // 4
    # hub 0 -- spokes 1..hub; background edges from a hash-derived pairing
    hub = spark.range(1, args.hub + 1).select(
        F.lit(0).alias("a"), F.col("id").alias("b")
    )
    bg = spark.range(args.background).select(
        (F.xxhash64(F.col("id")) % n_nodes).alias("a"),
        (F.xxhash64(F.col("id") + 1_000_000) % n_nodes).alias("b"),
    ).select(F.abs("a").alias("a"), F.abs("b").alias("b"))
    raw = hub.union(bg)
    edges = canonical_edges(raw, "a", "b").localCheckpoint(eager=True)
    m = edges.count()

    # --- naive: undirected adjacency self-join at the shared vertex
    t0 = time.monotonic()
    und = edges.selectExpr("lo AS u", "hi AS v").union(edges.selectExpr("hi AS u", "lo AS v"))
    naive_wedges = (
        und.alias("x")
        .join(und.alias("y"), F.col("x.v") == F.col("y.u"))
        .where(F.col("x.u") < F.col("y.v"))  # unordered wedge endpoints
        .count()
    )
    naive_s = time.monotonic() - t0

    t0 = time.monotonic()
    o = oriented_edges(edges).localCheckpoint(eager=True)
    e1 = o.select(F.col("src").alias("w_a"), F.col("dst").alias("w_b"))
    e2 = o.select(F.col("src").alias("w_b2"), F.col("dst").alias("w_c"))
    oriented_wedges = e1.join(e2, F.col("w_b") == F.col("w_b2")).count()
    oriented_s = time.monotonic() - t0

    tri = {r.metric: r.value for r in triangle_count(raw, "a", "b").collect()}

    # cross-check against lo<mid<hi enumeration
    e_a = edges.selectExpr("lo AS a1", "hi AS b1")
    e_b = edges.selectExpr("lo AS b2", "hi AS c2")
    e_c = edges.selectExpr("lo AS a3", "hi AS c3")
    ref = (
        e_a.join(e_b, F.col("b1") == F.col("b2"))
        .join(e_c, (F.col("a1") == F.col("a3")) & (F.col("c2") == F.col("c3")), "left_semi")
        .count()
    )
    assert tri["n_triangles"] == ref, (tri, ref)

    print(f"edges={m} hub_degree={args.hub} triangles={tri['n_triangles']}")
    print(f"naive    wedges={naive_wedges:>12,}  {naive_s:6.2f} s")
    print(f"oriented wedges={oriented_wedges:>12,}  {oriented_s:6.2f} s")
    print(f"wedge reduction: {naive_wedges / max(1, oriented_wedges):.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
