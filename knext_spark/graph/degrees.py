"""Degree aggregations, roots/leaves, degree histogram, hub salting.

Reference equivalents: ``G.in_degree()==0`` roots / ``out_degree()==0``
leaves (`/root/reference/src/knext/genes.py:163-165` — recomputed there
inside a per-node loop, O(V*E); here one aggregation each).

The degree histogram drives skew decisions: hub vertices (genes like
TP53 appear in hundreds of pathways; at web scale, hub pages have 1e8+
in-links) make the (src) join key and the (dst) aggregation key skewed.
``salted_out_edges`` splits a hub's out-edge fan-out across ``k`` salt
buckets so the rank⋈edges join and the partial aggregation spread over
k tasks instead of one straggler (two-level aggregation; standard skew
salting). AQE's skewJoin handles moderate skew automatically; explicit
salting is for the pathological hubs the histogram reveals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """(node, in_deg, out_deg) over distinct (src, dst) pairs."""
    e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    out_d = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("out_deg"))
    in_d = e.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("in_deg"))
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        )
    )


def roots(edges: DataFrame) -> DataFrame:
    """Nodes with in-degree 0 (src never appearing as dst) — left-anti
    join, no full degree materialization (`genes.py:163-164`)."""
    return (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .join(edges.select(F.col("dst").alias("node")).distinct(), "node", "left_anti")
    )


def leaves(edges: DataFrame) -> DataFrame:
    """Nodes with out-degree 0 (`genes.py:165`)."""
    return (
        edges.select(F.col("dst").alias("node"))
        .distinct()
        .join(edges.select(F.col("src").alias("node")).distinct(), "node", "left_anti")
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """log2-bucketed out-degree histogram: (bucket, min_deg, max_deg,
    n_nodes). Drives the salting decision — a bucket ≥ ~1e6 out-degree
    with nonzero nodes means explicit salting pays."""
    d = degrees(edges)
    b = F.floor(F.log2(F.greatest(F.col("out_deg"), F.lit(1))))
    return (
        d.groupBy(b.alias("bucket"))
        .agg(
            F.min("out_deg").alias("min_deg"),
            F.max("out_deg").alias("max_deg"),
            F.count("*").alias("n_nodes"),
        )
        .orderBy("bucket")
    )


def pick_salt_k(edges: DataFrame, hub_threshold: int = 1_000_000) -> int:
    """Choose a salt fan-out from the max out-degree: k = ceil(max_deg /
    hub_threshold), capped at 64. k=1 means no salting needed."""
    row = degrees(edges).agg(F.max("out_deg").alias("m")).collect()[0]
    m = row["m"] or 0
    return max(1, min(64, -(-m // hub_threshold)))


def salted_out_edges(edges: DataFrame, k: int) -> DataFrame:
    """Add a deterministic salt in [0, k) per (src, dst): the rank join
    replicates each src's rank k-fold (ranks ⋈ salt values), so each
    salted partition holds 1/k of a hub's fan-out."""
    return edges.withColumn("salt", F.pmod(F.xxhash64("src", "dst"), F.lit(k)))
