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


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Newman degree-assortativity coefficient of the undirected
    simple graph (``nx.degree_assortativity_coefficient(nx.Graph)``):
    the Pearson correlation of endpoint degrees over the edge ends,
    each edge contributing BOTH orientations (nx's joint degree
    histogram convention).

    Exactness by construction: returns ONE row carrying the raw
    integer moments (n ends, sum deg, sum deg·deg', sum deg²) and the
    coefficient assembled from them in a fixed IEEE dag — the moments
    are exact int64 sums (order-independent), so the whole row is
    hash-gateable cross-engine like the modularity contributions.
    int64 bound: sum(d²) ≤ Σ_v d(v)·d_max ≤ 2·E·d_max — overflows
    only past ~4e18 (E·d_max), far beyond any real corpus' simple
    graph; the driver-contract row re-checks nothing silently (an
    overflow would flip the hash).

    Cost: the linkpred canonicalization + one degree aggregation + two
    broadcast-eligible degree joins + one single-row aggregate.
    """
    from knext_spark.graph.linkpred import _simple_undirected

    und = _simple_undirected(edges)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    ends = und.join(da, "a").join(db, "b")
    mom = ends.agg(
        (2 * F.count("*")).cast("long").alias("n_ends"),
        F.sum(F.col("da") + F.col("db")).cast("long").alias("sum_d"),
        (2 * F.sum(F.col("da") * F.col("db"))).cast("long").alias("sum_dd"),
        F.sum(F.col("da") * F.col("da") + F.col("db") * F.col("db"))
        .cast("long")
        .alias("sum_d2"),
    )
    n = F.col("n_ends").cast("double")
    sx = F.col("sum_d").cast("double")
    sxy = F.col("sum_dd").cast("double")
    sx2 = F.col("sum_d2").cast("double")
    den = n * sx2 - sx * sx
    return mom.select(
        "n_ends",
        "sum_d",
        "sum_dd",
        "sum_d2",
        # degree-regular graph: 0/0 — NaN like nx (explicit: ANSI mode
        # raises on divide-by-zero rather than following IEEE)
        F.when(den != 0.0, (n * sxy - sx * sx) / den)
        .otherwise(F.lit(float("nan")))
        .alias("assortativity"),
    )
