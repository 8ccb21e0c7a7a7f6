"""Newman modularity of a node labeling over the link graph.

The reference exports its edge TSVs "for graph analysis"
(`/root/reference/README.rst:5-8`) and the engine's label-propagation
operator (graph/lpa.py) produces community labels — modularity is the
standard quality score for such a labeling, pinned to the public
NetworkX definition (``nx.algorithms.community.modularity``, γ as the
resolution parameter) on the undirected simple graph:

    Q = Σ_c [ L_c / m  −  γ · (d_c / (2m))² ]

with m the number of (undirected, simple) edges, L_c the number of
edges whose both endpoints carry label c, and d_c the summed degree of
the community's nodes. Self-loops are dropped and parallel edges
collapsed by the same canonicalization linkpred uses
(``_simple_undirected``); a caller wanting nx-parity on a multigraph
should collapse the same way before comparing.

Scale shape: the labeling is node-sized, the edge table edge-sized.
The per-community breakdown costs two label joins onto the edge
endpoints (shuffle on a, then on b — linear, co-partitionable) plus a
degree aggregation and one groupBy(label); every aggregate is
map-side-combinable. Nothing is quadratic, nothing iterates, and the
final score is a single-row sum over the (tiny) per-community frame.
Labels missing for an endpoint raise no error: those edges count
toward m and the nodes' degrees toward no community — identical to
scoring a partial partition (nx requires a full partition; here the
uncovered remainder simply contributes zero, documented rather than
hidden).

Float determinism: each community's contribution is a fixed dag of
correctly-rounded IEEE ops on integers (two divisions, one multiply,
one subtract) — bit-identical across Spark, DuckDB and CPython, so the
driver contract hash-gates the per-community rows at micros precision
(the same argument as neighbor_jaccard's score column). Only the
final ``modularity()`` total is a float SUM (engine-specific
accumulation order) and is therefore test-gated with a tolerance, not
hashed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from knext_spark.graph.linkpred import _simple_undirected


def community_contributions(
    edges: DataFrame, labels: DataFrame, resolution: float = 1.0
) -> DataFrame:
    """edges(src, dst) × labels(node, label) -> one row per community:
    (label, internal_edges, degree_sum, contribution) with
    contribution = internal/m − γ·(degree_sum/(2m))². The modularity
    of the labeling is the sum of the contribution column
    (:func:`modularity` collects it)."""
    und = _simple_undirected(edges)
    m = und.count()
    if m == 0:
        raise ValueError("modularity is undefined on an empty (simple) graph")
    la = labels.select(F.col("node").alias("a"), F.col("label").alias("__la"))
    lb = labels.select(F.col("node").alias("b"), F.col("label").alias("__lb"))
    internal = (
        und.join(la, "a")
        .join(lb, "b")
        .where(F.col("__la") == F.col("__lb"))
        .groupBy(F.col("__la").alias("label"))
        .agg(F.count("*").alias("internal_edges"))
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("__deg"))
    )
    dsum = (
        deg.join(labels, "node")
        .groupBy("label")
        .agg(F.sum("__deg").alias("degree_sum"))
    )
    # full outer: a community may have degree mass but zero internal
    # edges (and, on a partial labeling joined the other way, never the
    # reverse — every internal edge's endpoints carry the label)
    li = F.coalesce("internal_edges", F.lit(0)).cast("long")
    ds = F.coalesce("degree_sum", F.lit(0)).cast("long")
    half = ds.cast("double") / F.lit(2.0 * m)
    return dsum.join(internal, "label", "full_outer").select(
        "label",
        li.alias("internal_edges"),
        ds.alias("degree_sum"),
        (
            li.cast("double") / F.lit(float(m))
            - F.lit(float(resolution)) * half * half
        ).alias("contribution"),
    )


def modularity(
    edges: DataFrame, labels: DataFrame, resolution: float = 1.0
) -> float:
    """The scalar Q — sum of :func:`community_contributions`. One
    extra single-row aggregate over the per-community frame; float
    accumulation order is engine-specific (test-gated vs
    ``nx.algorithms.community.modularity`` with a tolerance)."""
    row = (
        community_contributions(edges, labels, resolution)
        .agg(F.sum("contribution").alias("q"))
        .collect()[0]
    )
    return float(row["q"] or 0.0)
