"""Per-vertex triangle counting by degree orientation (one-shot, not
iterative).

Standard compact-forward / degree-orientation scheme (Chiba–Nishizeki;
the MapReduce formulation is Suri & Vassilvitskii, WWW'11, public):
orient each undirected edge from the endpoint with smaller
(degree, id) to the larger; every triangle then has exactly ONE wedge
(two out-edges at its minimum-order apex), so wedges = out-edge
self-join at the apex, closed by a semi-ish join against the oriented
edge set. The orientation bounds per-node out-degree by O(sqrt(E)) on
any graph, which is what keeps the wedge join from exploding on hub
vertices — the reason this beats the naive 3-way edge self-join at
scale.

Exactness target: nx.triangles (undirected simple graph — parallel
edges collapsed, self-loops dropped, direction ignored).

Shuffles: 2 for degrees+orientation, 1 wedge self-join (keyed on
apex), 1 closing join (keyed on (lo, hi)), 1 final per-vertex agg.

Cache hygiene: nothing is persisted here (persisting would leak
block-manager memory past the call in long-lived sessions). Instead,
each multiply-consumed subtree is terminated with an EXPLICIT shuffle
exchange (``repartition``) so Spark's ReuseExchange rule computes it
once per job and every consumer reads the shuffle files: ``und`` is
consumed 3x (degrees, both sides of the orientation join) and
``oriented`` 3x (both wedge sides + the closing join). The
``repartition("lo")`` on ``oriented`` doubles as co-partitioning for
the wedge self-join (both sides keyed on the apex — zero additional
exchange). Callers invoking triangle_count repeatedly on the same
graph should persist the INPUT edge frame.

AQE note (measured, BENCH.md §4): adaptive execution DOES reuse the
two repartition stages at runtime (ReusedExchange in the final
adaptive plan), but its per-stage re-planning barriers on this
~100-exchange tree cost ~1.8x wall vs static planning, where the
whole-plan ReuseExchange rule fires up front (kgml corpus: 4.4s
static vs 7.8s adaptive median; a persist-based variant was slower
than either). For a fixed pipeline, run this plan with
``spark.sql.adaptive.enabled=false`` (there is nothing for AQE to
adapt — partitioning is explicit); keep AQE for ad-hoc graphs where
its skew-join handling on the wedge join may pay for itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def triangle_count(edges: DataFrame) -> DataFrame:
    """edges(src, dst) -> (node, triangles) for every node of the graph
    (nodes in no triangle included, count 0)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .repartition("a")  # explicit exchange: ReuseExchange point
    )
    # nodes from RAW endpoints: a vertex whose only edges are self-loops
    # still exists in the graph (count 0), matching nx.triangles
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    with_deg = und.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_hi"),
    ).repartition("lo")  # reused 3x + co-partitions the wedge self-join

    o1 = oriented.select(
        F.col("lo").alias("apex"), F.col("hi").alias("x"), F.col("deg_hi").alias("dx")
    )
    o2 = oriented.select(
        F.col("lo").alias("apex"), F.col("hi").alias("y"), F.col("deg_hi").alias("dy")
    )
    # wedge (x, y) at apex, ordered by the same (deg, id) total order
    wedges = o1.join(o2, "apex").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    tris = wedges.join(closing, ["x", "y"]).select("apex", "x", "y")

    per_node = (
        tris.select(F.explode(F.array("apex", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    out = nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )
    return out
