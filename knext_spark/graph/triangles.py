"""Per-vertex triangle counting (one-shot, not iterative).

Two strategies, both exact against nx.triangles (undirected simple
graph — parallel edges collapsed, self-loops dropped, direction
ignored):

**Degree orientation + wedge join** (the general / sparse path).
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

**Bitset adjacency** (the dense small-id path). When both endpoint
columns are integers confined to [0, 4096) — detected with one cheap
min/max scan of the raw edges — each node's neighborhood packs into a
<= 64-word bitset, and the per-edge common-neighbor count
|N(a) ∩ N(b)| is a bit_count(AND) fold over the two carried bitsets.
Per-node counts follow from the identity
t(v) = 1/2 * sum over edges (a,b) incident to v of |N(a) ∩ N(b)|
(each triangle at v is seen from exactly two of v's edges), so NO
per-wedge or per-triangle row is ever materialized. On a dense
mod-1000 graph (1000 nodes, ~350k edges, ~5e7 triangles) the wedge
path must generate and shuffle ~6e7 wedge rows and explode 3 rows per
triangle; the bitset path does ~16 word-ops per edge instead (guide
§2.3-2.4: shuffle fewer bytes / remove the shuffle outright). The id
bound keeps the bitset table small (< 32 KB/node worst case) — a
sparse huge-id graph would waste width, which is why the gate is on
max id, not node count, and why the general path stays the default.

Shuffles (wedge path): 2 for degrees+orientation, 1 wedge self-join
(keyed on apex), 1 closing join (keyed on (lo, hi)), 1 final
per-vertex agg.

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

_BITSET_MAX_ID = 4096  # bitset path gate: <= 64 words / 32 KB per node

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


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

    dtypes = dict(edges.dtypes)
    if dtypes["src"] in _INT_TYPES and dtypes["dst"] in _INT_TYPES:
        # one narrow scan, no exchange — decides the strategy only
        lo, hi = edges.agg(
            F.min(F.least("src", "dst")), F.max(F.greatest("src", "dst"))
        ).first()
        if lo is not None and lo >= 0 and hi < _BITSET_MAX_ID:
            per_node = _bitset_per_node(und, int(hi))
            return nodes.join(per_node, "node", "left").select(
                "node", F.coalesce("triangles", F.lit(0)).alias("triangles")
            )

    per_node = _wedge_per_node(und)
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


def _wedge_per_node(und: DataFrame) -> DataFrame:
    """Degree-orientation wedge join: per-node counts from the
    (apex, x, y) triangle rows."""
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

    return (
        tris.select(F.explode(F.array("apex", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )


def _bitset_per_node(und: DataFrame, max_id: int) -> DataFrame:
    """Per-node counts via packed-bitset neighborhoods: ids in
    [0, max_id] become bit positions; |N(a) ∩ N(b)| per edge is a
    bit_count(AND) fold; t(v) = half the sum of those counts over v's
    incident edges. Exact (all-integer), and free of per-wedge /
    per-triangle rows."""
    nw = (max_id + 64) // 64  # words per bitset
    both = und.select(F.col("a").alias("v"), F.col("b").alias("u")).unionByName(
        und.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    words = (
        both.select(
            "v",
            (F.col("u") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(u % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("v", "w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    adj = (
        words.groupBy("v")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("m")
        )
        .select(
            "v",
            F.transform(
                F.sequence(F.lit(0), F.lit(nw - 1)),
                lambda w: F.coalesce(
                    F.element_at(F.col("m"), w.cast("int")),
                    F.lit(0).cast("long"),
                ),
            ).alias("bs"),
        )
    )
    cnts = (
        und.join(adj.select(F.col("v").alias("a"), F.col("bs").alias("ba")), "a")
        .join(adj.select(F.col("v").alias("b"), F.col("bs").alias("bb")), "b")
        .select(
            "a",
            "b",
            F.aggregate(
                F.zip_with(
                    "ba", "bb", lambda x, y: F.bit_count(x.bitwiseAND(y))
                ),
                F.lit(0).cast("long"),
                lambda acc, c: acc + c,
            ).alias("c2"),
        )
    )
    return (
        cnts.select(F.col("a").alias("node"), "c2")
        .unionByName(cnts.select(F.col("b").alias("node"), "c2"))
        .groupBy("node")
        .agg((F.sum("c2") / 2).cast("long").alias("triangles"))
    )
