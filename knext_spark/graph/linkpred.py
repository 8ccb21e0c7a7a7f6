"""Local clustering coefficient and neighbor-Jaccard link prediction.

Rounds out the link-graph operator tier on top of the triangle /
degree machinery. Reference parity targets are the public NetworkX
definitions (the reference repo itself builds nx graphs from its edge
TSVs — `/root/reference/src/knext/genes.py:150-165` — so these are the
analyses its users run downstream):

- ``clustering_coefficient`` == ``nx.clustering(G)`` on the simple
  undirected graph: C(v) = 2*T(v) / (d(v) * (d(v)-1)), 0.0 when
  d(v) < 2. Reuses :func:`triangle_count` (degree-oriented wedge join,
  O(sqrt(E)) out-degree bound) plus ONE extra degree aggregation —
  nothing here is quadratic.

- ``neighbor_jaccard`` == ``nx.jaccard_coefficient(G, non_edges)``
  restricted to pairs with >= 1 common neighbor (pairs with jaccard 0
  carry no signal and would be |V|^2 of the output): the classic
  link-prediction score |N(a) & N(b)| / |N(a) | N(b)|.

Scale shape of the Jaccard pair generation: common-neighbor pairs are
wedges at a shared apex w, so the cost is sum_w d(w)^2 — dominated by
hub apexes exactly like the LSH posting lists in pipeline/dedup.py.
The same governor applies: ``max_apex_degree`` drops apexes above a
degree cap before the self-join (a hub shared by everything
contributes near-zero Jaccard signal anyway: its pairs have huge
union sizes). The cap is None by default (exact mode, what the
DuckDB oracle mirrors); at web scale set it to ~sqrt of the tolerable
pair budget. Each surviving wedge is emitted once (x < y on the
canonical ids), counted per pair with a map-side-combinable count, so
the shuffle carries one row per candidate pair, not per wedge.

Shuffles: und (1 exchange, reused) -> degree agg (1) -> wedge
self-join co-partitioned on apex (1) -> pair count (1) -> two degree
joins + one left-anti edge-exclusion join (broadcast-eligible degree
side at small |V|; sort-merge at scale).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from knext_spark.graph.triangles import triangle_count


def _simple_undirected(edges: DataFrame) -> DataFrame:
    """Canonical simple graph: (a < b), self-loops dropped, parallel
    edges collapsed; explicit exchange so consumers ReuseExchange."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .repartition("a")
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """edges(src, dst) -> (node, clustering double) for every endpoint
    node, matching ``nx.clustering`` on the undirected simple graph
    (isolated-by-self-loop nodes and degree-1 nodes score 0.0)."""
    und = _simple_undirected(edges)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    tri = triangle_count(edges)  # includes every endpoint node, 0-filled
    return (
        tri.join(deg, "node", "left")
        .select(
            "node",
            F.when(
                F.coalesce("deg", F.lit(0)) >= 2,
                2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


def neighbor_jaccard(
    edges: DataFrame,
    min_common: int = 1,
    max_apex_degree: Optional[int] = None,
    include_existing: bool = False,
    adamic_adar: bool = False,
    resource_allocation: bool = False,
    preferential_attachment: bool = False,
) -> DataFrame:
    """Link-prediction candidates (a, b, common, union_size, jaccard
    [, adamic_adar]) over the undirected simple graph, one row per
    unordered pair (a < b) with at least ``min_common`` shared
    neighbors.

    ``include_existing=False`` (default) anti-joins pairs that are
    already edges — the link-PREDICTION view, nx.jaccard_coefficient's
    non-edges convention. ``max_apex_degree`` is the hub governor
    documented in the module docstring: None = exact.

    ``adamic_adar=True`` adds the Adamic-Adar index
    sum_w 1/ln(deg(w)) over the shared neighbors — the same wedge
    rows, one extra map-side-combinable sum in the SAME aggregation
    (zero extra shuffle; each wedge row carries the apex degree it
    already joined for the governor). nx.adamic_adar_index parity is
    test-gated with a float tolerance rather than hash-gated in the
    driver contract: ``ln`` is only 1-ulp-accurate and not guaranteed
    bit-identical across the JVM, DuckDB's libm, and CPython, so a
    micros hash would be flaky by construction. 1/ln(deg(w)) is
    always finite: a shared neighbor has degree >= 2 by definition,
    so ln(deg) >= ln 2.

    ``resource_allocation=True`` adds the Resource-Allocation index
    sum_w 1/deg(w) (nx.resource_allocation_index) — the same wedge
    rows and the same already-joined apex degree as Adamic-Adar, one
    more map-side-combinable sum in the SAME aggregation (zero extra
    shuffle). Like Adamic-Adar it is a float SUM whose accumulation
    order is engine-specific, so parity is test-gated with a
    tolerance rather than driver-hash-gated.

    ``preferential_attachment=True`` adds the Preferential-Attachment
    index deg(a)*deg(b) (nx.preferential_attachment) — a pure-integer
    product of the two endpoint degrees the output already joins for
    union_size, zero extra work, exact cross-engine (hash-gated in the
    driver contract).
    """
    und = _simple_undirected(edges)
    # adjacency, both orientations: apex w -> neighbor x
    adj = und.select(F.col("a").alias("w"), F.col("b").alias("x")).unionByName(
        und.select(F.col("b").alias("w"), F.col("a").alias("x"))
    )
    deg = adj.groupBy("w").agg(F.count("*").alias("deg"))
    if max_apex_degree is not None:
        adj = adj.join(
            deg.where(F.col("deg") > max_apex_degree).select("w"), "w", "left_anti"
        )
    need_deg_w = adamic_adar or resource_allocation
    if need_deg_w:
        adj = adj.join(deg.withColumnRenamed("deg", "deg_w"), "w")
    adj = adj.repartition("w")  # co-partition the wedge self-join
    aggs = [F.count("*").alias("common")]
    if adamic_adar:
        aggs.append(
            F.sum(1.0 / F.log(F.col("l.deg_w"))).alias("adamic_adar")
        )
    if resource_allocation:
        aggs.append(
            F.sum(1.0 / F.col("l.deg_w")).alias("resource_allocation")
        )
    pairs = (
        adj.alias("l")
        .join(adj.alias("r"), "w")
        .where(F.col("l.x") < F.col("r.x"))
        .groupBy(F.col("l.x").alias("a"), F.col("r.x").alias("b"))
        .agg(*aggs)
        .where(F.col("common") >= min_common)
    )
    if not include_existing:
        pairs = pairs.join(und, ["a", "b"], "left_anti")
    da = deg.select(F.col("w").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("w").alias("b"), F.col("deg").alias("deg_b"))
    out_cols = [
        F.col("a"),
        F.col("b"),
        F.col("common"),
        (F.col("deg_a") + F.col("deg_b") - F.col("common")).alias("union_size"),
        (
            F.col("common")
            / (F.col("deg_a") + F.col("deg_b") - F.col("common"))
        ).alias("jaccard"),
    ]
    if adamic_adar:
        out_cols.append(F.col("adamic_adar"))
    if resource_allocation:
        out_cols.append(F.col("resource_allocation"))
    if preferential_attachment:
        out_cols.append(
            (F.col("deg_a") * F.col("deg_b"))
            .cast("long")
            .alias("preferential_attachment")
        )
    return pairs.join(da, "a").join(db, "b").select(*out_cols)
