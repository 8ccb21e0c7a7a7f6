"""k-core decomposition by iterative peeling.

The k-core of an undirected graph is the maximal subgraph in which
every node has degree >= k (Seidman 1983). Peeling — repeatedly drop
nodes whose current degree is < k together with their incident edges —
reaches that fixpoint; each round is one degree aggregation plus two
anti-joins (both on the same symmetric edge frame, so Catalyst keys
every step on the node column: one shuffle family). Round count is
bounded by the peeling depth (graph-dependent, small in practice —
a hub-and-spoke graph peels in one round, a path graph of length L in
O(L)); ``localCheckpoint`` every few rounds truncates lineage so plans
stay O(1) deep, with deterministic retirement via
``unpersist_checkpoint`` (plain unpersist is a no-op on
localCheckpoint-backed frames).

The edge input is directed (src, dst); degree here is UNDIRECTED
(symmetrized, self-loops dropped, parallel edges collapsed) — the
standard k-core setting and NetworkX's (tests compare against
``nx.k_core`` exactly). The DuckDB oracle (driver row ``k_core``)
unrolls a generous fixed number of peeling rounds as MATERIALIZED
CTEs — peeling is idempotent at the fixpoint, so extra rounds are
no-ops and the unrolled chain equals the engine's converged result
whenever convergence happens within the unroll budget (a deeper graph
would surface as a red row, the safe failure direction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from knext_spark.graph.superstep import unpersist_checkpoint


def k_core(
    edges: DataFrame,
    k: int = 2,
    max_iter: int = 1000,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, core_deg) for every node of the k-core; ``core_deg`` is
    the node's degree WITHIN the core (>= k by construction).

    ``k >= 1`` only: membership is derived from surviving edges, so a
    zero-degree node never appears — nx.k_core(G, 0) keeps isolated
    nodes, and silently diverging there would betray the exact-parity
    claim, hence the guard."""
    if k < 1:
        raise ValueError(
            f"k_core requires k >= 1 (got {k}): the 0-core includes "
            "isolated nodes, which an edge-derived membership cannot see"
        )
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    und = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    cur = und
    retired = [und]
    for it in range(max_iter):
        bad = (
            cur.groupBy("src")
            .agg(F.count("*").alias("__d"))
            .where(F.col("__d") < k)
            .select("src")
        )
        if bad.isEmpty():
            break
        # no broadcast hint: the first rounds can prune O(V) nodes, so
        # the anti-join side is NOT guaranteed small — AQE picks a
        # broadcast at runtime once the frontier shrinks
        nxt = cur.join(bad, "src", "left_anti").join(
            bad.withColumnRenamed("src", "dst"), "dst", "left_anti"
        )
        if (it + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
            retired.append(nxt)
        cur = nxt
    out = cur.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("core_deg")
    )
    result = out.localCheckpoint(eager=True)
    for frame in retired:
        unpersist_checkpoint(frame)
    return result
