"""k-truss decomposition by iterative edge peeling.

The k-truss (Cohen 2008) is the maximal subgraph in which every EDGE
participates in at least k-2 triangles — the edge-level strengthening
of the k-core (every k-truss edge's endpoints sit in the (k-1)-core),
and the standard cohesive-subgraph primitive for community seeding and
spam-link pruning. Peeling reaches it: compute per-edge triangle
support, drop edges below k-2, recompute — dropped edges can break
other edges' triangles, so the loop runs to a fixpoint.

Each round is one degree-orientation triangle enumeration over the
SURVIVING edge set (the same Chiba-Nishizeki / Suri-Vassilvitskii
scheme as graph/triangles.py — wedges at the minimum-(deg, id) apex,
per-node out-degree bounded O(sqrt(E)), so hub vertices never explode
the wedge join) with the triangle emitted per-EDGE instead of
per-vertex: each (apex, x, y) contributes one count to its three
canonical edges via a 3-array explode, one map-side-combinable
groupBy, and a left-anti prune. Round count is the truss peeling
depth (small in practice; a clique peels in one round).

Runs on the shared ``SuperstepRunner`` like pagerank/cc/lpa/k-core:
per-round Parquet commits with ``_metrics.json`` (wall, surviving
edges, peeled count, per-partition lineage), ``resume=True`` restarts
from the last committed round bit-identically (kill/resume test), and
the read-back bounds Catalyst plan depth at O(1) even though every
round contains a multi-join triangle plan.

Exactness target: ``nx.k_truss`` on the undirected simple graph
(parallel edges collapsed, self-loops dropped — nx.k_truss itself
REJECTS self-loop graphs, so sanitizing first is the only faithful
reading). ``k >= 2`` only: at k = 2 the support threshold is 0 and
the truss is the whole simple graph (converges in one round).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from knext_spark.graph.superstep import (
    SuperstepResult,
    SuperstepRunner,
    unpersist_checkpoint,
)


def _edge_support(und: DataFrame) -> DataFrame:
    """(a, b, support) for every canonical edge (a < b) of ``und`` —
    the number of triangles the edge closes within ``und``. Degree
    orientation exactly as graph/triangles.py; the explicit
    ``repartition`` exchanges are the ReuseExchange points (``und`` is
    consumed three times, ``oriented`` three times)."""
    und = und.repartition("a")
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
    ).repartition("lo")
    o1 = oriented.select(
        F.col("lo").alias("apex"), F.col("hi").alias("x"), F.col("deg_hi").alias("dx")
    )
    o2 = oriented.select(
        F.col("lo").alias("apex"), F.col("hi").alias("y"), F.col("deg_hi").alias("dy")
    )
    wedges = o1.join(o2, "apex").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    tris = wedges.join(closing, ["x", "y"]).select("apex", "x", "y")
    # each triangle feeds its three edges, re-canonicalized to (a < b)
    per_edge = (
        tris.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("apex", "x").alias("a"),
                        F.greatest("apex", "x").alias("b"),
                    ),
                    F.struct(
                        F.least("apex", "y").alias("a"),
                        F.greatest("apex", "y").alias("b"),
                    ),
                    F.struct(
                        F.least("x", "y").alias("a"),
                        F.greatest("x", "y").alias("b"),
                    ),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("support"))
    )
    return und.join(per_edge, ["a", "b"], "left").select(
        "a", "b", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )


def k_truss_run(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 3,
    checkpoint_dir: str | None = None,
    run_id: str = "default",
    resume: bool = False,
    max_iter: int = 1000,
) -> SuperstepResult:
    """Full-control variant: SuperstepResult whose ``state`` is the
    surviving canonical edge frame (a, b, support) — support counted
    WITHIN the truss — and whose metrics carry one entry per peeling
    round (rows = surviving edges, ``peeled`` = edges dropped)."""
    if k < 2:
        raise ValueError(
            f"k_truss requires k >= 2 (got {k}): support >= k-2 is "
            "vacuous below that and nx.k_truss rejects it too"
        )
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="knext_ckpt_")

    def init_state() -> DataFrame:
        return (
            edges.select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
            .withColumn("support", F.lit(0).cast("long"))
        )

    def step(state: DataFrame, it: int) -> tuple[DataFrame, dict]:
        # one eager localCheckpoint per round: the triangle plan
        # executes exactly ONCE (the convergence count and the commit
        # both read its blocks, instead of re-running the multi-join
        # plan), and the runner's commit-time retire frees the blocks
        # — cadence is pinned to 1 below precisely so that happens
        # every round (and so the 6-way-join state never chains lazily,
        # see the inherited-statistics hazard in graph/superstep.py)
        sup = _edge_support(state.select("a", "b")).localCheckpoint(eager=True)
        bad = sup.where(F.col("support") < k - 2).select("a", "b")
        n_bad = bad.count()
        if n_bad == 0:
            # commit the final supports with the surviving edges
            return sup, {"peeled": 0}
        nxt = sup.join(bad, ["a", "b"], "left_anti")
        return nxt, {"peeled": n_bad}

    def converged(m: dict) -> bool:
        return m.get("peeled", 1) == 0

    runner = SuperstepRunner(spark, "ktruss", run_id, checkpoint_dir, cadence=1)
    res = runner.run(init_state, step, converged, max_iter, resume=resume)
    if not res.converged:
        # a max_iter-truncated run's last commit carries supports
        # computed over the PREVIOUS edge set (the working state, fine
        # for resume); refresh them so the returned frame always honors
        # the "support counted WITHIN the surviving set" contract
        return SuperstepResult(
            _edge_support(res.state.select("a", "b")),
            res.iterations,
            res.converged,
            res.metrics,
        )
    return res


def k_truss(
    edges: DataFrame,
    k: int = 3,
    max_iter: int = 1000,
) -> DataFrame:
    """(a, b, support) for every edge of the k-truss (a < b canonical;
    ``support`` = triangles the edge closes within the truss, >= k-2
    by construction). Convenience wrapper over :func:`k_truss_run`
    (ephemeral checkpoint dir)."""
    res = k_truss_run(edges.sparkSession, edges, k=k, max_iter=max_iter)
    out = res.state.localCheckpoint(eager=True)
    unpersist_checkpoint(res.state)
    return out
