"""Sampled betweenness centrality (Brandes) as superstep DataFrame joins.

Betweenness — how often a node sits on shortest paths — is the classic
"bridge" centrality the reference's users compute in NetworkX on its
exported graphs; exact betweenness is all-pairs (O(V·E)), so the scale
form is Brandes' algorithm over a SAMPLE of source pivots (public
algorithm: Brandes 2001 §4; sampling per Brandes-Pich 2007 — nx's
``betweenness_centrality(k=...)``), which is exact when the sample is
every node.

Two passes, both level-synchronous and superstep-shaped:

1. **Forward, shortest-path counting** (:func:`shortest_path_counts`):
   the landmark-BFS frontier expansion (graph/landmarks.py) carrying
   one extra integer — σ(s,v), the NUMBER of shortest s→v paths:
   σ(s, v at dist d) = Σ σ(s, u) over predecessors u at dist d-1.
   Same join/anti-join shape and O(k·E) total work as
   landmark_distances, one extra map-side-combinable SUM. σ and dist
   are exact integers → the driver contract hash-gates this pass
   cross-engine (row ``path_counts``, unrolled per-level CTE oracle).

2. **Backward, dependency accumulation** (:func:`betweenness_sampled`):
   by DESCENDING level l, δ(s,v) = Σ over shortest-dag successors w
   (edges v→w with dist(w) = dist(v)+1) of σ_v/σ_w · (1 + δ(s,w));
   betweenness(v) = Σ over seeds s ≠ v of δ(s,v). Each level is one
   (state ⋈ edges ⋈ state) join restricted to two adjacent levels —
   again O(k·E) total across the run. δ is a float SUM (engine
   accumulation order), so parity with ``nx.betweenness_centrality``
   is test-gated with a tolerance, exactly like the other float-sum
   scores (Adamic-Adar, harmonic centrality).

Both passes run on the shared SuperstepRunner (Parquet commits,
per-partition lineage metrics, kill/resume bit-identical). Skew: the
frontier join keys on the frontier node — a hub's fan-out is one task's
probe of the persisted edge partition, the same profile as
landmark_distances (AQE skew-join is the mitigation tier; the seed
dimension adds k-way natural spread).

Sampling semantics: with ``sources`` = all nodes this is EXACT
directed betweenness (endpoints excluded — nx's default); with a
sample it is the raw partial sum over the sampled sources — callers
wanting nx's ``k=``-rescaled estimate multiply by n/k themselves
(kept out of the operator so the row stays a pure graph quantity).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from knext_spark.graph.superstep import (
    SuperstepResult,
    SuperstepRunner,
    unpersist_checkpoint,
)


def _directed_simple(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").where(
        F.col("src") != F.col("dst")
    ).dropDuplicates(["src", "dst"])


def shortest_path_counts_run(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    checkpoint_dir: str | None = None,
    run_id: str = "default",
    resume: bool = False,
    max_iter: int = 100,
    cadence: int = 1,
) -> SuperstepResult:
    """edges(src, dst) + sources(node) -> state (seed, node, dist,
    sigma): hop distance and exact shortest-path COUNT from every seed
    to every node it reaches within ``max_iter`` hops (seeds: dist 0,
    sigma 1). Directed (follows src->dst); self-loops and parallel
    edges are ignored (they lie on no shortest path)."""
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="knext_ckpt_")
    e = _directed_simple(edges)

    def init_state() -> DataFrame:
        return sources.select(
            F.col("node").alias("seed"),
            F.col("node"),
            F.lit(0).cast("long").alias("dist"),
            F.lit(1).cast("long").alias("sigma"),
        ).dropDuplicates(["seed", "node"])

    def step(state: DataFrame, it: int) -> tuple[DataFrame, dict]:
        frontier = state.where(F.col("dist") == it - 1).select(
            "seed", "node", "sigma"
        )
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .groupBy("seed", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        new = cand.join(
            state.select("seed", "node"), ["seed", "node"], "left_anti"
        ).select("seed", "node", F.lit(it).cast("long").alias("dist"), "sigma")
        n_new = new.count()
        if n_new == 0:
            return state, {"reached": 0}
        return state.unionByName(new), {"reached": n_new}

    def converged(m: dict) -> bool:
        return m.get("reached", 1) == 0

    runner = SuperstepRunner(
        spark, "path_counts", run_id, checkpoint_dir, cadence=cadence
    )
    return runner.run(init_state, step, converged, max_iter, resume=resume)


def shortest_path_counts(
    edges: DataFrame, sources: DataFrame, max_iter: int = 100
) -> DataFrame:
    """(seed, node, dist, sigma) for every reached pair — the
    hash-gateable integer core of Brandes (ephemeral checkpoint)."""
    res = shortest_path_counts_run(
        edges.sparkSession, edges, sources, max_iter=max_iter
    )
    out = res.state.localCheckpoint(eager=True)
    unpersist_checkpoint(res.state)
    return out


def betweenness_sampled(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    checkpoint_dir: str | None = None,
    run_id: str = "default",
    resume: bool = False,
    max_iter: int = 100,
    cadence: int = 1,
) -> DataFrame:
    """(node, betweenness) — Σ over sampled seeds s ≠ v of the Brandes
    dependency δ(s, v); exact directed ``nx.betweenness_centrality(G,
    normalized=False)`` when ``sources`` is every node. Nodes on no
    sampled shortest path report 0.0 (every graph node is present).

    Two SuperstepRunner phases share ``checkpoint_dir``: ``<run_id>_fwd``
    (path counting) and ``<run_id>_bwd`` (one superstep per level,
    deepest first); ``resume=True`` resumes whichever phase was killed
    (the forward pass is re-read from its own committed state).

    Keep ``cadence`` at 1 (default): the backward superstep joins two
    state-derived frames, so lazily-chained supersteps hit the
    inherited-sizeInBytes blowup documented in graph/superstep.py (the
    cc/k_core class of the hazard); Parquet commits reset it.
    """
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="knext_ckpt_")
    e = _directed_simple(edges)

    fwd = shortest_path_counts_run(
        spark,
        edges,
        sources,
        checkpoint_dir=checkpoint_dir,
        run_id=f"{run_id}_fwd",
        resume=resume,
        max_iter=max_iter,
        cadence=cadence,
    )
    sp = fwd.state
    # deepest level across all seeds — one tiny driver aggregate; the
    # backward pass runs exactly max_level supersteps (level
    # max_level-1 .. 0; level max_level has no successors, δ = 0)
    max_level = int(
        (sp.agg(F.max("dist").alias("m")).collect()[0]["m"]) or 0
    )

    def init_state() -> DataFrame:
        return sp.select(
            "seed", "node", "dist", "sigma", F.lit(0.0).alias("delta")
        )

    def step(state: DataFrame, it: int) -> tuple[DataFrame, dict]:
        # it = 1 processes the deepest level that HAS successors
        level = max_level - it
        cur = state.where(F.col("dist") == level).select(
            F.col("seed").alias("c_seed"),
            F.col("node").alias("c_node"),
            F.col("sigma").alias("c_sigma"),
        )
        succ = state.where(F.col("dist") == level + 1).select(
            F.col("seed").alias("s_seed"),
            F.col("node").alias("s_node"),
            F.col("sigma").alias("s_sigma"),
            F.col("delta").alias("s_delta"),
        )
        contrib = (
            cur.join(e, cur["c_node"] == e["src"])
            .join(
                succ,
                (F.col("dst") == F.col("s_node"))
                & (F.col("c_seed") == F.col("s_seed")),
            )
            .groupBy(
                F.col("c_seed").alias("seed"), F.col("c_node").alias("node")
            )
            .agg(
                F.sum(
                    (F.col("c_sigma").cast("double") / F.col("s_sigma"))
                    * (F.lit(1.0) + F.col("s_delta"))
                ).alias("__d")
            )
        )
        updated = (
            state.where(F.col("dist") == level)
            .join(contrib, ["seed", "node"], "left")
            .select(
                "seed",
                "node",
                "dist",
                "sigma",
                F.coalesce("__d", F.lit(0.0)).alias("delta"),
            )
        )
        new_state = state.where(F.col("dist") != level).unionByName(updated)
        return new_state, {"level": level}

    def converged(m: dict) -> bool:
        return m.get("level", 1) <= 0

    if max_level > 0:
        runner = SuperstepRunner(
            spark, "betweenness", f"{run_id}_bwd", checkpoint_dir, cadence=cadence
        )
        bwd = runner.run(init_state, step, converged, max_level, resume=resume)
        acc = bwd.state
    else:
        acc = init_state()

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .unionByName(sources.select("node"))
        .distinct()
    )
    per_node = (
        acc.where(F.col("node") != F.col("seed"))
        .groupBy("node")
        .agg(F.sum("delta").alias("betweenness"))
    )
    out = (
        nodes.join(per_node, "node", "left")
        .select(
            "node", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
        )
        .localCheckpoint(eager=True)
    )
    unpersist_checkpoint(sp)
    if max_level > 0:
        unpersist_checkpoint(acc)
    return out
