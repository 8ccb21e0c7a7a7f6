"""Topological levels + cycle detection by Kahn peeling.

Kahn's algorithm (Kahn 1962) assigns each node of a digraph its
*topological level*: level 0 = the nodes with no incoming edges,
level L = the nodes whose every predecessor sits at a level < L with
at least one at L-1 (i.e. the longest-path depth from any source —
exactly ``nx.topological_generations`` order on a DAG). Nodes the
peeling never reaches are the ones that lie ON or DOWNSTREAM OF a
directed cycle (a self-loop counts); they are reported with
``level = -1``, so the operator doubles as a cycle detector:
the graph is a DAG iff no row carries -1.

Link-graph uses at 100 TB: dependency ordering over code-import /
citation / hyperlink graphs (batchable by level), dead-code/leaf
stratification, and a cheap structural DAG check before running
DAG-only algorithms. Each peeling round is one distinct-dst aggregate
plus two anti-joins keyed on the node column — one shuffle family per
round, same cost shape as k-core peeling (graph/kcore.py); round
count is bounded by the depth of the acyclic prefix, NOT by |V|.

The loop runs on the shared ``SuperstepRunner`` (graph/superstep.py)
like pagerank/cc/lpa/k-core: every round's state commits to Parquet
with ``_metrics.json`` (wall, rows, leveled count, per-partition
lineage), a killed run resumes from the last committed round, and the
Parquet read-back bounds Catalyst plan depth at O(1). Commit cadence
is 1 for the measured reason documented at ``k_core``: peeling steps
run an action against the working anti-join chain, so a lazier
cadence re-executes prior rounds.

The state is ONE frame holding both remaining edges and node levels
(columns ``a, b, level``): edge rows have ``b`` set, node rows have
``b`` NULL and ``level`` NULL until assigned — a single-frame state is
what lets the runner's commit/resume treat every algorithm uniformly.

The reference has no topological surface (its graph pass is
undirected shortest-path probing, genes.py:185-206) — engine-mandate
operator for the link_graph family. The DuckDB oracle (driver row
``topo_levels``) unrolls a generous fixed number of peeling rounds as
MATERIALIZED CTEs; peeling is idempotent at the fixpoint, so extra
rounds are no-ops, and a deeper-than-unroll graph fails the gate
loudly rather than passing wrongly (same failure direction as the
k-core/k-truss oracles).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from knext_spark.graph.superstep import (
    SuperstepResult,
    SuperstepRunner,
    unpersist_checkpoint,
)


def topological_levels_run(
    spark: SparkSession,
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    run_id: str = "default",
    resume: bool = False,
    max_iter: int = 1000,
    cadence: int = 1,
) -> SuperstepResult:
    """Full-control variant: SuperstepResult whose ``state`` is the
    mixed edge/node frame (see module docstring) and whose ``metrics``
    carry one entry per peeling round (``leveled`` = nodes assigned
    that round). Use :func:`topological_levels` for the plain
    (node, level) output."""
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="knext_ckpt_")

    # node ids keep the caller's type (string ids work like k_core's);
    # dst is cast to src's type so the node/edge union stays consistent
    node_t = edges.schema["src"].dataType

    def init_state() -> DataFrame:
        # directed, parallel edges collapsed; self-loops KEPT — a
        # self-loop is a 1-cycle and must pin its node at level -1
        e = edges.select(
            F.col("src").alias("a"),
            F.col("dst").cast(node_t).alias("b"),
        ).dropDuplicates(["a", "b"])
        nodes = (
            e.select("a")
            .unionByName(e.select(F.col("b").alias("a")))
            .distinct()
        )
        return e.withColumn("level", F.lit(None).cast("long")).unionByName(
            nodes.select(
                "a",
                F.lit(None).cast(node_t).alias("b"),
                F.lit(None).cast("long").alias("level"),
            )
        )

    def step(state: DataFrame, it: int) -> tuple[DataFrame, dict]:
        rem_edges = state.where(F.col("b").isNotNull()).select("a", "b")
        node_rows = state.where(F.col("b").isNull()).select("a", "level")
        unleveled = node_rows.where(F.col("level").isNull()).select("a")
        # frontier: unleveled nodes with no incoming edge remaining
        frontier = unleveled.join(
            rem_edges.select(F.col("b").alias("a")), "a", "left_anti"
        )
        # one cheap job against the committed Parquet state (cadence=1)
        n_f = frontier.count()
        if n_f == 0:
            return state, {"leveled": 0}
        # no broadcast hint: the first rounds can level O(V) nodes, so
        # the anti-join side is NOT guaranteed small — AQE picks a
        # broadcast at runtime once the frontier shrinks
        new_edges = rem_edges.join(frontier, "a", "left_anti")
        nxt = (
            new_edges.withColumn("level", F.lit(None).cast("long"))
            .unionByName(
                node_rows.where(F.col("level").isNotNull()).select(
                    "a", F.lit(None).cast(node_t).alias("b"), "level"
                )
            )
            .unionByName(
                frontier.select(
                    "a",
                    F.lit(None).cast(node_t).alias("b"),
                    F.lit(it - 1).cast("long").alias("level"),
                )
            )
            .unionByName(
                unleveled.join(frontier, "a", "left_anti").select(
                    "a",
                    F.lit(None).cast(node_t).alias("b"),
                    F.lit(None).cast("long").alias("level"),
                )
            )
        )
        return nxt, {"leveled": n_f}

    def converged(m: dict) -> bool:
        return m.get("leveled", 1) == 0

    runner = SuperstepRunner(
        spark, "toposort", run_id, checkpoint_dir, cadence=cadence
    )
    res = runner.run(init_state, step, converged, max_iter, resume=resume)
    out = (
        res.state.where(F.col("b").isNull())
        .select(
            F.col("a").alias("node"),
            F.coalesce(F.col("level"), F.lit(-1)).cast("long").alias("level"),
        )
        .localCheckpoint(eager=True)
    )
    unpersist_checkpoint(res.state)
    return SuperstepResult(out, res.iterations, res.converged, res.metrics)


def topological_levels(
    edges: DataFrame, max_iter: int = 1000, checkpoint_every: int = 1
) -> DataFrame:
    """(node, level) for EVERY node of the digraph: level = Kahn
    generation index (longest-path depth from any source) for the
    acyclic prefix, ``-1`` for nodes on or downstream of a directed
    cycle. The graph is a DAG iff ``where(level = -1)`` is empty.
    Convenience wrapper over :func:`topological_levels_run` (ephemeral
    checkpoint dir; cadence pinned like ``k_core``'s, see there for
    the measured lazy-chain recompute rationale)."""
    return topological_levels_run(
        edges.sparkSession,
        edges,
        max_iter=max_iter,
        cadence=max(1, checkpoint_every),
    ).state
