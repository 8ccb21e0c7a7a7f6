"""Maximal independent set + greedy coloring by priority peeling.

Both operators run Luby-style rounds (Luby 1986) driven by a
DETERMINISTIC per-node priority — ``md5('mis:' || node) || ':' ||
node`` — instead of per-round randomness: a node acts when its
priority is a LOCAL MINIMUM among the still-active neighbors. The
suffix makes the priority injective (distinct nodes always compare
strictly), so every round's winner set is a pure function of the
graph — the whole trajectory is replayable in any engine that has
``md5``, which is what lets the DuckDB oracle re-run the exact
algorithm round by round (driver rows ``mis`` / ``coloring``; the
unrolled MATERIALIZED-CTE chain is idempotent at the fixpoint, extra
rounds are no-ops, a deeper-than-unroll graph fails the gate loudly —
the k-core oracle's failure direction, __spark_entry__.py).

- :func:`mis`: winners join the independent set and DOMINATE their
  neighbors out of candidacy; each round removes a constant expected
  fraction of the remaining edges, so rounds = O(log V) whp (Luby
  1986) regardless of density. Output is exactly NetworkX-maximal:
  independent (no internal edge) and maximal (every non-member has a
  member neighbor) — both gated by tests.
- :func:`coloring`: winners are only REMOVED (no domination) and take
  ``color = round``; two adjacent nodes can never win the same round
  (one of them beats the other), so the result is a proper coloring.
  Rounds = the longest strictly-priority-decreasing path, O(log V)
  expected on bounded-degree graphs but O(degree) on dense ones —
  use MIS-style domination (or k-core peeling first) on hub-heavy
  inputs; the contract row runs it on the sparse ring-chord graph for
  exactly this reason.

Link-graph uses at 100 TB: MIS is the standard symmetry-breaking
primitive (landmark/seed selection with no two seeds adjacent,
conflict-free scheduling of co-editing updates); the coloring
stratifies nodes into conflict-free batches so per-batch updates can
run without locks. Each round is one ``groupBy(node).min(priority)``
plus anti-joins keyed on the node column — one shuffle family per
round, the k-core cost shape (graph/kcore.py).

The loop runs on the shared ``SuperstepRunner`` (graph/superstep.py)
like pagerank/cc/lpa/k-core/toposort: every round's state commits to
Parquet with ``_metrics.json`` (wall, rows, winners, per-partition
lineage), a killed run resumes from the last committed round, and the
Parquet read-back bounds Catalyst plan depth at O(1). Commit cadence
is pinned 1 for the measured lazy-chain-recompute reason documented
at ``k_core`` (the per-round action counts a SIDE frame).

The state is ONE frame (columns ``a, b, tag``), the toposort
single-frame pattern: edge rows have ``b`` set; node rows have ``b``
NULL with ``tag`` NULL while undecided, the decision round (MIS
member / color) once decided. The node universe is the edge endpoint
set — isolated input nodes never appear (k-core's documented
edge-derived-membership scope).

The reference has no independent-set or coloring surface (its graph
pass is undirected shortest-path probing, genes.py:185-206) —
engine-mandate operators for the link_graph family.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from knext_spark.graph.superstep import (
    SuperstepResult,
    SuperstepRunner,
    unpersist_checkpoint,
)


def _priority(col: Column) -> Column:
    """Injective deterministic priority: md5('mis:'||id) || ':' || id.
    The md5 prefix is a fixed 32 hex chars, so comparison is random
    over the hash and falls through to the id only on (cosmologically
    unlikely) digest collisions — strict total order either way, and
    byte-identical in DuckDB (``md5('mis:'||x) || ':' || x``)."""
    s = col.cast("string")
    return F.concat(F.md5(F.concat(F.lit("mis:"), s)), F.lit(":"), s)


def _init_state(edges: DataFrame):
    """Symmetrized distinct edges (self-loops dropped) + one node row
    per endpoint, in the shared (a, b, tag) frame."""
    node_t = edges.schema["src"].dataType
    e = edges.select(
        F.col("src").alias("a"), F.col("dst").cast(node_t).alias("b")
    ).where(F.col("a") != F.col("b"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).dropDuplicates(["a", "b"])
    nodes = sym.select("a").distinct()
    return (
        sym.withColumn("tag", F.lit(None).cast("long")).unionByName(
            nodes.select(
                "a",
                F.lit(None).cast(node_t).alias("b"),
                F.lit(None).cast("long").alias("tag"),
            )
        ),
        node_t,
    )


def _winners(rem_edges: DataFrame, active: DataFrame) -> DataFrame:
    """Active nodes whose priority beats every remaining neighbor's
    (isolated active nodes win vacuously). No broadcast hint: early
    rounds can decide O(V) nodes, so neither side is guaranteed small
    — AQE picks a broadcast at runtime once the frontier shrinks."""
    minp = (
        rem_edges.select("a", _priority(F.col("b")).alias("__pb"))
        .groupBy("a")
        .agg(F.min("__pb").alias("__mp"))
    )
    return (
        active.join(minp, "a", "left")
        .where(F.col("__mp").isNull() | (_priority(F.col("a")) < F.col("__mp")))
        .select("a")
    )


def _run(
    spark: SparkSession,
    edges: DataFrame,
    dominate: bool,
    checkpoint_dir: str | None,
    run_id: str,
    resume: bool,
    max_iter: int,
    cadence: int,
) -> SuperstepResult:
    """Shared peeling loop; ``dominate=True`` = MIS (winners knock out
    their neighbors), ``False`` = coloring (winners only leave)."""
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="knext_ckpt_")
    algo = "mis" if dominate else "coloring"
    node_t = edges.schema["src"].dataType

    def init_state() -> DataFrame:
        state, _ = _init_state(edges)
        return state

    def step(state: DataFrame, it: int) -> tuple[DataFrame, dict]:
        rem_edges = state.where(F.col("b").isNotNull()).select("a", "b")
        node_rows = state.where(F.col("b").isNull()).select("a", "tag")
        active = node_rows.where(F.col("tag").isNull()).select("a")
        win = _winners(rem_edges, active)
        # one cheap job against the committed Parquet state (cadence=1)
        n_w = win.count()
        if n_w == 0:
            return state, {"decided": 0}
        if dominate:
            removed = win.unionByName(
                rem_edges.join(win, "a").select(F.col("b").alias("a"))
            ).distinct()
        else:
            removed = win
        new_edges = rem_edges.join(removed, "a", "left_anti").join(
            removed.withColumnRenamed("a", "b"), "b", "left_anti"
        )
        survivors = active.join(removed, "a", "left_anti")
        nxt = (
            new_edges.withColumn("tag", F.lit(None).cast("long"))
            .unionByName(
                node_rows.where(F.col("tag").isNotNull()).select(
                    "a", F.lit(None).cast(node_t).alias("b"), "tag"
                )
            )
            .unionByName(
                win.select(
                    "a",
                    F.lit(None).cast(node_t).alias("b"),
                    F.lit(it - 1).cast("long").alias("tag"),
                )
            )
            .unionByName(
                survivors.select(
                    "a",
                    F.lit(None).cast(node_t).alias("b"),
                    F.lit(None).cast("long").alias("tag"),
                )
            )
        )
        return nxt, {"decided": n_w}

    def converged(m: dict) -> bool:
        return m.get("decided", 1) == 0

    runner = SuperstepRunner(spark, algo, run_id, checkpoint_dir, cadence=cadence)
    return runner.run(init_state, step, converged, max_iter, resume=resume)


def mis_run(
    spark: SparkSession,
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    run_id: str = "default",
    resume: bool = False,
    max_iter: int = 1000,
    cadence: int = 1,
) -> SuperstepResult:
    """Full-control MIS: SuperstepResult whose ``state`` is
    (node, round) for every independent-set member (``round`` = the
    0-based Luby round the node won) and whose ``metrics`` carry one
    entry per round (``decided`` = winners). ``resume=True`` restarts
    from the last committed round — bit-identical final membership,
    gated by the kill/resume test."""
    res = _run(
        spark, edges, True, checkpoint_dir, run_id, resume, max_iter, cadence
    )
    out = (
        res.state.where(F.col("b").isNull() & F.col("tag").isNotNull())
        .select(F.col("a").alias("node"), F.col("tag").alias("round"))
        .localCheckpoint(eager=True)
    )
    unpersist_checkpoint(res.state)
    return SuperstepResult(out, res.iterations, res.converged, res.metrics)


def mis(edges: DataFrame, max_iter: int = 1000) -> DataFrame:
    """(node, round) for every member of the deterministic maximal
    independent set of the symmetrized graph (see module docstring).
    Convenience wrapper over :func:`mis_run` (ephemeral checkpoint
    dir; cadence pinned 1 — see ``k_core`` for the measured
    lazy-chain recompute rationale)."""
    return mis_run(edges.sparkSession, edges, max_iter=max_iter).state


def coloring_run(
    spark: SparkSession,
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    run_id: str = "default",
    resume: bool = False,
    max_iter: int = 1000,
    cadence: int = 1,
) -> SuperstepResult:
    """Full-control coloring: SuperstepResult whose ``state`` is
    (node, color) for EVERY endpoint node — a proper coloring (no edge
    is monochrome, test-gated) with ``color`` = the 0-based round the
    node was peeled. Kill/resume contract as :func:`mis_run`."""
    res = _run(
        spark, edges, False, checkpoint_dir, run_id, resume, max_iter, cadence
    )
    out = (
        res.state.where(F.col("b").isNull())
        .select(F.col("a").alias("node"), F.col("tag").alias("color"))
        .localCheckpoint(eager=True)
    )
    unpersist_checkpoint(res.state)
    return SuperstepResult(out, res.iterations, res.converged, res.metrics)


def coloring(edges: DataFrame, max_iter: int = 1000) -> DataFrame:
    """(node, color) proper greedy coloring by priority peeling (see
    module docstring; prefer sparse/bounded-degree inputs — on a dense
    graph the peel is O(max degree) rounds). Convenience wrapper over
    :func:`coloring_run`."""
    return coloring_run(edges.sparkSession, edges, max_iter=max_iter).state
