"""Approximate neighborhood function (ANF / HyperBall) over the link
graph.

``anf(edges, hops=H)`` estimates, for EVERY node, the size of its
h-hop ball ``|B_H(v)|`` = the number of nodes within distance H in the
symmetrized graph — the neighborhood function of Palmer/Gibbons/
Faloutsos (ANF, KDD 2002) as made web-scale by Boldi/Rosa/Vigna
(HyperBall, 2011): give each node the HLL sketch of ``{v}`` and
max-merge every node's sketch with its neighbors' each round; after H
rounds node v's sketch is exactly the sketch of the SET ``B_H(v)``,
because HLL registers are a monotone max-semilattice (merge order and
duplication are irrelevant). Exact per-node ball sizes need an
all-pairs BFS (O(V·E) at 100 TB — dead on arrival); this is H rounds
of one register-join + max-merge, the standard way effective-diameter
/ centrality profiles are computed on web graphs.

Composition, not new machinery: the registers come from
``pipeline/sketch.hll_registers`` (md5-derived, engine-exact in
DuckDB), each round is ``pipeline/sketch.hll_merge`` over the edge
join, and the final per-node estimate is
``pipeline/sketch.hll_estimate`` — the driver row ``anf`` replays all
of it in SQL (fixed-H unroll; the estimate tail is the
``hll_distinct_tokens`` oracle with ``node`` as the group key).

Scale shape: the per-round shuffle carries at most
``nodes x min(ball, m)`` register rows (m = 16^k_hex), map-side
combined by the max-merge; the edge side is re-used every round from
one persisted symmetrized frame (the pagerank pattern). Rounds = H by
contract — the neighborhood function is DEFINED at each h, so there
is no convergence test to get wrong; callers wanting the effective
diameter run increasing H and read the estimate curve.

The loop runs on the shared ``SuperstepRunner`` (graph/superstep.py):
every round's register table commits to Parquet with
``_metrics.json`` (wall, rows, per-partition lineage), a killed run
resumes from the last committed round, and the Parquet read-back
bounds Catalyst plan depth at O(1). State actions act on the state
itself (the row count), so no lazy-chain hazard applies, but cadence
stays 1 by default for resumability parity.

The reference has no neighborhood-size surface (its graph pass is
per-pathway shortest-path probing, genes.py:185-206) — engine-mandate
operator for the link_graph family.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from knext_spark.graph.superstep import (
    SuperstepResult,
    SuperstepRunner,
    unpersist_checkpoint,
)
from knext_spark.pipeline.sketch import hll_estimate, hll_merge, hll_registers


def anf_run(
    spark: SparkSession,
    edges: DataFrame,
    hops: int = 3,
    k_hex: int = 3,
    checkpoint_dir: str | None = None,
    run_id: str = "default",
    resume: bool = False,
    cadence: int = 1,
) -> SuperstepResult:
    """Full-control ANF: SuperstepResult whose ``state`` is the
    per-node ball estimate (node, n_registers, v_zero, estimate) after
    ``hops`` max-merge rounds and whose ``metrics`` carry one entry
    per round (rows = register-table size — monotonically
    non-decreasing, a cheap skew/saturation audit). ``resume=True``
    restarts from the last committed round — bit-identical final
    registers, gated by the kill/resume test."""
    if hops < 0:
        raise ValueError(f"hops must be >= 0, got {hops}")
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="knext_ckpt_")

    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .persist()
    )

    def init_state() -> DataFrame:
        nodes = sym.select(F.col("src").alias("node")).distinct()
        # each node starts as the sketch of {itself}: one register row
        return hll_registers(
            nodes.withColumn("__self", F.col("node")),
            "__self",
            ["node"],
            k_hex=k_hex,
            salt="anf",
        )

    def step(state: DataFrame, it: int) -> tuple[DataFrame, dict]:
        # pull every neighbor's registers onto the node, then max-merge
        pulled = sym.join(
            state.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "register", "rho")
        nxt = hll_merge(state.unionByName(pulled), ["node"])
        return nxt, {"hop": it}

    def converged(m: dict) -> bool:
        return m.get("hop", 0) >= hops

    if hops == 0:
        # hop 0 is the initial sketch (every ball is exactly {v}) —
        # return it directly instead of paying one full merge superstep
        # whose committed state would be discarded and recomputed
        regs = init_state().localCheckpoint(eager=True)
        sym.unpersist()
        out = hll_estimate(regs, ["node"], k_hex=k_hex).localCheckpoint(eager=True)
        unpersist_checkpoint(regs)
        return SuperstepResult(out, 0, True, [])

    runner = SuperstepRunner(spark, "anf", run_id, checkpoint_dir, cadence=cadence)
    res = runner.run(init_state, step, converged, hops, resume=resume)
    sym.unpersist()
    out = hll_estimate(res.state, ["node"], k_hex=k_hex).localCheckpoint(eager=True)
    unpersist_checkpoint(res.state)
    return SuperstepResult(out, res.iterations, res.converged, res.metrics)


def anf(edges: DataFrame, hops: int = 3, k_hex: int = 3) -> DataFrame:
    """(node, n_registers, v_zero, estimate) — the estimated h-hop
    ball size ``|B_hops(v)|`` for every endpoint node of the
    symmetrized graph (see module docstring; estimate error is HLL's
    ~1.04/sqrt(16^k_hex), i.e. ~1.6% at the default m=4096, and the
    small-range linear-counting branch makes small balls near-exact).
    Convenience wrapper over :func:`anf_run`."""
    return anf_run(edges.sparkSession, edges, hops=hops, k_hex=k_hex).state
