"""Landmark (per-seed) BFS distances and sampled centrality estimates.

The standard scale path for closeness/harmonic centrality: exact
all-pairs distances are quadratic, so pick k landmark seeds and
compute the distance from EVERY seed to every node — (seed, node,
dist) rather than :mod:`knext_spark.graph.bfs`'s min-over-seeds — then
estimate centralities from the sample (Eppstein-Wang style sampling;
public folklore). k rides along as a state column, so one superstep
still expands every seed's frontier together: work is O(k·E) total
across the run, one edge-probe shuffle (keyed on the frontier node)
plus one (seed, node) anti-join per round, round count = the largest
seed eccentricity (capped by ``max_iter``, which doubles as the
distance horizon exactly like bfs.py).

Centrality conveniences (library-level, float):

- ``harmonic_centrality_sampled``: sum over seeds of 1/d(seed, node)
  — nx.harmonic_centrality's incoming-distance convention restricted
  to the seed sample (direction="out" measures distance FROM seeds,
  i.e. the in-distance at the node).
- ``closeness_centrality_sampled``: (reached-1) / sum d over reached
  seeds, the Wasserman-Faust-normalized sampled form.

The driver-contract row gates ``landmark_distances`` (pure integers —
cross-engine exact); the float reciprocal sums are deliberately
test-gated against a Python oracle instead of hash-gated, since a
k-term double sum's rounding is order-dependent (same reasoning as
Adamic-Adar in linkpred.py).

Runs on the shared SuperstepRunner: per-round Parquet commits with
metrics + per-partition lineage, kill/resume bit-identical.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from knext_spark.graph.superstep import (
    SuperstepResult,
    SuperstepRunner,
    unpersist_checkpoint,
)


def landmark_distances_run(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    direction: str = "out",
    checkpoint_dir: str | None = None,
    run_id: str = "default",
    resume: bool = False,
    max_iter: int = 100,
    cadence: int = 1,
) -> SuperstepResult:
    """edges(src, dst) + sources(node) -> state (seed, node, dist) for
    every reached (landmark, node) pair; seeds at dist 0 per seed."""
    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out|in|both, got {direction!r}")
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="knext_ckpt_")

    e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    if direction == "in":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "both":
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates(["src", "dst"])

    def init_state() -> DataFrame:
        return sources.select(
            F.col("node").alias("seed"),
            F.col("node"),
            F.lit(0).cast("long").alias("dist"),
        ).dropDuplicates(["seed", "node"])

    def step(state: DataFrame, it: int) -> tuple[DataFrame, dict]:
        frontier = state.where(F.col("dist") == it - 1).select("seed", "node")
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .select("seed", F.col("dst").alias("node"))
            .dropDuplicates(["seed", "node"])
        )
        new = cand.join(
            state.select("seed", "node"), ["seed", "node"], "left_anti"
        ).select("seed", "node", F.lit(it).cast("long").alias("dist"))
        n_new = new.count()
        if n_new == 0:
            return state, {"reached": 0}
        return state.unionByName(new), {"reached": n_new}

    def converged(m: dict) -> bool:
        return m.get("reached", 1) == 0

    runner = SuperstepRunner(
        spark, "landmarks", run_id, checkpoint_dir, cadence=cadence
    )
    return runner.run(init_state, step, converged, max_iter, resume=resume)


def landmark_distances(
    edges: DataFrame,
    sources: DataFrame,
    direction: str = "out",
    max_iter: int = 100,
) -> DataFrame:
    """(seed, node, dist) for every reached pair — reached-only rows
    (the (k x V) NULL fill is the caller's left join if needed)."""
    res = landmark_distances_run(
        edges.sparkSession, edges, sources, direction=direction, max_iter=max_iter
    )
    out = res.state.localCheckpoint(eager=True)
    unpersist_checkpoint(res.state)
    return out


def harmonic_centrality_sampled(
    edges: DataFrame,
    sources: DataFrame,
    direction: str = "out",
    max_iter: int = 100,
) -> DataFrame:
    """(node, harmonic) = sum over seeds of 1/d(seed, node), d > 0 —
    nx.harmonic_centrality restricted to the seed sample. One groupBy
    over the landmark table; unreached pairs contribute 0 by absence."""
    d = landmark_distances(edges, sources, direction=direction, max_iter=max_iter)
    return (
        d.where(F.col("dist") > 0)
        .groupBy("node")
        .agg(F.sum(1.0 / F.col("dist")).alias("harmonic"))
    )


def closeness_centrality_sampled(
    edges: DataFrame,
    sources: DataFrame,
    direction: str = "out",
    max_iter: int = 100,
) -> DataFrame:
    """(node, closeness) = r / sum(d) over the r seeds that reach the
    node at d > 0 — the inverse mean distance over the reached sample
    (the self-pair is excluded by the d > 0 filter; nodes reached by
    no seed are absent)."""
    d = landmark_distances(edges, sources, direction=direction, max_iter=max_iter)
    g = (
        d.where(F.col("dist") > 0)
        .groupBy("node")
        .agg(F.count("*").alias("r"), F.sum("dist").alias("sum_d"))
    )
    return g.select(
        "node",
        (F.col("r") / F.col("sum_d")).cast("double").alias("closeness"),
    )
