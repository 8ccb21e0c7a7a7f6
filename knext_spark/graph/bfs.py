"""Multi-source BFS hop distances over the directed edge table.

The classic seed-distance pass of link analysis (distance-from-seeds
is a standard spam/trust feature — TrustRank's first step — and the
building block for closeness/harmonic centrality estimates from
sampled sources). The reference builds nx digraphs whose users run
exactly this downstream (`/root/reference/src/knext/genes.py:150-165`
feeds nx.shortest_path in its propagation pass); here it is a
first-class distributed operator.

Frontier-expansion formulation, one superstep per hop: the committed
state is the REACHED set (node, dist); each round joins the previous
frontier (dist == round-1) against the edge table and anti-joins
already-reached nodes, so every node enters the state exactly once,
with its MINIMUM hop distance — BFS's invariant — and total work is
O(sum of frontier out-degrees) = O(E) across the whole run, not per
round. The frontier⋈edges join keys on the node column every round
(one shuffle family); the anti-join's right side is the committed
state re-read from Parquet, which also bounds Catalyst plan depth at
O(1).

Runs on the shared ``SuperstepRunner`` (graph/superstep.py) like
pagerank/cc/lpa/k-core: per-round Parquet commits with
``_metrics.json`` (wall, rows, newly-reached count, per-partition
lineage), ``resume=True`` restarts from the last committed round with
bit-identical results (kill/resume test), round count = hop radius —
bounded by ``max_iter``, which doubles as the distance horizon (nodes
farther than ``max_iter`` hops report NULL, exactly like the bounded
recursive-CTE oracle).

Exactness target: nx.multi_source_shortest_path_length on the
direction-adjusted simple digraph (unweighted hops; unreached = NULL).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from knext_spark.graph.superstep import (
    SuperstepResult,
    SuperstepRunner,
    unpersist_checkpoint,
)


def bfs_distances_run(
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
    """edges(src, dst) + sources(node) -> SuperstepResult whose state
    is (node, dist) for every REACHED node (seeds at 0). ``direction``:
    'out' follows src->dst, 'in' follows dst->src, 'both' symmetrizes.
    Seeds not present in the graph still report dist 0 (they are valid
    BFS roots of their empty neighborhoods, matching nx)."""
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
            F.col("node"), F.lit(0).cast("long").alias("dist")
        ).dropDuplicates(["node"])

    def step(state: DataFrame, it: int) -> tuple[DataFrame, dict]:
        frontier = state.where(F.col("dist") == it - 1).select("node")
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .dropDuplicates(["node"])
        )
        new = cand.join(state.select("node"), "node", "left_anti").select(
            "node", F.lit(it).cast("long").alias("dist")
        )
        # one cheap count against the shrinking frontier; also the
        # convergence signal (0 new nodes = BFS exhausted)
        n_new = new.count()
        if n_new == 0:
            return state, {"reached": 0}
        return state.unionByName(new), {"reached": n_new}

    def converged(m: dict) -> bool:
        return m.get("reached", 1) == 0

    runner = SuperstepRunner(spark, "bfs", run_id, checkpoint_dir, cadence=cadence)
    return runner.run(init_state, step, converged, max_iter, resume=resume)


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    direction: str = "out",
    max_iter: int = 100,
    cadence: int = 1,
) -> DataFrame:
    """(node, dist) for EVERY node of the graph (and every seed):
    minimum hop count from the nearest source, NULL if unreached
    within ``max_iter`` hops. Convenience wrapper over
    :func:`bfs_distances_run` (ephemeral checkpoint dir).
    ``cadence`` > 1 commits every k-th round only. MEASURED WORSE for
    BFS (left default 1): the step's convergence count acts on the
    un-materialized union chain, so every non-commit round re-executes
    the prior rounds' frontier joins — a 1.91M-edge pseudo-diameter
    run that finishes in ~60 s at cadence 1 was killed at 10 min at
    cadence 4 (BENCH.md §13). The knob stays for API parity with the
    other superstep algorithms, whose states don't chain this way."""
    spark = edges.sparkSession
    res = bfs_distances_run(
        spark, edges, sources, direction=direction, max_iter=max_iter,
        cadence=cadence,
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .unionByName(sources.select("node"))
        .distinct()
    )
    out = (
        nodes.join(res.state, "node", "left")
        .select("node", F.col("dist").cast("long").alias("dist"))
        .localCheckpoint(eager=True)
    )
    unpersist_checkpoint(res.state)
    return out


def pseudo_diameter(
    edges: DataFrame,
    sweeps: int = 2,
    direction: str = "both",
    start: int | None = None,
    max_iter: int = 100,
    cadence: int = 1,
) -> DataFrame:
    """Double-sweep pseudo-diameter (Magnien-Latapy-Habib): BFS from a
    deterministic start (min node id unless given), jump to the
    farthest reached node (ties -> min id), BFS again; the largest
    eccentricity seen is a tight LOWER bound on the true diameter at
    the cost of ``sweeps`` BFS passes instead of all-pairs. Returns one
    row per sweep: (sweep, source, farthest, ecc) — ``max(ecc)`` is
    the pseudo-diameter; on a disconnected graph it bounds the start
    node's component (seed other components via ``start``).

    Scale: each sweep is one :func:`bfs_distances` run (O(E) total
    frontier work, SuperstepRunner-checkpointed); the per-sweep argmax
    is a global top-1 reduce (orderBy + limit 1), and only that single
    row ever reaches the driver.
    """
    if sweeps < 1:
        raise ValueError(f"sweeps must be >= 1, got {sweeps}")
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if start is None:
        start = nodes.agg(F.min("node")).collect()[0][0]
        if start is None:
            raise ValueError("pseudo_diameter of an empty edge table")
    elif nodes.where(F.col("node") == F.lit(start)).limit(1).count() == 0:
        # the docstring invites hand-supplied component seeds; a typo'd
        # id would otherwise surface as a bare IndexError on sweep 1
        raise ValueError(f"start node {start!r} is not a node of the graph")
    node_type = edges.schema["src"].dataType
    rows = []
    src = start
    for s in range(1, sweeps + 1):
        seeds = nodes.where(F.col("node") == F.lit(src))
        dist = bfs_distances(
            edges, seeds, direction=direction, max_iter=max_iter,
            cadence=cadence,
        )
        far = (
            dist.where(F.col("dist").isNotNull())
            .orderBy(F.desc("dist"), F.asc("node"))
            .limit(1)
            .collect()[0]
        )
        rows.append((s, src, far["node"], int(far["dist"])))
        src = far["node"]
    schema = StructType(
        [
            StructField("sweep", IntegerType()),
            StructField("source", node_type),
            StructField("farthest", node_type),
            StructField("ecc", LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
