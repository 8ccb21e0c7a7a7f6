"""PageRank as iterative DataFrame joins, NetworkX-parity semantics.

The north rule requires per-vertex scores matching ``nx.pagerank``
``allclose(1e-6)`` at convergence. NetworkX power-iteration semantics
reproduced exactly (networkx/algorithms/link_analysis/pagerank_alg.py,
public source):

- right-stochastic transition: each edge weight divided by its source's
  total out-weight;
- dangling nodes (no out-edges) donate their whole rank, spread
  uniformly (dangling_weights = personalization = uniform here);
- x_{k+1} = alpha * (x_k @ A + dangling_mass * 1/N) + (1-alpha)/N;
- convergence when L1(x_{k+1} - x_k) < N * tol.

Scale design:
- the normalized edge table is computed ONCE, repartitioned by ``src``
  and persisted — every superstep's rank⋈edges join then reuses that
  partitioning (no per-iteration edge shuffle; only the contribution
  aggregation shuffles, on dst);
- dangling mass and the L1 delta are single-row aggregates; the
  dangling scalar is attached via crossJoin(broadcast(1-row)) so the
  superstep stays one Catalyst plan (no driver round-trip mid-plan);
- hub skew: ``salt_k > 1`` splits each hub src's fan-out across k salt
  buckets — ranks are replicated k-fold (explode over [0,k)) and the
  join key becomes (src, salt), so a 1e8-out-degree hub spreads over k
  tasks; the contribution agg is then two-level: partial per
  (dst, salt), final per dst. ``salt_k='auto'`` consults the degree
  histogram (knext_spark.graph.degrees.pick_salt_k);
- every superstep checkpoints through SuperstepRunner (Parquet +
  _metrics.json with per-partition lineage) and is resumable.

Reference parity note: knext never computes PageRank (its README
positions the TSVs as input "for graph analysis",
/root/reference/README.rst:5-8); semantics are pinned to NetworkX, the
library the reference hands its output to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from knext_spark.graph.degrees import pick_salt_k
from knext_spark.graph.superstep import SuperstepRunner, SuperstepResult


def _normalized_edges(edges: DataFrame, salt_k: int) -> DataFrame:
    e = edges.select("src", "dst", F.col("weight").cast("double").alias("weight"))
    out_w = e.groupBy("src").agg(F.sum("weight").alias("out_w"))
    ne = e.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("out_w")).alias("w_norm")
    )
    if salt_k > 1:
        ne = ne.withColumn("salt", F.pmod(F.xxhash64("src", "dst"), F.lit(salt_k)))
    return ne


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    run_id: str = "default",
    resume: bool = False,
    salt_k: int | str = 1,
    cadence: int = 1,
    num_partitions: int | None = None,
) -> SuperstepResult:
    """edges(src, dst, weight) -> SuperstepResult with state
    (node, rank). Parallel (src,dst) duplicates are NOT collapsed here
    (caller controls: nx.DiGraph-parity means dropDuplicates upstream;
    a MultiDiGraph reading sums them, which summation here reproduces).
    """
    import tempfile

    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="knext_ckpt_")
    if salt_k == "auto":
        salt_k = pick_salt_k(edges)

    ne = _normalized_edges(edges, int(salt_k))
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    ne = ne.repartition(n_part, "src").persist()

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(n_part, "node")
        .persist()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("empty graph")
    src_nodes = ne.select(F.col("src").alias("node")).distinct().persist()

    def init_state() -> DataFrame:
        return nodes.select("node", F.lit(1.0 / n).alias("rank"))

    def step(state: DataFrame, k: int) -> tuple[DataFrame, dict]:
        ranks = state.select("node", "rank")
        if int(salt_k) > 1:
            salted = ranks.select(
                "node",
                "rank",
                F.explode(F.sequence(F.lit(0), F.lit(int(salt_k) - 1))).alias("salt"),
            ).withColumn("salt", F.col("salt").cast("long"))
            joined = ne.join(
                salted,
                (ne["src"] == salted["node"]) & (ne["salt"] == salted["salt"]),
            )
            partial = joined.groupBy("dst", ne["salt"]).agg(
                F.sum(F.col("rank") * F.col("w_norm")).alias("c")
            )
            contribs = partial.groupBy("dst").agg(F.sum("c").alias("contrib"))
        else:
            joined = ne.join(ranks, ne["src"] == ranks["node"])
            contribs = joined.groupBy("dst").agg(
                F.sum(F.col("rank") * F.col("w_norm")).alias("contrib")
            )
        dang = (
            ranks.join(src_nodes, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass"))
        )
        new = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(alpha)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dangling_mass") / F.lit(float(n))
                    )
                    + F.lit((1.0 - alpha) / n)
                ).alias("rank"),
            )
        )
        # lazy localCheckpoint: the L1 aggregate below is the ONE action
        # per superstep — it materializes the checkpoint (truncating
        # lineage) and returns the convergence metric in the same job
        new = new.localCheckpoint(eager=False)
        delta = (
            new.join(ranks.withColumnRenamed("rank", "prev"), "node")
            .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("l1"))
            .collect()[0]["l1"]
        )
        return new, {"l1_delta": float(delta), "n_nodes": n}

    def converged(m: dict) -> bool:
        return m.get("l1_delta", float("inf")) < n * tol

    runner = SuperstepRunner(
        spark, "pagerank", run_id, checkpoint_dir, cadence=cadence
    )
    result = runner.run(init_state, step, converged, max_iter, resume=resume)
    ne.unpersist()
    src_nodes.unpersist()
    nodes.unpersist()
    return result
