"""Deterministic random-walk corpus generation (DeepWalk-style).

Graph-embedding pipelines (DeepWalk / node2vec — public algorithms)
train on a corpus of fixed-length walks. At cluster scale the walks
must be reproducible run-to-run and independent of partitioning, so
"random" is derived from a hash, not an RNG: at step t of walk w from
start s, the next hop is the out-neighbor u minimizing
``md5(s:w:t:u)`` — a uniform choice among the neighbors that any
engine (and the DuckDB oracle) recomputes bit-identically, the same
construction as the deterministic splits (pipeline/splits.py).

Shape: one ``frontier ⋈ edges`` hash join + one arg-min aggregation
per step — the frontier carries ONE row per live walk, so a step
costs O(Σ out-degree of current positions) and the whole operator
O(length · walks · avg-degree), linear and shuffle-bounded exactly
like a BFS round. Hub positions fan out to one task's probe of the
persisted edge partition (the landmark-BFS profile). Walks ending on
a node with no out-edges stop early (their rows simply end, like
DeepWalk's dangling truncation). Lineage is truncated with a lazy
localCheckpoint every few steps so a long walk doesn't accumulate a
deep plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    length: int = 10,
    walks_per_start: int = 1,
    checkpoint_every: int = 4,
) -> DataFrame:
    """edges(src, dst) + starts(node) -> (start, walk, step, node):
    every position of every walk (step 0 = the start node itself),
    ``walks_per_start`` independent walks per start (distinct hash
    streams), each up to ``length`` hops, deterministically pseudo-
    random and partitioning-independent."""
    if length < 0:
        raise ValueError("length must be >= 0")
    if walks_per_start <= 0:
        raise ValueError("walks_per_start must be positive")
    e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    cur = (
        starts.select(F.col("node"))
        .dropDuplicates(["node"])
        .select(
            F.col("node").alias("start"),
            F.explode(
                F.sequence(F.lit(0), F.lit(walks_per_start - 1))
            ).alias("walk"),
            F.lit(0).cast("long").alias("step"),
            F.col("node"),
        )
        .withColumn("walk", F.col("walk").cast("long"))
    )
    out = cur
    for t in range(1, length + 1):
        score = F.md5(
            F.concat_ws(
                ":",
                F.col("start").cast("string"),
                F.col("walk").cast("string"),
                F.lit(str(t)),
                F.col("dst").cast("string"),
            )
        )
        nxt = (
            cur.join(e, cur["node"] == e["src"])
            .groupBy("start", "walk")
            .agg(F.min(F.struct(score.alias("s"), F.col("dst"))).alias("m"))
            .select(
                "start",
                "walk",
                F.lit(t).cast("long").alias("step"),
                F.col("m.dst").alias("node"),
            )
        )
        if t % max(1, checkpoint_every) == 0:
            nxt = nxt.localCheckpoint(eager=False)
        out = out.unionByName(nxt)
        cur = nxt
    return out
