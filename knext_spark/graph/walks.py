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


def node2vec_walks(
    edges: DataFrame,
    starts: DataFrame,
    length: int = 10,
    walks_per_start: int = 1,
    w_return: int = 1,
    w_common: int = 4,
    w_far: int = 2,
    checkpoint_every: int = 4,
) -> DataFrame:
    """node2vec-biased deterministic walks (Grover & Leskovec 2016):
    the next hop is weighted by where the candidate sits relative to
    the PREVIOUS position — ``w_return`` for going back to it,
    ``w_common`` for its out-neighbors (triangle-closing moves),
    ``w_far`` for everything else; node2vec's (p, q) map to
    (w_common / w_return, w_common / w_far). Step 1 is uniform
    (no previous node), matching the reference algorithm.

    Weights are INTEGERS so the choice stays hash-exact without libm:
    a candidate with weight w draws w md5 tickets
    (``md5(start:walk:step:dst:ticket)``) and the globally smallest
    ticket wins — P(x wins) = w_x / sum(w), the exact biased choice,
    reproduced bit-identically by the DuckDB oracle and any
    partitioning (ticket hashes are iid uniform; min-of-w beats
    min-of-v with probability w/(w+v)).

    Shape per step: the frontier join of :func:`random_walks` plus ONE
    extra hash join probing (prev, dst) against the edge set for the
    triangle class, and a ticket explode bounded by max(w) — still
    O(length * walks * avg_degree * max_w), shuffle-bounded like a BFS
    round. Returns (start, walk, step, node) like random_walks.
    """
    if length < 0:
        raise ValueError("length must be >= 0")
    if walks_per_start <= 0:
        raise ValueError("walks_per_start must be positive")
    for name, w in (("w_return", w_return), ("w_common", w_common), ("w_far", w_far)):
        if not isinstance(w, int) or w < 1:
            raise ValueError(f"{name} must be a positive int, got {w!r}")
    e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    # the (prev, dst) probe set for the triangle class
    e2 = e.select(
        F.col("src").alias("__p"), F.col("dst").alias("__d"), F.lit(1).alias("__adj")
    )
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
            F.lit(None).cast(edges.schema["src"].dataType).alias("prev"),
        )
        .withColumn("walk", F.col("walk").cast("long"))
    )
    out = cur.select("start", "walk", "step", "node")
    for t in range(1, length + 1):
        cand = cur.join(e, cur["node"] == e["src"]).select(
            "start", "walk", F.col("node").alias("cur"), "prev", F.col("dst")
        )
        cand = cand.join(
            e2,
            (cand["prev"] == e2["__p"]) & (cand["dst"] == e2["__d"]),
            "left",
        ).select(
            "start",
            "walk",
            "cur",
            "dst",
            F.when(F.col("prev").isNull(), F.lit(1))  # step 1: uniform
            .when(F.col("dst") == F.col("prev"), F.lit(int(w_return)))
            .when(F.col("__adj").isNotNull(), F.lit(int(w_common)))
            .otherwise(F.lit(int(w_far)))
            .alias("__w"),
        )
        tickets = cand.select(
            "start",
            "walk",
            F.col("cur"),
            "dst",
            F.explode(F.sequence(F.lit(1), F.col("__w"))).alias("__tk"),
        )
        score = F.md5(
            F.concat_ws(
                ":",
                F.col("start").cast("string"),
                F.col("walk").cast("string"),
                F.lit(str(t)),
                F.col("dst").cast("string"),
                F.col("__tk").cast("string"),
            )
        )
        # `cur` rides the groupBy keys — (start, walk) determine it, so
        # the groups are unchanged and the new prev comes out of the
        # same aggregation instead of an extra frontier join per step
        cur = (
            tickets.groupBy("start", "walk", "cur")
            .agg(F.min(F.struct(score.alias("s"), F.col("dst"))).alias("m"))
            .select(
                "start",
                "walk",
                F.lit(t).cast("long").alias("step"),
                F.col("m.dst").alias("node"),
                F.col("cur").alias("prev"),
            )
        )
        if t % max(1, checkpoint_every) == 0:
            cur = cur.localCheckpoint(eager=False)
        out = out.unionByName(cur.select("start", "walk", "step", "node"))
    return out
