"""Connected components via alternating large-star / small-star.

Algorithm: Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond" (SoCC'14, public) —
converges in O(log^2 n) rounds (2 rounds typical on real graphs),
independent of graph diameter, which is the property that matters at
10^12-edge scale (naive min-label propagation needs O(diameter) rounds;
a web graph's diameter is in the hundreds).

- large-star: every node u links each strictly-greater neighbor to the
  minimum of its closed neighborhood.
- small-star: every node u links its not-greater neighbors (and itself)
  to that minimum.

Both are one groupBy + one join per round; edge orientation keeps each
round's shuffle keyed on a single column. Node ids compare
lexicographically (string ids); the fixpoint is a star forest whose
root is the component's minimum node id — used as the canonical
component label (matches the `min(component)` canonicalization used in
tests against nx.connected_components).

Undirected semantics: input (src, dst) direction is ignored
(self-loops dropped). Per-superstep checkpoint/resume via
SuperstepRunner; convergence = edge-set signature (count, hash-sum)
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from knext_spark.graph.superstep import SuperstepRunner, SuperstepResult, unpersist_checkpoint


def _large_star(e: DataFrame) -> DataFrame:
    bidir = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    mins = bidir.groupBy("u").agg(F.min("v").alias("mv"))
    m = F.least(F.col("u"), F.col("mv"))
    # mins is the small aggregated side and both sides are already
    # shuffled on u — hash it instead of sort-merging (which would sort
    # the full bidirectional edge list every round)
    return (
        bidir.join(mins.hint("shuffle_hash"), "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("mv"))
    return (
        oriented.join(mins.hint("shuffle_hash"), "u")
        .select(F.col("v").alias("u"), F.col("mv").alias("v"))
        .unionByName(mins.select(F.col("u"), F.col("mv").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _signature(e: DataFrame) -> tuple[int, int]:
    # bit_xor: order-insensitive, overflow-free under ANSI mode (the
    # Spark 4 default; a plain sum of xxhash64 overflows long)
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    run_id: str = "default",
    resume: bool = False,
    max_iter: int = 50,
    cadence: int = 1,
    encode_ids: bool = False,
) -> SuperstepResult:
    """edges(src, dst) -> SuperstepResult with state
    (node, component) where component = min node id of the component.
    Isolated nodes (self-loop-only) label themselves.

    ``encode_ids=True`` runs the star contractions on dense int64
    codes (graph.encode) and decodes — EXACTLY the same labels as a
    raw-id run, because the encoding is order-preserving: min over
    encoded ids is the encoding of the min original id. The dictionary
    is materialized once to Parquet under ``checkpoint_dir`` (encode's
    consistency contract) and both decode joins read those same bytes.
    """
    import os
    import tempfile

    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="knext_ckpt_")

    if encode_ids:
        from knext_spark.graph.encode import (
            build_dictionary, decode_cols, encode_edges, nodes_of,
        )

        dic = build_dictionary(
            nodes_of(edges),
            materialize_dir=os.path.join(checkpoint_dir, "cc", run_id, "dictionary"),
            reuse=resume,
        )
        res = connected_components(
            spark,
            encode_edges(edges, dic),
            checkpoint_dir=checkpoint_dir,
            run_id=run_id,
            resume=resume,
            max_iter=max_iter,
            cadence=cadence,
        )
        out = decode_cols(res.state, dic, "node", "component")
        return SuperstepResult(out, res.iterations, res.converged, res.metrics)

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )

    def init_state() -> DataFrame:
        return (
            edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    prev_sig: list[tuple[int, int] | None] = [None]
    retired: list[DataFrame] = []
    last_new: list[DataFrame | None] = [None]

    def step(state: DataFrame, k: int) -> tuple[DataFrame, dict]:
        # eager checkpoint + separate signature collect: the same
        # fusion that pagerank uses for its dangling-mass sum measured
        # ~1.5x SLOWER per superstep for LPA at the 118.9M-edge scale
        # (see the negative-result note in lpa.py); the signature scan
        # of the persisted blocks is cheap, so two launches it is
        new = _small_star(_large_star(state)).localCheckpoint(eager=True)
        last_new[0] = new
        sig = _signature(new)
        changed = sig != prev_sig[0]
        prev_sig[0] = sig
        # the eager checkpoint above no longer needs its predecessor
        while len(retired) > 1:
            unpersist_checkpoint(retired.pop(0))
        retired.append(state)
        return new, {"changed": int(changed), "rows": sig[0], "sig": sig[1]}

    def converged(m: dict) -> bool:
        return m.get("changed", 1) == 0

    runner = SuperstepRunner(spark, "cc", run_id, checkpoint_dir, cadence=cadence)
    res = runner.run(init_state, step, converged, max_iter, resume=resume)
    for df in retired:  # committed state supersedes working layers
        unpersist_checkpoint(df)
    retired.clear()
    if last_new[0] is not None:
        unpersist_checkpoint(last_new[0])

    star = res.state  # (u=child, v=root) star forest at fixpoint
    labels = (
        nodes.join(star, nodes["node"] == star["u"], "left")
        .select("node", F.coalesce(star["v"], nodes["node"]).alias("component"))
    )
    nodes.unpersist()
    return SuperstepResult(labels, res.iterations, res.converged, res.metrics)
