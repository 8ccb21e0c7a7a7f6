"""Deterministic synchronous label propagation (community detection).

nx's builtin LPA variants are randomized (tie-breaks by RNG, async
order by shuffle) — the north rule's exact-match mandate forces a
pinned deterministic rule, documented here and mirrored by the test
oracle (tests/test_graph_algos.py):

- undirected neighborhoods (edge direction ignored, self-loops dropped,
  parallel edges collapsed);
- init: label(v) = v;
- synchronous update: label'(v) = the lexicographically SMALLEST label
  among those with maximum frequency in v's neighborhood (v's own label
  does not vote unless v is its own neighbor);
- isolated nodes keep their label;
- stop when no label changed, or after max_iter supersteps (synchronous
  LPA can 2-cycle on bipartite structures; the cap plus deterministic
  tie-break makes every run reproducible bit-for-bit).

Each superstep: one join (labels onto the bidirected edge list), one
groupBy (label frequencies per node), one window (argmax with
deterministic tie-break) — all shuffle-keyed on node. Checkpoint/resume
via SuperstepRunner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from knext_spark.graph.superstep import SuperstepRunner, SuperstepResult, unpersist_checkpoint


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    run_id: str = "default",
    resume: bool = False,
    cadence: int = 1,
    encode_ids: bool = False,
) -> SuperstepResult:
    """edges(src, dst) -> SuperstepResult with state (node, label).

    ``encode_ids=True`` iterates on dense int64 codes (graph.encode)
    and decodes — bit-identical labels to a raw-id run: the pinned
    tie-break (smallest label among argmax frequency) compares ids,
    and the encoding preserves their order. The dictionary is
    materialized once to Parquet under ``checkpoint_dir`` (encode's
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
            materialize_dir=os.path.join(checkpoint_dir, "lpa", run_id, "dictionary"),
            reuse=resume,
        )
        res = label_propagation(
            spark,
            encode_edges(edges, dic),
            max_iter=max_iter,
            checkpoint_dir=checkpoint_dir,
            run_id=run_id,
            resume=resume,
            cadence=cadence,
        )
        out = decode_cols(res.state, dic, "node", "label")
        return SuperstepResult(out, res.iterations, res.converged, res.metrics)

    e = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # partition the (static) bidirected edge list by the per-step join
    # key once; every superstep's labels join then co-partitions against
    # it instead of re-shuffling the edges
    bidir = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .repartition("v")
        .persist()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )

    def init_state() -> DataFrame:
        return nodes.select("node", F.col("node").alias("label"))

    retired: list[DataFrame] = []
    last_new: list[DataFrame | None] = [None]

    def step(state: DataFrame, k: int) -> tuple[DataFrame, dict]:
        labels = state.select("node", "label")
        # hash the small labels side; sort-merge would sort the full
        # edge list every superstep
        msgs = bidir.join(
            labels.hint("shuffle_hash"), bidir["v"] == labels["node"]
        ).select(
            F.col("u").alias("node"), "label"
        )
        freq = msgs.groupBy("node", "label").agg(F.count("*").alias("cnt"))
        w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
        best = (
            freq.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        new = (
            labels.join(best, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).alias("chg"),
            )
        ).localCheckpoint(eager=True)
        last_new[0] = new
        # NEGATIVE RESULT (measured, 118.9M-edge input @ local[32],
        # steady-state medians, runs interleaved with the eager
        # variant): fusing this count into the job that materializes a
        # LAZY localCheckpoint — pagerank's winning pattern for its
        # dangling-mass sum — made LPA supersteps ~1.5x SLOWER with
        # progressive degradation (fused medians 23.9-29.3 s/step vs
        # 13.5-19.0 eager, three runs each; bisect isolated the fusion,
        # not the retirement change). The separate count() below scans
        # the just-persisted blocks in ~0.2s, so the second job launch
        # is noise at scale. Keep eager + count.
        changed = new.where(F.col("chg")).count()
        while len(retired) > 1:
            unpersist_checkpoint(retired.pop(0))
        retired.append(state)
        return new.select("node", "label"), {"changed": int(changed)}

    def converged(m: dict) -> bool:
        return m.get("changed", 1) == 0

    runner = SuperstepRunner(spark, "lpa", run_id, checkpoint_dir, cadence=cadence)
    res = runner.run(init_state, step, converged, max_iter, resume=resume)
    bidir.unpersist()
    nodes.unpersist()
    for df in retired:  # committed state supersedes working layers
        unpersist_checkpoint(df)
    retired.clear()
    if last_new[0] is not None:
        unpersist_checkpoint(last_new[0])
    return res
