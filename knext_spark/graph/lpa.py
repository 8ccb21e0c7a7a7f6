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
groupBy (label frequencies per node), one combinable argmax aggregate
(min over (-cnt, label) structs — partial aggregation reduces a hot
node's candidate labels per map partition, where a row_number window
would sort them all in ONE task) — all shuffle-keyed on node.
Checkpoint/resume via SuperstepRunner.

Hub skew: the per-superstep label join streams a hub's entire fan-out
through one task (bidir is partitioned by the join key v; measured
+35%/superstep from a single 4M-degree hub folded into the 118.9M-edge
input, BENCH.md §5). Two mitigations, both measured there:

- ``hot_threshold`` (default ``"auto"``, the production path): the
  graph is static, so hub keys are found ONCE (one combinable degree
  aggregate); edges whose join key is hot are split off and spread
  round-robin, and each superstep joins them against a BROADCAST of
  just the hot keys' labels (<= 1024 rows) while the cold edges keep
  the co-partitioned shuffle join. No state replication, no
  straggler task — the classic skew-join broadcast split. ``"auto"``
  marks keys whose undirected degree exceeds one shuffle partition's
  edge share (floor 100k); 0/None disables.
- ``salt_k > 1`` splits the join key to (v, salt): bidir gets a
  deterministic per-edge salt, labels replicate k-fold, and the hub's
  fan-out spreads over k tasks — pagerank's two-level design.
  Measured STRICTLY WORSE here (2.80x vs the hub's unsalted 1.35x,
  BENCH.md §5): replicating the whole ~19M-row label frame k-fold
  through the shuffle every superstep swamps the one straggler it
  removes. Default stays 1; the knob remains for graphs with
  thousands of moderately-hot keys where a bounded broadcast set
  cannot cover the skew. ``salt_k="auto"`` picks k from the max
  undirected degree (k = ceil(max_deg / 1e6), capped 64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

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
    salt_k: int | str = 1,
    hot_threshold: int | str | None = "auto",
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
            salt_k=salt_k,
            hot_threshold=hot_threshold,
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
    bidir = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    hot: list = []
    bidir_hot = None
    if salt_k == "auto" or (hot_threshold not in (None, 0, "off")):
        deg = bidir.groupBy("v").agg(F.count("*").alias("c")).persist()
        stats = deg.agg(
            F.max("c").alias("m"), F.sum("c").alias("n_bidir")
        ).collect()[0]
        max_deg, n_bidir = int(stats["m"] or 0), int(stats["n_bidir"] or 0)
        if salt_k == "auto":
            salt_k = max(1, min(64, -(-max_deg // 1_000_000)))
        if hot_threshold not in (None, 0, "off"):
            n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
            thr = (
                max(100_000, n_bidir // max(1, n_part))
                if hot_threshold == "auto"
                else int(hot_threshold)
            )
            hot = [
                r["v"]
                for r in deg.where(F.col("c") > thr)
                .orderBy(F.col("c").desc(), F.col("v").asc())
                .limit(1024)
                .collect()
            ]
        deg.unpersist()
    if hot:
        # hub fan-outs leave the co-partitioned cold path: spread
        # round-robin, joined per-superstep against a broadcast of the
        # <=1024 hot labels — no single task owns a hub's edges
        bidir_hot = bidir.where(F.col("v").isin(hot)).repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        ).persist()
        bidir = bidir.where(~F.col("v").isin(hot))
    salt_k = int(salt_k)
    if salt_k > 1:
        bidir = bidir.withColumn(
            "salt", F.pmod(F.xxhash64("u", "v"), F.lit(salt_k))
        ).repartition("v", "salt").persist()
    else:
        bidir = bidir.repartition("v").persist()
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
        if salt_k > 1:
            salted = labels.select(
                "node",
                "label",
                F.explode(F.sequence(F.lit(0), F.lit(salt_k - 1))).alias("salt"),
            ).withColumn("salt", F.col("salt").cast("long"))
            msgs = bidir.join(
                salted.hint("shuffle_hash"),
                (bidir["v"] == salted["node"]) & (bidir["salt"] == salted["salt"]),
            ).select(F.col("u").alias("node"), "label")
        else:
            msgs = bidir.join(
                labels.hint("shuffle_hash"), bidir["v"] == labels["node"]
            ).select(F.col("u").alias("node"), "label")
        if bidir_hot is not None:
            hot_labels = labels.where(F.col("node").isin(hot))
            msgs = msgs.unionByName(
                bidir_hot.join(
                    F.broadcast(hot_labels), bidir_hot["v"] == hot_labels["node"]
                ).select(F.col("u").alias("node"), "label")
            )
        freq = msgs.groupBy("node", "label").agg(F.count("*").alias("cnt"))
        # argmax with the pinned tie-break as a MIN over (-cnt, label)
        # structs: identical semantics to the row_number window it
        # replaces (largest cnt, then smallest label), but combinable —
        # a hot node's candidate labels partially aggregate per map
        # partition instead of all sorting in one window task, and no
        # per-superstep sort at all
        best = (
            freq.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("label").alias("l"))
                ).alias("s")
            )
            .select("node", F.col("s.l").alias("new_label"))
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
    if bidir_hot is not None:
        bidir_hot.unpersist()
    nodes.unpersist()
    for df in retired:  # committed state supersedes working layers
        unpersist_checkpoint(df)
    retired.clear()
    if last_new[0] is not None:
        unpersist_checkpoint(last_new[0])
    return res
