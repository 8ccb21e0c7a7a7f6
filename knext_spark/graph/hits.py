"""HITS (hubs & authorities) as iterative DataFrame joins,
NetworkX-parity semantics.

Semantics pinned to the classic Kleinberg power iteration as shipped by
NetworkX (`networkx/algorithms/link_analysis/hits_alg.py`,
``_hits_python`` — public source; the same pinning strategy as
``pagerank`` vs ``_pagerank_python``):

- h_0 = 1/N for every node;
- each iteration: a_raw = h_{k-1}^T A (authority mass flows along
  edges src→dst, weighted), h_raw = A · a_raw (hub mass flows back),
  then EACH vector is max-normalized (h from the *un-normalized*
  a_raw, exactly as the reference recurrence does);
- convergence when L1(h_k − h_{k-1}) < tol (raw tol, not N·tol —
  HITS differs from PageRank here);
- on return both vectors are sum-normalized (``normalized=True``).

Parallel (src, dst) duplicates are NOT collapsed here — their weights
sum, the MultiDiGraph reading; nx.DiGraph parity means dropDuplicates
upstream (same caller contract as ``pagerank``).

Scale design (mirrors pagerank's superstep engineering; see BENCH.md §1
for why each choice exists):
- the edge table is persisted TWICE, co-partitioned for each pass:
  ``e_src`` partitioned by src (the hub→authority probe) and ``e_dst``
  partitioned by dst (the authority→hub probe). Each superstep is then
  two streaming ``shuffle_hash`` probes of cached edges — the only
  per-step shuffles are the two score vectors (O(V), not O(E)) and the
  two aggregations;
- the authority aggregation's output partitioning (dst) feeds the
  second join's key directly, so a_raw arrives co-partitioned with
  ``e_dst`` — no extra exchange between the passes;
- both max-norms and the lagged L1 convergence delta are fused into
  ONE single-row collect per superstep (a union of three single-row
  aggregates) — the same minimum-driver-involvement design the
  pagerank note documents as 2-3x faster than collect-free chaining;
- the convergence check lags one superstep (delta needs the previous
  step's normalized vector): when the lagged delta passes, the step
  returns its INPUT state — exactly the iterate ``_hits_python``
  stops at — at the cost of one discarded pass, and a run whose first
  passing delta is the final pair reports ``converged=False`` with
  the correct state (NetworkX raises PowerIterationFailedConvergence
  there);
- every superstep checkpoints through SuperstepRunner (Parquet +
  _metrics.json with per-partition lineage) and is resumable;
  superseded checkpoint layers are retired two steps behind via
  ``unpersist_checkpoint`` (the localCheckpoint block-manager leak
  pagerank.py documents);
- hub skew: a hot out-degree src concentrates the first probe's work
  in one task, a hot in-degree dst the second's. Both joins have the
  identical shape as pagerank's rank⋈edge probe, so the same
  mitigation family applies (AQE skew-join at runtime; the two-level
  salted agg if a deployment needs it pinned) — kept default-off here
  for the same measured reason LPA's salting is (BENCH.md §5).

Reference parity note: knext never computes HITS (its README positions
the TSVs as input "for graph analysis", /root/reference/README.rst:5-8);
semantics are pinned to NetworkX, the library the reference hands its
output to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from knext_spark.graph.superstep import (
    SuperstepResult,
    SuperstepRunner,
    auto_num_partitions,
    unpersist_checkpoint,
)


def hits(
    spark: SparkSession,
    edges: DataFrame,
    tol: float = 1.0e-8,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    run_id: str = "default",
    resume: bool = False,
    cadence: int = 1,
    num_partitions: int | None = None,
    encode_ids: bool = False,
) -> SuperstepResult:
    """edges(src, dst[, weight]) -> SuperstepResult with state
    (node, hub, auth), both columns sum-normalized at return.

    ``encode_ids=True`` dictionary-encodes node ids to dense int64
    before iterating and decodes the result (graph.encode), with the
    dictionary materialized ONCE to Parquet under ``checkpoint_dir``
    so resume re-reads the identical mapping — same contract as
    ``pagerank(encode_ids=True)``.
    """
    import os
    import tempfile

    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="knext_ckpt_")

    if encode_ids:
        from knext_spark.graph.encode import (
            build_dictionary,
            decode_cols,
            encode_edges,
            nodes_of,
        )

        dic = build_dictionary(
            nodes_of(edges),
            num_partitions,
            materialize_dir=os.path.join(checkpoint_dir, "hits", run_id, "dictionary"),
            reuse=resume,
        )
        res = hits(
            spark,
            encode_edges(edges, dic),
            tol=tol,
            max_iter=max_iter,
            checkpoint_dir=checkpoint_dir,
            run_id=run_id,
            resume=resume,
            cadence=cadence,
            num_partitions=num_partitions,
        )
        out = decode_cols(res.state, dic, "node")
        return SuperstepResult(out, res.iterations, res.converged, res.metrics)

    w = F.col("weight").cast("double") if "weight" in edges.columns else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("weight"))
    # two-phase persist (same as pagerank): count first so the layout
    # width can be derived from the graph size via auto_num_partitions
    nodes_pre = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes_pre.count()
    if n == 0:
        nodes_pre.unpersist()
        raise ValueError("empty graph")
    n_part = num_partitions or auto_num_partitions(spark, n, e)
    e_src = e.repartition(n_part, "src").persist()
    e_dst = e.repartition(n_part, "dst").persist()
    nodes = nodes_pre.repartition(n_part, "node").persist()

    def init_state() -> DataFrame:
        # auth starts as a placeholder (the recurrence derives a_1 from
        # h_0 before ever reading a_0) — 1/N keeps the schema uniform
        return nodes.select(
            "node", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
        )

    ser = StorageLevel.MEMORY_AND_DISK
    retired: list[DataFrame] = []
    last_new: list[DataFrame | None] = [None]
    prev_hubs: list[DataFrame | None] = [None]  # normalized h_{k-2} at entry to step k

    def step(state: DataFrame, k: int) -> tuple[DataFrame, dict]:
        hubs = state.select("node", "hub")
        # pass 1 (authority): a_raw[dst] = Σ_src h[src]·w — e_src is
        # cached pre-partitioned on the join key; hubs is the small
        # O(V) side, hashed per the pagerank probe design
        a_raw = (
            e_src.join(hubs.hint("shuffle_hash"), e_src["src"] == hubs["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("hub") * F.col("weight")).alias("a_raw"))
            # rename the group key: a_raw shares attribute lineage with
            # e_dst (both derive from e), and an e_dst.dst == a_raw.dst
            # condition would lean on Spark's self-join disambiguation;
            # the alias-aware output partitioning keeps the dst hash
            # partitioning, so the pass-2 join stays exchange-free
            .select(F.col("dst").alias("anode"), "a_raw")
            .localCheckpoint(eager=False, storageLevel=ser)
        )
        # pass 2 (hub): h_raw[src] = Σ_dst a_raw[dst]·w — from the
        # UN-normalized a_raw (the reference recurrence's order);
        # a_raw leaves its aggregation partitioned by dst = e_dst's key
        h_raw = (
            e_dst.join(a_raw.hint("shuffle_hash"), e_dst["dst"] == a_raw["anode"])
            .groupBy("src")
            .agg(F.sum(F.col("a_raw") * F.col("weight")).alias("h_raw"))
            .select(F.col("src").alias("hnode"), "h_raw")
            .localCheckpoint(eager=False, storageLevel=ser)
        )
        sum_df = a_raw.agg(F.max("a_raw").alias("v")).select(
            F.lit("a").alias("tag"), "v"
        ).unionByName(
            h_raw.agg(F.max("h_raw").alias("v")).select(F.lit("h").alias("tag"), "v")
        )
        prev = prev_hubs[0]
        do_check = tol > 0.0 and prev is not None
        if do_check:
            # lagged L1(h_{k-1} − h_{k-2}) fused into the same job:
            # a union of three single-row aggregates, ONE collect
            delta_df = (
                hubs.join(
                    prev.withColumnRenamed("hub", "prev").hint("shuffle_hash"),
                    "node",
                )
                .agg(F.sum(F.abs(F.col("hub") - F.col("prev"))).alias("v"))
                .select(F.lit("d").alias("tag"), "v")
            )
            sum_df = sum_df.unionByName(delta_df)
        got = {r["tag"]: r["v"] for r in sum_df.collect()}
        max_a, max_h = float(got["a"]), float(got["h"])
        delta = got.get("d")
        while len(retired) > 2:
            unpersist_checkpoint(retired.pop(0))
        retired.append(a_raw)
        retired.append(h_raw)
        retired.append(state)
        prev_hubs[0] = hubs
        if delta is not None and float(delta) < tol:
            # step k-1 converged: return its output (this step's input)
            # unchanged — identical to _hits_python's stopping iterate
            return state.select("node", "hub", "auth"), {
                "l1_delta": float(delta),
                "n_nodes": n,
            }
        # State update as UNION + SUM, not nodes⋈a_raw⋈h_raw. Semantics
        # are identical (each node appears once per branch; x + 0.0 is
        # exact in IEEE754, and partial-sum order can't matter when all
        # but one addend is +0.0). The join formulation is a trap on
        # Spark 4: Dataset.checkpoint copies the origin plan's
        # statistics onto the LogicalRDD (LogicalRDD.
        # rewriteStatsAndConstraints), join sizeInBytes is the PRODUCT
        # of its children, and here BOTH children derive from the
        # current state — so the state's inherited sizeInBytes SQUARES
        # every superstep, its BigInt digit count doubles, and by
        # ~25 lazily-chained supersteps (cadence > 1) the driver dies
        # in BigInteger.multiply (OOM; reproduced). Union stats ADD,
        # keeping digit growth linear. PageRank/CC/LPA multiply by a
        # constant (edges × state once) per step — linear digits —
        # which is why they never hit this.
        new = (
            nodes.select(
                "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
            )
            .unionByName(
                a_raw.select(
                    F.col("anode").alias("node"),
                    F.lit(0.0).alias("hub"),
                    (F.col("a_raw") / max_a).alias("auth"),
                )
            )
            .unionByName(
                h_raw.select(
                    F.col("hnode").alias("node"),
                    (F.col("h_raw") / max_h).alias("hub"),
                    F.lit(0.0).alias("auth"),
                )
            )
            .groupBy("node")
            .agg(F.sum("hub").alias("hub"), F.sum("auth").alias("auth"))
        )
        new = new.localCheckpoint(eager=False, storageLevel=ser)
        last_new[0] = new
        m = {"n_nodes": n}
        if delta is not None:
            m["l1_delta"] = float(delta)  # lagged: L1 of superstep k-1
        return new, m

    def converged(m: dict) -> bool:
        return m.get("l1_delta", float("inf")) < tol

    runner = SuperstepRunner(spark, "hits", run_id, checkpoint_dir, cadence=cadence)
    result = runner.run(init_state, step, converged, max_iter, resume=resume)
    # final sum-normalization (normalized=True) — one single-row collect
    sums = result.state.agg(
        F.sum("hub").alias("sh"), F.sum("auth").alias("sa")
    ).collect()[0]
    s_h = float(sums["sh"]) or 1.0
    s_a = float(sums["sa"]) or 1.0
    out = result.state.select(
        "node",
        (F.col("hub") / F.lit(s_h)).alias("hub"),
        (F.col("auth") / F.lit(s_a)).alias("auth"),
    )
    e_src.unpersist()
    e_dst.unpersist()
    nodes.unpersist()
    nodes_pre.unpersist()
    for df in retired:
        unpersist_checkpoint(df)
    retired.clear()
    if last_new[0] is not None:
        unpersist_checkpoint(last_new[0])
    return SuperstepResult(out, result.iterations, result.converged, result.metrics)
