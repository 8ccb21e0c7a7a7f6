"""Strongly connected components via trim + forward-coloring rounds.

Algorithm family: FW-BW-Trim (Fleischer/Hendrickson/Pinar's
divide-and-conquer made iterative; the coloring formulation follows
Orzan's thesis and Hong/Rodia/Olukotun "On Fast Parallel Detection of
Strongly Connected Components", both public). Each OUTER round over the
still-unassigned subgraph:

1. TRIM to a fixpoint: a node with in-degree 0 or out-degree 0 in the
   active subgraph is a singleton SCC — assign it to itself and drop
   it. This dissolves the DAG periphery (on web-shaped graphs the bulk
   of the condensation) in cheap passes of two left-anti joins each,
   no join against the edge fan-out at all.
2. COLOR to a fixpoint: color(v) = min active node id that reaches v
   (min-label propagation ALONG edge direction; initialized to v).
   One groupBy-min + one join per pass, keyed on dst — the same
   shuffle shape as a PageRank superstep.
3. MARK backward from every color root r (color(r) == r): within the
   color-r class, propagate reachability-of-r along REVERSED edges.
   The marked set is exactly the SCC containing r: color equality is
   preserved on every path into r (if any w on a v->..->r path had a
   smaller reacher c < r, then c would reach r, contradicting
   color(r) == r), so restricting the backward sweep to same-color
   rows loses nothing and keeps the per-pass join pruned.
4. Assign scc(v) = color(v) for marked v, remove them, next round.

Every outer round eliminates at least the SCC of the minimum active
node (always a color root), so the loop terminates; on graphs with a
giant SCC plus DAG tendrils (web graphs, code-dependency graphs) trim
plus one coloring round removes almost everything — the published
FW-BW-Trim behaviour. A long path is the adversarial case (O(depth)
trim passes), the same depth bound nx's Tarjan pays in stack form.

The canonical label is the SCC's minimum member id: a color root r is
minimal among active reachers of its SCC and SCCs are only ever
removed whole, so r IS the global minimum member (smaller members
would still be active and reach v). That makes the output directly
comparable to a mutual-reachability oracle (min over {u : v->*u and
u->*v}) — the driver's recursive-CTE check — and to
``nx.strongly_connected_components`` with min-canonicalized sets.

Outer rounds checkpoint/resume through SuperstepRunner (state =
(node, scc NULLABLE); inner fixpoints are derived state, recomputed
from the committed round on resume). Keep the default cadence=1: the
round-end merge joins two state-derived frames, so inherited-stats
digit count doubles per lazily-chained round (the graph/superstep.py
cadence hazard, lpa class).

Reference parity note: knext never computes SCC (its README positions
the TSVs as input "for graph analysis", /root/reference/README.rst:5-8);
semantics are pinned to NetworkX over the same edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from knext_spark.graph.superstep import (
    SuperstepRunner,
    SuperstepResult,
    auto_num_partitions,
    unpersist_checkpoint,
)


def _sig(df: DataFrame, *cols: str) -> tuple[int, int]:
    """Order-insensitive (count, xor-hash) signature — the components
    fixpoint test, reused for the coloring fixpoint."""
    row = df.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64(*cols)), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    run_id: str = "default",
    resume: bool = False,
    max_rounds: int = 50,
    max_inner: int = 200,
    cadence: int = 1,
    encode_ids: bool = False,
    num_partitions: int | None = None,
) -> SuperstepResult:
    """edges(src, dst) -> SuperstepResult with state (node, scc) where
    scc = min node id of the strongly connected component. Exactly
    ``nx.strongly_connected_components`` with min-canonicalized sets.
    Self-loops are irrelevant to SCC membership and dropped up front.

    ``encode_ids=True`` runs the rounds on dense int64 codes
    (graph.encode) and decodes — identical labels, because the
    encoding is order-preserving and every comparison here is a min
    over ids (same argument as connected_components).
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
            num_partitions,
            materialize_dir=os.path.join(checkpoint_dir, "scc", run_id, "dictionary"),
            reuse=resume,
        )
        res = strongly_connected_components(
            spark,
            encode_edges(edges, dic),
            checkpoint_dir=checkpoint_dir,
            run_id=run_id,
            resume=resume,
            max_rounds=max_rounds,
            max_inner=max_inner,
            cadence=cadence,
            num_partitions=num_partitions,
        )
        out = decode_cols(res.state, dic, "node", "scc")
        return SuperstepResult(out, res.iterations, res.converged, res.metrics)

    # two-phase persist (same as pagerank/hits): count first so the
    # layout width derives from the graph size via auto_num_partitions
    nodes_pre = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_part = num_partitions or auto_num_partitions(spark, nodes_pre.count(), edges)
    e0 = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(n_part, "src")
        .persist()
    )

    nodes = nodes_pre.repartition(n_part, "node").persist()

    def init_state() -> DataFrame:
        return nodes.select("node", F.lit(None).cast(nodes.schema["node"].dataType).alias("scc"))

    # inner-fixpoint working layers: pinned eagerly (each inner pass
    # compares against / re-reads its predecessors, so lineage must be
    # truncated pass-by-pass or the plan grows per pass), ALL freed at
    # the end of the round once the round's final count has
    # materialized the new state — freeing mid-round would destroy
    # localCheckpoint blocks that frames like ``colors``/``ae`` still
    # serve to later passes (localCheckpoint data has no recompute
    # path; same discipline as pagerank/cc, but scoped per round)
    scratch: list[DataFrame] = []

    def _pin(df: DataFrame) -> DataFrame:
        out = df.localCheckpoint(eager=True)
        scratch.append(out)
        return out

    def _drain_scratch() -> None:
        for df in scratch:
            unpersist_checkpoint(df)
        scratch.clear()

    def step(state: DataFrame, k: int) -> tuple[DataFrame, dict]:
        active = _pin(state.where(F.col("scc").isNull()).select("node"))
        ae = _pin(
            e0.join(active.withColumnRenamed("node", "src").hint("shuffle_hash"), "src", "left_semi")
            .join(active.withColumnRenamed("node", "dst").hint("shuffle_hash"), "dst", "left_semi")
            .select("src", "dst")
        )

        assigned_parts: list[DataFrame] = []

        # --- 1. trim fixpoint: peel in/out-degree-0 nodes as singletons
        for _ in range(max_inner):
            has_out = ae.select(F.col("src").alias("node")).distinct()
            has_in = ae.select(F.col("dst").alias("node")).distinct()
            trimmed = _pin(
                active.join(has_out, "node", "left_anti")
                .unionByName(active.join(has_in, "node", "left_anti"))
                .distinct()
            )
            if trimmed.isEmpty():
                break
            assigned_parts.append(trimmed.select("node", F.col("node").alias("scc")))
            active = _pin(active.join(trimmed, "node", "left_anti"))
            ae = _pin(
                ae.join(trimmed.withColumnRenamed("node", "src"), "src", "left_anti")
                .join(trimmed.withColumnRenamed("node", "dst"), "dst", "left_anti")
            )

        if not active.isEmpty():
            # --- 2. coloring fixpoint: color(v) = min active reacher of v
            colors = _pin(active.select("node", F.col("node").alias("color")))
            sig = None
            for _ in range(max_inner):
                pushed = (
                    ae.join(
                        colors.withColumnRenamed("node", "src").hint("shuffle_hash"),
                        "src",
                    )
                    .select(F.col("dst").alias("node"), "color")
                )
                colors = _pin(
                    colors.unionByName(pushed)
                    .groupBy("node")
                    .agg(F.min("color").alias("color"))
                )
                new_sig = _sig(colors, "node", "color")
                if new_sig == sig:
                    break
                sig = new_sig

            # --- 3. backward mark within each color class from its root
            marked = _pin(
                colors.where(F.col("color") == F.col("node")).select("node", F.col("color").alias("scc"))
            )
            n_marked = marked.count()
            for _ in range(max_inner):
                pre = (
                    ae.join(
                        marked.withColumnRenamed("node", "dst").hint("shuffle_hash"),
                        "dst",
                    )
                    .select(F.col("src").alias("node"), "scc")
                )
                # same-color guard: only rows whose own color equals the
                # root being propagated may join the SCC
                pre = pre.join(
                    colors.hint("shuffle_hash"),
                    (pre["node"] == colors["node"]) & (pre["scc"] == colors["color"]),
                    "left_semi",
                )
                marked = _pin(marked.unionByName(pre).distinct())
                n_new = marked.count()  # marks only grow: count is a fixpoint test
                if n_new == n_marked:
                    break
                n_marked = n_new
            assigned_parts.append(marked)

        # --- 4. merge the round's assignments into the committed state
        if assigned_parts:
            newly = assigned_parts[0]
            for p in assigned_parts[1:]:
                newly = newly.unionByName(p)
            newly = newly.withColumnRenamed("scc", "__new")
            new_state = (
                state.join(newly.hint("shuffle_hash"), "node", "left")
                .select("node", F.coalesce(F.col("scc"), F.col("__new")).alias("scc"))
            )
        else:
            new_state = state
        new_state = new_state.localCheckpoint(eager=False)
        # this count is the round's materializing action: it forces the
        # lazy checkpoint, after which every scratch layer is dead
        unassigned = new_state.where(F.col("scc").isNull()).count()
        _drain_scratch()
        return new_state, {"unassigned": unassigned}

    def converged(m: dict) -> bool:
        return m.get("unassigned", 1) == 0

    runner = SuperstepRunner(spark, "scc", run_id, checkpoint_dir, cadence=cadence)
    res = runner.run(init_state, step, converged, max_rounds, resume=resume)
    _drain_scratch()
    e0.unpersist()
    nodes.unpersist()
    nodes_pre.unpersist()
    return res
