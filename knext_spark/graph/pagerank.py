"""PageRank as iterative DataFrame joins, NetworkX-parity semantics.

The north rule requires per-vertex scores matching ``nx.pagerank``
``allclose(1e-6)`` at convergence. NetworkX power-iteration semantics
reproduced exactly (networkx/algorithms/link_analysis/pagerank_alg.py,
public source):

- right-stochastic transition: each edge weight divided by its source's
  total out-weight;
- dangling nodes (no out-edges) donate their whole rank, spread per
  the personalization vector (dangling_weights = personalization;
  uniform when no personalization is given — nx's defaults);
- x_{k+1} = alpha * (x_k @ A + dangling_mass * p) + (1-alpha) * p,
  with p = 1/N uniform or the normalized ``personalization`` column;
- convergence when L1(x_{k+1} - x_k) < N * tol.

Scale design:
- the normalized edge table is computed ONCE, repartitioned by ``src``
  and persisted — every superstep's rank⋈edges join then reuses that
  partitioning (no per-iteration edge shuffle; only the contribution
  aggregation shuffles, on dst);
- dangling mass uses the stochastic identity 1 - sum(contribs) (the
  rank vector sums to 1), one single-row collect over the checkpointed
  contribution table — no per-step ranks re-scan / anti-join /
  broadcast job;
- convergence mode (tol > 0) is ALSO one driver action per superstep:
  the L1 delta between the two *previous* rank vectors is fused into
  the same job as the dangling-mass sum (a union of two single-row
  aggregates, one collect). The check therefore lags one superstep —
  when the lagged delta passes, the step returns its INPUT state
  (exactly the x_m NetworkX returns: the first iterate with
  L1(x_m - x_{m-1}) < N*tol), at the cost of one discarded
  contribution pass on the final superstep. Boundary (deliberate): a
  run whose first passing delta is the pair (x_max_iter,
  x_{max_iter-1}) would need step max_iter+1 to observe it, so it
  reports ``converged=False`` with the correct final state — matching
  NetworkX, which likewise treats hitting the cap as non-convergence
  (it raises PowerIterationFailedConvergence there). Callers that
  care can re-test the last committed l1_delta. In fixed-iteration mode
  (tol <= 0) no delta is computed: the dangling-mass collect is the
  single per-superstep action (a fully lazy "collect-free" chaining
  variant measured 2-3x slower — see the note in ``step``);
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
from pyspark.storagelevel import StorageLevel

from knext_spark.graph.degrees import pick_salt_k
from knext_spark.graph.superstep import (
    SuperstepRunner,
    SuperstepResult,
    auto_num_partitions,
    unpersist_checkpoint,
)


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
    check_every: int = 1,
    encode_ids: bool = False,
    personalization: DataFrame | None = None,
    _p_normalized: bool = False,
) -> SuperstepResult:
    """edges(src, dst, weight) -> SuperstepResult with state
    (node, rank). Parallel (src,dst) duplicates are NOT collapsed here
    (caller controls: nx.DiGraph-parity means dropDuplicates upstream;
    a MultiDiGraph reading sums them, which summation here reproduces).

    ``personalization``: optional (node, p) DataFrame switching to
    personalized PageRank with exact ``nx.pagerank(G,
    personalization=...)`` semantics: p is normalized over ALL its
    rows (keys outside the graph contribute to the normalization mass
    but receive no rank — nx's behaviour), graph nodes absent from p
    get 0, the teleport term becomes (1-alpha)*p(v), and dangling mass
    redistributes as dangling_mass*p(v) (nx's default
    dangling=personalization). The start vector stays uniform 1/N
    (nx's nstart=None). The dangling-mass identity 1 - sum(contribs)
    is personalization-independent (the rank vector still sums to 1),
    so the per-superstep driver cost is unchanged. ``_p_normalized``
    is internal (the encode_ids wrapper normalizes BEFORE encoding so
    out-of-dictionary mass is preserved).

    ``encode_ids=True`` dictionary-encodes node ids to dense int64
    before iterating and decodes the result (graph.encode) — measured
    1.27x faster steady-state supersteps on short string keys, more on
    longer ones (BENCH.md §1). Ranks are
    numerically identical up to float summation order (aggregation
    grouping changes partial-sum order; differences are ~1e-16-level).
    The dictionary is materialized ONCE to Parquet under
    ``checkpoint_dir`` (graph.encode's consistency contract: range-
    shuffle recomputation is not deterministic) and resume re-reads
    that same materialization, so resumed nids always match the
    committed iterate's.
    """
    import os
    import tempfile

    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="knext_ckpt_")

    if personalization is not None and not _p_normalized:
        pin = personalization.select(
            "node", F.col("p").cast("double").alias("p")
        )
        tot = pin.agg(F.sum("p").alias("t")).collect()[0]["t"]
        if tot is None or float(tot) <= 0.0:
            raise ValueError("personalization must have positive total mass")
        personalization = pin.select(
            "node", (F.col("p") / F.lit(float(tot))).alias("p")
        )
        _p_normalized = True

    if encode_ids:
        from knext_spark.graph.encode import (
            build_dictionary, decode_cols, encode_edges, nodes_of,
        )

        dic = build_dictionary(
            nodes_of(edges),
            num_partitions,
            materialize_dir=os.path.join(
                checkpoint_dir, "pagerank", run_id, "dictionary"
            ),
            reuse=resume,
        )
        pers_enc = None
        if personalization is not None:
            # inner join: out-of-graph keys drop here, AFTER the
            # normalization above already banked their mass — nx parity
            pers_enc = personalization.join(dic, "node").select(
                F.col("nid").alias("node"), "p"
            )
        res = pagerank(
            spark,
            encode_edges(edges, dic),
            alpha=alpha,
            tol=tol,
            max_iter=max_iter,
            checkpoint_dir=checkpoint_dir,
            run_id=run_id,
            resume=resume,
            salt_k=salt_k,
            cadence=cadence,
            num_partitions=num_partitions,
            check_every=check_every,
            personalization=pers_enc,
            _p_normalized=True,
        )
        # dic is a Parquet read-back: the decode join re-reads the same
        # durable bytes whenever the caller's action runs — nothing to
        # keep alive or release
        out = decode_cols(res.state, dic, "node")
        return SuperstepResult(out, res.iterations, res.converged, res.metrics)
    if salt_k == "auto":
        salt_k = pick_salt_k(edges)

    ne = _normalized_edges(edges, int(salt_k))

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if personalization is not None:
        # carry the normalized teleport weight on the node frame itself
        # (one build-time join; the per-superstep plan shape is
        # unchanged — `new` still joins nodes with contribs once)
        nodes = nodes.join(personalization, "node", "left").select(
            "node", F.coalesce(F.col("p"), F.lit(0.0)).alias("p")
        )
    # two-phase persist: count the pre-partition frame once so the
    # partition count can be DERIVED from the graph size (superstep.
    # auto_num_partitions), then lay out the per-superstep frames with
    # it; the pre-partition cache makes the repartition a cache read,
    # not a recompute
    nodes_pre = nodes.persist()
    n = nodes_pre.count()
    n_part = num_partitions or auto_num_partitions(spark, n, edges)
    ne = ne.repartition(n_part, "src").persist()
    nodes = nodes_pre.repartition(n_part, "node").persist()
    # in-graph personalization mass: < 1.0 exactly when the caller put
    # mass on out-of-graph keys (nx banks that mass in the
    # normalization and lets it leak — the rank vector then sums to
    # S < 1 at the fixpoint, so the dangling identity must use the
    # tracked S, not the constant 1)
    p_mass = (
        1.0
        if personalization is None
        else float(nodes.agg(F.sum("p")).collect()[0][0] or 0.0)
    )
    if n == 0:
        raise ValueError("empty graph")

    def init_state() -> DataFrame:
        return nodes.select("node", F.lit(1.0 / n).alias("rank"))

    # Superseded checkpoint layers are unpersisted two steps behind:
    # a localCheckpoint's lineage is truncated once materialized, so a
    # long run would otherwise accumulate every superstep's state in
    # block-manager memory — unbounded heap growth whose GC pause time
    # (machine-wide, independent of task parallelism) becomes the
    # dominant non-scaling cost per superstep.
    # (PySpark's MEMORY_AND_DISK is the *serialized* variant — compact
    # byte buffers instead of per-row heap objects)
    ser = StorageLevel.MEMORY_AND_DISK
    retired: list[DataFrame] = []
    last_new: list[DataFrame | None] = [None]
    # rank vector of the PREVIOUS superstep's input (x_{k-2} at entry
    # to step k) — the lagged convergence pair; kept alive because the
    # retired list only unpersists two steps behind
    prev_ranks: list[DataFrame | None] = [None]
    # analytic total of the rank vector entering the CURRENT step —
    # exactly 1.0 forever in the uniform case; under personalization
    # with out-of-graph mass it decays toward its fixpoint and is
    # updated driver-side from the same quantities the step already
    # collects. None = unknown (resume mid-run): recomputed once.
    rank_sum: list[float | None] = [
        None if (resume and personalization is not None) else 1.0
    ]

    def step(state: DataFrame, k: int) -> tuple[DataFrame, dict]:
        ranks = state.select("node", "rank")
        if int(salt_k) > 1:
            salted = ranks.select(
                "node",
                "rank",
                F.explode(F.sequence(F.lit(0), F.lit(int(salt_k) - 1))).alias("salt"),
            ).withColumn("salt", F.col("salt").cast("long"))
            joined = ne.join(
                salted.hint("shuffle_hash"),
                (ne["src"] == salted["node"]) & (ne["salt"] == salted["salt"]),
            )
            partial = joined.groupBy("dst", ne["salt"]).agg(
                F.sum(F.col("rank") * F.col("w_norm")).alias("c")
            )
            contribs = partial.groupBy("dst").agg(F.sum("c").alias("contrib"))
        else:
            # shuffle_hash hint: both sides are pre-partitioned on the
            # join key (ne by src, ranks by node — zero exchange), and
            # the default sort-merge strategy would re-SORT the full
            # edge table every superstep; hashing the small ranks side
            # instead makes the superstep a pure streaming probe of the
            # cached edges
            joined = ne.join(ranks.hint("shuffle_hash"), ne["src"] == ranks["node"])
            contribs = joined.groupBy("dst").agg(
                F.sum(F.col("rank") * F.col("w_norm")).alias("contrib")
            )
        # Dangling mass via the stochastic identity: w_norm sums to 1
        # per src, so sum(contribs) == sum of non-dangling ranks, and
        # the rank vector sums to exactly 1 analytically (float drift
        # ~1e-16/step, far under the 1e-6 parity gate). One cheap
        # collect over the checkpointed contribs replaces a per-step
        # ranks-scan + anti-join + broadcast-await job — at 1000
        # executors those per-superstep launch floors, not the edge
        # work, are what caps scaling.
        # NOTE(measured, this sandbox, 118.9M edges @ local[8]): a
        # "collect-free" variant — dangling mass as a broadcast 1-row
        # aggregate, supersteps chained lazily, one count() per
        # sync_every steps — benchmarked 2-3x SLOWER (40.7 s/step vs
        # 21.9 same-session, 14.0 clean) than this single-collect
        # design: Spark kicks off every broadcast-exchange future at
        # physical-planning time (localCheckpoint), so each deferred
        # superstep launches a broadcast job that materializes the
        # chain anyway, and the sync job then re-executes the final
        # map-side work. One single-row collect per superstep is the
        # minimum driver involvement Spark's execution model rewards.
        contribs = contribs.localCheckpoint(eager=False, storageLevel=ser)
        sum_df = contribs.agg(
            F.coalesce(F.sum("contrib"), F.lit(0.0)).alias("v")
        ).select(F.lit("s").alias("tag"), "v")
        prev = prev_ranks[0]
        do_check = tol > 0.0 and prev is not None and (k - 1) % max(1, check_every) == 0
        if do_check:
            # lagged L1(x_{k-1} - x_{k-2}) fused into the dangling-mass
            # job: union of two single-row aggregates, ONE collect
            delta_df = (
                ranks.join(
                    prev.withColumnRenamed("rank", "prev").hint("shuffle_hash"),
                    "node",
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("v"))
                .select(F.lit("d").alias("tag"), "v")
            )
            sum_df = sum_df.unionByName(delta_df)
        got = {r["tag"]: r["v"] for r in sum_df.collect()}
        if rank_sum[0] is None:  # resumed personalized run: one-time re-derivation
            rank_sum[0] = float(state.agg(F.sum("rank")).collect()[0][0])
        dangling_mass = rank_sum[0] - got["s"]
        delta = got.get("d")
        # the collect above materialized this step's inputs; layers two
        # steps back can never be re-read — free them
        while len(retired) > 2:
            unpersist_checkpoint(retired.pop(0))
        retired.append(contribs)
        retired.append(state)
        prev_ranks[0] = ranks
        if delta is not None and float(delta) < n * tol:
            # step k-1 converged: return its output (this step's input)
            # unchanged — identical to NetworkX's stopping iterate
            return ranks, {
                "l1_delta": float(delta),
                "n_nodes": n,
                "dangling_mass": dangling_mass,
            }
        if personalization is None:
            rank_expr = (
                F.lit(alpha)
                * (
                    F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.lit(dangling_mass / float(n))
                )
                + F.lit((1.0 - alpha) / n)
            )
        else:
            # nx personalized update: alpha*(Ax + dm*p) + (1-alpha)*p
            rank_expr = (
                F.lit(alpha)
                * (
                    F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.lit(dangling_mass) * F.col("p")
                )
                + F.lit(1.0 - alpha) * F.col("p")
            )
        new = (
            nodes.join(
                contribs.hint("shuffle_hash"), nodes["node"] == contribs["dst"], "left"
            )
            .select("node", rank_expr.alias("rank"))
        )
        # lazy localCheckpoint truncates lineage (LogicalRDD) without an
        # eager job — the next superstep's fused collect materializes it
        new = new.localCheckpoint(eager=False, storageLevel=ser)
        last_new[0] = new
        if personalization is not None:
            # analytic total of `new`: sum over nodes of the update rule
            # (contribs sum to got["s"], p sums to p_mass) — keeps the
            # dangling identity exact without any extra distributed sum
            rank_sum[0] = (
                alpha * (got["s"] + dangling_mass * p_mass)
                + (1.0 - alpha) * p_mass
            )
        m = {"n_nodes": n, "dangling_mass": dangling_mass}
        if delta is not None:
            m["l1_delta"] = float(delta)  # lagged: L1 of superstep k-1
        return new, m

    def converged(m: dict) -> bool:
        return m.get("l1_delta", float("inf")) < n * tol

    runner = SuperstepRunner(
        spark, "pagerank", run_id, checkpoint_dir, cadence=cadence
    )
    result = runner.run(init_state, step, converged, max_iter, resume=resume)
    ne.unpersist()
    nodes.unpersist()
    nodes_pre.unpersist()
    # the returned state is a committed-Parquet read-back — the working
    # checkpoint layers are dead; leaking them across calls compounds
    # into machine-wide GC pressure over a multi-run session (measured:
    # it inflated a later run's superstep wall by >50%)
    for df in retired:
        unpersist_checkpoint(df)
    retired.clear()
    if last_new[0] is not None:  # final step's working copy, superseded too
        unpersist_checkpoint(last_new[0])
    return result
