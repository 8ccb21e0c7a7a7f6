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


def _salted_min_join(
    big: DataFrame, salt_k: int, mins: DataFrame | None = None
) -> DataFrame:
    """Join ``big(u, v, ...)`` with its per-u min(v) aggregate
    (``mins`` if the caller already built it, else computed here),
    returning big's rows extended with ``mv``. The min aggregate is
    map-side combinable (a hub key reduces to one row per upstream
    partition), but the JOIN streams the hub's whole fan-out through
    one task; ``salt_k > 1`` splits the key to (u, salt) — big gets a
    deterministic per-row salt, the tiny mins side replicates k-fold —
    so a hub's rows spread over k tasks (same design as pagerank's
    salt_k; measured on a 4M-degree hub in BENCH.md §5)."""
    if mins is None:
        mins = big.groupBy("u").agg(F.min("v").alias("mv"))
    if salt_k <= 1:
        # mins is the small aggregated side and both sides are already
        # shuffled on u — hash it instead of sort-merging (which would
        # sort the full edge list every round)
        return big.join(mins.hint("shuffle_hash"), "u")
    salted = big.withColumn("__salt", F.pmod(F.xxhash64("u", "v"), F.lit(salt_k)))
    mins_k = mins.select(
        "u",
        "mv",
        F.explode(F.sequence(F.lit(0), F.lit(salt_k - 1))).alias("__salt"),
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return salted.join(mins_k.hint("shuffle_hash"), ["u", "__salt"]).drop("__salt")


def _large_star(e: DataFrame, salt_k: int = 1) -> DataFrame:
    bidir = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    m = F.least(F.col("u"), F.col("mv"))
    return (
        _salted_min_join(bidir, salt_k)
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame, salt_k: int = 1) -> DataFrame:
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("mv"))
    return (
        _salted_min_join(oriented, salt_k, mins)
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
    salt_k: int | str = 1,
) -> SuperstepResult:
    """edges(src, dst) -> SuperstepResult with state
    (node, component) where component = min node id of the component.
    Isolated nodes (self-loop-only) label themselves.

    ``salt_k > 1`` salts the per-round star joins (see
    _salted_min_join) — the min aggregations are already map-side
    combinable, but a hub's fan-out otherwise streams through one join
    task per round, and the star-forest fixpoint makes every large
    component's representative exactly such a hub. ``salt_k="auto"``
    picks k from the INPUT's max undirected degree (one aggregate);
    note the contraction concentrates fan-in on component
    representatives as rounds progress, so for graphs whose largest
    component is far bigger than its max input degree an explicit
    salt_k sized to the component scale is the right call.

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
            salt_k=salt_k,
        )
        out = decode_cols(res.state, dic, "node", "component")
        return SuperstepResult(out, res.iterations, res.converged, res.metrics)

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )

    if salt_k == "auto":
        und = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        deg = (
            und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .distinct()
            .groupBy("a")
            .agg(F.count("*").alias("c"))
            .agg(F.max("c").alias("m"))
            .collect()[0]["m"]
        ) or 0
        salt_k = max(1, min(64, -(-int(deg) // 1_000_000)))
    salt_k = int(salt_k)

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
        new = _small_star(_large_star(state, salt_k), salt_k).localCheckpoint(
            eager=True
        )
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
