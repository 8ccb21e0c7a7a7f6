#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. The LAST stdout line
is a short headline JSON (guaranteed to fit a tail capture):

  {"metric": ..., "value": <total wall sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "pagerank_supersteps_per_sec": ..., "pagerank_edges_per_sec": ...,
   "kgml_edges_per_sec": ...}

The FULL record — including the per-query min/max spread arrays and
per-superstep walls — is printed on an earlier line and written to
BENCH_LAST.json next to this file.

The headline metric mirrors BASELINE.json: PageRank supersteps/sec and
edges/sec over the KGML-derived edge table (synthesized deterministic
corpus, parsed by the engine, genes-mode with propagation), plus the
operator suite at the chosen SF.

--scaling runs the same PageRank job at several parallelism levels
(default local[2] / local[8] / local[32]; override
SPARK_GRAFT_SCALE_LEVELS=2,8) on the same input and reports throughput
at every level plus the scaling efficiency of each consecutive pair
(= (edges/s@hi / edges/s@lo) / (hi/lo)). The headline value is the
first pair — local[2] -> local[8], the N -> 4N cores stand-in for the
N vs 4N executor criterion (protocol + memory-bus analysis for the
8 -> 32 pair in BENCH.md).

--refcmp runs the reference parser head-to-head against the engine on
the same corpus.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def _corpus_docs_for_sf(sf: float) -> int:
    # sf0.01 -> 150 docs, sf0.1 -> 1500 docs (~45 edges/doc post-expand)
    return max(24, int(15000 * sf))


def _build_kgml_edges(spark, sf: float, n_docs: int | None = None, scale: float = 1.0, mixed: bool = False):
    from knext_spark.corpus import gen_docs_df
    from knext_spark.knext import build_edges
    from knext_spark.parse import parse_docs

    docs = gen_docs_df(
        spark, n_docs or _corpus_docs_for_sf(sf), seed=42, scale=scale
    )
    parsed = parse_docs(docs)
    # default (non-unique) naming: gene ids shared across documents of
    # one org connect, forming one large graph
    edges = build_edges(parsed, mixed=mixed, unique=False)
    return edges.select(
        F.col("entry1").alias("src"), F.col("entry2").alias("dst"), "weight"
    ).dropDuplicates(["src", "dst"])


def _pagerank_throughput(spark, edges, cadence=50, max_iter=100, tol=1.0e-6,
                         num_partitions=None):
    from knext_spark.graph import pagerank

    n_edges = edges.count()
    t0 = time.time()
    res = pagerank(
        spark,
        edges,
        checkpoint_dir=tempfile.mkdtemp(prefix="bench_pr_"),
        run_id="bench",
        cadence=cadence,
        max_iter=max_iter,
        tol=tol,
        num_partitions=num_partitions,
    )
    res.state.count()
    wall = time.time() - t0
    iters = res.iterations
    # warm-up exclusion (BASELINE.md protocol): drop init (iter 0) and
    # the first real superstep; rate from the steady-state walls
    walls = [
        m["wall_s"]
        for m in res.metrics
        if m.get("iteration", 0) >= 2 and "wall_s" in m
    ]
    steady = sum(walls) if walls else wall
    steady_iters = len(walls) or iters
    return {
        "wall_s": wall,
        "supersteps": iters,
        "n_edges": n_edges,
        "supersteps_per_sec": steady_iters / steady,
        "edges_per_sec": steady_iters * n_edges / steady,
    }


from contextlib import contextmanager


@contextmanager
def _static_plan(spark):
    """Disable AQE for a fixed-shape plan. Measured on the triangle
    queries (BENCH.md §4): the plan consumes its two explicit
    repartition exchanges 3x each, and while AQE DOES reuse the
    materialized stages at runtime (ReusedExchange present in the
    final adaptive plan), its per-stage re-planning barriers on a
    ~100-exchange tree cost ~1.8x wall (kgml_triangles median 7.8s
    adaptive vs 4.4s static, 5 runs). Static planning applies the
    classic whole-plan ReuseExchange rule up front — the right choice
    for a plan whose partitioning is already explicit, and the same
    protocol the scaling bench uses for the iterative phase."""
    old = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


_SCALE_OFF = 1_000_000_000  # key offset per replica; divisible by 1000
# so the lineitem-derived mod-1000 graph queries collapse replicas onto
# identical edges (they then measure the k-fold distinct/dedup; the
# graph itself is constant by construction)


def _build_scaled_sf(spark, sf_dir: str, k: int) -> str:
    """Deterministic k-fold replication of the suite's input tables
    into disjoint id spaces — the second bench scale point (no sf1
    parquet exists on disk, and the task mandates synthesizing scale
    deterministically). Replica 0 is the original bytes; replica r:

    - offsets every join/group key by r * 1e9, so per-replica join and
      group structure is IDENTICAL and output volume scales linearly;
    - prefixes every document token with 'r{r}', so shingle / minhash
      / simhash structure is preserved WITHIN a replica but never
      collides ACROSS replicas — the near-dup workload scales the way
      k-fold fresh data would, instead of creating k-cliques of exact
      duplicates;
    - sign-flips a deterministic half of the embedding dimensions per
      replica (an isometry: within-replica cosines are bit-preserved,
      across-replica vectors decorrelate) — the ANN workload scales
      like fresh data.

    Untouched dimension tables are symlinked. Cached under /tmp keyed
    by (sf name, k)."""
    import shutil

    name = os.path.basename(sf_dir.rstrip("/"))
    out_dir = f"/tmp/bench_scaled_{name}_x{k}"
    marker = os.path.join(out_dir, "_SCALED_OK")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)

    def reps(table: str, build):
        parts = [build(spark.read.parquet(f"{sf_dir}/{table}.parquet"), r)
                 for r in range(k)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")

    def off(df, r, *keys):
        return df.select(
            *[
                (F.col(c) + F.lit(r * _SCALE_OFF)).alias(c)
                if c in keys else F.col(c)
                for c in df.columns
            ]
        )

    reps("lineitem", lambda df, r: off(df, r, "l_orderkey", "l_partkey", "l_suppkey"))
    reps("orders", lambda df, r: off(df, r, "o_orderkey", "o_custkey"))
    reps("part", lambda df, r: off(df, r, "p_partkey"))
    reps("customer", lambda df, r: off(df, r, "c_custkey"))
    reps("events", lambda df, r: off(df, r, "event_id", "user_id"))

    def docs(df, r):
        df = off(df, r, "doc_id")
        if r == 0:
            return df
        newtext = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda x: F.concat(F.lit(f"r{r}"), x),
            ),
            " ",
        )
        return df.withColumn("text", newtext).withColumn(
            "n_chars", F.length("text").cast("long")
        )

    reps("documents", docs)

    dim = len(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("embedding").first()["embedding"]
    )

    def embs(df, r):
        df = off(df, r, "vec_id")
        if r == 0:
            return df
        signs = F.array(*[
            F.lit(1.0 if ((r * 1315423911 + i * 2654435761) >> 7) & 1 else -1.0)
            for i in range(dim)
        ])
        return df.withColumn(
            "embedding",
            F.zip_with("embedding", signs, lambda v, s: (v * s).cast("float")),
        )

    reps("embeddings", embs)

    for table in ("region", "nation", "supplier"):
        src = f"{sf_dir}/{table}.parquet"
        if os.path.exists(src):
            os.symlink(src, f"{out_dir}/{table}.parquet")
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def _hits_throughput(spark, edges, steps=8):
    """Fixed-superstep HITS run (tol=0): deterministic workload for a
    run-to-run-comparable rate. NOTE one HITS superstep makes TWO edge
    passes (hub→authority and authority→hub probes), so its
    edges_per_sec counts 2·|E| contributions per superstep."""
    from knext_spark.graph import hits

    n_edges = edges.count()
    t0 = time.time()
    res = hits(
        spark,
        edges,
        tol=0.0,
        max_iter=steps,
        checkpoint_dir=tempfile.mkdtemp(prefix="bench_hits_"),
        run_id="bench",
        cadence=50,
    )
    res.state.count()
    wall = time.time() - t0
    walls = [
        m["wall_s"]
        for m in res.metrics
        if m.get("iteration", 0) >= 2 and "wall_s" in m
    ]
    steady = sum(walls) if walls else wall
    steady_iters = len(walls) or res.iterations
    return {
        "wall_s": wall,
        "supersteps": res.iterations,
        "n_edges": n_edges,
        "supersteps_per_sec": steady_iters / steady,
        "edges_per_sec": steady_iters * 2 * n_edges / steady,
    }


def run_suite(sf_dir: str, cpus: int) -> dict:
    """Each query is repeated SPARK_GRAFT_BENCH_RUNS times (default 3,
    fresh DataFrame each rep so planning cost is included); reported
    per-query time is the MEDIAN, with min/max spread kept in
    `queries_spread` so a round-over-round diff can be adjudicated as
    noise vs regression (round 2's single-run harness could not)."""
    import statistics

    from knext_spark.session import get_spark

    import __spark_entry__ as em

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    scale = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_SCALE", "1")))
    spark = get_spark(
        "bench", master=f"local[{cpus}]", shuffle_partitions=max(8, int(cpus))
    )
    if scale > 1:
        sf_dir = _build_scaled_sf(spark, sf_dir, scale)
    timings: dict[str, float] = {}
    spread: dict[str, dict] = {}
    extras: dict[str, float] = {}

    def timed(name, fn, n=runs):
        walls = []
        out = None
        for _ in range(n):
            t0 = time.time()
            out = fn()
            walls.append(round(time.time() - t0, 3))
        timings[name] = round(statistics.median(walls), 3)
        spread[name] = {"runs": walls, "min": min(walls), "max": max(walls)}
        return out

    # parse timing: rebuild the whole pipeline each rep (nothing
    # persisted yet, so no cache hit); then persist one copy for the
    # downstream graph phases
    kgml_docs = _corpus_docs_for_sf(sf) * scale
    n_kgml_edges = timed(
        "kgml_parse_edges",
        lambda: _build_kgml_edges(spark, sf, n_docs=kgml_docs).count(),
    )
    edges = _build_kgml_edges(spark, sf, n_docs=kgml_docs)
    edges.persist().count()
    extras["kgml_n_edges"] = n_kgml_edges
    extras["kgml_edges_per_sec"] = round(
        n_kgml_edges / timings["kgml_parse_edges"], 1
    )

    pr_runs = [_pagerank_throughput(spark, edges) for _ in range(runs)]
    pr_walls = [round(p["wall_s"], 3) for p in pr_runs]
    pr = sorted(pr_runs, key=lambda p: p["wall_s"])[len(pr_runs) // 2]
    timings["kgml_pagerank"] = round(pr["wall_s"], 3)
    spread["kgml_pagerank"] = {
        "runs": pr_walls, "min": min(pr_walls), "max": max(pr_walls)
    }
    extras["pagerank_supersteps"] = pr["supersteps"]
    extras["pagerank_supersteps_per_sec"] = round(pr["supersteps_per_sec"], 3)
    extras["pagerank_edges_per_sec"] = round(pr["edges_per_sec"], 1)

    from knext_spark.graph import connected_components, triangle_count

    def cc_run():
        connected_components(
            spark, edges, checkpoint_dir=tempfile.mkdtemp(prefix="bench_cc_"),
            cadence=10,
        ).state.count()

    timed("kgml_connected_components", cc_run)

    with _static_plan(spark):
        timed(
            "kgml_triangles",
            lambda: triangle_count(edges).agg(F.sum("triangles")).collect(),
        )

    hits_runs = [_hits_throughput(spark, edges) for _ in range(runs)]
    hits_walls = [round(h["wall_s"], 3) for h in hits_runs]
    ht = sorted(hits_runs, key=lambda h: h["wall_s"])[len(hits_runs) // 2]
    timings["kgml_hits"] = round(ht["wall_s"], 3)
    spread["kgml_hits"] = {
        "runs": hits_walls, "min": min(hits_walls), "max": max(hits_walls)
    }
    extras["hits_supersteps"] = ht["supersteps"]
    extras["hits_supersteps_per_sec"] = round(ht["supersteps_per_sec"], 3)
    extras["hits_edge_contribs_per_sec"] = round(ht["edges_per_sec"], 1)
    edges.unpersist()

    suite = [
        "pricing_summary",
        "agg_collect_join",
        "dedup_keep_last",
        "broadcast_lookup_join",
        "window_topk",
        "clique_pairs",
        "exact_dedup",
        "minhash_dedup",
        "simhash_near_pairs",
        "lang_id",
        "quality_score",
        "doc_fingerprint",
        "lsh_ann_buckets",
        "embedding_near_dups",
        "triangles",
    ]
    qs = em.queries()
    for name in suite:
        def one(name=name):
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

        if name == "triangles":
            with _static_plan(spark):
                timed(name, one)
        else:
            timed(name, one)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_spread": spread,
        "bench_runs_per_query": runs,
        "sf": sf,
        "bench_scale": scale,
        "effective_sf": round(sf * scale, 3),
        "kgml_docs": kgml_docs,
        "cpus": cpus,
        **extras,
    }


def _timed_pagerank(spark, edges, steps: int, n_part: int) -> float:
    """Wall seconds for a fixed-superstep PageRank run (tol=0 fast
    path: no convergence action; supersteps chain through lazy
    localCheckpoints)."""
    from knext_spark.graph import pagerank

    t0 = time.time()
    res = pagerank(
        spark,
        edges,
        checkpoint_dir=tempfile.mkdtemp(prefix="bench_pr_"),
        run_id="scale",
        cadence=1000,
        max_iter=steps,
        tol=0.0,
        num_partitions=n_part,
    )
    res.state.count()
    return time.time() - t0


def _steady_superstep_walls(
    spark, edges, steps: int, n_part: int, personalization=None
) -> list[float]:
    """Per-superstep wall seconds from ONE fixed-superstep run — the
    runner records each superstep's wall in its metrics, so a single
    run yields `steps` samples with per-run fixed cost (session, init
    commit, final commit) excluded by construction."""
    from knext_spark.graph import pagerank

    res = pagerank(
        spark,
        edges,
        checkpoint_dir=tempfile.mkdtemp(prefix="bench_pr_"),
        run_id="scale",
        cadence=1000,
        max_iter=steps,
        tol=0.0,
        num_partitions=n_part,
        personalization=personalization,
    )
    res.state.count()
    return [
        float(m["wall_s"])
        for m in res.metrics
        if m.get("iteration", 0) >= 1 and "wall_s" in m
    ]


def _ensure_scale_edges(sf, n_docs, replicas, n_part, conf) -> str:
    """The 118.9M-edge int64-keyed scaling corpus: generate once (KGML
    parse, replicate into disjoint id spaces, xxhash64-encode) and
    reuse via $SPARK_GRAFT_SCALE_EDGES across runs."""
    from knext_spark.session import get_spark

    edge_dir = os.environ.get("SPARK_GRAFT_SCALE_EDGES", "")
    if edge_dir and os.path.exists(os.path.join(edge_dir, "_SUCCESS")):
        return edge_dir
    edge_dir = edge_dir or tempfile.mkdtemp(prefix="bench_scale_edges_")
    spark = get_spark(
        "bench_scale_gen", master="local[32]",
        shuffle_partitions=n_part, extra_conf=conf,
    )
    # mixed mode: pure-Catalyst edge build (no per-doc propagation)
    # — the scaling subject is superstep throughput
    base = _build_kgml_edges(spark, sf, n_docs=n_docs, scale=3.0, mixed=True)
    rep = base.crossJoin(spark.range(replicas).select(F.col("id").alias("rep")))
    (
        rep.select(
            F.xxhash64("src", "rep").alias("src"),
            F.xxhash64("dst", "rep").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
        .repartition(n_part)
        .write.mode("overwrite")
        .parquet(edge_dir)
    )
    spark.stop()
    return edge_dir


def run_scaling(sf_dir: str, levels=(2, 8, 32)) -> dict:
    """Same PageRank job at several parallelism levels on the same input.

    Protocol (BENCH.md):
    - the KGML corpus is generated and parsed ONCE (distributed), the
      resulting edge table replicated ``SPARK_GRAFT_SCALE_REPLICAS``
      times into disjoint id spaces (same degree distribution, same
      skew, x R edges) and node ids dictionary-encoded to 64-bit via
      xxhash64 — the standard prep before an iterative phase at scale;
    - the encoded table is written to ONE shared Parquet file; both
      levels read the identical bytes with identical partitioning
      (shuffle partitions 64, rank/edge co-partitioning 64) — only task
      slots differ, like a real N -> 4N executor comparison;
    - AQE off for the iterative phase (static partitioning by design;
      per-superstep re-planning is serial driver cost);
    - STEADY-STATE PER-SUPERSTEP MEDIAN: one run of
      SPARK_GRAFT_SCALE_STEPS supersteps per level; the runner records
      every superstep's wall, and the level's s/step is the median of
      the LAST HALF of those walls. Per-run fixed cost (session init,
      state-0 commit, final commit) is excluded by construction, and —
      the round-3 fix — so is the JIT/codegen warm-up, which measured
      ~4-5 supersteps long (e.g. local[8]: 54.4, 21.4, 23.4, 25.7,
      18.0 then a steady 15.4-16.4s band). The previous differential
      protocol (wall(8 steps) - wall(3 steps)) STRADDLED that
      transition, which made consecutive paired runs disagree by up to
      55% (measured: 20.8 vs 13.4 s/step, identical code and input) —
      round 2's 0.87 and an identically-configured re-run's 0.63 were
      both samples of that noise. Within one JVM's steady state the
      walls sit in a ±5% band and the median of >= 8 of them is
      reproducible. SPARK_GRAFT_SCALE_RUNS > 1 repeats the whole run
      and takes the fastest level median (interference can only slow a
      run down).
    - efficiency is reported for EVERY consecutive level pair; the
      headline value is the first pair (2 -> 8 by default, the
      N -> 4N-cores stand-in — the task text allows "N and 4N cores").
      The 8 -> 32 pair is kept in the output deliberately: on this
      single-socket sandbox it measures memory-bus saturation, not
      algorithmic scaling (BENCH.md has the analysis), and hiding it
      would overstate the result.
    """
    import statistics
    from knext_spark.session import get_spark
    from pyspark.sql import functions as F

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    if os.environ.get("SPARK_GRAFT_SCALE_LEVELS"):
        levels = tuple(
            int(x) for x in os.environ["SPARK_GRAFT_SCALE_LEVELS"].split(",")
        )
    if len(levels) < 2:
        raise ValueError(f"--scaling needs >= 2 levels, got {levels!r}")
    n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "100000"))
    replicas = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "14"))
    runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "1"))
    steps = int(os.environ.get("SPARK_GRAFT_SCALE_STEPS", "16"))
    n_part = int(os.environ.get("SPARK_GRAFT_SCALE_PARTITIONS", "64"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "56g")
    shm = "/dev/shm/spark-scale-tmp"
    os.makedirs(shm, exist_ok=True)
    # shuffle/spill on tmpfs: the sandbox's /tmp disk caps shuffle
    # throughput (~200 MB/s serial) and would masquerade as poor CPU
    # scaling; production executors put this on local NVMe
    no_aqe = {
        "spark.sql.adaptive.enabled": "false",
        "spark.local.dir": shm,
        # Tungsten off-heap: 64MB on-heap page allocations are G1
        # humongous objects and trigger GCLocker stalls at high thread
        # counts (observed; see BENCH.md)
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "24g",
        "spark.buffer.pageSize": "8m",
    }

    edge_dir = _ensure_scale_edges(sf, n_docs, replicas, n_part, no_aqe)

    out = {}
    for cpus in levels:
        spark = get_spark(
            f"bench_scale_{cpus}", master=f"local[{cpus}]",
            shuffle_partitions=n_part, extra_conf=no_aqe,
        )
        edges = spark.read.parquet(edge_dir).persist()
        n_edges = edges.count()
        medians, all_walls = [], []
        for _ in range(runs):
            walls = _steady_superstep_walls(spark, edges, steps, n_part)
            steady = walls[len(walls) // 2:]  # back half = post-warm-up
            medians.append(statistics.median(steady))
            all_walls.append([round(w, 2) for w in walls])
        s_per_step = min(medians)  # fastest run: interference only adds
        sps = 1.0 / s_per_step
        out[f"local[{cpus}]"] = {
            "n_edges": n_edges,
            "sec_per_superstep": round(s_per_step, 3),
            "supersteps_per_sec": round(sps, 4),
            "edges_per_sec": round(sps * n_edges, 1),
            "per_superstep_walls": all_walls,
        }
        edges.unpersist()
        spark.stop()
    pairs = {}
    for lo, hi in zip(levels, levels[1:]):
        pairs[f"{lo}->{hi}"] = round(
            out[f"local[{hi}]"]["edges_per_sec"]
            / out[f"local[{lo}]"]["edges_per_sec"]
            / (hi / lo),
            4,
        )
    headline = next(iter(pairs.values()))
    return {
        "metric": "pagerank_scaling_efficiency",
        "value": headline,
        "unit": "ratio",
        "headline_pair": next(iter(pairs)),
        "efficiency_pairs": pairs,
        "levels": out,
        "replicas": replicas,
        "n_docs": n_docs,
        "supersteps_per_run": steps,
        "runs_per_level": runs,
        "sf": sf,
    }


def run_encode_gain(sf_dir: str) -> dict:
    """Measure the engine-level dictionary encoding's superstep gain
    (pagerank(encode_ids=True) vs raw string ids) on the scaling-bench
    edge corpus kept STRING-keyed: same generator and replica protocol
    as --scaling, but ids stay `<gene>#<rep>` strings instead of the
    harness's xxhash64 pre-encode. Steady-state per-superstep medians
    (same protocol as --scaling: one run per variant, median of the
    back-half superstep walls) exclude per-run fixed cost INCLUDING
    the one-time dictionary build + encode joins — the number reported
    is the pure per-superstep effect of iterating on int64 vs string
    keys, which is what a long production run experiences."""
    import statistics
    from knext_spark.session import get_spark

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "100000"))
    replicas = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "14"))
    runs = int(os.environ.get("SPARK_GRAFT_ENC_RUNS", "1"))
    steps = int(os.environ.get("SPARK_GRAFT_SCALE_STEPS", "16"))
    n_part = int(os.environ.get("SPARK_GRAFT_SCALE_PARTITIONS", "64"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "56g")
    shm = "/dev/shm/spark-scale-tmp"
    os.makedirs(shm, exist_ok=True)
    conf = {
        "spark.sql.adaptive.enabled": "false",
        "spark.local.dir": shm,
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "24g",
        "spark.buffer.pageSize": "8m",
    }

    edge_dir = tempfile.mkdtemp(prefix="bench_encgain_edges_")
    spark = get_spark(
        "bench_encgain", master=f"local[{cpus}]",
        shuffle_partitions=n_part, extra_conf=conf,
    )
    base = _build_kgml_edges(spark, sf, n_docs=n_docs, scale=3.0, mixed=True)
    rep = base.crossJoin(spark.range(replicas).select(F.col("id").alias("rep")))
    (
        rep.select(
            F.concat_ws("#", "src", "rep").alias("src"),
            F.concat_ws("#", "dst", "rep").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
        .repartition(n_part)
        .write.mode("overwrite")
        .parquet(edge_dir)
    )

    edges = spark.read.parquet(edge_dir).persist()
    n_edges = edges.count()

    from knext_spark.graph import pagerank as pr_fn

    def steady_walls(enc: bool) -> list[float]:
        res = pr_fn(
            spark, edges,
            checkpoint_dir=tempfile.mkdtemp(prefix="bench_enc_"),
            run_id="encgain", cadence=1000, max_iter=steps, tol=0.0,
            num_partitions=n_part, encode_ids=enc,
        )
        res.state.count()
        return [
            float(m["wall_s"])
            for m in res.metrics
            if m.get("iteration", 0) >= 1 and "wall_s" in m
        ]

    out = {}
    for enc in (False, True):
        medians, all_walls = [], []
        for _ in range(runs):
            walls = steady_walls(enc)
            medians.append(statistics.median(walls[len(walls) // 2:]))
            all_walls.append([round(w, 2) for w in walls])
        out["encoded" if enc else "raw_string"] = {
            "sec_per_superstep": round(min(medians), 3),
            "per_superstep_walls": all_walls,
        }
    edges.unpersist()
    spark.stop()
    return {
        "metric": "pagerank_encode_ids_speedup",
        "value": round(
            out["raw_string"]["sec_per_superstep"]
            / out["encoded"]["sec_per_superstep"],
            3,
        ),
        "unit": "x",
        "n_edges": n_edges,
        "variants": out,
        "supersteps_per_run": steps,
        "replicas": replicas,
    }


def run_graph_extra(sf_dir: str, levels=(2, 8)) -> dict:
    """Throughput + two-level scaling evidence for the round-5 graph
    additions: strongly connected components (full-job edges/sec —
    SCC's rounds are heterogeneous, so per-superstep medians would
    compare unlike work) and personalized PageRank (steady-state
    per-superstep walls, directly comparable to the --scaling PageRank
    protocol; the expected result is parity with plain PageRank, since
    personalization only changes the per-node teleport column and the
    driver-side dangling arithmetic).

    Input: the same KGML-parse -> replicate -> xxhash64-encode recipe
    as --scaling, sized down (SPARK_GRAFT_GX_DOCS=30000 x
    SPARK_GRAFT_GX_REPLICAS=4 by default, ~10M edges) because SCC runs
    to a FIXPOINT per level per run rather than a fixed superstep
    count. PPR seeds = the ~1% of nodes with xxhash64(node) % 100 == 0
    (deterministic, in-graph). Both levels read the same Parquet bytes
    with the same partitioning; only task slots differ."""
    import statistics
    from knext_spark.session import get_spark
    from knext_spark.graph import pagerank, strongly_connected_components

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    if os.environ.get("SPARK_GRAFT_GX_LEVELS"):
        levels = tuple(
            int(x) for x in os.environ["SPARK_GRAFT_GX_LEVELS"].split(",")
        )
    n_docs = int(os.environ.get("SPARK_GRAFT_GX_DOCS", "30000"))
    replicas = int(os.environ.get("SPARK_GRAFT_GX_REPLICAS", "4"))
    runs = int(os.environ.get("SPARK_GRAFT_GX_RUNS", "2"))
    steps = int(os.environ.get("SPARK_GRAFT_GX_STEPS", "12"))
    n_part = int(os.environ.get("SPARK_GRAFT_SCALE_PARTITIONS", "64"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "56g")
    shm = "/dev/shm/spark-scale-tmp"
    os.makedirs(shm, exist_ok=True)
    conf = {
        "spark.sql.adaptive.enabled": "false",
        "spark.local.dir": shm,
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "24g",
        "spark.buffer.pageSize": "8m",
    }

    edge_dir = tempfile.mkdtemp(prefix="bench_gx_edges_")
    spark = get_spark(
        "bench_gx_gen", master="local[32]",
        shuffle_partitions=n_part, extra_conf=conf,
    )
    base = _build_kgml_edges(spark, sf, n_docs=n_docs, scale=3.0, mixed=True)
    rep = base.crossJoin(spark.range(replicas).select(F.col("id").alias("rep")))
    (
        rep.select(
            F.xxhash64("src", "rep").alias("src"),
            F.xxhash64("dst", "rep").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
        .repartition(n_part)
        .write.mode("overwrite")
        .parquet(edge_dir)
    )
    spark.stop()

    out = {}
    for cpus in levels:
        spark = get_spark(
            f"bench_gx_{cpus}", master=f"local[{cpus}]",
            shuffle_partitions=n_part, extra_conf=conf,
        )
        edges = spark.read.parquet(edge_dir).persist()
        n_edges = edges.count()
        pers = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
            .where(F.pmod(F.xxhash64("node"), F.lit(100)) == 0)
            .select("node", F.lit(1.0).alias("p"))
        )

        scc_walls, scc_rounds, n_scc = [], None, None
        for _ in range(runs):
            t0 = time.time()
            res = strongly_connected_components(
                spark, edges,
                checkpoint_dir=tempfile.mkdtemp(prefix="bench_scc_"),
                run_id="gx", num_partitions=n_part,
            )
            n_scc = res.state.select("scc").distinct().count()
            scc_walls.append(time.time() - t0)
            scc_rounds = res.iterations

        variants = {}
        for name, p in (("pagerank", None), ("ppr", pers)):
            medians, all_walls = [], []
            for _ in range(runs):
                walls = _steady_superstep_walls(
                    spark, edges, steps, n_part, personalization=p
                )
                medians.append(statistics.median(walls[len(walls) // 2:]))
                all_walls.append([round(w, 2) for w in walls])
            sps = 1.0 / min(medians)
            variants[name] = {
                "sec_per_superstep": round(min(medians), 3),
                "edges_per_sec": round(sps * n_edges, 1),
                "per_superstep_walls": all_walls,
            }

        scc_wall = min(scc_walls)
        out[f"local[{cpus}]"] = {
            "n_edges": n_edges,
            "scc": {
                "wall_s": round(scc_wall, 2),
                "edges_per_sec": round(n_edges / scc_wall, 1),
                "outer_rounds": scc_rounds,
                "n_components": n_scc,
                "walls": [round(w, 2) for w in scc_walls],
            },
            **variants,
        }
        edges.unpersist()
        spark.stop()

    pairs = {}
    for lo, hi in zip(levels, levels[1:]):
        for algo in ("scc", "pagerank", "ppr"):
            pairs[f"{algo}:{lo}->{hi}"] = round(
                out[f"local[{hi}]"][algo]["edges_per_sec"]
                / out[f"local[{lo}]"][algo]["edges_per_sec"]
                / (hi / lo),
                4,
            )
    ppr_vs_pr = round(
        out[f"local[{levels[-1]}]"]["pagerank"]["sec_per_superstep"]
        / out[f"local[{levels[-1]}]"]["ppr"]["sec_per_superstep"],
        3,
    )
    return {
        "metric": "graph_extra_scaling_efficiency",
        "value": pairs[f"scc:{levels[0]}->{levels[1]}"],
        "unit": "ratio",
        "efficiency_pairs": pairs,
        "ppr_vs_pagerank_superstep_ratio": ppr_vs_pr,
        "levels": out,
        "n_docs": n_docs,
        "replicas": replicas,
        "supersteps_per_run": steps,
        "runs_per_level": runs,
        "sf": sf,
    }


def run_skew(sf_dir: str) -> dict:
    """Hub-skew evidence for CC/LPA at the scaling-bench edge scale.

    Claim under test: the per-key aggregates inside each superstep —
    min for the star contractions, count for LPA's label frequencies —
    are map-side combinable, so a hot key reduces to one row per
    upstream partition before the exchange and superstep wall time is
    insensitive to a hub vertex. The per-superstep join against the
    hot key's rows is the residual skew (one task carries the hub's
    fan-out); salting is the documented escalation if it dominates.

    Protocol: the same input twice — the uniform 118.9M-edge corpus,
    and the identical corpus plus ONE hub vertex with
    $SPARK_GRAFT_SKEW_HUB (default 4,000,000) extra distinct
    neighbors folded in (both written to Parquet; both variants read
    stable bytes). Same session, AQE off, tmpfs shuffle dirs — the
    --scaling protocol. LPA runs a fixed $SPARK_GRAFT_SKEW_STEPS
    supersteps (state shape is constant per step, so the back-half
    median is the steady-state s/step); CC contracts its state each
    round, so it runs a fixed number of rounds and reports per-round
    walls (compare round k to round k — contraction makes a single
    median meaningless). Headline value: hub/uniform ratio of the LPA
    steady s/step (1.0 = skew fully absorbed)."""
    import statistics

    from knext_spark.graph import connected_components, label_propagation
    from knext_spark.session import get_spark

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "100000"))
    replicas = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "14"))
    hub_deg = int(os.environ.get("SPARK_GRAFT_SKEW_HUB", "4000000"))
    steps = int(os.environ.get("SPARK_GRAFT_SKEW_STEPS", "5"))
    n_part = int(os.environ.get("SPARK_GRAFT_SCALE_PARTITIONS", "64"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "56g")
    shm = "/dev/shm/spark-scale-tmp"
    os.makedirs(shm, exist_ok=True)
    # default: fixed-plan protocol (AQE off, the --scaling convention).
    # SPARK_GRAFT_SKEW_AQE=1 flips AQE + skew-join splitting on to
    # measure production-mode adaptive absorption of the same hub
    # (forceOptimize needed: the star/label joins are shuffle_hash-
    # hinted and AQE otherwise declines to split to avoid extra
    # shuffles). Results in BENCH.md §5.
    aqe = os.environ.get("SPARK_GRAFT_SKEW_AQE", "0") == "1"
    conf = {
        "spark.sql.adaptive.enabled": "true" if aqe else "false",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.local.dir": shm,
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "24g",
        "spark.buffer.pageSize": "8m",
    }

    uniform_dir = _ensure_scale_edges(sf, n_docs, replicas, n_part, conf)
    spark = get_spark(
        "bench_skew", master=f"local[{cpus}]",
        shuffle_partitions=n_part, extra_conf=conf,
    )
    hub_dir = tempfile.mkdtemp(prefix="bench_skew_edges_")
    base = spark.read.parquet(uniform_dir)
    # the hub links to EXISTING nodes: the two inputs then differ only
    # in the one hot key (+hub_deg edges on it), so the comparison
    # isolates join skew. (The round-4 first cut synthesized NEW
    # neighbor ids — that inflated the node set ~48% and measured
    # state-growth, not skew; see BENCH.md §5.)
    hub_edges = (
        base.select(F.col("src").alias("n"))
        .unionByName(base.select(F.col("dst").alias("n")))
        .distinct()
        .where(F.col("n") != -1)
        .orderBy("n")
        .limit(hub_deg)
        .select(
            F.col("n").alias("src"),
            F.lit(-1).cast("long").alias("dst"),  # the hub
            F.lit(1.0).alias("weight"),
        )
    )
    base.unionByName(hub_edges).repartition(n_part).write.mode(
        "overwrite"
    ).parquet(hub_dir)

    _cc_hub_cache: dict[str, str] = {}

    def cc_hub_dir() -> str:
        """Component-PRESERVING hub input for the CC probe (built on
        demand — needs one converged CC run over the uniform corpus,
        cached next to it).

        The merging hub above is the right probe for LPA (labels flow
        through it without changing the state size), but it's the
        WRONG one for CC: linking one vertex to everything collapses
        the components, so the hub run contracts a different graph
        every round and round-k walls compare apples to oranges
        (BENCH.md §5 punted on CC for exactly this reason). Here the
        hub is the largest component's REPRESENTATIVE (its min node
        id — already the star contraction's natural fan-in key), and
        its extra edges go to members of ITS OWN component, so the
        final labeling — and every round's component structure — is
        unchanged; the two inputs differ only in the hot key's row
        count. Distinct neighbors are capped by the component size;
        the remaining rows REPLICATE members, which is faithful for
        this probe: the star joins and min-aggs are row-driven (min
        over a duplicate neighbor is idempotent), so shuffle and join
        skew on the hot key depend on the hub's ROW count, not its
        distinct-neighbor count."""
        if "dir" in _cc_hub_cache:
            return _cc_hub_cache["dir"]
        cc_dir = uniform_dir.rstrip("/") + "_cc_labels"
        if not os.path.exists(os.path.join(cc_dir, "_SUCCESS")):
            res = connected_components(
                spark, spark.read.parquet(uniform_dir),
                checkpoint_dir=tempfile.mkdtemp(prefix="bench_skew_ccref_"),
                cadence=1000, max_iter=50,
            )
            res.state.write.mode("overwrite").parquet(cc_dir)
        labels = spark.read.parquet(cc_dir)
        top = (
            labels.groupBy("component").count()
            .orderBy(F.desc("count"), F.asc("component")).first()
        )
        rep, comp_size = int(top["component"]), int(top["count"])
        members = (
            labels.where(
                (F.col("component") == rep) & (F.col("node") != rep)
            ).select(F.col("node").alias("src"))
        )
        copies = max(1, -(-hub_deg // max(1, comp_size - 1)))
        boost = (
            members.crossJoin(
                spark.range(copies).select(F.col("id").alias("__c"))
            )
            .limit(hub_deg)
            .select(
                "src",
                F.lit(rep).cast("long").alias("dst"),
                F.lit(1.0).alias("weight"),
            )
        )
        d = tempfile.mkdtemp(prefix="bench_skew_cchub_")
        spark.read.parquet(uniform_dir).unionByName(boost).repartition(
            n_part
        ).write.mode("overwrite").parquet(d)
        _cc_hub_cache["dir"] = d
        _cc_hub_cache["meta"] = {  # type: ignore[assignment]
            "hub_node": rep, "component_size": comp_size,
            "distinct_neighbors": min(hub_deg, comp_size - 1),
            "edge_copies": copies,
        }
        return d

    def one_variant(d: str, salt_k=1, hot_threshold=None) -> dict:
        edges = spark.read.parquet(d).persist()
        n_edges = edges.count()
        lpa = label_propagation(
            spark, edges, max_iter=steps, cadence=1000,
            checkpoint_dir=tempfile.mkdtemp(prefix="bench_skew_lpa_"),
            salt_k=salt_k, hot_threshold=hot_threshold,
        )
        lpa_walls = [
            round(float(m["wall_s"]), 2)
            for m in lpa.metrics
            if m.get("iteration", 0) >= 1 and "wall_s" in m
        ]
        cc = connected_components(
            spark, edges, max_iter=steps, cadence=1000,
            checkpoint_dir=tempfile.mkdtemp(prefix="bench_skew_cc_"),
            salt_k=salt_k,
        )
        cc_walls = [
            round(float(m["wall_s"]), 2)
            for m in cc.metrics
            if m.get("iteration", 0) >= 1 and "wall_s" in m
        ]
        edges.unpersist()
        return {
            "n_edges": n_edges,
            "lpa_s_per_step": round(
                statistics.median(lpa_walls[len(lpa_walls) // 2:]), 3
            ),
            "lpa_per_superstep_walls": lpa_walls,
            "cc_per_round_walls": cc_walls,
            "cc_total_s": round(sum(cc_walls), 2),
            "cc_rounds": cc.iterations,
            "cc_converged": cc.converged,
        }

    salt = os.environ.get("SPARK_GRAFT_SKEW_SALT", "auto")
    salt = salt if salt == "auto" else int(salt)
    # uniform = baseline; hub = unmitigated; hub_hot = LPA hot-key
    # broadcast split (hot_threshold='auto'); hub_salted = per-superstep
    # salting (measured strictly worse than unmitigated — BENCH.md §5)
    runners = {
        "uniform": lambda: one_variant(uniform_dir),
        "hub": lambda: one_variant(hub_dir),
        "hub_hot": lambda: one_variant(hub_dir, hot_threshold="auto"),
        "hub_salted": lambda: one_variant(hub_dir, salt_k=salt),
        # component-preserving variants — the CC-comparable probe
        "hub_cc": lambda: one_variant(cc_hub_dir()),
        "hub_cc_salted": lambda: one_variant(cc_hub_dir(), salt_k=salt),
    }
    which = [
        w.strip()
        for w in os.environ.get(
            "SPARK_GRAFT_SKEW_VARIANTS", "uniform,hub,hub_hot,hub_salted"
        ).split(",")
    ]
    unknown = [w for w in which if w and w not in runners]
    if unknown:
        print(f"skew: ignoring unknown variant(s) {unknown}; "
              f"valid: {sorted(runners)}")
    which = [w for w in which if w in runners]
    out = {name: runners[name]() for name in which}
    spark.stop()
    # ratios need the uniform baseline; a hub-only selection (e.g. to
    # re-measure one mitigation) still returns its absolute walls
    base = out.get("uniform", {}).get("lpa_s_per_step")
    # the hub variants carry hub_degree MORE edges; divide out each
    # variant's OWN volume delta so the ratios isolate the skew effect
    uni_edges = out.get("uniform", {}).get("n_edges", 1)

    def _vol(k: str) -> float:
        return out[k]["n_edges"] / uni_edges

    ratios = {
        f"lpa_{k}_ratio": round(
            out[k]["lpa_s_per_step"] / base / _vol(k), 3
        )
        for k in out
        if k != "uniform" and base
    }
    vol = _vol(next((k for k in out if k != "uniform"), "uniform"))
    # CC ratios only for the component-preserving variants: those
    # contract the SAME graph every round as uniform, so the summed
    # walls over the shared round prefix compare like to like
    uni_cc = out.get("uniform", {}).get("cc_per_round_walls")
    for k in out:
        if k.startswith("hub_cc") and uni_cc:
            h = out[k]["cc_per_round_walls"]
            nr = min(len(uni_cc), len(h))
            ratios[f"cc_{k}_ratio"] = round(
                sum(h[:nr]) / sum(uni_cc[:nr]) / _vol(k), 3
            )
    cc_hub_meta = _cc_hub_cache.get("meta")
    headline = (
        "lpa_hub_hot_ratio" if "hub_hot" in out
        else next(iter(ratios), "lpa_uniform_ratio")
    )
    return {
        "metric": f"skew_overhead_{headline}",
        "value": ratios.get(headline, 1.0),
        "unit": "ratio",
        **ratios,
        "edge_volume_ratio": round(vol, 4),
        **({"cc_hub": cc_hub_meta} if cc_hub_meta else {}),
        "aqe": aqe,
        "salt_k": salt,
        "hub_degree": hub_deg,
        "supersteps": steps,
        "cpus": cpus,
        "variants": out,
    }


def run_recall(sf_dir: str) -> dict:
    """Recall@k curves for the two ANN families vs brute-force truth.

    The tests prove DIRECTION (recall monotone in probes / nprobe,
    nprobe=K exact); this mode measures the NUMBERS a user needs to
    choose a family and a probe budget: recall@k and wall seconds for
    - LSH: probes 0,1,2,4,8 x probe_rank {fixed, distance}
    - IVF: nprobe 1,2,4,8,K (K = n_centroids)
    on the $SPARK_GRAFT_SF_DIR embeddings table (sf0.1 = 2,000
    vectors of dim 64 — small enough that exact cosine_topk is an
    affordable ground truth, which is the whole point of measuring
    recall here rather than at 100 TB where no truth exists).

    recall@k = |ANN(q) ∩ TRUTH(q)| / k averaged over queries, with
    TRUTH = exact top-k (ties broken by neighbor id in BOTH engines,
    so the intersection is well-defined). Wall is the median of
    SPARK_GRAFT_BENCH_RUNS noop-writes of the ANN result (same
    protocol as the suite).

    Knobs: SPARK_GRAFT_RECALL_K (default 10), SPARK_GRAFT_RECALL_PLANES
    (default 6: 64 buckets over 2,000 vectors ≈ 31/bucket — mid-range
    selectivity so the curve spans a useful band), SPARK_GRAFT_RECALL_
    CENTROIDS (default 16)."""
    import statistics

    from knext_spark.pipeline.similarity import (
        cosine_topk, ivf_ann_topk, lsh_ann_topk,
    )
    from knext_spark.session import get_spark

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    k = int(os.environ.get("SPARK_GRAFT_RECALL_K", "10"))
    planes = int(os.environ.get("SPARK_GRAFT_RECALL_PLANES", "6"))
    n_cent = int(os.environ.get("SPARK_GRAFT_RECALL_CENTROIDS", "16"))
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_spark(
        "bench_recall", master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
    )
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).persist()
    n = emb.count()
    truth = cosine_topk(emb, k=k).select("vec_id", "neighbor_id").persist()
    n_truth = truth.count()

    def measure(name: str, fn) -> dict:
        walls = []
        for _ in range(runs):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        matched = (
            fn().select("vec_id", "neighbor_id")
            .join(truth, ["vec_id", "neighbor_id"]).count()
        )
        return {
            "recall": round(matched / n_truth, 4),
            "wall_s": round(statistics.median(walls), 3),
            "walls": walls,
        }

    curves: dict[str, dict] = {"lsh_fixed": {}, "lsh_ranked": {}, "ivf": {}}
    for probes in (0, 1, 2, 4, 8):
        curves["lsh_fixed"][f"probes={probes}"] = measure(
            f"lsh p{probes} fixed",
            lambda p=probes: lsh_ann_topk(
                emb, k=k, planes=planes, probes=p, probe_rank="fixed",
                max_bucket=None,
            ),
        )
        if probes > 0:  # ranked == fixed at probes=0 by construction
            curves["lsh_ranked"][f"probes={probes}"] = measure(
                f"lsh p{probes} ranked",
                lambda p=probes: lsh_ann_topk(
                    emb, k=k, planes=planes, probes=p, probe_rank="distance",
                    max_bucket=None,
                ),
            )
    for nprobe in (1, 2, 4, 8, n_cent):
        curves["ivf"][f"nprobe={nprobe}"] = measure(
            f"ivf np{nprobe}",
            lambda np_=nprobe: ivf_ann_topk(
                emb, k=k, n_centroids=n_cent, nprobe=np_,
            ),
        )
    truth.unpersist()
    emb.unpersist()
    spark.stop()
    best = max(
        (v["recall"] for fam in curves.values() for v in fam.values()),
    )
    return {
        "metric": "ann_recall_at_k",
        "value": best,
        "unit": "recall",
        "k": k,
        "n_vectors": n,
        "lsh_planes": planes,
        "ivf_centroids": n_cent,
        "runs_per_point": runs,
        "curves": curves,
        "sf": sf,
        "cpus": cpus,
    }


def run_linkpred(sf_dir: str, levels=(2, 8)) -> dict:
    """Two-level scaling evidence for the round-5 one-shot graph
    operators: local clustering coefficient (degree-oriented triangle
    reuse), neighbor-Jaccard link prediction (apex wedge join under
    the max_apex_degree hub governor — the KGML gene graph is
    hub-skewed, so an UNgoverned wedge join is exactly the quadratic
    blow-up the governor exists to prevent; the governed run is the
    production configuration being measured), and multi-source BFS
    distances from a deterministic ~1% seed set (full job including
    the superstep runner's per-round Parquet commits).

    Protocol mirrors --graph-extra: one KGML-parse -> xxhash64-encode
    edge table written once to shared Parquet; each level reads the
    same bytes with the same partitioning, full-job wall (count
    action) per operator, min over SPARK_GRAFT_LP_RUNS runs,
    edges/sec + per-pair scaling efficiency."""
    from knext_spark.session import get_spark
    from knext_spark.graph import (
        bfs_distances,
        clustering_coefficient,
        neighbor_jaccard,
    )

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    if os.environ.get("SPARK_GRAFT_LP_LEVELS"):
        levels = tuple(
            int(x) for x in os.environ["SPARK_GRAFT_LP_LEVELS"].split(",")
        )
    n_docs = int(os.environ.get("SPARK_GRAFT_LP_DOCS", "20000"))
    runs = int(os.environ.get("SPARK_GRAFT_LP_RUNS", "2"))
    apex_cap = int(os.environ.get("SPARK_GRAFT_LP_APEX_CAP", "128"))
    min_common = int(os.environ.get("SPARK_GRAFT_LP_MIN_COMMON", "2"))
    n_part = int(os.environ.get("SPARK_GRAFT_SCALE_PARTITIONS", "64"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "56g")
    shm = "/dev/shm/spark-scale-tmp"
    os.makedirs(shm, exist_ok=True)
    conf = {
        "spark.sql.adaptive.enabled": "false",
        "spark.local.dir": shm,
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "24g",
        "spark.buffer.pageSize": "8m",
    }

    edge_dir = tempfile.mkdtemp(prefix="bench_lp_edges_")
    spark = get_spark(
        "bench_lp_gen", master="local[32]",
        shuffle_partitions=n_part, extra_conf=conf,
    )
    base = _build_kgml_edges(spark, sf, n_docs=n_docs, scale=3.0, mixed=True)
    (
        base.select(
            F.xxhash64("src").alias("src"), F.xxhash64("dst").alias("dst")
        )
        .repartition(n_part)
        .write.mode("overwrite")
        .parquet(edge_dir)
    )
    spark.stop()

    out = {}
    for cpus in levels:
        spark = get_spark(
            f"bench_lp_{cpus}", master=f"local[{cpus}]",
            shuffle_partitions=n_part, extra_conf=conf,
        )
        edges = spark.read.parquet(edge_dir).persist()
        n_edges = edges.count()
        level = {"n_edges": n_edges}
        seeds = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
            .where(F.pmod(F.xxhash64("node"), F.lit(100)) == 0)
        )
        for name, fn in (
            ("clustering", lambda: clustering_coefficient(edges)),
            (
                "jaccard",
                lambda: neighbor_jaccard(
                    edges, min_common=min_common, max_apex_degree=apex_cap
                ),
            ),
            # ~1% deterministic in-graph seed set, like --graph-extra's
            # PPR seeds; full job incl. the per-round commits
            ("bfs", lambda: bfs_distances(edges, seeds, max_iter=50)),
        ):
            walls, rows = [], None
            for _ in range(runs):
                t0 = time.time()
                rows = fn().count()
                walls.append(time.time() - t0)
            w = min(walls)
            level[name] = {
                "wall_s": round(w, 2),
                "edges_per_sec": round(n_edges / w, 1),
                "out_rows": rows,
                "walls": [round(x, 2) for x in walls],
            }
        out[f"local[{cpus}]"] = level
        edges.unpersist()
        spark.stop()

    pairs = {}
    for lo, hi in zip(levels, levels[1:]):
        for algo in ("clustering", "jaccard", "bfs"):
            pairs[f"{algo}:{lo}->{hi}"] = round(
                out[f"local[{hi}]"][algo]["edges_per_sec"]
                / out[f"local[{lo}]"][algo]["edges_per_sec"]
                / (hi / lo),
                4,
            )
    return {
        "metric": "linkpred_scaling_efficiency",
        "value": pairs[f"jaccard:{levels[0]}->{levels[1]}"],
        "unit": "ratio",
        "efficiency_pairs": pairs,
        "levels": out,
        "n_docs": n_docs,
        "apex_cap": apex_cap,
        "min_common": min_common,
        "runs_per_level": runs,
        "sf": sf,
    }


def run_temporal_skew(sf_dir: str) -> dict:
    """Hot-key straggler evidence for asof_join's ``bucket_delta`` path.

    Claim under test (pipeline/temporal.py module docstring): the
    single-window plan sorts a key's whole timeline in ONE task, so a
    hot key is a straggler no partition count fixes; bucket_delta's
    two-level carry-forward splits the hot timeline across tasks at
    the cost of one small summary aggregate + join.

    Protocol (mirrors --skew): three inputs from the same generator —
    `uniform` ($SPARK_GRAFT_TSKEW_USERS users x EVENTS events, right
    side 1 state row per user per STATE_EVERY ticks), and `hot` =
    uniform + ONE user carrying $SPARK_GRAFT_TSKEW_HOT extra left rows
    and the matching extra right rows. Both written to Parquet; walls
    are medians of SPARK_GRAFT_BENCH_RUNS noop-writes. Variants:
    single-window on uniform (baseline), single-window on hot
    (unmitigated straggler), bucketed on hot (mitigated), bucketed on
    uniform (overhead of the extra aggregate when there IS no skew).
    Ratios are volume-adjusted (hot input has more rows). The
    bucketed plan's row-identity to the single-window plan is gated
    separately by tests/test_pipeline_ops.py."""
    import statistics

    from knext_spark.pipeline.temporal import asof_join
    from knext_spark.session import get_spark

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_users = int(os.environ.get("SPARK_GRAFT_TSKEW_USERS", "100000"))
    events = int(os.environ.get("SPARK_GRAFT_TSKEW_EVENTS", "200"))
    hot_events = int(os.environ.get("SPARK_GRAFT_TSKEW_HOT", "20000000"))
    state_every = int(os.environ.get("SPARK_GRAFT_TSKEW_STATE_EVERY", "10"))
    delta = int(os.environ.get("SPARK_GRAFT_TSKEW_DELTA", str(hot_events // 256)))
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    n_part = int(os.environ.get("SPARK_GRAFT_SCALE_PARTITIONS", "64"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "56g")
    shm = "/dev/shm/spark-scale-tmp"
    os.makedirs(shm, exist_ok=True)
    conf = {
        "spark.sql.adaptive.enabled": "false",
        "spark.local.dir": shm,
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "24g",
        "spark.buffer.pageSize": "8m",
    }
    spark = get_spark(
        "bench_tskew", master=f"local[{cpus}]",
        shuffle_partitions=n_part, extra_conf=conf,
    )

    def gen(hot: bool) -> tuple[str, str]:
        # left: (user_id, t, v); timestamps are integer ticks unique
        # per user; right: one (user_id, t, state) row per STATE_EVERY
        # ticks. Deterministic (spark.range arithmetic, no RNG).
        base = spark.range(n_users * events).select(
            (F.col("id") % n_users).alias("user_id"),
            (F.col("id") / n_users).cast("long").alias("t"),
            F.col("id").alias("v"),
        )
        parts = [base]
        if hot:
            parts.append(
                spark.range(hot_events).select(
                    F.lit(-1).cast("long").alias("user_id"),
                    F.col("id").alias("t"),
                    (F.col("id") + 7).alias("v"),
                )
            )
        left = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        right = left.where(F.pmod(F.col("t"), F.lit(state_every)) == 0).select(
            "user_id", F.col("t").alias("rt"), (F.col("v") * 2).alias("state")
        )
        tag = "hot" if hot else "uniform"
        ldir = os.path.join(shm, f"tskew_left_{tag}")
        rdir = os.path.join(shm, f"tskew_right_{tag}")
        left.repartition(n_part).write.mode("overwrite").parquet(ldir)
        right.repartition(n_part).write.mode("overwrite").parquet(rdir)
        return ldir, rdir

    inputs = {"uniform": gen(False), "hot": gen(True)}

    def one(tag: str, bucket_delta: int | None) -> dict:
        ldir, rdir = inputs[tag]
        left = spark.read.parquet(ldir)
        right = spark.read.parquet(rdir)
        walls = []
        for _ in range(runs):
            t0 = time.time()
            asof_join(
                left, right, key="user_id", left_ts="t", right_ts="rt",
                payload="state", bucket_delta=bucket_delta,
            ).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        return {
            "n_left": left.count(),
            "wall_s": round(statistics.median(walls), 3),
            "walls": walls,
        }

    out = {
        "uniform_window": one("uniform", None),
        "uniform_bucketed": one("uniform", delta),
        "hot_window": one("hot", None),
        "hot_bucketed": one("hot", delta),
    }
    spark.stop()
    vol = out["hot_window"]["n_left"] / out["uniform_window"]["n_left"]
    base = out["uniform_window"]["wall_s"]
    ratios = {
        "hot_window_ratio": round(out["hot_window"]["wall_s"] / base / vol, 3),
        "hot_bucketed_ratio": round(
            out["hot_bucketed"]["wall_s"] / base / vol, 3
        ),
        "uniform_bucketed_overhead": round(
            out["uniform_bucketed"]["wall_s"] / base, 3
        ),
    }
    return {
        "metric": "asof_join_skew_overhead",
        "value": ratios["hot_bucketed_ratio"],
        "unit": "ratio",
        **ratios,
        "edge_volume_ratio": round(vol, 4),
        "bucket_delta": delta,
        "hot_events": hot_events,
        "uniform_rows": n_users * events,
        "runs_per_point": runs,
        "cpus": cpus,
        "sf": sf,
        "variants": out,
    }


def run_newops(sf_dir: str, levels=(2, 8)) -> dict:
    """Two-level scaling evidence for the round-5 additions:

    - graph: sampled Brandes betweenness (forward σ counting +
      backward δ accumulation, both superstep phases incl. per-round
      Parquet commits) over the KGML-derived encoded edge table with a
      deterministic ~0.1% seed sample, and the per-community Newman
      modularity breakdown for a 64-way deterministic labeling;
    - corpus: repetition_ratio, contamination (doc_id%97 stand-in
      suite, broadcast probe) and pack_sequences over a k-fold
      replicated documents table (replication makes the corpus side
      big enough that job overhead is not the measurement).

    Protocol mirrors --linkpred: inputs written once to shared
    Parquet, each level reads the same bytes, full-job wall (count
    action), min over SPARK_GRAFT_NO_RUNS runs, rows-or-edges/sec +
    per-pair scaling efficiency."""
    from knext_spark.session import get_spark
    from knext_spark.graph import betweenness_sampled, community_contributions
    from knext_spark.pipeline import (
        contamination,
        pack_sequences,
        repetition_ratio,
    )

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    if os.environ.get("SPARK_GRAFT_NO_LEVELS"):
        levels = tuple(
            int(x) for x in os.environ["SPARK_GRAFT_NO_LEVELS"].split(",")
        )
    n_docs = int(os.environ.get("SPARK_GRAFT_NO_DOCS", "20000"))
    runs = int(os.environ.get("SPARK_GRAFT_NO_RUNS", "2"))
    doc_reps = int(os.environ.get("SPARK_GRAFT_NO_DOC_REPS", "100"))
    # betweenness is O(k·E) per PASS: the seed sample size trades
    # bench wall for per-superstep data volume — too few seeds and the
    # ~2·diameter supersteps are all fixed overhead (which is what a
    # 2->8 ratio then measures); 1/2000 keeps each superstep
    # data-dominated at this corpus size
    seed_mod = int(os.environ.get("SPARK_GRAFT_NO_SEED_MOD", "2000"))
    n_part = int(os.environ.get("SPARK_GRAFT_SCALE_PARTITIONS", "64"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "56g")
    shm = "/dev/shm/spark-scale-tmp"
    os.makedirs(shm, exist_ok=True)
    conf = {
        "spark.sql.adaptive.enabled": "false",
        "spark.local.dir": shm,
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "24g",
        "spark.buffer.pageSize": "8m",
    }

    edge_dir = tempfile.mkdtemp(prefix="bench_no_edges_")
    docs_dir = tempfile.mkdtemp(prefix="bench_no_docs_")
    spark = get_spark(
        "bench_no_gen", master="local[32]",
        shuffle_partitions=n_part, extra_conf=conf,
    )
    base = _build_kgml_edges(spark, sf, n_docs=n_docs, scale=3.0, mixed=True)
    (
        base.select(
            F.xxhash64("src").alias("src"), F.xxhash64("dst").alias("dst")
        )
        .repartition(n_part)
        .write.mode("overwrite")
        .parquet(edge_dir)
    )
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    (
        docs0.select(
            F.explode(F.sequence(F.lit(0), F.lit(doc_reps - 1))).alias("rep"),
            "doc_id",
            "text",
        )
        .select(
            (F.col("doc_id") * doc_reps + F.col("rep")).alias("doc_id"), "text"
        )
        .repartition(n_part)
        .write.mode("overwrite")
        .parquet(docs_dir)
    )
    spark.stop()

    out = {}
    for cpus in levels:
        spark = get_spark(
            f"bench_no_{cpus}", master=f"local[{cpus}]",
            shuffle_partitions=n_part, extra_conf=conf,
        )
        edges = spark.read.parquet(edge_dir).persist()
        n_edges = edges.count()
        docs = spark.read.parquet(docs_dir).persist()
        n_rows = docs.count()
        level = {"n_edges": n_edges, "n_docs": n_rows}
        nodes = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
        seeds = nodes.where(
            F.pmod(F.xxhash64("node"), F.lit(seed_mod)) == 0
        )
        labels = nodes.select(
            "node", F.pmod(F.xxhash64("node"), F.lit(64)).alias("label")
        )
        bench_docs = docs.where(F.col("doc_id") % 97 == 0)
        for name, denom, fn in (
            (
                "betweenness",
                n_edges,
                lambda: betweenness_sampled(spark, edges, seeds, max_iter=50),
            ),
            (
                "modularity",
                n_edges,
                lambda: community_contributions(edges, labels),
            ),
            ("repetition", n_rows, lambda: repetition_ratio(docs, w=3)),
            (
                "contamination",
                n_rows,
                lambda: contamination(docs, bench_docs, w=3),
            ),
            (
                "packing",
                n_rows,
                lambda: pack_sequences(docs, budget=2048, n_shards=256),
            ),
        ):
            walls, rows = [], None
            for _ in range(runs):
                t0 = time.time()
                df = fn()
                # noop sink: a count() on a pure projection would let
                # Catalyst prune every computed column and skip the
                # operator entirely — the write forces every row
                df.write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
                rows = df.count()
            w = min(walls)
            level[name] = {
                "wall_s": round(w, 2),
                "rows_per_sec": round(denom / w, 1),
                "out_rows": rows,
                "walls": [round(x, 2) for x in walls],
            }
        out[f"local[{cpus}]"] = level
        edges.unpersist()
        docs.unpersist()
        spark.stop()

    algos = (
        "betweenness", "modularity", "repetition", "contamination", "packing"
    )
    pairs = {}
    for lo, hi in zip(levels, levels[1:]):
        for algo in algos:
            pairs[f"{algo}:{lo}->{hi}"] = round(
                out[f"local[{hi}]"][algo]["rows_per_sec"]
                / out[f"local[{lo}]"][algo]["rows_per_sec"]
                / (hi / lo),
                4,
            )
    return {
        "metric": "newops_scaling_efficiency",
        "value": pairs[f"betweenness:{levels[0]}->{levels[1]}"],
        "unit": "ratio",
        "efficiency_pairs": pairs,
        "levels": out,
        "n_docs_graph": n_docs,
        "doc_reps": doc_reps,
        "seed_mod": seed_mod,
        "runs_per_level": runs,
        "sf": sf,
    }


def run_r5ops(sf_dir: str, levels=(2, 8)) -> dict:
    """Two-level scaling evidence for the late-round-5 additions:

    - corpus: hll_distinct (approximate distinct tokens per 16-way
      group — the shuffle is capped at groups x 4096 register rows no
      matter the input) and lm_score (char-bigram model trained on a
      ~1% slice, broadcast-probed in one corpus pass) over a k-fold
      replicated documents table;
    - graph: k_truss peeling at FIXED 3 rounds (per-round triangle
      enumeration + Parquet commit — fixed rounds make the two levels
      run the identical job, like the pagerank scaling protocol) and
      pseudo_diameter (2 chained BFS sweeps) over the KGML-derived
      encoded edge table.

    Protocol mirrors --newops: inputs written once to shared Parquet,
    each level reads the same bytes, min-of-runs walls, rows-or-edges
    /sec + per-pair scaling efficiency."""
    from knext_spark.session import get_spark
    from knext_spark.graph import k_truss_run, pseudo_diameter
    from knext_spark.pipeline import hll_distinct, lm_score

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    if os.environ.get("SPARK_GRAFT_NO_LEVELS"):
        levels = tuple(
            int(x) for x in os.environ["SPARK_GRAFT_NO_LEVELS"].split(",")
        )
    n_docs = int(os.environ.get("SPARK_GRAFT_NO_DOCS", "20000"))
    runs = int(os.environ.get("SPARK_GRAFT_NO_RUNS", "2"))
    doc_reps = int(os.environ.get("SPARK_GRAFT_NO_DOC_REPS", "100"))
    truss_rounds = int(os.environ.get("SPARK_GRAFT_TRUSS_ROUNDS", "3"))
    n_part = int(os.environ.get("SPARK_GRAFT_SCALE_PARTITIONS", "64"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "56g")
    shm = "/dev/shm/spark-scale-tmp"
    os.makedirs(shm, exist_ok=True)
    conf = {
        "spark.sql.adaptive.enabled": "false",
        "spark.local.dir": shm,
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "24g",
        "spark.buffer.pageSize": "8m",
    }

    edge_dir = tempfile.mkdtemp(prefix="bench_r5_edges_")
    docs_dir = tempfile.mkdtemp(prefix="bench_r5_docs_")
    spark = get_spark(
        "bench_r5_gen", master="local[32]",
        shuffle_partitions=n_part, extra_conf=conf,
    )
    base = _build_kgml_edges(spark, sf, n_docs=n_docs, scale=3.0, mixed=True)
    (
        base.select(
            F.xxhash64("src").alias("src"), F.xxhash64("dst").alias("dst")
        )
        .repartition(n_part)
        .write.mode("overwrite")
        .parquet(edge_dir)
    )
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    (
        docs0.select(
            F.explode(F.sequence(F.lit(0), F.lit(doc_reps - 1))).alias("rep"),
            "doc_id",
            "text",
        )
        .select(
            (F.col("doc_id") * doc_reps + F.col("rep")).alias("doc_id"), "text"
        )
        .repartition(n_part)
        .write.mode("overwrite")
        .parquet(docs_dir)
    )
    spark.stop()

    out = {}
    for cpus in levels:
        spark = get_spark(
            f"bench_r5_{cpus}", master=f"local[{cpus}]",
            shuffle_partitions=n_part, extra_conf=conf,
        )
        edges = spark.read.parquet(edge_dir).persist()
        n_edges = edges.count()
        docs = spark.read.parquet(docs_dir).persist()
        n_rows = docs.count()
        level = {"n_edges": n_edges, "n_docs": n_rows}
        tok = docs.select(
            F.pmod(F.col("doc_id"), F.lit(16)).alias("grp"),
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
            ).alias("token"),
        )
        lm_ref = docs.where(F.col("doc_id") % 101 == 0)

        def _truss():
            ck = tempfile.mkdtemp(prefix="bench_truss_", dir=shm)
            res = k_truss_run(
                spark, edges, k=3, checkpoint_dir=ck, max_iter=truss_rounds
            )
            return res.state

        for name, denom, materialize, fn in (
            ("hll_distinct", n_rows, True,
             lambda: hll_distinct(tok, "token", ["grp"])),
            ("lm_score", n_rows, True, lambda: lm_score(docs, ref=lm_ref)),
            (f"k_truss_{truss_rounds}rounds", n_edges * truss_rounds, False,
             _truss),
            ("pseudo_diameter", n_edges * 2, False,
             lambda: pseudo_diameter(edges, sweeps=2, max_iter=16)),
        ):
            walls, rows = [], None
            for _ in range(runs):
                t0 = time.time()
                df = fn()
                if materialize:
                    df.write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
                rows = df.count()
            w = min(walls)
            level[name] = {
                "wall_s": round(w, 2),
                "rows_per_sec": round(denom / w, 1),
                "out_rows": rows,
                "walls": [round(x, 2) for x in walls],
            }
        out[f"local[{cpus}]"] = level
        edges.unpersist()
        docs.unpersist()
        spark.stop()

    algos = (
        "hll_distinct", "lm_score", f"k_truss_{truss_rounds}rounds",
        "pseudo_diameter",
    )
    pairs = {}
    for lo, hi in zip(levels, levels[1:]):
        for algo in algos:
            pairs[f"{algo}:{lo}->{hi}"] = round(
                out[f"local[{hi}]"][algo]["rows_per_sec"]
                / out[f"local[{lo}]"][algo]["rows_per_sec"]
                / (hi / lo),
                4,
            )
    headline = (
        pairs[f"hll_distinct:{levels[0]}->{levels[1]}"]
        if len(levels) >= 2
        else None
    )
    return {
        "metric": "r5ops_scaling_efficiency",
        "value": headline,
        "unit": "ratio",
        "efficiency_pairs": pairs,
        "levels": out,
        "n_docs_graph": n_docs,
        "doc_reps": doc_reps,
        "truss_rounds": truss_rounds,
        "runs_per_level": runs,
        "sf": sf,
    }


def run_spanops(sf_dir: str, levels=(2, 8)) -> dict:
    """Two-level scaling evidence for the final round-5 additions:

    - dup_spans over a k-fold replicated documents table. Replication
      (distinct doc_ids, identical text) makes EVERY shingle cross-doc
      duplicated, so this measures the dense-hit WORST case: full
      window scan, full-volume semi join, every position through the
      per-doc merge window — the honest upper bound on span-extraction
      cost, not a cherry-picked sparse input;
    - contaminated_spans against a small pseudo-benchmark (every 101st
      original doc), the sparse-hit production shape;
    - cms_table count-min accounting over all corpus tokens (shuffle
      capped at groups x depth x 16^w_hex rows regardless of input);
    - topological_levels Kahn peeling over the KGML-derived encoded
      edge table (round count is data-determined, hence identical at
      both levels, like the fixed-round truss protocol).

    Protocol mirrors --r5ops: inputs written once to shared Parquet,
    each level reads the same bytes, min-of-runs walls, rows-or-edges
    /sec + per-pair scaling efficiency."""
    from knext_spark.session import get_spark
    from knext_spark.graph import topological_levels_run
    from knext_spark.pipeline import cms_table, contaminated_spans, dup_spans

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    if os.environ.get("SPARK_GRAFT_NO_LEVELS"):
        levels = tuple(
            int(x) for x in os.environ["SPARK_GRAFT_NO_LEVELS"].split(",")
        )
    n_docs = int(os.environ.get("SPARK_GRAFT_NO_DOCS", "20000"))
    runs = int(os.environ.get("SPARK_GRAFT_NO_RUNS", "2"))
    doc_reps = int(os.environ.get("SPARK_GRAFT_NO_DOC_REPS", "20"))
    topo_rounds = int(os.environ.get("SPARK_GRAFT_TOPO_ROUNDS", "4"))
    n_part = int(os.environ.get("SPARK_GRAFT_SCALE_PARTITIONS", "64"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "56g")
    shm = "/dev/shm/spark-scale-tmp"
    os.makedirs(shm, exist_ok=True)
    conf = {
        "spark.sql.adaptive.enabled": "false",
        "spark.local.dir": shm,
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "24g",
        "spark.buffer.pageSize": "8m",
    }

    edge_dir = tempfile.mkdtemp(prefix="bench_span_edges_")
    docs_dir = tempfile.mkdtemp(prefix="bench_span_docs_")
    ref_dir = tempfile.mkdtemp(prefix="bench_span_ref_")
    spark = get_spark(
        "bench_span_gen", master="local[32]",
        shuffle_partitions=n_part, extra_conf=conf,
    )
    base = _build_kgml_edges(spark, sf, n_docs=n_docs, scale=3.0, mixed=True)
    (
        base.select(
            F.xxhash64("src").alias("src"), F.xxhash64("dst").alias("dst")
        )
        .repartition(n_part)
        .write.mode("overwrite")
        .parquet(edge_dir)
    )
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    (
        docs0.select(
            F.explode(F.sequence(F.lit(0), F.lit(doc_reps - 1))).alias("rep"),
            "doc_id",
            "text",
        )
        .select(
            (F.col("doc_id") * doc_reps + F.col("rep")).alias("doc_id"), "text"
        )
        .repartition(n_part)
        .write.mode("overwrite")
        .parquet(docs_dir)
    )
    docs0.where(F.col("doc_id") % 101 == 0).write.mode("overwrite").parquet(
        ref_dir
    )
    spark.stop()

    out = {}
    for cpus in levels:
        spark = get_spark(
            f"bench_span_{cpus}", master=f"local[{cpus}]",
            shuffle_partitions=n_part, extra_conf=conf,
        )
        edges = spark.read.parquet(edge_dir).persist()
        n_edges = edges.count()
        docs = spark.read.parquet(docs_dir).persist()
        n_rows = docs.count()
        ref = spark.read.parquet(ref_dir).persist()
        ref.count()
        level = {"n_edges": n_edges, "n_docs": n_rows}
        tok = docs.select(
            F.pmod(F.col("doc_id"), F.lit(16)).alias("grp"),
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
            ).alias("token"),
        )
        def _topo():
            ck = tempfile.mkdtemp(prefix="bench_topo_", dir=shm)
            return topological_levels_run(
                spark, edges, checkpoint_dir=ck, max_iter=topo_rounds
            ).state

        for name, denom, fn in (
            ("dup_spans", n_rows, lambda: dup_spans(docs, w=8)),
            ("contaminated_spans", n_rows,
             lambda: contaminated_spans(docs, ref, w=8)),
            ("cms_table", n_rows, lambda: cms_table(tok, "token", ["grp"])),
            (f"topo_levels_{topo_rounds}rounds", n_edges * topo_rounds, _topo),
        ):
            walls, rows = [], None
            for _ in range(runs):
                t0 = time.time()
                df = fn()
                df.write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
                rows = df.count()
            w = min(walls)
            level[name] = {
                "wall_s": round(w, 2),
                "rows_per_sec": round(denom / w, 1),
                "out_rows": rows,
                "walls": [round(x, 2) for x in walls],
            }
        out[f"local[{cpus}]"] = level
        edges.unpersist()
        docs.unpersist()
        ref.unpersist()
        spark.stop()

    algos = (
        "dup_spans", "contaminated_spans", "cms_table",
        f"topo_levels_{topo_rounds}rounds",
    )
    pairs = {}
    for lo, hi in zip(levels, levels[1:]):
        for algo in algos:
            pairs[f"{algo}:{lo}->{hi}"] = round(
                out[f"local[{hi}]"][algo]["rows_per_sec"]
                / out[f"local[{lo}]"][algo]["rows_per_sec"]
                / (hi / lo),
                4,
            )
    headline = (
        pairs[f"dup_spans:{levels[0]}->{levels[1]}"]
        if len(levels) >= 2
        else None
    )
    return {
        "metric": "spanops_scaling_efficiency",
        "value": headline,
        "unit": "ratio",
        "efficiency_pairs": pairs,
        "levels": out,
        "n_docs_graph": n_docs,
        "doc_reps": doc_reps,
        "topo_rounds": topo_rounds,
        "runs_per_level": runs,
        "sf": sf,
    }


def run_peelops(sf_dir: str, levels=(2, 8)) -> dict:
    """Two-level scaling evidence for the priority-peeling / sketch
    operators added late in round 5: Luby MIS, greedy coloring
    (graph/mis.py) and the HyperBall neighborhood function
    (graph/anf.py).

    Input: a deterministic degree-bounded graph over ``n`` nodes
    (ring edge i->i+1 plus one chord i->i+7919+(i%1009), so out-degree
    2 at ANY n) — bounded degree is what keeps the peel depth
    O(log n), and the round count is data-determined hence IDENTICAL
    at both parallelism levels (the fixed-round truss/topo protocol
    argument). Written once to shared Parquet; each level reads the
    same bytes; min-of-runs walls; throughput = nodes decided (MIS,
    coloring) or register-merge hops x nodes (ANF) per second, plus
    the per-pair scaling efficiency."""
    from knext_spark.session import get_spark
    from knext_spark.graph import anf_run, coloring_run, mis_run

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    if os.environ.get("SPARK_GRAFT_NO_LEVELS"):
        levels = tuple(
            int(x) for x in os.environ["SPARK_GRAFT_NO_LEVELS"].split(",")
        )
    runs = int(os.environ.get("SPARK_GRAFT_NO_RUNS", "2"))
    n_nodes = int(os.environ.get("SPARK_GRAFT_PEEL_NODES", "2000000"))
    anf_hops = int(os.environ.get("SPARK_GRAFT_ANF_HOPS", "2"))
    n_part = int(os.environ.get("SPARK_GRAFT_SCALE_PARTITIONS", "64"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "56g")
    shm = "/dev/shm/spark-scale-tmp"
    os.makedirs(shm, exist_ok=True)
    conf = {
        "spark.sql.adaptive.enabled": "false",
        "spark.local.dir": shm,
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "24g",
        "spark.buffer.pageSize": "8m",
    }

    edge_dir = tempfile.mkdtemp(prefix="bench_peel_edges_")
    spark = get_spark(
        "bench_peel_gen", master="local[32]",
        shuffle_partitions=n_part, extra_conf=conf,
    )
    ids = spark.range(n_nodes).select(F.col("id").alias("src"))
    (
        ids.select("src", ((F.col("src") + 1) % n_nodes).alias("dst"))
        .unionByName(
            ids.select(
                "src",
                (
                    (F.col("src") + 7919 + F.col("src") % 1009) % n_nodes
                ).alias("dst"),
            )
        )
        .repartition(n_part)
        .write.mode("overwrite")
        .parquet(edge_dir)
    )
    spark.stop()

    out = {}
    for cpus in levels:
        spark = get_spark(
            f"bench_peel_{cpus}", master=f"local[{cpus}]",
            shuffle_partitions=n_part, extra_conf=conf,
        )
        edges = spark.read.parquet(edge_dir).persist()
        n_edges = edges.count()
        level = {"n_nodes": n_nodes, "n_edges": n_edges}

        def _mk(algo):
            def _run():
                ck = tempfile.mkdtemp(prefix=f"bench_{algo}_", dir=shm)
                if algo == "mis":
                    r = mis_run(spark, edges, checkpoint_dir=ck)
                elif algo == "coloring":
                    r = coloring_run(spark, edges, checkpoint_dir=ck)
                else:
                    r = anf_run(
                        spark, edges, hops=anf_hops, checkpoint_dir=ck
                    )
                return r
            return _run

        which = os.environ.get("SPARK_GRAFT_PEEL_OPS", "mis,coloring,anf").split(",")
        for name, denom, fn in (
            ("mis", n_nodes, _mk("mis")),
            ("coloring", n_nodes, _mk("coloring")),
            (f"anf_{anf_hops}hops", n_nodes * anf_hops, _mk("anf")),
        ):
            if name.split("_")[0] not in which:
                continue
            walls, rows, iters = [], None, None
            for _ in range(runs):
                t0 = time.time()
                res = fn()
                res.state.write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
                rows = res.state.count()
                iters = res.iterations
            w = min(walls)
            level[name] = {
                "wall_s": round(w, 2),
                "rows_per_sec": round(denom / w, 1),
                "out_rows": rows,
                "rounds": iters,
                "walls": [round(x, 2) for x in walls],
            }
        out[f"local[{cpus}]"] = level
        edges.unpersist()
        spark.stop()

    algos = tuple(
        a for a in ("mis", "coloring", f"anf_{anf_hops}hops")
        if a in out[f"local[{levels[0]}]"]
    )
    pairs = {}
    for lo, hi in zip(levels, levels[1:]):
        for algo in algos:
            pairs[f"{algo}:{lo}->{hi}"] = round(
                out[f"local[{hi}]"][algo]["rows_per_sec"]
                / out[f"local[{lo}]"][algo]["rows_per_sec"]
                / (hi / lo),
                4,
            )
    head_key = f"{algos[-1]}:{levels[0]}->{levels[1]}"
    headline = pairs.get(head_key) if len(levels) >= 2 else None
    return {
        "metric": "peelops_scaling_efficiency",
        "value": headline,
        "unit": "ratio",
        "efficiency_pairs": pairs,
        "levels": out,
        "n_nodes": n_nodes,
        "anf_hops": anf_hops,
        "runs_per_level": runs,
        "sf": sf,
    }


def run_bpeops(sf_dir: str, levels=(2, 8)) -> dict:
    """Two-level scaling evidence for BPE merge learning.

    The operator's scale story is structural: after the one corpus
    pass (tokenize -> groupBy word), every merge round runs over
    VOCABULARY-bounded state, so round cost is independent of corpus
    size — replicating the corpus 100× (500k docs) changes only the
    counts, not the per-round work. The measured job is therefore
    corpus-pass-dominated exactly as it would be at 100 TB, and the
    efficiency number reflects the part that actually grows with
    data. Protocol mirrors --spanops (shared Parquet input, min of 2
    runs per level)."""
    from knext_spark.session import get_spark
    from knext_spark.pipeline import bpe_merges

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    if os.environ.get("SPARK_GRAFT_NO_LEVELS"):
        levels = tuple(
            int(x) for x in os.environ["SPARK_GRAFT_NO_LEVELS"].split(",")
        )
    runs = int(os.environ.get("SPARK_GRAFT_NO_RUNS", "2"))
    doc_reps = int(os.environ.get("SPARK_GRAFT_NO_DOC_REPS", "100"))
    bpe_k = int(os.environ.get("SPARK_GRAFT_BPE_K", "4"))
    n_part = int(os.environ.get("SPARK_GRAFT_SCALE_PARTITIONS", "64"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "56g")
    shm = "/dev/shm/spark-scale-tmp"
    os.makedirs(shm, exist_ok=True)
    conf = {
        "spark.sql.adaptive.enabled": "false",
        "spark.local.dir": shm,
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "24g",
        "spark.buffer.pageSize": "8m",
    }

    docs_dir = tempfile.mkdtemp(prefix="bench_bpe_docs_")
    spark = get_spark(
        "bench_bpe_gen", master="local[32]",
        shuffle_partitions=n_part, extra_conf=conf,
    )
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    (
        docs0.select(
            F.explode(F.sequence(F.lit(0), F.lit(doc_reps - 1))).alias("rep"),
            "doc_id",
            "text",
        )
        .select(
            (F.col("doc_id") * doc_reps + F.col("rep")).alias("doc_id"), "text"
        )
        .repartition(n_part)
        .write.mode("overwrite")
        .parquet(docs_dir)
    )
    spark.stop()

    out = {}
    for cpus in levels:
        spark = get_spark(
            f"bench_bpe_{cpus}", master=f"local[{cpus}]",
            shuffle_partitions=n_part, extra_conf=conf,
        )
        docs = spark.read.parquet(docs_dir).persist()
        n_rows = docs.count()
        walls, rows = [], None
        for _ in range(runs):
            t0 = time.time()
            m = bpe_merges(docs, k=bpe_k)
            rows = m.count()
            walls.append(time.time() - t0)
        w = min(walls)
        out[f"local[{cpus}]"] = {
            "n_docs": n_rows,
            f"bpe_merges_k{bpe_k}": {
                "wall_s": round(w, 2),
                "rows_per_sec": round(n_rows / w, 1),
                "out_rows": rows,
                "walls": [round(x, 2) for x in walls],
            },
        }
        docs.unpersist()
        spark.stop()

    pairs = {}
    for lo, hi in zip(levels, levels[1:]):
        pairs[f"bpe_merges_k{bpe_k}:{lo}->{hi}"] = round(
            out[f"local[{hi}]"][f"bpe_merges_k{bpe_k}"]["rows_per_sec"]
            / out[f"local[{lo}]"][f"bpe_merges_k{bpe_k}"]["rows_per_sec"]
            / (hi / lo),
            4,
        )
    headline = (
        pairs[f"bpe_merges_k{bpe_k}:{levels[0]}->{levels[1]}"]
        if len(levels) >= 2
        else None
    )
    return {
        "metric": "bpeops_scaling_efficiency",
        "value": headline,
        "unit": "ratio",
        "efficiency_pairs": pairs,
        "levels": out,
        "doc_reps": doc_reps,
        "bpe_k": bpe_k,
        "runs_per_level": runs,
        "sf": sf,
    }


def run_refcmp(n_docs: int | None = None) -> dict:
    """Head-to-head: reference parser (single-threaded pandas/NetworkX,
    run in-process from /root/reference) vs engine (local[32]) on the
    SAME synthesized KGML corpus — genes mode, propagation on. The
    north star asks the engine to match-or-beat the reference's
    single-node throughput at the same data scale."""
    import shutil

    if n_docs is None:
        n_docs = int(os.environ.get("SPARK_GRAFT_REFCMP_DOCS", "2000"))
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import ref_runner

    from knext_spark.corpus import gen_corpus_rows, docs_from_rows
    from knext_spark.knext import build_edges
    from knext_spark.parse import parse_docs
    from knext_spark.session import get_spark

    rows = gen_corpus_rows(n_docs=n_docs, seed=7)
    tmp = tempfile.mkdtemp(prefix="refcmp_")
    xml_dir = os.path.join(tmp, "xml")
    os.makedirs(xml_dir)
    for repo, path, commit, lang, content in rows:
        with open(os.path.join(xml_dir, os.path.basename(path)), "w") as f:
            f.write(content)

    t0 = time.time()
    n_ref_edges = 0
    for name in sorted(os.listdir(xml_dir)):
        try:
            tsv = ref_runner.run_reference_genes(
                os.path.join(xml_dir, name), os.path.join(tmp, "ref_out"),
                mixed=False, unique=True,
            )
            with open(tsv) as f:
                n_ref_edges += max(0, sum(1 for _ in f) - 1)
        except Exception:
            pass
    ref_wall = time.time() - t0

    spark = get_spark("refcmp", master="local[32]")
    parse_docs(docs_from_rows(spark, rows)).count()  # JIT/session warm-up
    t0 = time.time()
    n_eng_edges = build_edges(
        parse_docs(docs_from_rows(spark, rows)), mixed=False, unique=True
    ).count()
    eng_wall = time.time() - t0
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "metric": "parse_throughput_vs_reference",
        "value": round((n_docs / eng_wall) / (n_docs / ref_wall), 2),
        "unit": "x_reference",
        "n_docs": n_docs,
        "reference": {"wall_s": round(ref_wall, 2), "docs_per_sec": round(n_docs / ref_wall, 2), "edges": n_ref_edges},
        "engine": {"wall_s": round(eng_wall, 2), "docs_per_sec": round(n_docs / eng_wall, 2), "edges": n_eng_edges},
    }


_BULKY_KEYS = ("queries_spread", "per_superstep_walls")


def _short_record(rec):
    """Copy of the record with the bulky diagnostic arrays removed, so
    the final stdout line stays well under any tail-capture window.
    (Round 3's official BENCH_r03.json came back `parsed: null` because
    the one headline line, grown by queries_spread, overflowed the
    driver's tail capture — the medians survived only inside a
    truncated string.)"""
    if isinstance(rec, dict):
        return {k: _short_record(v) for k, v in rec.items() if k not in _BULKY_KEYS}
    if isinstance(rec, list):
        return [_short_record(v) for v in rec]
    return rec


def emit(rec: dict) -> None:
    """Record protocol: the FULL record (spread arrays included) goes to
    BENCH_LAST.json next to this file and to an early stdout line; the
    LAST stdout line is the short headline JSON the driver parses."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    full = json.dumps(rec)
    print(full)
    short = json.dumps(_short_record(rec))
    # the short line is the machine-read artifact — keep it last
    print(short)
    sys.stdout.flush()


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        emit(run_scaling(sf_dir))
    elif "--encode-gain" in sys.argv:
        emit(run_encode_gain(sf_dir))
    elif "--refcmp" in sys.argv:
        emit(run_refcmp())
    elif "--skew-temporal" in sys.argv:
        emit(run_temporal_skew(sf_dir))
    elif "--skew" in sys.argv:
        emit(run_skew(sf_dir))
    elif "--recall" in sys.argv:
        emit(run_recall(sf_dir))
    elif "--graph-extra" in sys.argv:
        emit(run_graph_extra(sf_dir))
    elif "--linkpred" in sys.argv:
        emit(run_linkpred(sf_dir))
    elif "--newops" in sys.argv:
        emit(run_newops(sf_dir))
    elif "--r5ops" in sys.argv:
        emit(run_r5ops(sf_dir))
    elif "--spanops" in sys.argv:
        emit(run_spanops(sf_dir))
    elif "--bpeops" in sys.argv:
        emit(run_bpeops(sf_dir))
    elif "--peelops" in sys.argv:
        emit(run_peelops(sf_dir))
    else:
        rec = run_suite(sf_dir, cpus)
        here = os.path.dirname(os.path.abspath(__file__))
        snap = os.path.join(here, "BENCH_SCALE_POINT.json")
        if rec.get("bench_scale", 1) > 1:
            # a scaled run snapshots itself so the next default-scale
            # run (the driver's per-round record) carries BOTH points;
            # recorded_at makes a stale snapshot visible in the record
            short = _short_record(rec)
            short["recorded_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
            with open(snap, "w") as f:
                json.dump(short, f, indent=1)
        elif os.path.exists(snap):
            with open(snap) as f:
                rec["scale_point"] = json.load(f)
        emit(rec)
