#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": ..., "value": <total wall sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "pagerank_supersteps_per_sec": ..., "pagerank_edges_per_sec": ...,
   "kgml_edges_per_sec": ...}

The headline metric mirrors BASELINE.json: PageRank supersteps/sec and
edges/sec over the KGML-derived edge table (synthesized deterministic
corpus, parsed by the engine, genes-mode with propagation), plus the
operator suite at the chosen SF.

--scaling runs the same PageRank job at local[8] and local[32] on the
same input and reports throughput at both plus scaling efficiency
(= (edges/s@32 / edges/s@8) / 4): the sandbox stand-in for the N vs 4N
executor criterion (see BENCH.md).
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


def run_suite(sf_dir: str, cpus: int) -> dict:
    from knext_spark.session import get_spark

    import __spark_entry__ as em

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(
        "bench", master=f"local[{cpus}]", shuffle_partitions=max(8, int(cpus))
    )
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    t0 = time.time()
    edges = _build_kgml_edges(spark, sf)
    n_kgml_edges = edges.persist().count()
    timings["kgml_parse_edges"] = round(time.time() - t0, 3)
    extras["kgml_n_edges"] = n_kgml_edges
    extras["kgml_edges_per_sec"] = round(
        n_kgml_edges / timings["kgml_parse_edges"], 1
    )

    pr = _pagerank_throughput(spark, edges)
    timings["kgml_pagerank"] = round(pr["wall_s"], 3)
    extras["pagerank_supersteps"] = pr["supersteps"]
    extras["pagerank_supersteps_per_sec"] = round(pr["supersteps_per_sec"], 3)
    extras["pagerank_edges_per_sec"] = round(pr["edges_per_sec"], 1)

    from knext_spark.graph import connected_components, triangle_count

    t0 = time.time()
    cc = connected_components(
        spark, edges, checkpoint_dir=tempfile.mkdtemp(prefix="bench_cc_"), cadence=10
    )
    cc.state.count()
    timings["kgml_connected_components"] = round(time.time() - t0, 3)

    t0 = time.time()
    triangle_count(edges).agg(F.sum("triangles")).collect()
    timings["kgml_triangles"] = round(time.time() - t0, 3)
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
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        **extras,
    }


def run_scaling(sf_dir: str, levels=(8, 32)) -> dict:
    """Same PageRank job at two parallelism levels on the same input."""
    from knext_spark.session import get_spark

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # compute-bound configuration: the edge table must be big enough
    # that each superstep is dominated by the edge-contribution join,
    # not by fixed job-launch/shuffle latency (profiled floor ~1.8s on
    # this host). The corpus is generated ONCE (distributed, at the
    # wider level) and written to a shared Parquet edge table: both
    # levels read the IDENTICAL input with IDENTICAL partitioning
    # (shuffle partitions 64, rank/edge co-partitioning 64) — only task
    # slots differ, like a real N -> 4N executor comparison.
    n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "300000"))
    runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))
    supersteps = int(os.environ.get("SPARK_GRAFT_SCALE_STEPS", "10"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    edge_dir = tempfile.mkdtemp(prefix="bench_scale_edges_")
    spark = get_spark(
        "bench_scale_gen", master=f"local[{max(levels)}]", shuffle_partitions=64
    )
    # mixed mode: pure-Catalyst edge build (no per-doc propagation) —
    # the scaling subject is PageRank superstep throughput
    _build_kgml_edges(
        spark, sf, n_docs=n_docs, scale=3.0, mixed=True
    ).write.mode("overwrite").parquet(edge_dir)
    spark.stop()

    out = {}
    for cpus in levels:
        spark = get_spark(
            f"bench_scale_{cpus}",
            master=f"local[{cpus}]",
            shuffle_partitions=64,
        )
        edges = spark.read.parquet(edge_dir).persist()
        n_edges = edges.count()
        samples = []
        for r in range(runs):
            # tol=0: fixed supersteps (throughput measurement, not
            # convergence — N*tol auto-converges instantly at bench N)
            samples.append(
                _pagerank_throughput(
                    spark, edges, max_iter=supersteps, tol=0.0,
                    num_partitions=64,
                )
            )
        samples.sort(key=lambda s: s["edges_per_sec"])
        med = samples[len(samples) // 2]
        out[f"local[{cpus}]"] = {k: round(v, 3) for k, v in med.items()}
        out[f"local[{cpus}]"]["n_edges"] = n_edges
        edges.unpersist()
        spark.stop()
    lo, hi = levels
    eff = (
        out[f"local[{hi}]"]["edges_per_sec"]
        / out[f"local[{lo}]"]["edges_per_sec"]
        / (hi / lo)
    )
    return {
        "metric": "pagerank_scaling_efficiency",
        "value": round(eff, 4),
        "unit": "ratio",
        "levels": out,
        "sf": sf,
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        print(json.dumps(run_suite(sf_dir, cpus)))
