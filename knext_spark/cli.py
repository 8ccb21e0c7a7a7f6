"""spark-submit entrypoint mirroring the reference CLI verbs.

Reference: ``knext get-kgml|genes|mixed|convert``
(`/root/reference/src/__main__.py:22-158`). Engine verbs:

  ingest        synthesize/refresh the docs corpus table (stand-in for
                get-kgml's KEGG fetch; idempotent MERGE like
                call.py:38-39's skip-if-exists)
  parse-genes   docs table -> genes-mode edge warehouse (+ TSV export)
  parse-mixed   docs table -> mixed-mode edge warehouse (+ TSV export)
  convert       edge warehouse -> NCBI/UniProt ids (convert.py parity)
  pagerank|hits|cc|scc|lpa|triangles|clustering|jaccard|bfs|betweenness|ktruss|diameter|toposort|mis|coloring|anf|modularity
                graph algorithms over an edge warehouse, with
                checkpoint/resume for the iterative ones (pagerank
                takes --personalization, a parquet of (node, p)
                teleport seeds; jaccard takes --min-common and the
                --max-apex-degree hub governor; bfs and betweenness
                take --sources, a parquet of (node) seeds; ktruss
                takes -k; diameter takes --sweeps; toposort emits
                (node, level) with -1 for cycle-tainted nodes;
                mis/coloring emit the deterministic md5-ticket
                independent set / proper coloring; anf takes --hops
                and emits per-node ball-size estimates;
                modularity takes --labels, a parquet of (node, label),
                and prints the scalar Q)

Usage (cluster):
  spark-submit --py-files knext_spark.zip main.py <verb> [options]
Local:
  python main.py <verb> [options]

All verbs build plans only; no driver-side data loops (TSV export is
the explicitly-small compat path).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession, functions as F


def _spark(args) -> SparkSession:
    from knext_spark.session import get_spark

    # under spark-submit the master comes from the submit conf
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return get_spark("knext_spark_cli", master=args.master)


def cmd_ingest(args):
    from knext_spark.corpus import gen_docs_df
    from knext_spark.corpus.table import write_docs

    spark = _spark(args)
    docs = gen_docs_df(spark, args.n_docs, seed=args.seed, scale=args.scale)
    n = write_docs(
        docs, args.table, mode="append" if args.append else "overwrite",
        idempotent=args.append,
    )
    print(json.dumps({"ingested_rows": n, "table": args.table}))


def _parse(args, mixed: bool):
    from knext_spark.corpus.table import read_docs
    from knext_spark.knext import build_edges, quarantine_docs
    from knext_spark.knext.sinks import export_tsv_per_doc, write_edges_warehouse
    from knext_spark.parse import parse_docs

    spark = _spark(args)
    parsed = parse_docs(read_docs(spark, args.table))
    edges = build_edges(
        parsed, mixed=mixed, unique=args.unique,
        propagate=getattr(args, "propagate", "faithful"),
    )
    write_edges_warehouse(edges, args.out)
    quarantine_docs(parsed).write.mode("overwrite").parquet(args.out + "_quarantine")
    if args.tsv_dir:
        export_tsv_per_doc(edges, args.tsv_dir)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"edges": n, "warehouse": args.out, "mixed": mixed}))


def cmd_convert(args):
    from knext_spark.knext.convert import NCBI_PREFIX, UP_PREFIX, convert_edges

    spark = _spark(args)
    edges = spark.read.parquet(args.edges)
    # always read the given mapping path — a bad path must fail loudly
    # (silently substituting an empty mapping would drop every row in
    # the species-prefix purge and produce near-empty output)
    mapping = spark.read.parquet(args.mapping)
    prefix = UP_PREFIX if args.uniprot else NCBI_PREFIX
    out = convert_edges(
        edges.select("entry1", "entry2", "type", "value", "name", "out_seq"),
        mapping,
        args.species,
        prefix=prefix,
        unique=args.unique,
    )
    out.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"converted": spark.read.parquet(args.out).count()}))


def _edges_df(spark, path):
    e = spark.read.parquet(path)
    cols = e.columns
    if "src" not in cols and "entry1" in cols:
        e = e.select(
            F.col("entry1").alias("src"),
            F.col("entry2").alias("dst"),
            (F.col("weight") if "weight" in cols else F.lit(1.0)).alias("weight"),
        )
    return e


def cmd_graph(args):
    from knext_spark.graph import (
        bfs_distances_run,
        clustering_coefficient,
        connected_components,
        hits,
        label_propagation,
        neighbor_jaccard,
        pagerank,
        strongly_connected_components,
        triangle_count,
    )

    spark = _spark(args)
    edges = _edges_df(spark, args.edges)
    # argparse leaves --salt-k a string; pagerank compares it numerically
    # (modularity's parser has no --salt-k: default 1)
    raw_salt = getattr(args, "salt_k", 1)
    salt_k = raw_salt if raw_salt == "auto" else int(raw_salt)
    if args.verb in ("mis", "coloring", "toposort") and args.cadence != 1:
        # these verbs act on a SIDE frame each round, the measured
        # lazy-chain recompute hazard (BENCH.md §13: 3-10x blowup) that
        # made the library wrappers pin cadence=1 — clamp here too
        import sys as _sys

        print(
            f"warning: --cadence clamped to 1 for {args.verb} "
            "(side-frame per-round action; see BENCH.md §13)",
            file=_sys.stderr,
        )
        args.cadence = 1
    if args.verb == "pagerank":
        pers = None
        if getattr(args, "personalization", None):
            # parquet (node, p): seeds for personalized PageRank
            pers = spark.read.parquet(args.personalization)
        res = pagerank(
            spark,
            edges.dropDuplicates(["src", "dst"]),
            alpha=args.alpha,
            tol=args.tol,
            max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint_dir,
            run_id=args.run_id,
            resume=args.resume,
            salt_k=salt_k,
            cadence=args.cadence,
            personalization=pers,
        )
    elif args.verb == "scc":
        res = strongly_connected_components(
            spark, edges, checkpoint_dir=args.checkpoint_dir,
            run_id=args.run_id, resume=args.resume, cadence=args.cadence,
            max_rounds=args.max_iter,
        )
    elif args.verb == "cc":
        res = connected_components(
            spark, edges, checkpoint_dir=args.checkpoint_dir,
            run_id=args.run_id, resume=args.resume, cadence=args.cadence,
            salt_k=salt_k,
        )
    elif args.verb == "hits":
        res = hits(
            spark,
            edges.dropDuplicates(["src", "dst"]),
            tol=args.tol,
            max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint_dir,
            run_id=args.run_id,
            resume=args.resume,
            cadence=args.cadence,
        )
    elif args.verb == "lpa":
        hot = args.hot_threshold
        res = label_propagation(
            spark, edges, max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint_dir, run_id=args.run_id,
            resume=args.resume, cadence=args.cadence,
            salt_k=salt_k,
            hot_threshold=hot if hot in ("auto", "off") else int(hot),
        )
    elif args.verb == "bfs":
        # --sources: parquet of (node) seed rows
        res = bfs_distances_run(
            spark, edges, spark.read.parquet(args.sources),
            direction=args.direction, checkpoint_dir=args.checkpoint_dir,
            run_id=args.run_id, resume=args.resume, cadence=args.cadence,
            max_iter=args.max_iter,
        )
    elif args.verb == "betweenness":
        from knext_spark.graph import betweenness_sampled

        betweenness_sampled(
            spark, edges, spark.read.parquet(args.sources),
            checkpoint_dir=args.checkpoint_dir, run_id=args.run_id,
            resume=args.resume, cadence=args.cadence, max_iter=args.max_iter,
        ).write.mode("overwrite").parquet(args.out)
        print(json.dumps({"out": args.out}))
        return
    elif args.verb == "ktruss":
        from knext_spark.graph import k_truss_run

        res = k_truss_run(
            spark, edges, k=args.k, checkpoint_dir=args.checkpoint_dir,
            run_id=args.run_id, resume=args.resume, max_iter=args.max_iter,
        )
    elif args.verb == "toposort":
        from knext_spark.graph import topological_levels_run

        res = topological_levels_run(
            spark, edges, checkpoint_dir=args.checkpoint_dir,
            run_id=args.run_id, resume=args.resume,
            max_iter=args.max_iter, cadence=args.cadence,
        )
    elif args.verb == "mis":
        from knext_spark.graph import mis_run

        res = mis_run(
            spark, edges, checkpoint_dir=args.checkpoint_dir,
            run_id=args.run_id, resume=args.resume,
            max_iter=args.max_iter, cadence=args.cadence,
        )
    elif args.verb == "coloring":
        from knext_spark.graph import coloring_run

        res = coloring_run(
            spark, edges, checkpoint_dir=args.checkpoint_dir,
            run_id=args.run_id, resume=args.resume,
            max_iter=args.max_iter, cadence=args.cadence,
        )
    elif args.verb == "anf":
        from knext_spark.graph import anf_run

        res = anf_run(
            spark, edges, hops=args.hops,
            checkpoint_dir=args.checkpoint_dir, run_id=args.run_id,
            resume=args.resume, cadence=args.cadence,
        )
    elif args.verb == "diameter":
        from knext_spark.graph import pseudo_diameter

        # --sources: parquet of (node) rows; the min node seeds the
        # sweep (use it to target a specific component)
        start = None
        if getattr(args, "sources", None):
            start = (
                spark.read.parquet(args.sources)
                .agg(F.min("node"))
                .collect()[0][0]
            )
        pseudo_diameter(
            edges, sweeps=args.sweeps, direction=args.direction,
            max_iter=args.max_iter, start=start,
        ).write.mode("overwrite").parquet(args.out)
        print(json.dumps({"out": args.out}))
        return
    elif args.verb == "modularity":
        from knext_spark.graph import modularity as _q

        print(json.dumps({
            "modularity": _q(edges, spark.read.parquet(args.labels)),
        }))
        return
    elif args.verb == "clustering":
        clustering_coefficient(edges).write.mode("overwrite").parquet(args.out)
        print(json.dumps({"out": args.out}))
        return
    elif args.verb == "jaccard":
        neighbor_jaccard(
            edges,
            min_common=args.min_common,
            max_apex_degree=args.max_apex_degree,
        ).write.mode("overwrite").parquet(args.out)
        print(json.dumps({"out": args.out}))
        return
    else:  # triangles
        triangle_count(edges).write.mode("overwrite").parquet(args.out)
        print(json.dumps({"out": args.out}))
        return
    res.state.write.mode("overwrite").parquet(args.out)
    print(
        json.dumps(
            {
                "out": args.out,
                "iterations": res.iterations,
                "converged": res.converged,
                "last_metrics": res.metrics[-1] if res.metrics else None,
            }
        )
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="knext_spark")
    p.add_argument("--master", default=None)
    sub = p.add_subparsers(dest="verb", required=True)

    s = sub.add_parser("ingest")
    s.add_argument("--table", required=True)
    s.add_argument("--n-docs", type=int, default=1000)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--scale", type=float, default=1.0)
    s.add_argument("--append", action="store_true")
    s.set_defaults(fn=cmd_ingest)

    for verb, mixed in (("parse-genes", False), ("parse-mixed", True)):
        s = sub.add_parser(verb)
        s.add_argument("--table", required=True)
        s.add_argument("--out", required=True)
        s.add_argument("--unique", action="store_true")
        s.add_argument("--tsv-dir", default=None)
        s.add_argument(
            "--propagate",
            choices=("faithful", "contract"),
            default="faithful",
            help=(
                "genes-mode compound/undefined propagation variant. "
                "'faithful' (default) reproduces the reference's per-"
                "document BFS byte-exactly but groups each document "
                "into one Arrow batch — right for reference parity "
                "and corpora whose single documents fit an executor. "
                "'contract' is a pure-DataFrame reachability fixpoint "
                "with no per-document grouping — the scale path. The "
                "variants can differ: faithful's bridge set is a "
                "SUBSET of contract's true closure (proved by "
                "property test); contract finds extra multi-hop "
                "compound bridges on some corpora (e.g. +8 edges on "
                "the 24-doc test corpus). See README 'Propagation "
                "variants'."
            ),
        )
        s.set_defaults(fn=lambda a, m=mixed: _parse(a, m))

    s = sub.add_parser("convert")
    s.add_argument("--edges", required=True)
    s.add_argument("--mapping", required=True)
    s.add_argument("--species", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--uniprot", action="store_true")
    s.add_argument("--unique", action="store_true")
    s.set_defaults(fn=cmd_convert)

    s = sub.add_parser("modularity")
    s.add_argument("--edges", required=True)
    s.add_argument("--labels", required=True)  # parquet (node, label)
    s.set_defaults(fn=cmd_graph, verb="modularity")

    for verb in (
        "pagerank", "hits", "cc", "scc", "lpa", "triangles",
        "clustering", "jaccard", "bfs", "betweenness", "ktruss",
        "diameter", "toposort", "mis", "coloring", "anf",
    ):
        s = sub.add_parser(verb)
        s.add_argument("--edges", required=True)
        s.add_argument("--out", required=True)
        s.add_argument("--checkpoint-dir", default="/tmp/knext_ckpt")
        s.add_argument("--run-id", default="cli")
        s.add_argument("--resume", action="store_true")
        s.add_argument("--cadence", type=int, default=1)
        s.add_argument("--max-iter", type=int, default=100)
        s.add_argument("--alpha", type=float, default=0.85)
        s.add_argument("--tol", type=float, default=1.0e-6)
        s.add_argument("--salt-k", default=1)
        # lpa only: hot-key broadcast split threshold (auto|off|int)
        s.add_argument("--hot-threshold", default="auto")
        # pagerank only: parquet path of (node, p) teleport seeds
        s.add_argument("--personalization", default=None)
        # jaccard only: selectivity floor + hub governor
        s.add_argument("--min-common", type=int, default=1)
        s.add_argument("--max-apex-degree", type=int, default=None)
        # bfs/diameter: seed parquet (node) + edge direction
        s.add_argument("--sources", default=None)
        s.add_argument(
            "--direction",
            default="out" if verb == "bfs" else "both",
            choices=["out", "in", "both"],
        )
        # ktruss only: the support threshold; diameter only: sweeps
        s.add_argument("-k", type=int, default=3)
        s.add_argument("--sweeps", type=int, default=2)
        # anf only: ball radius
        s.add_argument("--hops", type=int, default=3)
        s.set_defaults(fn=cmd_graph)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
