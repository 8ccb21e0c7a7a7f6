"""Order-preserving dictionary encoding of node ids to dense int64.

Iterative graph algorithms shuffle/compare their key column every
superstep; on string ids (URLs, gene names, repo paths) that means
hashing and comparing variable-length UTF-8 per row per iteration.
Encoding to int64 once up front measured 1.27x faster steady-state
supersteps on the 118.9M-edge scaling input with short (~10-14 char)
ids (BENCH.md §1, steady-state protocol; the gain scales with key
length — web-scale URLs/paths are 5-20x longer) — round 2 did this in
the bench harness; this module makes it a first-class engine wrapper
(pagerank/cc/lpa take ``encode_ids=True`` and decode the result).

The encoding is ORDER-PRESERVING and DENSE (0..n-1 by sorted node
id), not a hash:

- order preservation is what keeps the algorithms' semantics exactly
  intact under encoding: LPA's deterministic tie-break (smallest label
  among argmax-frequency) and connected components' min-label
  canonicalization compare ids — with encoded order == original
  order, the decoded results are bit-identical to a raw-id run
  (tests/test_graph_algos.py). A hash encoding (xxhash64) would
  scramble tie-breaks and need a post-hoc re-canonicalization join.
- density keeps the id space compact (nice for downstream bitmaps /
  arrays), and rules out hash collisions outright.

Scale design — no global sort bottleneck: ``repartitionByRange`` with
an EXPLICIT partition count range-partitions the node set (globally
ordered partitions; the explicit count keeps AQE from coalescing the
shuffle, which would renumber partition ids between jobs), a
per-partition window computes local row numbers in parallel, and only
the n_part partition COUNTS are collected to the driver to compute
cumulative offsets: id = offset[partition] + local_rank - 1. That is
one range shuffle + one tiny collect, all DataFrame ops.

CONSISTENCY CONTRACT — the dictionary is materialized exactly once.
Spark's RangePartitioner reservoir-samples its bounds with a seed
derived from the RDD id, which changes per plan instantiation: a
recomputation of the range shuffle (cache eviction, a later decode
action after unpersist) can draw DIFFERENT bounds, and the offsets
collected against the first instantiation would then produce
non-dense/duplicate nids — silently wrong results. So the ranked
node set is pinned with an eager ``localCheckpoint`` BEFORE the
offsets are collected, and the offsets, ``encode_edges``, and
``decode_cols`` all read that single materialization. With
``materialize_dir`` set (what pagerank/cc/lpa's ``encode_ids=True``
does, under their checkpoint_dir) the finished dictionary is
additionally written to Parquet and every later use — including
decode joins that run after the wrapper returns, and resumed runs —
reads those durable bytes; the in-memory checkpoint is then freed.
Note the final node->nid MAPPING is deterministic regardless of
bounds (it is the global sort rank), so two independent *builds* of
the same node set agree; only mixing offsets from one instantiation
with rows of another is unsafe, and the single materialization rules
that out.

Callers that build a dictionary WITHOUT ``materialize_dir`` must keep
it alive themselves for the duration of its use and free it with
``knext_spark.graph.superstep.unpersist_checkpoint(dic)`` (plain
``unpersist`` is a no-op on localCheckpoint-backed frames).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window, functions as F

from knext_spark.graph.superstep import unpersist_checkpoint


def build_dictionary(
    nodes: DataFrame,
    num_partitions: int | None = None,
    materialize_dir: str | None = None,
    reuse: bool = False,
) -> DataFrame:
    """nodes(node) [distinct] -> dictionary (node, nid) with nid a
    dense, order-preserving int64: sorted(node)[i] gets nid=i.

    ``materialize_dir``: write the dictionary to Parquet there and
    return the read-back — the durable form every downstream join
    (encode, decode, post-return actions, resume) reads. Without it
    the result rides on an in-session eager localCheckpoint; see the
    module docstring for the caller's lifetime obligations.

    ``reuse=True`` (resume path): if ``materialize_dir`` holds a
    committed dictionary (``_SUCCESS``), read it back instead of
    rebuilding — the resumed iterate's nids were assigned by exactly
    that dictionary, so reuse is what makes resume correct. Only pass
    it for the same input node set the dictionary was built from.
    """
    spark = nodes.sparkSession
    if (
        reuse
        and materialize_dir
        and os.path.exists(os.path.join(materialize_dir, "_SUCCESS"))
    ):
        return spark.read.parquet(materialize_dir)
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    ranked = nodes.repartitionByRange(n_part, "node").select(
        "node", F.spark_partition_id().alias("pid")
    )
    w = Window.partitionBy("pid").orderBy("node")
    # eager pin BEFORE collecting offsets: every later job (the counts
    # collect, the dictionary join, the Parquet write) reads these
    # blocks, never a re-sampled range shuffle
    local = ranked.withColumn("rn", F.row_number().over(w)).localCheckpoint(
        eager=True
    )
    counts = sorted(
        local.groupBy("pid").agg(F.count("*").alias("cnt")).collect(),
        key=lambda r: r["pid"],
    )
    offs, acc = [], 0
    for r in counts:
        offs.append((int(r["pid"]), acc))
        acc += int(r["cnt"])
    off_df = spark.createDataFrame(offs, "pid int, off long")
    dic = local.join(F.broadcast(off_df), "pid").select(
        "node", (F.col("off") + F.col("rn") - 1).alias("nid")
    )
    if materialize_dir:
        dic.write.mode("overwrite").parquet(materialize_dir)
        unpersist_checkpoint(local)
        return spark.read.parquet(materialize_dir)
    return dic


def nodes_of(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    return (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )


def encode_edges(
    edges: DataFrame,
    dictionary: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Replace src/dst with their int64 codes; all other columns pass
    through. Two hash joins against the dictionary — a one-time cost
    the per-superstep savings amortize immediately."""
    rest = [c for c in edges.columns if c not in (src, dst)]
    d_src = dictionary.select(F.col("node").alias(src), F.col("nid").alias("__src_nid"))
    d_dst = dictionary.select(F.col("node").alias(dst), F.col("nid").alias("__dst_nid"))
    return (
        edges.join(d_src, src)
        .join(d_dst, dst)
        .select(
            F.col("__src_nid").alias(src), F.col("__dst_nid").alias(dst), *rest
        )
    )


def decode_cols(df: DataFrame, dictionary: DataFrame, *cols: str) -> DataFrame:
    """Map each named int64 column back to the original node id,
    preserving column order and the remaining columns. INNER joins by
    design: every nid in ``df`` was assigned from ``dictionary``, so
    decode preserves row count — and a dictionary inconsistency
    surfaces as missing rows (checkable) instead of silent nulls."""
    out = df
    for c in cols:
        d = dictionary.select(
            F.col("nid").alias(c), F.col("node").alias(f"__dec_{c}")
        )
        out = out.join(d, c)
    return out.select(
        *[
            F.col(f"__dec_{c}").alias(c) if c in cols else F.col(c)
            for c in df.columns
        ]
    )
