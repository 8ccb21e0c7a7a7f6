"""Deterministic sequence packing (concat-and-chunk) for pretraining.

A pretraining loader wants fixed-length token sequences, but documents
have power-law lengths; the standard fix (public recipe: GPT/T5-style
"concat and chunk", also how Megatron/Dolma build their token streams)
is to concatenate documents into a stream and slice the stream into
``budget``-token windows. Doing that at 100 TB needs an assignment
that is deterministic, cluster-size-independent, and computable
without any sequential scan — which this operator gets by making the
stream ORDER itself a pure function of the data:

- every document hashes to one of ``n_shards`` independent streams
  (``md5(key) % n_shards`` — shard count = parallelism of the packing
  stage, set it to ~4x your cores);
- within a shard the stream order is (md5(key), key) — stable under
  re-ingestion and independent of partitioning;
- a window prefix-sum of token counts then yields each document's
  byte-exact position: ``offset`` (tokens before it in its stream),
  and the chunk ids its tokens land in, ``bin_start = offset div
  budget`` .. ``bin_end = (offset + tokens - 1) div budget`` (a doc
  spanning a chunk boundary is split by the loader — that's the
  concat-and-chunk contract; callers that must not split documents
  can filter ``bin_start == bin_end`` or re-pack the remainder).

Cost: ONE exchange (hash-partition by shard) + an in-partition sort —
the same shape as any windowed aggregation; every output column is an
integer, so the DuckDB oracle reproduces the assignment bit-for-bit.
Skew: shards are md5-uniform over documents, so shard token mass
concentrates only if a single document is a large fraction of the
corpus; ``n_shards`` is the lever, and the operator never collects
anything to the driver.

The reference has no corpus operators (SURVEY.md §2.5) —
engine-mandate operator like the rest of pipeline/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from knext_spark.pipeline.text import tokens_col


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    text_col: str = "text",
    key: str = "doc_id",
    tokens_col_name: str | None = None,
) -> DataFrame:
    """docs(key, text) -> (key, shard, tokens, offset, bin_start,
    bin_end): the deterministic concat-and-chunk packing assignment.

    ``tokens_col_name``: use a precomputed token-count column instead
    of re-tokenizing (a real pipeline counts tokens once and carries
    the column; the default re-derives it with the engine's shared
    ``TOKEN_RE`` tokenizer so the operator is self-contained).
    """
    if budget <= 0:
        raise ValueError("budget must be a positive token count")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    tok = (
        F.col(tokens_col_name)
        if tokens_col_name is not None
        else F.size(tokens_col(text_col))
    ).cast("long")
    h = F.md5(F.col(key).cast("string"))
    # first 8 hex chars -> int: cheap, uniform, and replicable in SQL
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    ).alias("shard")
    base = docs.select(
        F.col(key), shard, h.alias("__h"), tok.alias("tokens")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__h", key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("tokens").over(w)
    positioned = base.select(
        key, "shard", "tokens", (cum - F.col("tokens")).alias("offset")
    )
    # integer DIV, not floor(double/): exact at any stream length (the
    # same magnitude argument as temporal.py's bucket ids)
    b = int(budget)
    return positioned.select(
        key,
        "shard",
        "tokens",
        "offset",
        F.expr(f"offset DIV {b}").cast("long").alias("bin_start"),
        F.expr(
            f"greatest(offset + tokens - 1, offset) DIV {b}"
        ).cast("long").alias("bin_end"),
    )
