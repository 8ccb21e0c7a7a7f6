"""Benchmark-contamination screening for training corpora.

Before pretraining on a scraped corpus, a pipeline must measure how
much of each document overlaps a held-out evaluation set — documents
that quote benchmark items verbatim leak test answers into the
training data. The standard screen (public recipe: GPT-3 appendix C /
PaLM §C / the Dolma toolkit) is word-n-gram overlap: a document is
contaminated to the degree that its distinct w-shingles also appear
anywhere in the benchmark suite.

Shape at 100 TB:
- the BENCHMARK side is small by construction (eval suites are 1e4-1e6
  items → ~1e6-1e8 distinct shingles): it is aggregated once,
  de-duplicated, and — under ``broadcast_bench=True`` (default) —
  broadcast, so the screen costs ONE pass over the corpus with a
  map-side hash probe and one map-side-combinable count aggregation
  per doc; no corpus-sized shuffle at all;
- with ``broadcast_bench=False`` (a benchmark too big for the driver)
  the probe becomes an ordinary shuffle join on the shingle string —
  one exchange of the corpus' distinct shingles, still linear;
- the corpus side explodes to one row per DISTINCT shingle per doc
  (``shingles_col`` already dedups within the doc), so a doc costs
  O(tokens) rows exactly like the MinHash signature pass it usually
  shares a scan with.

The same tokenization (``text.TOKEN_RE``) and shingle construction as
the dedup family, so the DuckDB oracle reproduces counts bit-for-bit
(integers; the ratio is a single two-integer division — micros-safe).
The reference has no corpus operators at all (SURVEY.md §2.5) —
engine-mandate operator, like the rest of pipeline/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from knext_spark.pipeline.dedup import shingles_col


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    w: int = 3,
    text_col: str = "text",
    key: str = "doc_id",
    broadcast_bench: bool = True,
) -> DataFrame:
    """docs(key, text) × bench(..., text) -> one row per doc:
    (key, n_ngrams, n_hits, contamination) where n_ngrams is the
    doc's distinct w-shingle count, n_hits how many of those shingles
    appear anywhere in the benchmark set, and contamination =
    n_hits / n_ngrams (0.0 for shingle-less docs).

    Flag, don't drop: the caller joins this back and applies its own
    threshold (the published screens differ — e.g. any 8-gram hit vs
    a ratio cut); emitting the measurements keeps the policy outside
    the operator.
    """
    doc_sh = docs.select(
        F.col(key), F.explode(shingles_col(text_col, w)).alias("sh")
    )
    bench_sh = bench.select(
        F.explode(shingles_col(text_col, w)).alias("sh")
    ).distinct()
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    per_doc = doc_sh.join(
        bench_sh.withColumn("__hit", F.lit(1)), "sh", "left"
    ).groupBy(key).agg(
        F.count("*").alias("n_ngrams"),
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_hits"),
    )
    # shingle-less docs never reach the explode — restore them at 0
    return (
        docs.select(key)
        .join(per_doc, key, "left")
        .select(
            key,
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.when(
                F.coalesce("n_ngrams", F.lit(0)) > 0,
                F.coalesce("n_hits", F.lit(0)).cast("double")
                / F.col("n_ngrams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination"),
        )
    )
