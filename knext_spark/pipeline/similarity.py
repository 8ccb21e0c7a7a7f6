"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products stay JVM-side via zip_with + aggregate (no UDF); the
  pair space is a join, so Spark distributes blocks of it; O(n^2 * d).
- ``lsh_ann_topk``: the scale path — random-hyperplane LSH. P
  deterministic pseudo-random hyperplanes (md5-derived weights in
  [-1, 1]) hash each vector to a P-bit bucket; candidates share a
  bucket; exact cosine re-ranks within bucket (raw doubles — both engines fold
  in index order, so values are bit-identical for oracle parity). Recall is tunable by P
  and by ``probes``: multiprobe LSH (Lv et al., VLDB'07) additionally
  probes the Hamming-adjacent buckets (1-bit flips of the P-bit code) —
  the query side explodes to 1 + probes buckets while the candidate
  side stays single-bucket, so the join fan-out grows linearly in
  probes, not quadratically. At 1e9 vectors this is the standard design
  (bucket join instead of n^2).
- ``embedding_near_dups``: cosine >= threshold pairs via the same LSH
  bucketing (near-dup dedup on embeddings).

Weights/hash are md5-based so the DuckDB oracle can reproduce the
bucketing exactly; cosine is rounded to 6 decimals for stable
cross-engine comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    key: str = "vec_id",
    vec: str = "embedding",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for every vector (or for
    ``queries`` if given) -> (vec_id, neighbor_id, rank, cosine).
    Deterministic: ties broken by neighbor id."""
    q = (queries or emb).select(
        F.col(key).alias("qid"), F.col(vec).alias("qv")
    )
    c = emb.select(F.col(key).alias("nid"), F.col(vec).alias("nv"))
    pairs = q.join(c, F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid", "nid", _cosine(F.col("qv"), F.col("nv")).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("qid").alias(key), F.col("nid").alias("neighbor_id"), "rank", "cosine")
    )


def _plane_weight(plane: int, dim: Column) -> Column:
    """Deterministic pseudo-random weight in [-1, 1]: md5-derived.
    Identical formula is expressible in DuckDB for oracle parity."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(",", F.lit(str(plane)), dim.cast("string")).cast("binary")), 1, 8),
        16,
        10,
    ).cast("long")
    return (h % 2001 - 1000) / 1000.0


def lsh_bucket(vec: Column, planes: int) -> Column:
    """P-bit random-hyperplane bucket id of a vector."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda v, i: v.cast("double") * _plane_weight(p, i),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def probe_buckets(bucket: Column, planes: int, probes: int) -> Column:
    """The multiprobe set: the exact bucket plus the first ``probes``
    1-bit-flip neighbors (flip order = plane index — the standard
    fixed probing sequence; a perturbation-ranked sequence is the
    full Lv et al. refinement)."""
    flips = [bucket]
    for p in range(min(probes, planes)):
        flips.append(bucket.bitwiseXOR(F.lit(2**p)))
    return F.array_distinct(F.array(*flips))


def lsh_ann_topk(
    emb: DataFrame,
    k: int = 5,
    planes: int = 4,
    key: str = "vec_id",
    vec: str = "embedding",
    probes: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket (plus the
    ``probes`` Hamming-adjacent buckets of the query's code), exact
    cosine re-rank within. Returns (vec_id, neighbor_id, rank, cosine,
    bucket). Recall < 1 by design; the exactness oracle is
    cosine_topk. The candidate side is NOT exploded — only queries
    probe extra buckets, so candidate storage and shuffle volume stay
    one row per vector."""
    # no persist: the bucketed projection is pure scan-side work that
    # both join inputs recompute within the one consuming job — caching
    # it here would leak block-manager memory past the call (callers
    # that consume the result repeatedly should cache the RESULT)
    b = emb.select(
        F.col(key).alias("qid"),
        F.col(vec).alias("qv"),
        lsh_bucket(F.col(vec), planes).alias("bucket"),
    )
    q = b
    if probes > 0:
        q = b.select(
            "qid",
            "qv",
            F.explode(probe_buckets(F.col("bucket"), planes, probes)).alias("bucket"),
        )
    c = b.select(
        F.col("qid").alias("nid"), F.col("qv").alias("nv"), "bucket"
    )
    pairs = q.join(c, "bucket").where(F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid", "nid", "bucket", _cosine(F.col("qv"), F.col("nv")).alias("cosine")
    )
    if probes > 0:
        # a (q, n) pair can collide in several probed buckets — keep
        # one row per pair (the candidate's own bucket is reported)
        scored = scored.groupBy("qid", "nid").agg(
            F.min("bucket").alias("bucket"), F.first("cosine").alias("cosine")
        )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("qid").alias(key), F.col("nid").alias("neighbor_id"), "rank", "cosine", "bucket")
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    planes: int = 4,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, LSH-bucketed
    candidate generation (a < b)."""
    b = emb.select(
        F.col(key).alias("a"),
        F.col(vec).alias("va"),
        lsh_bucket(F.col(vec), planes).alias("bucket"),
    )
    c = b.select(F.col("a").alias("b"), F.col("va").alias("vb"), "bucket")
    pairs = b.join(c, "bucket").where(F.col("a") < F.col("b"))
    scored = pairs.select(
        "a", "b", _cosine(F.col("va"), F.col("vb")).alias("cosine")
    ).distinct()
    return scored.where(F.col("cosine") >= threshold)
