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
  probes Hamming-adjacent buckets (1-bit flips of the P-bit code) —
  the query side explodes to 1 + probes buckets while the candidate
  side stays single-bucket, so the join fan-out grows linearly in
  probes, not quadratically. ``probe_rank="distance"`` is the Lv et
  al. refinement: flip the planes whose hyperplane margin |dot| is
  smallest first (those are the bits most likely wrong), instead of
  fixed plane order — measurably better recall per probe
  (tests/test_pipeline_ops.py). At 1e9 vectors this is the standard
  design (bucket join instead of n^2).
- ``embedding_near_dups``: cosine >= threshold pairs via the same LSH
  bucketing (near-dup dedup on embeddings).
- ``ivf_ann_topk``: the OTHER standard ANN scale path — IVF-flat.
  A small set of centroids partitions the corpus into inverted lists
  (each vector assigned to its nearest centroid); a query probes its
  ``nprobe`` nearest lists and exact cosine re-ranks inside them.
  Centroids here are deterministic seed samples (the ``n_centroids``
  vectors with the smallest md5(key) — an order-statistics sample the
  DuckDB oracle reproduces exactly); k-means refinement of the
  centroids is an offline fitting concern that changes recall, not the
  query plan, so the engine keeps the query path pure and
  deterministic. Complements LSH: IVF adapts to the data distribution
  (lists mirror density), LSH is data-independent.

Scale governors (the in-bucket re-rank is O(bucket^2)):

- ``max_bucket`` prunes buckets holding more than that many vectors —
  a bucket that large means degenerate hyperplanes or near-constant
  embeddings, and exact re-ranking inside it is the quadratic hot-key
  blowup at 100 TB (mirrors ``max_posting``/``max_bucket`` in
  pipeline.dedup). The prune is planned lazily inside the consuming
  query (no extra jobs); audit what a cap drops with ``hot_buckets``.
  Members of a pruned bucket still surface via query-side probes
  (``probes > 0``) in both lsh_ann_topk and embedding_near_dups.
- ``planes="auto"`` sizes P ≈ log2(n / target_bucket) from the corpus
  size so the EXPECTED bucket is ~target_bucket — without it a fixed
  small P gives 2^P total buckets and every bucket grows linearly
  with n. (Costs one count() of the input; pass an int to skip.)

Weights/hash are md5-based so the DuckDB oracle can reproduce the
bucketing exactly; cosine is rounded to 6 decimals for stable
cross-engine comparison.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def _cosine(a: Column, b: Column) -> Column:
    """Reference formulation: dot / (norm·norm), index-order folds
    (bit-identical in DuckDB's list_reduce — the oracle contract).
    The pair-verify hot paths below do NOT call this per pair: a
    higher-order-function fold costs an array allocation per
    evaluation, and this expression runs THREE of them per pair while
    two (the norms) are per-VECTOR quantities. Each site precomputes
    `_norm` once per row and divides the per-pair `_dot` by the two
    carried norm columns — the same expressions over the same inputs,
    so the result is bit-identical, at one fold per pair instead of
    three (measured ~3x on the brute-force/verify stages)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


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
        F.col(key).alias("qid"),
        F.col(vec).alias("qv"),
        _norm(F.col(vec)).alias("__qn"),
    )
    c = emb.select(
        F.col(key).alias("nid"),
        F.col(vec).alias("nv"),
        _norm(F.col(vec)).alias("__nn"),
    )
    # the non-equi condition forces a broadcast-nested-loop join whose
    # parallelism is the STREAM side's partition count — for a parquet
    # scan that's the file count (often << cores), so the quadratic
    # stage runs on a handful of tasks while the rest of the cluster
    # idles. One cheap round-robin exchange of the (small) query side
    # restores full parallelism; values are unaffected. Measured at
    # 20k vectors / local[32]: 872s on 10 file-bound tasks -> 327s
    # spread (this fix) -> 153s with the carried-norm kernel (below).
    pairs = _spread(q).join(c, F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid",
        "nid",
        (_dot(F.col("qv"), F.col("nv")) / (F.col("__qn") * F.col("__nn"))).alias("cosine"),
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


def _plane_dot(vec: Column, plane: int) -> Column:
    """Signed projection of ``vec`` onto hyperplane ``plane`` (index-
    order fold — bit-identical in DuckDB's list_reduce)."""
    return F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda v, i: v.cast("double") * _plane_weight(plane, i),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def plane_dots(vec: Column, planes: int) -> Column:
    """array<double> of the P signed hyperplane projections."""
    return F.array(*[_plane_dot(vec, p) for p in range(planes)])


def bucket_of(dots: Column, planes: int) -> Column:
    """P-bit bucket id from the projection array (bit p set iff
    dots[p] >= 0)."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        bucket = bucket + F.when(dots[p] >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def lsh_bucket(vec: Column, planes: int) -> Column:
    """P-bit random-hyperplane bucket id of a vector."""
    return bucket_of(plane_dots(vec, planes), planes)


def auto_planes(n: int, target_bucket: int = 1024, lo: int = 4, hi: int = 24) -> int:
    """P such that the expected bucket size n / 2^P ≈ target_bucket.
    This is what keeps bucket population (and the O(bucket^2) re-rank)
    CONSTANT as the corpus grows, instead of linear in n."""
    if n <= 0:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(max(2.0, n / target_bucket)))))


def probe_buckets(bucket: Column, planes: int, probes: int) -> Column:
    """The fixed-order multiprobe set: the exact bucket plus the first
    ``probes`` 1-bit-flip neighbors in plane-index order."""
    flips = [bucket]
    for p in range(min(probes, planes)):
        flips.append(bucket.bitwiseXOR(F.lit(2**p)))
    return F.array_distinct(F.array(*flips))


def ranked_probe_buckets(
    bucket: Column, dots: Column, planes: int, probes: int
) -> Column:
    """Perturbation-ranked multiprobe set (Lv et al., VLDB'07): flip
    the ``probes`` planes with the SMALLEST |projection| first — a
    near-zero margin means the vector sits next to that hyperplane and
    its true neighbors plausibly landed on the other side, so those
    flips recover the most recall per probe. Tie-break: plane index
    (array_sort on (|dot|, p) structs — lexicographic, deterministic,
    and the identical order-by is expressible in DuckDB)."""
    n = min(probes, planes)
    ranked = F.transform(
        F.array_sort(
            F.array(
                *[
                    F.struct(F.abs(dots[p]).alias("m"), F.lit(p).alias("p"))
                    for p in range(planes)
                ]
            )
        ),
        lambda s: s["p"],
    )
    flipped = F.transform(
        F.slice(ranked, 1, n),
        # 2^p via pow (shiftleft needs a literal shift): exact in a
        # double for p <= 52, and planes caps at 24
        lambda p: bucket.bitwiseXOR(F.pow(F.lit(2.0), p).cast("long")),
    )
    return F.array_distinct(F.concat(F.array(bucket), flipped))


def auto_centroids(
    n: int, target_list: int = 1024, lo: int = 4, hi: int = 1 << 16
) -> int:
    """K such that the expected inverted list n / K ≈ target_list.
    The cid join's parallelism AND the O(list^2 / K) re-rank cost are
    both K-bounded, so K must grow with the corpus exactly like
    auto_planes grows P — a fixed small K at 100 TB means 16-way
    parallelism and linear list growth."""
    if n <= 0:
        return lo
    return max(lo, min(hi, math.ceil(n / target_list)))


def ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    key: str = "vec_id",
    vec: str = "embedding",
    refine: int = 0,
) -> DataFrame:
    """(cid, cv): deterministic seed centroids — the ``n_centroids``
    vectors with the smallest md5(key), ids assigned in that order.
    Selection is a distributed TakeOrdered (orderBy + limit pushes a
    per-partition top-K, never a full sort); the row_number window
    then runs over only the K surviving rows, so its single-partition
    plan is K-bounded, not corpus-bounded.

    ``refine``: number of Lloyd (k-means) iterations over the seeds.
    Each iteration assigns every vector to its nearest centroid (the
    same argmax-cosine rule _ivf_sims uses to build lists, cid-asc
    tie-break) and re-centers each cluster on the member mean; empty
    clusters keep their previous centroid. The mean is computed over
    micros-quantized int64 components (the repo's floor(x·1e6 + 0.5)
    convention), so the per-cluster SUM is exact and ORDER-INDEPENDENT
    — bit-identical across retries, partitionings, and the DuckDB
    oracle; a float sum would be none of those. Cost per iteration:
    one K-way broadcast scoring pass + one (cid, dim)-keyed aggregate
    (map-side combinable; dim×K result rows), both linear in n — the
    classic IVF training trade: spend iterations once to earn recall
    at every query."""
    picked = (
        emb.select(
            F.md5(F.col(key).cast("string").cast("binary")).alias("h"),
            F.col(key).alias("ck"),
            F.col(vec).alias("cv"),
        )
        .orderBy("h", "ck")
        .limit(n_centroids)
    )
    w = Window.orderBy("h", "ck")
    cents = picked.select(F.row_number().over(w).alias("cid"), "cv")
    for _ in range(int(refine)):
        cents = _lloyd_step(emb, cents, key, vec)
    return cents


def _lloyd_step(emb: DataFrame, cents: DataFrame, key: str, vec: str) -> DataFrame:
    """One deterministic k-means step: argmax-cosine assignment, then
    the exact micros-int mean per (cid, dim) — see ivf_centroids."""
    assigned = (
        _ivf_sims(emb, cents, key, vec)
        .where(F.col("rn") == 1)
        .select("cid", "v")
    )
    comp = assigned.select("cid", F.posexplode("v").alias("pos", "val"))
    means = (
        comp.select(
            "cid",
            "pos",
            F.floor(F.col("val").cast("double") * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("q"),
        )
        .groupBy("cid", "pos")
        .agg(F.sum("q").alias("s"), F.count("*").alias("n"))
        .select(
            "cid", "pos", (F.col("s") / F.col("n") / F.lit(1e6)).alias("m")
        )
    )
    new = (
        means.groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cid", F.transform("pm", lambda x: x["m"]).alias("cv"))
    )
    return (
        cents.select("cid", F.col("cv").cast("array<double>").alias("__old"))
        .join(new, "cid", "left")
        .select("cid", F.coalesce("cv", "__old").alias("cv"))
    )


def _spread(df: DataFrame, mult: int = 2) -> DataFrame:
    """Round-robin-repartition ``df`` to mult × defaultParallelism
    partitions if it currently has fewer. Value-neutral. Broadcast /
    nested-loop join stages inherit the STREAM side's partition count,
    which for a parquet scan is the file count — often a handful —
    so without this the cluster idles through the expensive scoring
    stage regardless of core count."""
    par = df.sparkSession.sparkContext.defaultParallelism * mult
    return df.repartition(par) if df.rdd.getNumPartitions() < par else df


def _ivf_sims(emb: DataFrame, centroids: DataFrame, key: str, vec: str) -> DataFrame:
    """(id, v, vn, cid, rn): every vector scored against every
    centroid (broadcast — K is small), ranked by cosine desc with cid
    as the deterministic tie-break. rn = 1 is the vector's inverted
    list; rn <= nprobe is its probe set. vn carries the row's vector
    norm so the downstream pair-verify divides instead of re-folding
    (see _cosine)."""
    scored = (
        _spread(
            emb.select(
                F.col(key).alias("id"),
                F.col(vec).alias("v"),
                _norm(F.col(vec)).alias("vn"),
            )
        )
        .crossJoin(F.broadcast(centroids.withColumn("cn", _norm(F.col("cv")))))
        .select(
            "id", "v", "vn", "cid",
            (_dot(F.col("v"), F.col("cv")) / (F.col("vn") * F.col("cn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("cid"))
    return scored.select("id", "v", "vn", "cid", F.row_number().over(w).alias("rn"))


def ivf_ann_topk(
    emb: DataFrame,
    k: int = 5,
    n_centroids: int | str = 16,
    nprobe: int = 2,
    key: str = "vec_id",
    vec: str = "embedding",
    max_list: int | None = None,
    target_list: int = 1024,
    salt: int | str = "auto",
    refine: int = 0,
) -> DataFrame:
    """IVF-flat approximate top-k -> (vec_id, neighbor_id, rank,
    cosine, cid). Candidates live in exactly ONE inverted list (their
    nearest centroid), so a (query, neighbor) pair is generated at
    most once even with nprobe > 1 — no post-join dedup needed (unlike
    multiprobe LSH). Recall grows with nprobe at linear candidate
    cost. ``max_list`` lazily prunes degenerate inverted lists from
    the candidate side exactly like lsh_ann_topk's ``max_bucket``
    (queries still probe other lists); list sizes mirror data density,
    so at 100 TB pair the cap with more centroids rather than relying
    on it. ``n_centroids="auto"`` sizes K ≈ n / target_list (one
    count() of the input) — essential at scale, since both the cid
    join's parallelism and the expected list size are K-bounded.

    ``salt``: the candidate join is keyed on cid alone, so its
    parallelism is bounded by K no matter the cluster size — with the
    default K=16 that leaves most of a 32-core box idle through the
    verify stage. Salting splits every inverted list into ``salt``
    deterministic sub-lists (pmod(xxhash64(member), s)) and explodes
    the QUERY side ×s — each (query, neighbor) pair still meets
    exactly once (a member lives in exactly one sub-list), so the
    output is row-identical; only the join's key space grows K → K×s.
    ``"auto"`` sizes s ≈ 2·cores/K (1 when K already covers the
    cluster — at production K ≈ n/1024 the salt is a no-op). Honest
    measurement at 20k vectors / local[32] / K=16 / nprobe=1: the
    salt alone is a wash (60.8/64.2s unsalted vs 55.8/68.6s auto) —
    at that size the wall is bound by the cosine kernel and the
    AQE-coalesced top-k window, not the join's key space; the 2×
    this op gained in round 5 (107s → ~53s) came from carrying
    per-row norms instead of re-folding them per pair (see _cosine).
    The salt's case is the shape it provably bounds: K ≪ cores with
    a verify stage heavy enough to dominate (big lists, high nprobe,
    wide vectors), where a 16-way key space caps ANY cluster at 16
    tasks."""
    if n_centroids == "auto":
        n_centroids = auto_centroids(emb.count(), target_list)
    n_centroids = int(n_centroids)
    cents = ivf_centroids(emb, n_centroids, key, vec, refine=refine)
    sims = _ivf_sims(emb, cents, key, vec)
    cand = (
        sims.where(F.col("rn") == 1)
        .select(
            F.col("id").alias("nid"), F.col("v").alias("nv"),
            F.col("vn").alias("__nn"), "cid",
        )
    )
    cand = _prune_hot_buckets(cand, max_list, col="cid")
    q = sims.where(F.col("rn") <= nprobe).select(
        F.col("id").alias("qid"), F.col("v").alias("qv"),
        F.col("vn").alias("__qn"), "cid",
    )
    if salt == "auto":
        cores = emb.sparkSession.sparkContext.defaultParallelism
        salt = max(1, min(64, (2 * cores) // max(1, n_centroids)))
    salt = int(salt)
    if salt > 1:
        cand = cand.withColumn(
            "__salt", F.pmod(F.xxhash64("nid"), F.lit(salt)).cast("int")
        )
        q = q.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        pairs = (
            q.join(cand, ["cid", "__salt"])
            .where(F.col("qid") != F.col("nid"))
            .drop("__salt")
        )
    else:
        pairs = q.join(cand, "cid").where(F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid",
        "nid",
        "cid",
        (_dot(F.col("qv"), F.col("nv")) / (F.col("__qn") * F.col("__nn"))).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias(key),
            F.col("nid").alias("neighbor_id"),
            "rank",
            "cosine",
            "cid",
        )
    )


def _prune_hot_buckets(
    b: DataFrame, max_bucket: int | None, col: str = "bucket"
) -> DataFrame:
    """Drop rows whose bucket holds > max_bucket vectors. LAZY by
    design: the over-cap bucket set is a left-anti join against a
    bucket-size aggregate planned inside the consuming query — no
    eager count() job re-scanning the per-plane projection on every
    call even when the cap never trips (that projection is the
    expensive part: P md5 folds per vector). The aggregate side is
    tiny (<= 2^P rows) and broadcast. Audit which buckets a cap would
    prune with ``hot_buckets`` (one explicit aggregate job)."""
    if max_bucket is None:
        return b
    hot = (
        b.groupBy(col)
        .agg(F.count("*").alias("__bsz"))
        .where(F.col("__bsz") > max_bucket)
        .select(col)
    )
    return b.join(F.broadcast(hot), col, "left_anti")


def hot_buckets(
    emb: DataFrame,
    planes: int,
    max_bucket: int,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """The audit report the prune itself no longer computes eagerly:
    (bucket, size, min_key, max_key) for every bucket over
    ``max_bucket`` — the id extrema are cheap map-side-combinable
    example members (a collect_list of a hot bucket's members is
    exactly the skew this audits). Run before a big ANN job to see
    what a cap will drop (pruned members can still surface via
    query-side probes in lsh_ann_topk/embedding_near_dups with
    probes > 0)."""
    b = emb.select(
        lsh_bucket(F.col(vec), planes).alias("bucket"),
        F.col(key).alias("__key"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("size"),
            F.min("__key").alias("min_key"),
            F.max("__key").alias("max_key"),
        )
        .where(F.col("size") > max_bucket)
    )


def lsh_ann_topk(
    emb: DataFrame,
    k: int = 5,
    planes: int | str = 4,
    key: str = "vec_id",
    vec: str = "embedding",
    probes: int = 0,
    probe_rank: str = "fixed",
    max_bucket: int | None = 10000,
    target_bucket: int = 1024,
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket (plus the
    ``probes`` Hamming-adjacent buckets of the query's code), exact
    cosine re-rank within. Returns (vec_id, neighbor_id, rank, cosine,
    bucket). Recall < 1 by design; the exactness oracle is
    cosine_topk. The candidate side is NOT exploded — only queries
    probe extra buckets, so candidate storage and shuffle volume stay
    one row per vector. Buckets over ``max_bucket`` are pruned from
    the CANDIDATE side (lazily — see _prune_hot_buckets): the
    in-bucket re-rank is O(bucket^2), and an oversized bucket means
    degenerate hyperplanes, not similarity. ``planes="auto"`` sizes P
    from the corpus so the expected bucket stays ~``target_bucket``."""
    if planes == "auto":
        planes = auto_planes(emb.count(), target_bucket)
    planes = int(planes)
    # no persist: the bucketed projection is pure scan-side work that
    # both join inputs recompute within the one consuming job — caching
    # it here would leak block-manager memory past the call (callers
    # that consume the result repeatedly should cache the RESULT).
    # _spread BEFORE the projection: the P md5-weight folds per vector
    # and the in-bucket verify both inherit the scan's partition count
    # (one parquet file -> one task) without it — see _spread.
    b = _spread(emb.select(key, vec)).select(
        F.col(key).alias("qid"),
        F.col(vec).alias("qv"),
        _norm(F.col(vec)).alias("__qn"),
        plane_dots(F.col(vec), planes).alias("dots"),
    ).select(
        "qid", "qv", "__qn", "dots",
        bucket_of(F.col("dots"), planes).alias("bucket"),
    )
    q = b.select("qid", "qv", "__qn", "bucket")
    if probes > 0:
        pset = (
            ranked_probe_buckets(F.col("bucket"), F.col("dots"), planes, probes)
            if probe_rank == "distance"
            else probe_buckets(F.col("bucket"), planes, probes)
        )
        q = b.select("qid", "qv", "__qn", F.explode(pset).alias("bucket"))
    c = b.select(
        F.col("qid").alias("nid"), F.col("qv").alias("nv"),
        F.col("__qn").alias("__nn"), "bucket",
    )
    c = _prune_hot_buckets(c, max_bucket)
    pairs = q.join(c, "bucket").where(F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid",
        "nid",
        "bucket",
        (_dot(F.col("qv"), F.col("nv")) / (F.col("__qn") * F.col("__nn"))).alias("cosine"),
    )
    if probes > 0:
        # a (q, n) pair can collide in several probed buckets — keep
        # one row per pair (the candidate's own bucket is reported).
        # min on BOTH columns: cosine is functionally dependent on
        # (qid, nid) so any pick agrees, but min says so structurally
        # (first() would be order-dependent in general)
        scored = scored.groupBy("qid", "nid").agg(
            F.min("bucket").alias("bucket"), F.min("cosine").alias("cosine")
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
    planes: int | str = 4,
    key: str = "vec_id",
    vec: str = "embedding",
    max_bucket: int | None = 10000,
    target_bucket: int = 1024,
    probes: int = 0,
    probe_rank: str = "distance",
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, LSH-bucketed
    candidate generation (a < b). Hot buckets over ``max_bucket`` are
    pruned from the CANDIDATE side — near-dup mining inside a
    degenerate bucket is O(bucket^2) boilerplate, the same hot-key
    blowup ``max_bucket`` bounds in pipeline.dedup's band join.
    ``planes="auto"`` sizes P from the corpus size.

    ``probes > 0`` is the recall path for pruned-bucket members (same
    design as lsh_ann_topk): the query side — never pruned — explodes
    over the Hamming-adjacent probe buckets, so a vector whose own
    bucket was pruned still pairs with near-dups in neighboring
    buckets; only pairs BOTH of whose members sit inside the same
    pruned bucket stay dropped (that O(bucket^2) interior is exactly
    what the cap exists to bound). ``probe_rank="distance"`` flips the
    smallest-margin planes first (Lv et al.); ``"fixed"`` uses plane
    order. Pair output is orientation-normalized (a < b) and exact
    cosine keeps the threshold semantics unchanged — probing only ever
    ADDS candidate pairs."""
    if planes == "auto":
        planes = auto_planes(emb.count(), target_bucket)
    planes = int(planes)
    # _spread BEFORE the projection — same rationale as lsh_ann_topk:
    # without it the plane folds AND the broadcast-hash-join verify
    # stage (stream side = this subtree) run at the parquet scan's
    # parallelism, one task per input file.
    b = _spread(emb.select(key, vec)).select(
        F.col(key).alias("a"),
        F.col(vec).alias("va"),
        _norm(F.col(vec)).alias("__na"),
        plane_dots(F.col(vec), planes).alias("dots"),
    ).select(
        "a", "va", "__na", "dots",
        bucket_of(F.col("dots"), planes).alias("bucket"),
    )
    cand = _prune_hot_buckets(
        b.select(
            F.col("a").alias("b"), F.col("va").alias("vb"),
            F.col("__na").alias("__nb"), "bucket",
        ),
        max_bucket,
    )
    if probes > 0:
        pset = (
            ranked_probe_buckets(F.col("bucket"), F.col("dots"), planes, probes)
            if probe_rank == "distance"
            else probe_buckets(F.col("bucket"), planes, probes)
        )
        q = b.select("a", "va", "__na", F.explode(pset).alias("bucket"))
        # probing sees a pair from either end — normalize orientation;
        # cosine is bit-identical under the swap (commutative products,
        # same index-order fold), so the distinct collapses duplicates
        scored = (
            q.join(cand, "bucket")
            .where(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b"),
                (_dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb"))).alias("cosine"),
            )
            .distinct()
        )
    else:
        q = b.select("a", "va", "__na", "bucket")
        scored = (
            q.join(cand, "bucket")
            .where(F.col("a") < F.col("b"))
            .select(
                "a",
                "b",
                (_dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb"))).alias("cosine"),
            )
            .distinct()
        )
    return scored.where(F.col("cosine") >= threshold)
