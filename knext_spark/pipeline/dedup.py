"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard. All candidate generation is inverted-index / LSH-bucket joins
(O(colliding pairs)), never cross joins; all hashing is md5-derived so
the DuckDB oracle can reproduce values exactly.

At 100 TB: exact dedup is one hash-shuffle on a 32-byte key; MinHash
signatures are one scan + one groupBy(doc) (map-side combinable);
band-bucket joins shuffle only (band_key) pairs — hot buckets (boiler-
plate shingles) are the skew risk, bounded by ``max_bucket`` pruning
(a bucket with >max_bucket docs is boilerplate, not duplication —
standard practice, logged out rather than silently dropped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from knext_spark.pipeline.text import tokens_col


def norm_text(text_col: str = "text") -> Column:
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized-text md5; keeps the smallest ``key``
    per group (deterministic), adds group size."""
    h = F.md5(norm_text(text_col).cast("binary")).alias("content_hash")
    w = Window.partitionBy("content_hash").orderBy(key)
    return (
        df.select(key, h)
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "group_size", F.count("*").over(Window.partitionBy("content_hash"))
        )
        .where(F.col("rn") == 1)
        .select(key, "content_hash", "group_size")
    )


def shingles_col(text_col: str = "text", w: int = 3) -> Column:
    """Distinct word w-shingles (space-joined token windows)."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    return F.when(
        n >= w,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (w - 1)),
                lambda i: F.array_join(F.slice(toks, i, w), " "),
            )
        ),
    ).otherwise(
        F.when(n > 0, F.array(F.array_join(toks, " "))).otherwise(
            F.array().cast("array<string>")
        )
    )


def _seed_hash(seed: int, shingle: Column) -> Column:
    return F.md5(F.concat(F.lit(f"{seed}:"), shingle).cast("binary"))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    k: int = 8,
    w: int = 3,
) -> DataFrame:
    """(key, mh_0..mh_{k-1}) — k MinHash values: per seed, the min md5
    of seed-prefixed shingles. One explode + one groupBy(key) with k
    min() aggregates (all map-side combinable — partial mins merge)."""
    sh = df.select(key, F.explode(shingles_col(text_col, w)).alias("sh"))
    aggs = [F.min(_seed_hash(s, F.col("sh"))).alias(f"mh_{s}") for s in range(k)]
    return sh.groupBy(key).agg(*aggs)


def lsh_bands(sig: DataFrame, key: str = "doc_id", bands: int = 4, rows: int = 2) -> DataFrame:
    """Signature -> (key, band, band_key): band_key = md5 of the band's
    concatenated minhashes. Docs sharing any band_key are candidates."""
    out = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        out.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols).cast("binary")).alias("band_key"),
            )
        )
    return sig.select(key, F.explode(F.array(*out)).alias("bk")).select(
        key, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def lsh_candidate_pairs(
    sig: DataFrame,
    key: str = "doc_id",
    bands: int = 4,
    rows: int = 2,
    max_bucket: int = 10000,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing >= 1 LSH band bucket.
    Buckets larger than ``max_bucket`` are pruned (boilerplate guard).

    Pairs are generated IN-ROW from each bucket's collected member
    list instead of a bucket-keyed self-join: the self-join (plus the
    separate size aggregate) consumed the band projection three times,
    and exchange reuse never fires across differently-pruned subtrees,
    so the whole signature pipeline was recomputed per consumer
    (guide §2.4 — measured: 40 parquet scans of the corpus in one
    minhash_dedup plan). One groupBy collects each bucket once; the
    size gate is a filter on the collected array; memory stays bounded
    because the second explode fans out one row per (bucket, member)
    carrying the <= max_bucket member array, never the full pair
    array."""
    bk = lsh_bands(sig, key, bands, rows)
    gate = F.size("ms") >= 2
    if max_bucket is not None:
        # bound the collected array BEFORE aggregation: keep at most
        # max_bucket+1 rows per bucket (window row_number — sorts
        # spill gracefully, unlike an aggregation buffer holding a
        # boilerplate bucket's full member array). A bucket retaining
        # max_bucket+1 rows is over-cap and the size gate drops it
        # whole, so which members were retained never matters and the
        # output is identical to collect-then-gate.
        wcap = Window.partitionBy("band", "band_key").orderBy(key)
        bk = bk.withColumn("__rn", F.row_number().over(wcap)).where(
            F.col("__rn") <= max_bucket + 1
        ).drop("__rn")
        gate = gate & (F.size("ms") <= max_bucket)
    buckets = (
        bk.groupBy("band", "band_key")
        .agg(F.collect_list(key).alias("ms"))
        .where(gate)
    )
    return (
        buckets.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode(F.filter("ms", lambda y: y > F.col("a"))).alias("b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    w: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    max_posting: int = 10000,
    verify: str = "broadcast",
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs.

    Without ``candidates``: inverted-index join (explode shingles,
    self-join on shingle, group to intersection counts) — generates
    only pairs sharing >= 1 shingle. With ``candidates`` (e.g. from
    LSH): verifies just those pairs by broadcasting the pair list onto
    the corpus and intersecting the two shingle sets in-row (see the
    branch comment). Returns (a, b, jaccard >= threshold).

    ``verify`` (candidates path only) is the scale governor for the
    pair list: ``"broadcast"`` (default) ships the melted pairs to
    every executor — the corpus is scanned once and never shuffled,
    the right shape while the pair set is duplication-mass-sized (it
    is bounded by bands x C(max_bucket, 2) per bucket, so size
    ``max_bucket`` with broadcastability in mind). ``"index"`` keeps
    the exploded-shingle index joins instead: slower (corpus-window
    shuffles) but with no broadcast-size ceiling — use it when the
    pair list is too large to broadcast (the 8 GB / 512M-row cap
    fails loudly, not wrong).

    ``max_posting`` (index path only) caps posting lists: a shingle
    appearing in more documents than this is boilerplate, not
    duplication, and its posting list alone would generate O(list^2)
    pairs — the quadratic hot-key blowup at 100 TB. Pruned shingles
    still count toward each document's shingle-set SIZE (the Jaccard
    denominator stays exact); only the intersection contribution of the
    hot shingle is lost, which can only LOWER a pair's estimated
    jaccard — a pair of true near-duplicates shares many non-boilerplate
    shingles and still surfaces. Mirrors ``max_bucket`` in
    ``lsh_candidate_pairs``; the prune is logged, not silent.
    """
    if candidates is not None and verify == "index":
        # no-ceiling fallback: exploded-shingle index joins, pruned to
        # candidate documents per side (cost linear in the candidate
        # docs' windows; the corpus shuffles but nothing broadcasts)
        sh = df.select(key, shingles_col(text_col, w).alias("shs"))
        sizes = sh.select(key, F.size("shs").alias("n"))
        ex = sh.select(key, F.explode("shs").alias("sh"))
        pa = ex.select(F.col(key).alias("a"), "sh")
        pb = ex.select(F.col(key).alias("b"), "sh")
        inter = (
            candidates.select("a", "b")
            .join(pa, "a")
            .join(pb, ["b", "sh"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("inter"))
        )
        na = sizes.select(F.col(key).alias("a"), F.col("n").alias("na"))
        nb = sizes.select(F.col(key).alias("b"), F.col("n").alias("nb"))
        out = (
            inter.join(na, "a")
            .join(nb, "b")
            .select(
                "a",
                "b",
                (
                    F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
                ).alias("jaccard"),
            )
        )
        return out.where(F.col("jaccard") >= threshold)
    if candidates is not None:
        # Verify candidate pairs by IN-ROW set intersection instead of
        # exploded-shingle index joins. The candidate pair set is
        # duplication-mass-sized (tiny relative to the corpus), so it
        # broadcasts; one broadcast join per side attaches each pair's
        # document text WITHOUT shuffling the corpus, and the Jaccard
        # arithmetic runs on two carried shingle arrays. The previous
        # index formulation shuffled every candidate document's
        # exploded shingle rows through two joins — corpus-window-sized
        # exchanges to verify a tiny pair set (guide §2.3/§3; measured
        # 10x bench: minhash_dedup 28.2s -> 12.9s). Shingles are
        # computed AFTER the join, so only paired documents pay them.
        # Melted single broadcast: each pair explodes into one row per
        # side keyed on that side's doc id, so ONE broadcast hash join
        # (keyed on the doc id) attaches text to both roles — two
        # per-side joins would be keyed differently and broadcast the
        # candidate pipeline twice (broadcast exchanges with different
        # hash keys never reuse; measured as a full second candidate
        # recompute). Regrouping by (a, b) then pairs the two texts
        # with a tiny |pairs|-sized exchange.
        melted = candidates.select(
            "a",
            "b",
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("role"), F.col("a").alias("k")),
                    F.struct(F.lit(1).alias("role"), F.col("b").alias("k")),
                )
            ).alias("u"),
        ).select("a", "b", F.col("u.role").alias("role"), F.col("u.k").alias("k"))
        j = df.select(
            F.col(key).alias("k"), F.col(text_col).alias("__t")
        ).join(F.broadcast(melted), "k")
        texted = j.groupBy("a", "b").agg(
            F.max(F.when(F.col("role") == 0, F.col("__t"))).alias("__ta"),
            F.max(F.when(F.col("role") == 1, F.col("__t"))).alias("__tb"),
        )
        sa = shingles_col("__ta", w)
        sb = shingles_col("__tb", w)
        scored = texted.select(
            "a",
            "b",
            F.size(F.array_intersect(sa, sb)).alias("inter"),
            F.size(sa).alias("na"),
            F.size(sb).alias("nb"),
        )
        out = scored.where(F.col("inter") > 0).select(
            "a",
            "b",
            (
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("jaccard"),
        )
        return out.where(F.col("jaccard") >= threshold)
    sh = df.select(key, shingles_col(text_col, w).alias("shs"))
    sizes = sh.select(key, F.size("shs").alias("n"))
    ex = sh.select(key, F.explode("shs").alias("sh"))
    if max_posting is not None:
        hot = (
            ex.groupBy("sh")
            .agg(F.count("*").alias("df_"))
            .where(F.col("df_") > max_posting)
            .select("sh")
        )
        n_hot = hot.count()
        if n_hot:
            import logging

            logging.getLogger(__name__).warning(
                "ngram_jaccard_pairs: pruning %d shingle(s) with posting "
                "list > %d (boilerplate guard)", n_hot, max_posting,
            )
            ex = ex.join(F.broadcast(hot), "sh", "left_anti")
    pa = ex.select(F.col(key).alias("a"), "sh")
    pb = ex.select(F.col(key).alias("b"), "sh")
    inter = (
        pa.join(pb, "sh")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col(key).alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(key).alias("b"), F.col("n").alias("nb"))
    out = (
        inter.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            (
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= threshold)


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    k: int = 8,
    w: int = 3,
    bands: int = 4,
    rows: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash-LSH dedup: shingle -> minhash -> band-bucket join ->
    exact-Jaccard verify. Returns confirmed (a, b, jaccard) pairs."""
    sig = minhash_signatures(df, text_col, key, k, w)
    cand = lsh_candidate_pairs(sig, key, bands, rows)
    return ngram_jaccard_pairs(df, text_col, key, w, threshold, candidates=cand)


def _md5_bit(col: Column, bit: int) -> Column:
    """Bit ``bit`` (0 = lsb of first nibble) of md5(col), via hex-digit
    value — identical logic expressible in DuckDB (('0x'||digit)::int)."""
    return _hex_bit(F.md5(col.cast("binary")), bit)


def _hex_bit(hexcol: Column, bit: int) -> Column:
    """Same bit extraction as :func:`_md5_bit`, but over an already-
    computed md5 hex column — callers that need many bits of ONE hash
    project the md5 once and extract per-bit, instead of trusting
    common-subexpression elimination to dedupe ``bits`` md5 calls."""
    nibble = F.substring(hexcol, bit // 4 + 1, 1)
    val = F.conv(nibble, 16, 10).cast("int")
    return F.floor(val / (2 ** (bit % 4))) % 2


def simhash(
    df: DataFrame, text_col: str = "text", key: str = "doc_id", bits: int = 16
) -> DataFrame:
    """SimHash fingerprint: per bit, the sign of sum over tokens of
    (+1 if md5(token) bit set else -1); fingerprint = the bit-packed
    integer. Token multiplicity counts (frequency-weighted), matching
    the classic Charikar construction over a bag of features.

    The token md5 is projected ONCE below the aggregation and every
    bit reads the shared hex column — one md5 per token occurrence
    instead of ``bits`` (values identical; guide §1.2 per-task work)."""
    tok = df.select(key, F.explode(tokens_col(text_col)).alias("t")).select(
        key, F.md5(F.col("t").cast("binary")).alias("h")
    )
    aggs = [
        F.sum(_hex_bit(F.col("h"), b) * 2 - 1).alias(f"s_{b}") for b in range(bits)
    ]
    sums = tok.groupBy(key).agg(*aggs)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"s_{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select(key, fp.cast("long").alias("simhash"))


def _hamming_masks(bits: int, max_hamming: int) -> list[int]:
    """All XOR masks of popcount <= max_hamming over ``bits`` bits
    (0 included): v2 is within Hamming distance of v1 iff
    v1 ^ v2 is one of these."""
    from itertools import combinations

    masks = [0]
    for d in range(1, max_hamming + 1):
        for combo in combinations(range(bits), d):
            masks.append(sum(1 << i for i in combo))
    return masks


def _simhash_pairs_by_radius(
    fps: DataFrame, key: str, masks: list[int]
) -> DataFrame:
    """All (a < b, hamming) pairs within the Hamming radius, by XOR-mask
    enumeration over the DISTINCT fingerprint values: the value space is
    2^bits, so for narrow fingerprints the distinct-value table is tiny
    and the candidate fan-out is |distinct| x |masks| — linear in the
    corpus plus the true output, never the O(bucket^2) block-collision
    blowup of the pigeonhole join (guide §2.5 hot-key quadratics;
    measured 389.7M block-join candidates -> 0 at bits=16/10x bench).

    Each unordered doc pair surfaces exactly once: an (a, b) pair with
    fingerprints (va != vb) is generated only from the (v1=va, v2=vb)
    direction (the mirrored direction yields (b, a), dropped by a < b),
    and equal-fingerprint pairs are generated only from mask 0 — so no
    distinct pass is needed at all.

    The explicit repartition("simhash") is the shared-exchange point:
    fps is consumed three times (distinct values + both doc sides),
    all keyed on the fingerprint, and every consumer uses fps's full
    (key, simhash) output — so the subtrees below the exchange
    canonicalize identically and ReuseExchange computes the expensive
    fingerprint aggregation ONCE (without it, each consumer re-runs
    the tokenize + md5 + groupBy pipeline; the repo's measured rule is
    that reuse only fires when consumers cannot prune differently)."""
    fps = fps.repartition("simhash")
    vals = fps.select(F.col("simhash").alias("v1")).distinct()
    flips = vals.select(
        "v1",
        F.explode(
            F.array(*[F.lit(m).cast("long") for m in masks])
        ).alias("m"),
    ).select("v1", F.col("v1").bitwiseXOR(F.col("m")).alias("v2"))
    flips = flips.join(
        vals.select(F.col("v1").alias("v2")), "v2", "left_semi"
    )
    a = fps.select(F.col(key).alias("a"), F.col("simhash").alias("v1"))
    b = fps.select(F.col(key).alias("b"), F.col("simhash").alias("v2"))
    ham = F.bit_count(F.col("v1").bitwiseXOR(F.col("v2")))
    return (
        a.join(flips, "v1")
        .join(b, "v2")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", ham.alias("hamming"))
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    bits: int = 16,
    max_hamming: int = 2,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Two candidate-generation strategies, both returning EXACTLY the set
    of pairs at distance <= max_hamming (chunks > max_hamming makes the
    pigeonhole candidate set a superset of it, so the strategies agree
    row-for-row):

    - **Radius enumeration** (narrow fingerprints, <= 1024 XOR masks):
      enumerate every mask of popcount <= max_hamming over the distinct
      fingerprint values and join doc groups — cost O(n + distinct x
      masks + output). A narrow fingerprint makes the pigeonhole
      blocks degenerate (bits=16 / chunks=4 leaves 16 block values, so
      block candidates grow as n^2/16 per chunk); this path replaces
      that quadratic with the output's own size.
    - **Pigeonhole chunks** (wide fingerprints): split into ``chunks``
      blocks; any pair within distance d < chunks shares >= 1 exact
      block -> block-equality join generates candidates, popcount
      verifies. At bits=64 the mask count (2081 at max_hamming=2) would
      multiply the corpus instead; wide blocks rarely collide, so the
      block join is the cheaper superset there."""
    assert chunks > max_hamming
    fps = simhash(df, text_col, key, bits)
    masks = _hamming_masks(bits, max_hamming)
    if len(masks) <= 1024:
        return _simhash_pairs_by_radius(fps, key, masks)
    width = bits // chunks
    block = lambda c: F.floor(  # noqa: E731
        F.col("simhash") / (2 ** (c * width))
    ) % (2**width)
    blocks = fps.select(
        key,
        "simhash",
        F.explode(
            F.array(*[F.struct(F.lit(c).alias("c"), block(c).alias("bv")) for c in range(chunks)])
        ).alias("blk"),
    ).select(key, "simhash", F.col("blk.c").alias("c"), F.col("blk.bv").alias("bv"))
    a = blocks.select(F.col(key).alias("a"), F.col("simhash").alias("fa"), "c", "bv")
    b = blocks.select(F.col(key).alias("b"), F.col("simhash").alias("fb"), "c", "bv")
    # hamming is a pure function of the pair, so computing it and
    # filtering BEFORE the dedup commutes with distinct — the distinct's
    # exchange then carries (a, b, hamming) for only the pairs that
    # already verified, instead of (a, b, fa, fb) for every block-
    # collision candidate (narrower rows AND far fewer of them; a pair
    # colliding in several blocks is the only duplication left)
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        a.join(b, ["c", "bv"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dedup_clusters(
    spark,
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    checkpoint_dir: str | None = None,
    pairs: DataFrame | None = None,
    keep: str = "min",
    **minhash_kwargs,
) -> DataFrame:
    """Transitive fuzzy-dedup clustering — the shape corpus-scale LLM
    dedup actually takes: confirmed near-dup PAIRS alone under-remove
    (A~B and B~C but the A-C pair never collided in any band), so the
    pair graph is closed transitively and one canonical doc survives
    per CLUSTER.

    pairs (default: :func:`minhash_dedup_pairs` with
    ``**minhash_kwargs``) -> connected components over the pair graph
    (graph/components.py: alternating star contraction, checkpointed)
    -> every input doc labeled (key, cluster, is_canonical) where
    cluster = min member key (docs in no pair are their own
    singleton cluster) and is_canonical marks the kept doc
    (``keep="min"``: the min key — deterministic, the only keep rule
    whose canonical is also the cluster id).

    Scale: the pair graph is tiny relative to the corpus (only
    confirmed duplicates), so the CC superstep cost is bounded by
    duplication mass, not corpus size; the final labeling is one
    left join from the corpus to the CC state on the doc key.
    """
    if keep != "min":
        raise ValueError(f"unsupported keep rule: {keep!r} (only 'min')")
    if pairs is None:
        pairs = minhash_dedup_pairs(df, text_col=text_col, key=key, **minhash_kwargs)
    from knext_spark.graph.components import connected_components

    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    res = connected_components(
        spark, edges, checkpoint_dir=checkpoint_dir, run_id="dedup_clusters"
    )
    state = res.state.select(
        F.col("node").alias(key), F.col("component").alias("cluster")
    )
    return (
        df.select(key)
        .join(state, key, "left")
        .select(
            key,
            F.coalesce("cluster", F.col(key)).alias("cluster"),
            (F.coalesce("cluster", F.col(key)) == F.col(key)).alias("is_canonical"),
        )
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    max_docs: int = 2,
    min_chars: int = 10,
    sep: str = "\n",
    broadcast_boilerplate: bool = True,
) -> DataFrame:
    """CCNet-style line-level boilerplate removal (web-corpus prep:
    nav bars, cookie banners, footers repeat verbatim across a site's
    pages and must be stripped from *within* documents, not by
    dropping whole documents).

    A line is boilerplate when its normalized form (trimmed,
    lowercased) occurs in more than ``max_docs`` distinct documents;
    boilerplate lines are dropped from every document. Lines whose
    normalized form is shorter than ``min_chars`` characters are
    exempt (always kept): hashing tiny lines would strip blank
    separators and list markers that merely look alike.

    Returns ``(key, n_lines, n_kept, clean_text)`` with line order
    preserved in ``clean_text``; a fully-boilerplate document yields
    ``clean_text = ''`` (kept, so the caller sees the drop rather
    than losing the row).

    Scale: one posexplode scan; the doc-frequency aggregate runs on
    the per-doc-distinct (line_hash, key) projection (map-side
    combinable) and is filtered to ``> max_docs`` BEFORE the join
    back, so only the boilerplate hash set — small by construction,
    each entry standing for many duplicate lines — ships to every
    executor (broadcast by default); the rebuild is the same
    array_sort(collect_list(struct)) fold the knext aggregation uses
    (reference parity: knext joins comma-lists, genes.py:235-262
    analogue — here it is newline-joined lines).
    """
    norm = F.lower(F.trim(F.col("line")))
    lines = (
        df.select(
            key, F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line")
        )
        .withColumn("lhash", F.md5(norm))
        .withColumn("exempt", F.length(norm) < min_chars)
    )
    boiler = (
        lines.where(~F.col("exempt"))
        .select("lhash", key)
        .distinct()
        .groupBy("lhash")
        .agg(F.count("*").alias("doc_freq"))
        .where(F.col("doc_freq") > max_docs)
    )
    if broadcast_boilerplate:
        boiler = F.broadcast(boiler)
    keep = F.col("doc_freq").isNull() | F.col("exempt")
    return (
        lines.join(boiler, "lhash", "left")
        .groupBy(key)
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("pos", "line")))
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("clean_text"),
        )
    )


def dedup_against(
    new: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    w: int = 3,
    k: int = 8,
    bands: int = 4,
    rows: int = 2,
    threshold: float = 0.5,
    max_bucket: int = 10000,
) -> DataFrame:
    """Incremental dedup: flag every NEW document that duplicates the
    SEEN corpus (the daily-crawl-vs-historical-corpus shape — dedup
    within a batch is :func:`minhash_dedup_pairs`; this is dedup
    ACROSS the corpus boundary, without ever pairing seen docs with
    each other). Flag-don't-drop, one row per new doc:

    (key, exact_dup, exact_dup_of, near_dup, near_dup_of,
    near_jaccard) — ``exact_dup_of`` = smallest seen key with the same
    normalized-md5 content hash; ``near_dup_of`` = smallest seen key
    whose verified w-shingle Jaccard >= ``threshold`` (with that
    pair's Jaccard), candidates generated by cross-side MinHash-LSH
    band buckets exactly like :func:`lsh_candidate_pairs` but
    new x seen only.

    Scale: the seen side ships as band buckets + signatures (k + bands
    columns per doc, not text); buckets above ``max_bucket`` on either
    side are pruned (the boilerplate guard — same failure direction as
    lsh_candidate_pairs); verification joins explode only candidate
    docs' shingles. In steady state the seen side's signatures/buckets
    are precomputed once and appended per batch — each increment costs
    O(new batch), not O(corpus).
    """
    nh = new.select(
        F.col(key).alias("a"),
        F.md5(norm_text(text_col).cast("binary")).alias("h"),
    )
    sh_seen = seen.select(
        F.col(key).alias("b"),
        F.md5(norm_text(text_col).cast("binary")).alias("h"),
    )
    exact = (
        nh.join(sh_seen, "h", "left")
        .groupBy("a")
        .agg(F.min("b").alias("exact_dup_of"))
    )

    bk_new = lsh_bands(minhash_signatures(new, text_col, key, k, w), key, bands, rows)
    bk_seen = lsh_bands(
        minhash_signatures(seen, text_col, key, k, w), key, bands, rows
    )
    if max_bucket is not None:
        sizes_n = bk_new.groupBy("band", "band_key").agg(F.count("*").alias("sz"))
        sizes_s = bk_seen.groupBy("band", "band_key").agg(F.count("*").alias("sz"))
        bk_new = bk_new.join(
            sizes_n.where(F.col("sz") <= max_bucket).select("band", "band_key"),
            ["band", "band_key"],
        )
        bk_seen = bk_seen.join(
            sizes_s.where(F.col("sz") <= max_bucket).select("band", "band_key"),
            ["band", "band_key"],
        )
    cand = (
        bk_new.select(F.col(key).alias("a"), "band", "band_key")
        .join(
            bk_seen.select(F.col(key).alias("b"), "band", "band_key"),
            ["band", "band_key"],
        )
        .select("a", "b")
        .distinct()
    )

    shs_new = new.select(
        F.col(key).alias("a"), shingles_col(text_col, w).alias("shs")
    )
    shs_seen = seen.select(
        F.col(key).alias("b"), shingles_col(text_col, w).alias("shs")
    )
    na = shs_new.select("a", F.size("shs").alias("na"))
    nb = shs_seen.select("b", F.size("shs").alias("nb"))
    ex_new = shs_new.join(cand.select("a").distinct(), "a").select(
        "a", F.explode("shs").alias("sh")
    )
    ex_seen = shs_seen.join(cand.select("b").distinct(), "b").select(
        "b", F.explode("shs").alias("sh")
    )
    inter = (
        ex_new.join(ex_seen, "sh")
        .join(cand, ["a", "b"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    verified = (
        inter.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            (
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(float(threshold)))
    )
    wnear = Window.partitionBy("a").orderBy("b")
    near = (
        verified.withColumn("__rn", F.row_number().over(wnear))
        .where(F.col("__rn") == 1)
        .select(
            "a",
            F.col("b").alias("near_dup_of"),
            F.col("jaccard").alias("near_jaccard"),
        )
    )
    return (
        new.select(F.col(key).alias("a"))
        .distinct()
        .join(exact, "a", "left")
        .join(near, "a", "left")
        .select(
            F.col("a").alias(key),
            F.col("exact_dup_of").isNotNull().alias("exact_dup"),
            "exact_dup_of",
            F.col("near_dup_of").isNotNull().alias("near_dup"),
            "near_dup_of",
            "near_jaccard",
        )
    )


def _window_occurrences(
    df: DataFrame, text_col: str, key: str, w: int
) -> DataFrame:
    """Every ``w``-token window of every document as ``(key, pos,
    sh)`` — 0-based start position and the space-joined shingle text.
    One narrow scan + explode, no shuffle; the n >= w guard matters
    because Spark's ``sequence(0, n-w)`` DESCENDS when n < w instead
    of returning empty."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    wins = df.select(
        F.col(key),
        F.when(
            n >= w,
            F.transform(
                F.sequence(F.lit(0), n - w),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.array_join(F.slice(toks, i + 1, w), " ").alias("sh"),
                ),
            ),
        ).alias("wins"),
    ).where(F.col("wins").isNotNull())
    return wins.select(F.col(key), F.explode("wins").alias("u")).select(
        key, F.col("u.pos").alias("pos"), F.col("u.sh").alias("sh")
    )


def _merge_hit_spans(hits: DataFrame, key: str, w: int) -> DataFrame:
    """Merge flagged window start positions ``(key, pos)`` into
    maximal ``(key, span_start, span_end, n_tokens)`` intervals, each
    window covering ``[pos, pos + w - 1]``: one running-max window per
    document, pure integer arithmetic."""
    wdoc = Window.partitionBy(key).orderBy("pos")
    prev_end = F.max(F.col("pos") + (w - 1)).over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.select(
        F.col(key),
        F.col("pos"),
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    span_id = F.sum("is_new").over(
        wdoc.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.withColumn("span_id", span_id)
        .groupBy(key, "span_id")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (w - 1)).cast("long").alias("span_end"),
        )
        .select(
            key,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("n_tokens"),
        )
    )


def dup_spans(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    w: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal cross-document duplicated token spans per document —
    the span-extraction shape of exact-substring dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    rather than dropping whole documents that merely *contain* a
    repeated region (minhash/jaccard above) or repeated lines
    (:func:`line_dedup`), report the exact token ranges a trainer
    should cut.

    A token position is duplicated when some ``w``-token window
    covering it occurs verbatim in >= ``min_docs`` distinct documents;
    overlapping or adjacent duplicated windows merge into maximal
    spans. Returns ``(key, span_start, span_end, n_tokens)`` with
    0-based inclusive token indices (the caller's tokenization is
    :func:`knext_spark.pipeline.text.tokens_col`, same as every other
    token operator here). Documents shorter than ``w`` tokens yield no
    rows; a document with no cross-doc duplication yields no rows.

    Scale shape (the reason this is NOT a suffix array): one
    posexplode-style window scan; the doc-frequency aggregate runs on
    the per-doc-distinct (shingle, key) projection (map-side
    combinable); the duplicated-shingle set comes back via a SEMI
    join on the shingle — cost linear in corpus windows, never a
    pairwise explosion, so a boilerplate shingle in a million
    documents costs exactly its own occurrences (no ``max_posting``
    cap needed, unlike the pairwise :func:`ngram_jaccard_pairs`). The
    span merge is one running-max window per document — all integer
    arithmetic, hash-exact against the DuckDB oracle (driver row
    ``dup_spans``)."""
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    occ = _window_occurrences(df, text_col, key, w)
    dup = (
        occ.select("sh", key)
        .dropDuplicates(["sh", key])
        .groupBy("sh")
        .agg(F.count("*").alias("df_"))
        .where(F.col("df_") >= min_docs)
        .select("sh")
    )
    hits = occ.join(dup, "sh", "left_semi").select(key, "pos")
    return _merge_hit_spans(hits, key, w)


def contaminated_spans(
    df: DataFrame,
    ref: DataFrame,
    text_col: str = "text",
    ref_text_col: str = "text",
    key: str = "doc_id",
    w: int = 5,
) -> DataFrame:
    """Decontamination span extraction: maximal token spans of each
    training document (``df``) that appear verbatim anywhere in a
    reference corpus (``ref`` — an eval benchmark, a test split, a
    blocklist). The cross-corpus twin of :func:`dup_spans` and the
    WHERE companion to the HOW-MUCH screen
    (:func:`knext_spark.pipeline.contamination.contamination`, which
    reports per-doc hit ratios for threshold policies): a
    training-token position is contaminated when some ``w``-token
    window covering it occurs in any reference document (GPT-3
    appendix C / PaLM-style n-gram overlap); overlapping or adjacent
    contaminated windows merge into maximal spans a trainer can cut
    instead of dropping the whole document.

    Returns ``(key, span_start, span_end, n_tokens)`` with 0-based
    inclusive token indices under the shared
    :func:`knext_spark.pipeline.text.tokens_col` tokenization. Clean
    documents and documents shorter than ``w`` tokens yield no rows —
    downstream either drops flagged docs or cuts just the spans.

    Scale shape: the reference side reduces to its DISTINCT shingle
    set (benchmarks are tiny next to the corpus, so after the distinct
    this is often broadcastable — Spark's AQE/stats pick that up; at
    1000-executor scale with a big blocklist the semi join hash-
    shuffles on the shingle, still linear in corpus windows, never
    pairwise). The merge is the same per-document running-max window
    as :func:`dup_spans`. All integers — hash-exact against the
    DuckDB oracle (driver row ``contaminated_spans``)."""
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    occ = _window_occurrences(df, text_col, key, w)
    # ref needs only its text column; synthesize a constant key so the
    # shared window scan never assumes a ref schema beyond the text
    ref_sh = (
        _window_occurrences(
            ref.select(F.lit(0).alias("__rk"), F.col(ref_text_col).alias("__rt")),
            "__rt",
            "__rk",
            w,
        )
        .select("sh")
        .dropDuplicates(["sh"])
    )
    hits = occ.join(ref_sh, "sh", "left_semi").select(key, "pos")
    return _merge_hit_spans(hits, key, w)
