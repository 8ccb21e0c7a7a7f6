"""Round-2 operator hardening tests: posting-list caps, multiprobe
LSH recall, partitioned TSV export parity, cache hygiene."""

from __future__ import annotations

import csv
import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------- ngram posting cap
def _boiler_docs(spark):
    common = "shared boiler plate sentence repeated across every doc"
    rows = [(i, f"{common} unique{i} token{i} word{i}") for i in range(30)]
    # one true near-dup pair: shared UNIQUE content (low-df shingles)
    rows.append((100, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta iota"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngram_posting_cap_bounds_pairs(spark):
    from knext_spark.pipeline.dedup import ngram_jaccard_pairs

    docs = _boiler_docs(spark)
    uncapped = ngram_jaccard_pairs(
        docs, w=3, threshold=0.01, max_posting=None
    ).collect()
    capped = ngram_jaccard_pairs(
        docs, w=3, threshold=0.01, max_posting=5
    ).collect()
    # without the cap the boilerplate shingle makes all 30 docs pairwise
    # candidates (quadratic blowup); with it only low-df evidence counts
    assert len(uncapped) >= 30 * 29 // 2
    assert len(capped) < len(uncapped)
    capped_pairs = {(r["a"], r["b"]) for r in capped}
    # the genuine near-dup pair (shared low-df shingles) must survive
    assert (100, 101) in capped_pairs
    # boilerplate-only pairs must be gone
    assert not any(a < 100 and b < 100 for a, b in capped_pairs)


def test_ngram_cap_noop_below_threshold(spark):
    """On the real documents table no shingle reaches the default cap,
    so the capped and uncapped results are identical (keeps the
    driver's ngram_jaccard contract row byte-stable)."""
    from knext_spark.pipeline.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sorted(
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(docs, w=3, threshold=0.1).collect()
    )
    b = sorted(
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(
            docs, w=3, threshold=0.1, max_posting=None
        ).collect()
    )
    assert a == b


# ------------------------------------------------- multiprobe LSH ANN
def _recall(approx, exact):
    want = {(r["vec_id"], r["neighbor_id"]) for r in exact}
    got = {(r["vec_id"], r["neighbor_id"]) for r in approx}
    return len(got & want) / len(want)


def test_multiprobe_improves_recall(spark):
    from knext_spark.pipeline import cosine_topk
    from knext_spark.pipeline.similarity import lsh_ann_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = cosine_topk(emb, k=3).collect()
    # measured on this table (500 vecs, deterministic md5 hyperplanes):
    # planes=3: 0.239 / 0.507 / 0.633 recall at probes 0 / 2 / 3
    # planes=6: 0.063 -> 0.276 at probes 0 -> 6 (monotone)
    r0 = _recall(lsh_ann_topk(emb, k=3, planes=3, probes=0).collect(), exact)
    r2 = _recall(lsh_ann_topk(emb, k=3, planes=3, probes=2).collect(), exact)
    r3 = _recall(lsh_ann_topk(emb, k=3, planes=3, probes=3).collect(), exact)
    assert r2 > r0  # probing 1-bit-adjacent buckets recovers neighbors
    assert r3 >= r2  # monotone in probes
    assert r3 > 0.5  # and lands in a useful range on this table


def test_ivf_full_probe_is_exact(spark):
    """nprobe = n_centroids means every query scans every inverted
    list, so IVF-flat must reproduce brute-force cosine_topk EXACTLY
    (same neighbors, same ranks, same cosines) — the recall knob's
    upper end is the exactness oracle."""
    from knext_spark.pipeline import cosine_topk, ivf_ann_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {
        (r["vec_id"], r["rank"]): (r["neighbor_id"], round(r["cosine"], 9))
        for r in cosine_topk(emb, k=3).collect()
    }
    got = {
        (r["vec_id"], r["rank"]): (r["neighbor_id"], round(r["cosine"], 9))
        for r in ivf_ann_topk(emb, k=3, n_centroids=8, nprobe=8).collect()
    }
    assert got == exact


def test_ivf_recall_grows_with_nprobe(spark):
    from knext_spark.pipeline import cosine_topk, ivf_ann_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = cosine_topk(emb, k=3).collect()
    r1 = _recall(ivf_ann_topk(emb, k=3, n_centroids=16, nprobe=1).collect(), exact)
    r2 = _recall(ivf_ann_topk(emb, k=3, n_centroids=16, nprobe=2).collect(), exact)
    r4 = _recall(ivf_ann_topk(emb, k=3, n_centroids=16, nprobe=4).collect(), exact)
    assert r2 >= r1 and r4 >= r2  # monotone in nprobe
    assert r4 > r1  # and strictly useful on this table


def test_recall_floors_at_bench_config(spark):
    """Regression floors for the BENCH.md recall table (bench.py
    --recall): the bench configuration (k=10, planes=6, centroids=16)
    on the sf0.001 embeddings, pinned ~10% under the measured values
    so an ANN regression (hash change, probe-order bug, centroid
    seeding drift) trips the suite, while harmless jitter cannot —
    the pipeline is deterministic (md5 hyperplanes, order-statistic
    centroid seeds), so any drop below these floors is a real change.

    Measured 2026-08-18: lsh_fixed p8 = 0.2306, lsh_ranked p4 =
    0.1908 (vs fixed p4 0.1704 — ranking helps at equal budget),
    ivf np4 = 0.4658, np8 = 0.7272, np16 = 1.0 exactly."""
    from knext_spark.pipeline import cosine_topk, ivf_ann_topk
    from knext_spark.pipeline.similarity import lsh_ann_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = cosine_topk(emb, k=10).collect()

    def rec(df):
        return _recall(df.collect(), exact)

    assert rec(
        lsh_ann_topk(emb, k=10, planes=6, probes=8, probe_rank="fixed",
                     max_bucket=None)
    ) >= 0.20
    ranked4 = rec(
        lsh_ann_topk(emb, k=10, planes=6, probes=4, probe_rank="distance",
                     max_bucket=None)
    )
    fixed4 = rec(
        lsh_ann_topk(emb, k=10, planes=6, probes=4, probe_rank="fixed",
                     max_bucket=None)
    )
    assert ranked4 >= 0.17 and ranked4 >= fixed4
    assert rec(ivf_ann_topk(emb, k=10, n_centroids=16, nprobe=4)) >= 0.42
    assert rec(ivf_ann_topk(emb, k=10, n_centroids=16, nprobe=8)) >= 0.65
    # nprobe = K is the exactness oracle: full probe == brute force
    assert rec(ivf_ann_topk(emb, k=10, n_centroids=16, nprobe=16)) == 1.0


def test_ivf_lloyd_refinement_improves_recall(spark):
    """Deterministic Lloyd refinement (ivf_centroids refine=N) must
    buy recall over the raw order-statistic seeds, and must not break
    the nprobe=K exactness oracle (full probe scans every list no
    matter where the centroids sit). Measured on this table (k=10,
    K=16, nprobe=2): refine 0/1/2/3 -> 0.3024/0.3452/0.3496/0.3634;
    at sf0.01 the same sweep gives 0.2768 -> 0.3554. The floor is
    pinned under the refine=2 value with margin."""
    from knext_spark.pipeline import cosine_topk, ivf_ann_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = cosine_topk(emb, k=10).collect()

    def rec(refine, nprobe=2):
        return _recall(
            ivf_ann_topk(
                emb, k=10, n_centroids=16, nprobe=nprobe, refine=refine
            ).collect(),
            exact,
        )

    r0, r2 = rec(0), rec(2)
    assert r2 > r0  # training helps on this table
    assert r2 >= 0.32  # pinned floor (measured 0.3496)
    # exactness invariant survives training: full probe == brute force
    got = {
        (r["vec_id"], r["rank"], r["neighbor_id"], round(r["cosine"], 9))
        for r in ivf_ann_topk(
            emb, k=3, n_centroids=8, nprobe=8, refine=2
        ).collect()
    }
    want = {
        (r["vec_id"], r["rank"], r["neighbor_id"], round(r["cosine"], 9))
        for r in cosine_topk(emb, k=3).collect()
    }
    assert got == want


def test_ivf_salted_join_is_row_identical(spark):
    """The cid-join salt is a pure physical rewrite: every inverted
    list splits into s deterministic sub-lists and the query side
    explodes ×s, so each (query, neighbor) pair still meets exactly
    once. Output must be row-identical to the unsalted plan at several
    s, at nprobe 1 and K (the test session resolves salt='auto' to 1
    at local[8]/K=16, so the salted path needs this explicit gate)."""
    from knext_spark.pipeline import ivf_ann_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def rows(salt, nprobe):
        return sorted(
            (r["vec_id"], r["rank"], r["neighbor_id"], round(r["cosine"], 9), r["cid"])
            for r in ivf_ann_topk(
                emb, k=5, n_centroids=16, nprobe=nprobe, salt=salt
            ).collect()
        )

    for nprobe in (1, 16):
        base = rows(1, nprobe)
        for s in (3, 8):
            assert rows(s, nprobe) == base, f"salt={s} nprobe={nprobe} diverged"


def test_ivf_max_list_prunes_only_hot_lists(spark):
    """A tiny max_list cap must bound candidate-list size without
    touching queries whose neighbors live in small lists; pruned-list
    members still appear as QUERIES (never as candidates)."""
    from pyspark.sql import functions as F

    from knext_spark.pipeline import ivf_ann_topk
    from knext_spark.pipeline.similarity import _ivf_sims, ivf_centroids

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = ivf_centroids(emb, 4)
    sizes = (
        _ivf_sims(emb, cents, "vec_id", "embedding")
        .where(F.col("rn") == 1)
        .groupBy("cid")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    cap = sorted(r["n"] for r in sizes)[0]  # prune all but the smallest
    out = ivf_ann_topk(emb, k=3, n_centroids=4, nprobe=4, max_list=cap)
    kept_cids = {r["cid"] for r in out.select("cid").distinct().collect()}
    hot = {r["cid"] for r in sizes if r["n"] > cap}
    assert kept_cids.isdisjoint(hot)
    assert out.count() > 0  # small lists still serve results


def test_multiprobe_zero_is_plain_lsh(spark):
    """probes=0 must be EXACTLY the plain same-bucket LSH top-k — the
    expected side is built independently here from lsh_bucket + a
    direct bucket self-join, so a regression in the multiprobe code
    path (e.g. accidental candidate-side explode) can't hide."""
    from pyspark.sql import Window
    from knext_spark.pipeline.similarity import _cosine, lsh_ann_topk, lsh_bucket

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = sorted(
        (r["vec_id"], r["neighbor_id"], r["rank"])
        for r in lsh_ann_topk(emb, k=3, planes=4, probes=0).collect()
    )
    b = emb.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        lsh_bucket(F.col("embedding"), 4).alias("bucket"),
    )
    c = b.select(F.col("qid").alias("nid"), F.col("qv").alias("nv"), "bucket")
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    plain = sorted(
        (r["qid"], r["nid"], r["rank"])
        for r in (
            b.join(c, "bucket")
            .where(F.col("qid") != F.col("nid"))
            .select("qid", "nid", _cosine(F.col("qv"), F.col("nv")).alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 3)
        ).collect()
    )
    assert len(a) > 0
    assert a == plain


def test_ranked_multiprobe_beats_fixed(spark):
    """Perturbation-ranked probing (flip smallest-|margin| planes
    first, Lv et al.) must beat the fixed plane-order sequence at the
    same probe budget. Measured on this fixture: planes=4 probes=2 is
    0.341 fixed vs 0.371 ranked; every planes in {3,4,6} x probes in
    {1,2} is strictly better, and probes=planes is identical (both
    flip every plane)."""
    from knext_spark.pipeline import cosine_topk
    from knext_spark.pipeline.similarity import lsh_ann_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = cosine_topk(emb, k=3).collect()
    fixed = _recall(
        lsh_ann_topk(emb, k=3, planes=4, probes=2, probe_rank="fixed").collect(),
        exact,
    )
    ranked = _recall(
        lsh_ann_topk(emb, k=3, planes=4, probes=2, probe_rank="distance").collect(),
        exact,
    )
    assert ranked > fixed


def test_auto_planes_sizing():
    from knext_spark.pipeline.similarity import auto_planes

    assert auto_planes(0) == 4
    assert auto_planes(1000, target_bucket=1024) == 4  # floor
    assert auto_planes(2**20, target_bucket=1024) == 10
    assert auto_planes(10**9, target_bucket=1024) == 20
    assert auto_planes(10**12, target_bucket=1024) == 24  # ceiling


def _degenerate_emb(spark, n=40):
    """Near-constant embeddings: every vector hashes to ONE bucket for
    any hyperplane set — the adversarial hot-bucket case."""
    rows = [(i, [1.0, 1.0, 1.0, 1.0 + i * 1e-9]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ann_hot_bucket_cap_bounds_pairs(spark):
    from knext_spark.pipeline.similarity import embedding_near_dups, lsh_ann_topk

    emb = _degenerate_emb(spark)
    # uncapped: the single degenerate bucket yields O(n^2) verified pairs
    un = embedding_near_dups(emb, threshold=-1.0, planes=4, max_bucket=None).count()
    assert un == 40 * 39 // 2
    # capped: the hot bucket is pruned entirely — bounded work, no blowup
    assert embedding_near_dups(emb, threshold=-1.0, planes=4, max_bucket=10).count() == 0
    assert (
        lsh_ann_topk(emb, k=3, planes=4, probes=0, max_bucket=10).count() == 0
    )
    # the cap is a no-op when no bucket exceeds it
    capped_hi = embedding_near_dups(
        emb, threshold=-1.0, planes=4, max_bucket=1000
    ).count()
    assert capped_hi == un


def test_near_dup_probe_recovery_from_pruned_bucket(spark):
    """A near-dup pair with one member inside an over-cap (pruned)
    bucket must still surface when probes > 0: the query side is never
    pruned and explodes over Hamming-adjacent buckets, so hot-bucket
    members recover pairs with neighbors in adjacent buckets. Pairs
    entirely inside the pruned bucket stay dropped — that O(bucket^2)
    interior is exactly what the cap exists to bound."""
    import hashlib
    import random

    from knext_spark.pipeline.similarity import embedding_near_dups, lsh_bucket

    emb = _degenerate_emb(spark)  # 40 vectors, all in ONE bucket H
    hot = int(emb.select(lsh_bucket(F.col("embedding"), 4).alias("b")).first()["b"])

    # search for a witness vector whose bucket sits at Hamming distance
    # exactly 1 from H, using the engine's md5 weight formula verbatim
    # (components are multiples of 1/64, exactly float32-representable,
    # so the Python dot agrees in sign with the Spark one)
    def plane_w(p, i):
        h = int(hashlib.md5(f"{p},{i}".encode()).hexdigest()[:8], 16)
        return (h % 2001 - 1000) / 1000.0

    def bucket_py(v):
        b = 0
        for p in range(4):
            if sum(x * plane_w(p, i) for i, x in enumerate(v)) >= 0:
                b |= 1 << p
        return b

    rng = random.Random(3)
    while True:
        wvec = [rng.randrange(-256, 257) / 64 for _ in range(4)]
        if bin(bucket_py(wvec) ^ hot).count("1") == 1:
            break
    wdf = spark.createDataFrame(
        [(1000, wvec)], "vec_id long, embedding array<float>"
    )
    got_b = int(wdf.select(lsh_bucket(F.col("embedding"), 4).alias("b")).first()["b"])
    assert bin(got_b ^ hot).count("1") == 1  # Python/Spark bucket agree
    witness = 1000
    full = emb.unionByName(wdf)

    # cap=10 prunes the 40-member bucket; without probes the witness
    # (alone in its bucket) pairs with nothing
    assert (
        embedding_near_dups(
            full, threshold=-1.0, planes=4, max_bucket=10, probes=0
        ).count()
        == 0
    )
    # with all 4 one-bit probes every hot-bucket member reaches the
    # witness's bucket: exactly the 40 recovered (member, witness) pairs
    rec = embedding_near_dups(
        full, threshold=-1.0, planes=4, max_bucket=10, probes=4
    ).collect()
    assert len(rec) == 40
    assert all(r["a"] < r["b"] for r in rec)
    assert all(witness in (r["a"], r["b"]) for r in rec)


def test_ann_cap_noop_on_fixture(spark):
    """On the real embeddings fixture no bucket reaches the default
    cap, so capped == uncapped — keeps the driver's ann contract rows
    byte-stable against the cap-free DuckDB oracles."""
    from knext_spark.pipeline.similarity import lsh_ann_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = sorted(
        (r["vec_id"], r["neighbor_id"], r["rank"])
        for r in lsh_ann_topk(emb, k=3, planes=4, probes=2).collect()
    )
    b = sorted(
        (r["vec_id"], r["neighbor_id"], r["rank"])
        for r in lsh_ann_topk(emb, k=3, planes=4, probes=2, max_bucket=None).collect()
    )
    assert a == b


# ------------------------------------- partitioned TSV export parity
def test_export_tsv_partitioned_order_and_content(parsed_docs, tmp_path):
    from knext_spark.knext import build_edges
    from knext_spark.knext.sinks import TSV_COLS, export_tsv_partitioned

    edges = build_edges(parsed_docs, mixed=False, unique=True)
    out = str(tmp_path / "tsv_part")
    export_tsv_partitioned(edges, out)

    expected: dict[str, list] = {}
    for r in edges.orderBy("pathway", "out_seq").collect():
        expected.setdefault(r["pathway"], []).append(
            ["" if r[c] is None else str(r[c]) for c in TSV_COLS]
        )
    got: dict[str, list] = {}
    for d in sorted(os.listdir(out)):
        if not d.startswith("pathway="):
            continue
        pw = d.split("=", 1)[1]
        parts = sorted(
            f for f in os.listdir(os.path.join(out, d)) if f.endswith(".csv")
        )
        assert len(parts) == 1, (pw, parts)  # one task writes each pathway
        with open(os.path.join(out, d, parts[0]), newline="") as f:
            rows = list(csv.reader(f, delimiter="\t"))
        assert rows[0] == TSV_COLS
        got[pw] = [["" if v == "" else v for v in row] for row in rows[1:]]
    assert set(got) == set(expected)
    for pw in expected:
        assert got[pw] == expected[pw], pw  # per-file order == out_seq order


# ----------------------------------------------------- cache hygiene
def test_no_retained_rdds_after_calls(spark):
    from knext_spark.graph import triangle_count
    from knext_spark.pipeline.similarity import lsh_ann_topk

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    edges = li.select(
        (F.col("l_orderkey") % 100).alias("src"),
        (F.col("l_partkey") % 100).alias("dst"),
    ).distinct()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    triangle_count(edges).collect()
    lsh_ann_topk(emb, k=2, planes=4, probes=2).collect()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before  # no block-manager residue from either call


def test_asof_join_semantics(spark):
    """Hand-built backward as-of cases: no right row yet -> null;
    equal timestamps match (backward-INCLUSIVE); several right rows at
    one (key, ts) collapse to the max-tie payload; keys never seen on
    the right stay null throughout."""
    from knext_spark.pipeline import asof_join

    left = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 10), (3, "a", 20), (4, "b", 10), (5, "c", 10)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        # b has two rows at t=10 (tie -> max payload wins); a at 10, 15
        [("a", 10, 100), ("a", 15, 150), ("b", 10, 7), ("b", 10, 9)],
        "k string, t long, payload long",
    )
    out = {
        r["id"]: r["asof_payload"]
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="t", payload="payload"
        ).collect()
    }
    assert out == {1: None, 2: 100, 3: 150, 4: 9, 5: None}


def test_range_join_semantics(spark):
    """Boundary cases for the bucketized band join: gap 0 and gap ==
    delta are INCLUSIVE, gap > delta is out, pairs crossing a bucket
    boundary are found via the exploded next-bucket probe, and a naive
    theta join over the same inputs agrees row-for-row."""
    from knext_spark.pipeline import range_join

    left = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 9), (3, "b", 100)], "id long, k string, t long"
    )
    right = spark.createDataFrame(
        # for l=5 (delta 10): 5 (gap 0), 15 (gap 10 == delta), 16 (out)
        # for l=9: 19 crosses into the next bucket (floor(19/10)=1)
        # k='b': right rows exist only for other keys -> no pairs
        [("a", 5, 50), ("a", 15, 51), ("a", 16, 52), ("a", 19, 53)],
        "k string, t long, payload long",
    )
    out = {
        (r["id"], r["range_payload"], r["gap"])
        for r in range_join(
            left, right, key="k", left_ts="t", right_ts="t",
            delta=10, payload="payload",
        ).collect()
    }
    assert out == {
        (1, 50, 0),   # gap 0 inclusive
        (1, 51, 10),  # gap == delta inclusive; 16 (gap 11) excluded
        (2, 51, 6),
        (2, 52, 7),
        (2, 53, 10),  # 19 found across the bucket edge (floor(19/10)=1)
    }


def test_asof_join_null_payload_is_an_observation(spark):
    """A matched right row whose payload is legitimately NULL attaches
    NULL (pandas merge_asof semantics) — it must NOT forward an older
    timestamp's payload. The struct-marker carry makes right rows
    non-null observations regardless of payload; the tie column keeps
    determinism when payload is null."""
    from knext_spark.pipeline import asof_join

    left = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 12), (3, "a", 20)], "id long, k string, t long"
    )
    right = spark.createDataFrame(
        [("a", 4, 40, 1), ("a", 10, None, 2), ("a", 18, 80, 3)],
        "k string, t long, payload long, seq long",
    )
    for bd in (None, 7):
        out = {
            r["id"]: r["asof_payload"]
            for r in asof_join(
                left, right, key="k", left_ts="t", right_ts="t",
                payload="payload", tie="seq", bucket_delta=bd,
            ).collect()
        }
        assert out == {1: 40, 2: None, 3: 80}, f"bucket_delta={bd}"


def test_asof_join_bucketed_equals_single_window(spark):
    """The skew path (bucket_delta) is a pure physical rewrite: on a
    seeded random input — hot key with a long timeline, sparse keys,
    empty buckets between events, ties — its output is row-identical
    to the single-window plan at several bucket widths (including one
    so small most buckets hold a single row, and one so large all rows
    share a bucket, which degenerates to the unbucketed plan)."""
    import random

    from knext_spark.pipeline import asof_join

    rng = random.Random(1105)
    keys = ["hot"] * 60 + ["warm"] * 12 + ["cold"]
    left_rows = [
        (i, rng.choice(keys), rng.randrange(0, 500))
        for i in range(200)
    ]
    right_rows = [
        (rng.choice(keys), rng.randrange(0, 500), rng.randrange(0, 50))
        for _ in range(150)
    ]
    left = spark.createDataFrame(left_rows, "id long, k string, t long")
    right = spark.createDataFrame(right_rows, "k string, t long, payload long")

    def run(bd):
        return sorted(
            (r["id"], r["asof_payload"])
            for r in asof_join(
                left, right, key="k", left_ts="t", right_ts="t",
                payload="payload", bucket_delta=bd,
            ).collect()
        )

    base = run(None)
    for bd in (3, 50, 10_000):
        assert run(bd) == base, f"bucket_delta={bd} diverged"


def test_temporal_bucket_ids_exact_beyond_double(spark):
    """Bucket ids are integer arithmetic: at timestamps >= 2**53 (where
    double-division floors into the wrong bucket) range_join still
    finds exactly the in-band pairs and asof_join still matches."""
    from knext_spark.pipeline import asof_join, range_join

    base = (1 << 60) + 1  # not representable in double
    left = spark.createDataFrame(
        [(1, "a", base)], "id long, k string, t long"
    )
    right = spark.createDataFrame(
        [("a", base + 9, 91), ("a", base + 11, 92), ("a", base - 1, 90)],
        "k string, t long, payload long",
    )
    pairs = {
        (r["range_payload"], r["gap"])
        for r in range_join(
            left, right, key="k", left_ts="t", right_ts="t",
            delta=10, payload="payload",
        ).collect()
    }
    assert pairs == {(91, 9)}  # base+11 out of band, base-1 behind
    a = asof_join(
        left, right, key="k", left_ts="t", right_ts="t",
        payload="payload", bucket_delta=10,
    ).collect()
    assert [r["asof_payload"] for r in a] == [90]


def test_hot_buckets_reports_example_members(spark):
    """hot_buckets surfaces (size, min_key, max_key) per over-cap
    bucket; the extrema are real member ids."""
    from knext_spark.pipeline.similarity import hot_buckets

    emb = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(8)] + [(100, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = hot_buckets(emb, planes=2, max_bucket=4).collect()
    assert len(rows) == 1
    (h,) = rows
    assert h["size"] == 8 and h["min_key"] == 0 and h["max_key"] == 7


# ------------------------------------------------- deterministic splits
def test_deterministic_split_properties(spark):
    from knext_spark.pipeline import deterministic_split

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = deterministic_split(docs, key_col="text")
    rows = out.select("doc_id", "text", "split").collect()
    n = len(rows)
    by = {}
    for r in rows:
        by.setdefault(r["split"], []).append(r)
    # every row labeled, only the three configured labels
    assert sum(len(v) for v in by.values()) == n
    assert set(by) <= {"train", "valid", "test"}
    # fractions land near the configured 90/5/5 (md5 is uniform; the
    # sf0.001 corpus is small so the tolerance is generous)
    assert abs(len(by["train"]) / n - 0.9) < 0.05
    # stability: a second invocation assigns identically (no rand())
    again = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(docs, key_col="text").collect()
    }
    assert all(again[r["doc_id"]] == r["split"] for r in rows)
    # leakage safety: duplicate content always lands in the same split
    dup = spark.createDataFrame(
        [(1, "same words"), (2, "same words"), (3, "other words")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["split"] for r in deterministic_split(dup).collect()}
    assert got[1] == got[2]


def test_deterministic_sample_is_stable_and_nested(spark):
    from knext_spark.pipeline import deterministic_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    q = {r["doc_id"] for r in deterministic_sample(docs, 0.25, "text").collect()}
    h = {r["doc_id"] for r in deterministic_sample(docs, 0.5, "text").collect()}
    # rates roughly honored
    assert abs(len(q) / n - 0.25) < 0.06
    assert abs(len(h) / n - 0.5) < 0.06
    # the hash-prefix construction nests: the 25% sample is a subset of
    # the 50% one (stable curriculum growth, unlike DataFrame.sample)
    assert q <= h
    # rate=1 keeps everything, rate=0 keeps nothing
    assert deterministic_sample(docs, 1.0, "text").count() == n
    assert deterministic_sample(docs, 0.0, "text").count() == 0


def test_split_rejects_bad_fractions(spark):
    import pytest as _pytest

    from knext_spark.pipeline import deterministic_sample, deterministic_split

    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        deterministic_split(docs, fractions={})
    with _pytest.raises(ValueError):
        deterministic_split(docs, fractions={"a": -1.0, "b": 2.0})
    with _pytest.raises(ValueError):
        deterministic_sample(docs, 1.5)


def test_dedup_clusters_transitive_closure(spark, tmp_path):
    """A~B and B~C without an A~C pair must still collapse into ONE
    cluster labeled min(key); untouched docs are singleton canonicals."""
    from knext_spark.pipeline import dedup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 7, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.85)], "a long, b long, jaccard double"
    )
    out = {
        r["doc_id"]: (r["cluster"], r["is_canonical"])
        for r in dedup_clusters(
            spark, docs, pairs=pairs, checkpoint_dir=str(tmp_path / "cc")
        ).collect()
    }
    assert out == {
        1: (1, True), 2: (1, False), 3: (1, False),
        7: (7, True), 9: (9, True),
    }


def test_dedup_clusters_default_minhash_path(spark, tmp_path):
    """End-to-end default path: near-identical texts cluster, the rest
    stay singleton; exactly one canonical per cluster."""
    from knext_spark.pipeline import dedup_clusters

    docs = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "the quick brown fox jumps over the lazy dog!"),
            (12, "an entirely different document about spark engines"),
        ],
        "doc_id long, text string",
    )
    rows = dedup_clusters(
        spark, docs, checkpoint_dir=str(tmp_path / "cc2"), threshold=0.5
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[10]["cluster"] == by_id[11]["cluster"] == 10
    assert by_id[10]["is_canonical"] and not by_id[11]["is_canonical"]
    assert by_id[12]["cluster"] == 12 and by_id[12]["is_canonical"]


def test_corpus_profile_hand_computed(spark):
    """Profile of a tiny corpus with known groups: quantile
    interpolation (type-7: rank = p*(n-1)), dyadic mean quality,
    per-language grouping with the lang_id tie rules."""
    from knext_spark.pipeline import corpus_profile, lang_id, quality_score

    texts = [
        (1, "the cat and the dog run to the park in the morning light"),
        (2, "the quick brown fox is in that old barn and it was warm for days"),
        (3, "zzz qqq xxx"),  # no markers -> und
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    rows = {r["pred_lang"]: r for r in corpus_profile(docs).collect()}
    assert set(rows) == {"en", "und"}
    en = rows["en"]
    # doc1: 13 tokens, doc2: 15 tokens -> p50 = 13 + 0.5*(15-13) = 14.0
    assert en["n_docs"] == 2
    assert en["total_tokens"] == 13 + 15
    assert en["p50_tokens"] == 14.0
    assert en["p90_tokens"] == 13 + 0.9 * 2
    # mean quality must equal the average of the per-doc operator's
    # quality column exactly (dyadic rationals sum exactly)
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert en["mean_quality"] == (q[1] + q[2]) / 2
    assert rows["und"]["n_docs"] == 1
    # grouping key matches the per-doc operator
    langs = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert langs == {1: "en", 2: "en", 3: "und"}


def test_scrub_pii_masks_and_counts(spark):
    """Hand-crafted strings: each pattern masks its span, counts come
    from the ORIGINAL text, clean text passes through bit-identical."""
    from knext_spark.pipeline import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org and 192.168.0.1 now"),
            (2, "call +44 (0) 7700-900123 re id 078-05-1120"),
            (3, "nothing sensitive here, just 3.14 and v1.2.3"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert rows[1]["text"] == "mail <EMAIL> and <IP> now"
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_pii"]) == (1, 1, 2)
    assert rows[2]["text"] == "call <PHONE> re id <SSN>"
    assert (rows[2]["n_phone"], rows[2]["n_ssn"], rows[2]["n_pii"]) == (1, 1, 2)
    # version strings / decimals are NOT IPv4s (needs 4 octets), and
    # un-prefixed digit runs are not phones (conservative + anchor)
    assert rows[3]["text"] == "nothing sensitive here, just 3.14 and v1.2.3"
    assert rows[3]["n_pii"] == 0


# ------------------------------------------------ contamination / packing


def test_contamination_counts_and_edge_cases(spark):
    from knext_spark.pipeline import contamination

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "quick brown fox"),
            (3, "totally different words here"),
            (4, ""),
            (5, "xy"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in contamination(docs, bench, w=3).collect()}
    assert len(got) == 5
    # bench 3-shingles: {"the quick brown", "quick brown fox"}
    assert (got[1]["n_ngrams"], got[1]["n_hits"]) == (3, 2)
    assert (got[2]["n_ngrams"], got[2]["n_hits"]) == (1, 1)
    assert got[2]["contamination"] == 1.0
    assert got[3]["n_hits"] == 0
    assert (got[4]["n_ngrams"], got[4]["contamination"]) == (0, 0.0)
    # short doc: single joined shingle, not in the bench set
    assert (got[5]["n_ngrams"], got[5]["n_hits"]) == (1, 0)
    # shuffle-join path (benchmark too big to broadcast) is row-identical
    alt = {
        r["doc_id"]: r
        for r in contamination(docs, bench, w=3, broadcast_bench=False).collect()
    }
    assert {k: tuple(v) for k, v in got.items()} == {
        k: tuple(v) for k, v in alt.items()
    }


def test_pack_sequences_stream_invariants(spark):
    """Per shard the offsets form one contiguous token stream
    (offset_{i+1} = offset_i + tokens_i starting at 0), chunk ids are
    exact integer DIVs of it, and the assignment is independent of the
    input partitioning (determinism at any cluster size)."""
    from collections import defaultdict

    from knext_spark.pipeline import pack_sequences

    docs = spark.createDataFrame(
        [(i, ("tok " * (i % 37)).strip()) for i in range(200)],
        "doc_id long, text string",
    )
    rows = pack_sequences(docs, budget=16, n_shards=4).collect()
    assert len(rows) == 200
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r["shard"]].append(r)
    assert set(by_shard) <= set(range(4)) and len(by_shard) > 1
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["offset"])
        cum = 0
        for r in rs:
            assert r["offset"] == cum, (shard, r)
            assert r["bin_start"] == r["offset"] // 16
            assert r["bin_end"] == max(r["offset"] + r["tokens"] - 1, r["offset"]) // 16
            cum += r["tokens"]
    got = sorted(map(tuple, rows))
    again = sorted(map(tuple, pack_sequences(docs.repartition(7), budget=16, n_shards=4).collect()))
    assert got == again


def test_pack_sequences_rejects_bad_params(spark):
    import pytest as _pytest

    from knext_spark.pipeline import pack_sequences

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        pack_sequences(docs, budget=0)
    with _pytest.raises(ValueError):
        pack_sequences(docs, n_shards=0)
    # precomputed token-count column path
    pre = docs.withColumn("n_tok", F.lit(3).cast("long"))
    out = pack_sequences(pre, budget=2, tokens_col_name="n_tok").collect()
    assert out[0]["tokens"] == 3 and out[0]["bin_end"] == 1


def test_repetition_ratio_hand_cases(spark):
    from knext_spark.pipeline import repetition_ratio

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),   # 9 tokens -> 7 windows, 3 distinct
            (2, "one two three four"),  # 2 windows, all distinct
            (3, "x y"),                 # < w tokens
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_ratio(docs, w=3).collect()}
    assert (got[1]["total_ngrams"], got[1]["distinct_ngrams"]) == (7, 3)
    assert abs(got[1]["repetition"] - (1 - 3 / 7)) < 1e-12
    assert (got[2]["total_ngrams"], got[2]["repetition"]) == (2, 0.0)
    assert (got[3]["total_ngrams"], got[3]["repetition"]) == (0, 0.0)
    assert (got[4]["total_ngrams"], got[4]["repetition"]) == (0, 0.0)


def test_stratified_sample_quota_and_stability(spark):
    from knext_spark.pipeline import stratified_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}", f"t{i}") for i in range(100)],
        "doc_id long, lang string, text string",
    )
    out = stratified_sample(df, 5, stratum_col="lang", key_col="doc_id")
    rows = out.collect()
    from collections import Counter

    c = Counter(r["lang"] for r in rows)
    assert c == {"s0": 5, "s1": 5, "s2": 5}
    # quota above a stratum's size keeps the whole stratum
    tiny = df.where(F.col("doc_id") < 4)  # s0:2, s1:1, s2:1
    assert stratified_sample(tiny, 5, "lang", "doc_id").count() == 4
    # deterministic + partitioning-independent + nested (5 ⊆ 10)
    again = stratified_sample(df.repartition(7), 5, "lang", "doc_id")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
    ten = {
        r["doc_id"]
        for r in stratified_sample(df, 10, "lang", "doc_id").collect()
    }
    assert {r["doc_id"] for r in rows} <= ten
    import pytest as _pytest

    with _pytest.raises(ValueError):
        stratified_sample(df, 0, "lang")


def test_line_dedup_semantics(spark):
    """Hand-built corpus: a boilerplate banner repeated in 3 docs is
    dropped everywhere (max_docs=2); unique lines survive in order;
    short lines are exempt even when repeated; a fully-boilerplate doc
    comes back with clean_text='' rather than vanishing."""
    from knext_spark.pipeline import line_dedup

    banner = "subscribe to our newsletter today"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\nunique alpha content line\n--\nclosing alpha words"),
            (2, f"{banner}\nunique beta content line\n--"),
            (3, f"{banner}\nunique gamma content line"),
            (4, banner),
            (5, "standalone delta doc line"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup(docs, max_docs=2, min_chars=5).collect()
    }
    assert len(out) == 5
    # banner dropped (3 docs > 2); '--' exempt (len 2 < 5) though repeated
    assert out[1]["clean_text"] == "unique alpha content line\n--\nclosing alpha words"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (4, 3)
    assert out[2]["clean_text"] == "unique beta content line\n--"
    assert out[3]["clean_text"] == "unique gamma content line"
    assert out[4]["clean_text"] == ""
    assert (out[4]["n_lines"], out[4]["n_kept"]) == (1, 0)
    assert out[5]["clean_text"] == "standalone delta doc line"


def test_line_dedup_normalizes_case_and_whitespace(spark):
    """Frequency counting is on the trimmed, lowercased form, but the
    surviving text keeps the original bytes."""
    from knext_spark.pipeline import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "Cookie Policy Notice\nkeep me one"),
            (2, "  cookie policy notice \nkeep me two"),
            (3, "COOKIE POLICY NOTICE\nkeep me three"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in line_dedup(docs, max_docs=2, min_chars=5).collect()
    }
    assert out == {1: "keep me one", 2: "keep me two", 3: "keep me three"}


def test_tfidf_topk_matches_manual(spark):
    """4-doc corpus checked against a hand-computed smoothed tf-idf:
    a corpus-wide token scores below a rarer one at equal tf; ranks
    tie-break lexicographically."""
    import math

    from knext_spark.pipeline import tfidf_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "cherry cherry cherry common"),
            (4, "date common"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["rank"])

    def idf(df):
        return math.log((4 + 1) / (df + 1)) + 1

    # doc 1: apple tf=2 df=1 beats common tf=1 df=4 and banana tf=1 df=2
    assert [r["token"] for r in by_doc[1]] == ["apple", "banana"]
    assert abs(by_doc[1][0]["tfidf"] - 2 * idf(1)) < 1e-12
    # doc 3: cherry tf=3 df=2 first; common second
    assert [r["token"] for r in by_doc[3]] == ["cherry", "common"]
    # doc 4: date (df=1) outranks common (df=4)
    assert [r["token"] for r in by_doc[4]] == ["date", "common"]
    # every doc got exactly min(k, n_distinct_tokens) rows
    assert [len(by_doc[d]) for d in sorted(by_doc)] == [2, 2, 2, 2]


def test_temperature_rates_math():
    import pytest as _pytest

    from knext_spark.pipeline import temperature_rates

    counts = {"en": 1600, "fr": 400, "de": 100}
    # T=1: keep everything (natural mixture)
    assert temperature_rates(counts, 1.0) == {"en": 1.0, "fr": 1.0, "de": 1.0}
    # T=0: equal expected sizes — every stratum down to the smallest
    r0 = temperature_rates(counts, 0.0)
    assert r0["de"] == 1.0
    assert abs(r0["en"] - 100 / 1600) < 1e-12
    assert abs(r0["fr"] - 100 / 400) < 1e-12
    # T=0.5: the classic sqrt mixing — rate = sqrt(smallest/n)
    rh = temperature_rates(counts, 0.5)
    assert abs(rh["en"] - (100 / 1600) ** 0.5) < 1e-12
    # monotone in T: hotter temperature keeps more of the head
    assert rh["en"] > r0["en"]
    with _pytest.raises(ValueError):
        temperature_rates({}, 0.5)
    with _pytest.raises(ValueError):
        temperature_rates(counts, 2.0)
    with _pytest.raises(ValueError):
        temperature_rates({"en": 0}, 0.5)


def test_weighted_sample_exact_replay_and_nesting(spark):
    import hashlib

    from knext_spark.pipeline import rate_hex, weighted_sample

    rows = [(i, "en" if i % 4 else "de") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"en": 0.25, "de": 1.0}
    got = {
        r["doc_id"]
        for r in weighted_sample(df, rates, "lang", "doc_id").collect()
    }
    # exact python replay of the md5 cut — the operator is a pure
    # deterministic function of (salt, key, stratum rate)
    cuts = {s: rate_hex(r) for s, r in rates.items()}
    expect = {
        i
        for i, lang in rows
        if cuts[lang] is None
        or hashlib.md5(f"ws:{i}".encode()).hexdigest()[:8] < cuts[lang]
    }
    assert got == expect
    # rate-1.0 stratum kept wholesale
    assert {i for i, lang in rows if lang == "de"} <= got
    # monotone: raising a rate only adds rows (nested ablations)
    more = {
        r["doc_id"]
        for r in weighted_sample(
            df, {"en": 0.5, "de": 1.0}, "lang", "doc_id"
        ).collect()
    }
    assert got <= more
    # unknown strata drop by default, kept with default_rate=1
    extra = spark.createDataFrame([(9001, "xx")], "doc_id long, lang string")
    both = df.union(extra)
    assert (
        weighted_sample(both, rates, "lang", "doc_id")
        .where("lang = 'xx'")
        .count()
        == 0
    )
    assert (
        weighted_sample(both, rates, "lang", "doc_id", default_rate=1.0)
        .where("lang = 'xx'")
        .count()
        == 1
    )
    # partitioning-independent
    again = {
        r["doc_id"]
        for r in weighted_sample(
            df.repartition(7), rates, "lang", "doc_id"
        ).collect()
    }
    assert again == got
    # a different salt decorrelates the kept set
    other = {
        r["doc_id"]
        for r in weighted_sample(df, rates, "lang", "doc_id", salt="v2").collect()
    }
    assert other != got


def test_weighted_sample_temperature_end_to_end(spark):
    """temperature_rates + weighted_sample rebalances a skewed corpus:
    at T=0 the expected per-stratum sizes equalize."""
    from knext_spark.pipeline import temperature_rates, weighted_sample

    rows = [(i, "en" if i < 3200 else ("fr" if i < 4000 else "de")) for i in range(4200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    counts = {"en": 3200, "fr": 800, "de": 200}
    out = weighted_sample(df, temperature_rates(counts, 0.0), "lang", "doc_id")
    from collections import Counter

    c = Counter(r["lang"] for r in out.collect())
    assert c["de"] == 200  # smallest stratum untouched
    # md5 uniformity: each down-sampled stratum lands near 200
    assert abs(c["en"] - 200) < 60
    assert abs(c["fr"] - 200) < 60


def _py_hll_registers(keys, k_hex=3, salt="hll"):
    import hashlib

    regs = {}
    for k in keys:
        h = hashlib.md5(f"{salt}:{k}".encode()).hexdigest()
        reg, suf = h[:k_hex], h[k_hex : k_hex + 12]
        z = len(suf) - len(suf.lstrip("0"))
        if z == 12:
            rho = 49
        else:
            c = suf[z]
            extra = 0 if c >= "8" else 1 if c >= "4" else 2 if c >= "2" else 3
            rho = 4 * z + extra + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_hll_registers_match_python_replay(spark):
    from knext_spark.pipeline import hll_registers

    keys = [f"token{i}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["register"]: r["rho"]
        for r in hll_registers(df, "k", k_hex=2).collect()
    }
    assert got == _py_hll_registers(keys, k_hex=2)


def test_hll_estimate_accuracy_and_merge(spark):
    from knext_spark.pipeline import hll_distinct, hll_merge, hll_registers, hll_estimate

    n = 20000
    rows = [(f"k{i}", "a" if i % 2 else "b") for i in range(n)]
    # duplicates must not move the sketch
    df = spark.createDataFrame(rows + rows[:5000], "k string, g string")
    est = {r["g"]: r for r in hll_distinct(df, "k", ["g"]).collect()}
    for g, true_n in (("a", n // 2), ("b", n // 2)):
        rel = abs(est[g]["estimate"] - true_n) / true_n
        assert rel < 0.08, (g, est[g]["estimate"], true_n)
    # mergeability: sketch(half1) U sketch(half2) == sketch(whole), exactly
    whole = spark.createDataFrame(rows, "k string, g string")
    h1 = hll_registers(whole.where("k < 'k5'"), "k", ["g"])
    h2 = hll_registers(whole.where("k >= 'k5'"), "k", ["g"])
    merged = hll_merge(h1.unionByName(h2), ["g"])
    direct = hll_registers(whole, "k", ["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # and the merged estimate equals the direct estimate bit-for-bit
    em = hll_estimate(merged, ["g"]).collect()
    ed = hll_estimate(direct, ["g"]).collect()
    assert sorted(map(tuple, em)) == sorted(map(tuple, ed))


def test_hll_small_range_correction(spark):
    """Tiny cardinalities ride the linear-counting branch and stay
    accurate (the raw HLL estimator is badly biased down there)."""
    from knext_spark.pipeline import hll_distinct

    import pytest as _pytest

    df = spark.createDataFrame([(f"x{i % 30}",) for i in range(300)], "k string")
    row = hll_distinct(df, "k").collect()[0]
    assert row["n_registers"] <= 30
    assert abs(row["estimate"] - 30) / 30 < 0.1
    with _pytest.raises(ValueError):
        hll_distinct(df, "k", k_hex=0)


def test_lm_score_python_replay(spark):
    """Hand corpus: exact add-one bigram math replayed in python
    (same lower(), same smoothing, same average)."""
    import math
    from collections import Counter

    from knext_spark.pipeline import lm_score

    ref_texts = {10: "abab", 11: "abcd"}
    rows = [(i, t) for i, t in ref_texts.items()] + [(12, "Abca"), (13, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref = df.where("doc_id < 12")
    got = {r["doc_id"]: r for r in lm_score(df, ref).collect()}

    def bgs(t):
        t = t.lower()
        return [t[i : i + 2] for i in range(len(t) - 1)]

    model = Counter()
    for t in ref_texts.values():
        model.update(bgs(t))
    total, v = sum(model.values()), len(model)

    for i, t in [(i, t) for i, t in rows]:
        b = bgs(t)
        if not b:
            assert got[i]["n_bigrams"] == 0 and got[i]["avg_logp"] is None
            continue
        want = sum(
            math.log((model.get(x, 0) + 1) / (total + v)) for x in b
        ) / len(b)
        assert got[i]["n_bigrams"] == len(b)
        assert abs(got[i]["avg_logp"] - want) < 1e-9, (i, got[i], want)
    # the in-reference doc scores higher than the OOV-heavy one
    assert got[10]["avg_logp"] > got[12]["avg_logp"]


def test_lm_score_separates_languages(spark):
    """Trained on the English slice of the synthetic corpus, English
    documents average a higher log-prob than non-Latin ones."""
    from knext_spark.pipeline import lm_score

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert "en" in langs and "zh" in langs
    ref = docs.where("lang = 'en'")
    scored = lm_score(docs, ref).join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["lang"]: r["m"]
        for r in scored.groupBy("lang")
        .agg(F.avg("avg_logp").alias("m"))
        .collect()
    }
    assert means["en"] > means["zh"]


def _py_cms(keys, depth, w_hex, salt="cms"):
    import hashlib
    from collections import defaultdict

    sk = defaultdict(int)
    for k in keys:
        for r in range(depth):
            b = hashlib.md5(f"{salt}:{r}:{k}".encode()).hexdigest()[:w_hex]
            sk[(r, b)] += 1
    return dict(sk)


def test_cms_matches_python_replay_and_never_undercounts(spark):
    """Count-min sketch (pipeline/sketch.py cms_table/cms_lookup):
    the sketch table matches a pure-python md5 replay exactly; point
    estimates never undercount (the CMS guarantee); a wide sketch
    (no collisions) reproduces exact counts; a narrow one (16 buckets,
    37 keys) genuinely overcounts somewhere — the test corpus is built
    to force both regimes."""
    from collections import Counter

    from knext_spark.pipeline import cms_lookup, cms_table

    keys = [f"k{i % 37}" for i in range(800)] + ["hot"] * 200
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    sk = cms_table(df, "k", depth=3, w_hex=1)
    got = {(r["row"], r["bucket"]): r["cnt"] for r in sk.collect()}
    assert got == _py_cms(keys, depth=3, w_hex=1)

    true = Counter(keys)
    qdf = spark.createDataFrame([(k,) for k in sorted(true)], "k string")
    est = {
        r["k"]: r["estimate"]
        for r in cms_lookup(sk, qdf, "k", depth=3, w_hex=1).collect()
    }
    assert all(est[k] >= true[k] for k in true), "CMS undercounted"
    assert any(est[k] > true[k] for k in true), (
        "16-bucket sketch over 38 keys should collide somewhere"
    )
    wide = cms_lookup(
        cms_table(df, "k", depth=3, w_hex=6), qdf, "k", depth=3, w_hex=6
    )
    assert {r["k"]: r["estimate"] for r in wide.collect()} == dict(true)


def test_cms_merge_exactness_and_guards(spark):
    """Sketches from disjoint slices merge (sum) into exactly the
    whole-input sketch; parameter guards reject bad depth/width; a
    lookup against a sketch built at a different w_hex fails LOUDLY
    (assert_true) instead of silently probing wrong buckets."""
    import pytest as _pytest

    from knext_spark.pipeline import cms_lookup, cms_merge, cms_table

    rows = [(f"t{i % 11}",) for i in range(300)]
    df = spark.createDataFrame(rows, "k string")
    h1 = cms_table(df.where("k < 't5'"), "k", depth=4, w_hex=2)
    h2 = cms_table(df.where("k >= 't5'"), "k", depth=4, w_hex=2)
    merged = cms_merge(h1.unionByName(h2))
    direct = cms_table(df, "k", depth=4, w_hex=2)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    with _pytest.raises(ValueError):
        cms_table(df, "k", depth=0)
    with _pytest.raises(ValueError):
        cms_table(df, "k", w_hex=9)
    q = spark.createDataFrame([("t1",)], "k string")
    with _pytest.raises(Exception, match="w_hex"):
        cms_lookup(direct, q, "k", depth=4, w_hex=1).collect()


def test_histogram_bins_and_merge(spark):
    import pytest as _pytest

    from knext_spark.pipeline import histogram

    rows = [(i, "g%d" % (i % 2)) for i in range(-5, 205)]
    df = spark.createDataFrame(rows, "v long, g string")
    h = histogram(df, "v", lo=0, hi=200, bins=10, group_cols=["g"])
    got = {(r["g"], r["bin"]): r["cnt"] for r in h.collect()}
    # python replay of the same clamp + integer division
    want = {}
    for v, g in rows:
        b = min(max((v - 0) * 10, 0) // 200, 9)
        want[(g, b)] = want.get((g, b), 0) + 1
    assert got == want
    # mergeability: histogram(half1) + histogram(half2) == histogram(all)
    h1 = histogram(df.where("v < 100"), "v", 0, 200, 10, ["g"])
    h2 = histogram(df.where("v >= 100"), "v", 0, 200, 10, ["g"])
    merged = {
        (r["g"], r["bin"]): r["cnt"]
        for r in h1.unionByName(h2)
        .groupBy("g", "bin")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert merged == want
    with _pytest.raises(ValueError):
        histogram(df, "v", 10, 10)
    with _pytest.raises(ValueError):
        histogram(df, "v", 0, 10, bins=0)


def test_histogram_quantiles_accuracy(spark):
    """Estimates land within one bin width of the exact quantiles, and
    a fine-enough histogram on integer data is exact at the bin
    midpoint level; python replay of the interpolation dag."""
    import math

    from knext_spark.pipeline import histogram, histogram_quantiles

    import pytest as _pytest

    rows = [(i % 1000, "a") for i in range(3000)]
    df = spark.createDataFrame(rows, "v long, g string")
    h = histogram(df, "v", 0, 1000, 50, ["g"])
    out = histogram_quantiles(h, [0.0, 0.25, 0.5, 0.9], 0, 1000, 50, ["g"])
    got = {r["q"]: r for r in out.collect()}
    vals = sorted(v for v, _ in rows)
    n = len(vals)
    for q, r in got.items():
        assert r["n"] == n
        exact = vals[max(0, math.ceil(q * n) - 1)]
        assert abs(r["estimate"] - exact) <= 20 + 1e-9, (q, r, exact)
    # python replay: cumulative bins + the same interpolation
    hist = {}
    for v, _ in rows:
        b = min(max(v * 50, 0) // 1000, 49)
        hist[b] = hist.get(b, 0) + 1
    for q, r in got.items():
        target = max(1, math.ceil(q * n))
        cum = 0
        for b in sorted(hist):
            if cum + hist[b] >= target:
                est = 0 + (b + (target - cum) / hist[b]) * (1000 / 50)
                break
            cum += hist[b]
        assert abs(r["estimate"] - est) < 1e-12
    with _pytest.raises(ValueError):
        histogram_quantiles(h, [1.5], 0, 1000, 50, ["g"])


def test_dedup_against_semantics(spark):
    """Incremental dedup vs a seen corpus: an exact (normalized) copy
    flags exact+near with the right seen ids; a one-word edit flags
    near only; a fresh doc flags nothing; seen docs are never paired
    with each other."""
    from knext_spark.pipeline import dedup_against

    base = "the quick brown fox jumps over the lazy dog again and again"
    seen = spark.createDataFrame(
        [(1, base), (2, "completely different reference material here entirely"),
         (3, base.replace("lazy", "sleepy"))],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (101, "  THE quick   brown fox jumps over the lazy dog again and again "),
            (102, base.replace("dog", "cat")),
            (103, "nothing like anything in the historical corpus at all friends"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dedup_against(new, seen, threshold=0.5).collect()}
    assert got[101]["exact_dup"] and got[101]["exact_dup_of"] == 1
    assert got[101]["near_dup"] and got[101]["near_dup_of"] == 1
    assert abs(got[101]["near_jaccard"] - 1.0) < 1e-12
    assert not got[102]["exact_dup"]
    assert got[102]["near_dup"] and got[102]["near_dup_of"] in (1, 3)
    assert 0.5 <= got[102]["near_jaccard"] < 1.0
    assert not got[103]["exact_dup"] and not got[103]["near_dup"]
    assert got[103]["near_jaccard"] is None
    # every new doc exactly once
    assert sorted(got) == [101, 102, 103]


def test_dedup_against_python_jaccard_replay(spark):
    """The reported near_jaccard equals the exact w-shingle Jaccard
    computed in python for the flagged pair."""
    from knext_spark.pipeline import dedup_against

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    edited = base.replace("epsilon", "omicron")
    seen = spark.createDataFrame([(1, base)], "doc_id long, text string")
    new = spark.createDataFrame([(201, edited)], "doc_id long, text string")
    got = dedup_against(new, seen, threshold=0.1).collect()[0]

    def shingles(t, w=3):
        tk = t.lower().split()
        return {" ".join(tk[i : i + w]) for i in range(len(tk) - w + 1)}

    a, b = shingles(edited), shingles(base)
    want = len(a & b) / len(a | b)
    assert got["near_dup"] and abs(got["near_jaccard"] - want) < 1e-12


def test_gopher_filter_rules(spark):
    """Each rule fires on a purpose-built doc, reasons come in fixed
    rule order, and a clean doc passes with an empty array."""
    from knext_spark.pipeline import gopher_filter

    clean = (
        "the quick brown fox jumps over the lazy dog and it was a fine "
        "day for running in the field with many other animals that were "
        "also enjoying the sunshine near the old farm house by the river "
        "bank where children played games during the long summer afternoon "
        "while parents watched from wooden chairs under the shade trees"
    )
    docs = spark.createDataFrame(
        [
            (1, clean),
            (2, "hi there friend"),  # too_short
            (3, " ".join(["pneumonoultramicroscopicsilicovolcanoconiosis"] * 60)),
            (4, clean + " " + "!?!%$#@^&*()" * 40),  # punct
            (5, " ".join(f"zz{i}" for i in range(80))),  # no stopwords
            (6, "the cat sat on a mat " + " ".join(["again and again and"] * 20)),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_filter(docs).collect()}
    assert got[1]["passes"] and got[1]["reasons"] == []
    # 3 tokens, and also below the 2-distinct-stopword floor
    assert got[2]["reasons"] == ["too_short", "stopwords"]
    # doc 3: giant identical tokens — token_len AND stopwords AND repetitive
    assert "token_len" in got[3]["reasons"]
    assert "stopwords" in got[3]["reasons"]
    assert not got[3]["passes"]
    assert "punct" in got[4]["reasons"]
    assert got[5]["reasons"] == ["stopwords"]
    assert "repetitive" in got[6]["reasons"]
    # reasons preserve fixed rule order
    order = ["too_short", "too_long", "token_len", "punct", "stopwords", "repetitive"]
    for r in got.values():
        idx = [order.index(x) for x in r["reasons"]]
        assert idx == sorted(idx)
    # custom threshold override: make doc 1 "too_long"
    strict = gopher_filter(docs, thresholds={"max_tokens": 10}).collect()
    strict = {r["doc_id"]: r for r in strict}
    assert "too_long" in strict[1]["reasons"]


def test_vocab_topk_semantics(spark):
    """Hand corpus: exact tf/df, deterministic (tf desc, token) rank,
    ties broken lexicographically, k truncation."""
    from collections import Counter

    from knext_spark.pipeline import vocab_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana cherry banana"),
            (3, "apple date"),
        ],
        "doc_id long, text string",
    )
    got = [tuple(r) for r in vocab_topk(docs, k=3).collect()]
    # tf: apple 3, banana 3, cherry 2, date 1; df: apple 2, banana 2,
    # cherry 2, date 1; apple < banana at the tf tie
    assert got == [
        ("apple", 3, 2, 1),
        ("banana", 3, 2, 2),
        ("cherry", 2, 2, 3),
    ]
    assert vocab_topk(docs, k=100).count() == 4
    import pytest as _pytest

    with _pytest.raises(ValueError):
        vocab_topk(docs, k=0)


def test_sketch_null_handling(spark):
    """NULL keys/values are ignored with count(distinct)/count
    semantics instead of poisoning the fold or the quantile window."""
    from knext_spark.pipeline import (
        histogram,
        histogram_quantiles,
        hll_distinct,
        hll_estimate,
        hll_registers,
    )

    df = spark.createDataFrame(
        [("k1", "g"), (None, "g"), ("k2", "g")], "k string, g string"
    )
    row = hll_distinct(df, "k", ["g"]).collect()[0]
    assert row["estimate"] is not None and abs(row["estimate"] - 2) < 0.5
    hv = spark.createDataFrame([(1,), (None,), (3,)], "v long")
    h = histogram(hv, "v", 0, 10, 5)
    assert sum(r["cnt"] for r in h.collect()) == 2
    q = histogram_quantiles(h, [0.5], 0, 10, 5).collect()
    assert q[0]["n"] == 2 and q[0]["estimate"] is not None
    # mismatched k_hex fails loudly instead of a negative v_zero
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    regs = hll_registers(df, "k", k_hex=3)
    with _pytest.raises(Exception):
        hll_estimate(regs, k_hex=2).collect()
    with _pytest.raises(ValueError):
        histogram_quantiles(h, [], 0, 10, 5)


def test_dup_spans_semantics(spark):
    """Hand-built corpus: a 7-token phrase shared by two docs yields
    one maximal merged span per doc at each doc's own offset (w=5 ->
    three overlapping duplicated windows merge into start..start+6);
    a unique doc and a doc shorter than w yield no rows."""
    from knext_spark.pipeline import dup_spans

    phrase = "alpha beta gamma delta epsilon zeta eta"
    docs = spark.createDataFrame(
        [
            (1, f"one two three {phrase} four five"),
            (2, f"{phrase} something else entirely here now"),
            (3, "completely unique wording with no repeats at all ever"),
            (4, "short doc"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dup_spans(docs, w=5, min_docs=2).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["span_start"], out[1]["span_end"], out[1]["n_tokens"]) == (3, 9, 7)
    assert (out[2]["span_start"], out[2]["span_end"], out[2]["n_tokens"]) == (0, 6, 7)


def test_dup_spans_two_regions_stay_separate(spark):
    """Two duplicated regions in one doc separated by enough unique
    filler come back as two spans, not one; each region is anchored by
    a different partner doc."""
    from knext_spark.pipeline import dup_spans

    r1 = "red orange yellow green blue"
    r2 = "north south east west center"
    docs = spark.createDataFrame(
        [
            (1, f"{r1} filler1 filler2 filler3 filler4 filler5 filler6 {r2}"),
            (2, f"intro words here {r1} outro words there"),
            (3, f"{r2} trailing unique tail tokens"),
        ],
        ["doc_id", "text"],
    )
    rows = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in dup_spans(docs, w=5, min_docs=2).collect()
    )
    assert rows == [
        (1, 0, 4, 5),
        (1, 11, 15, 5),
        (2, 3, 7, 5),
        (3, 0, 4, 5),
    ]


def test_dup_spans_python_replay(spark):
    """Seeded pseudo-random corpus from a tiny vocab (to force window
    collisions) replayed in pure python: identical window scan,
    doc-frequency filter, and adjacent-interval merge."""
    import random

    from knext_spark.pipeline import dup_spans

    rng = random.Random(75)
    vocab = ["aa", "bb", "cc", "dd"]
    corpus = {
        d: [rng.choice(vocab) for _ in range(rng.randint(2, 18))]
        for d in range(1, 25)
    }
    w = 4
    dfreq: dict[str, set[int]] = {}
    for d, toks in corpus.items():
        for i in range(len(toks) - w + 1):
            dfreq.setdefault(" ".join(toks[i : i + w]), set()).add(d)
    expect = []
    for d, toks in corpus.items():
        hits = [
            i
            for i in range(len(toks) - w + 1)
            if len(dfreq[" ".join(toks[i : i + w])]) >= 2
        ]
        spans: list[list[int]] = []
        for i in hits:
            if spans and i <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], i + w - 1)
            else:
                spans.append([i, i + w - 1])
        expect += [(d, s, e, e - s + 1) for s, e in spans]
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()], ["doc_id", "text"]
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in dup_spans(docs, w=w, min_docs=2).collect()
    )
    assert got == sorted(expect) and len(got) > 10


def test_dup_spans_rejects_bad_params(spark):
    """w < 1 and min_docs < 2 fail loudly."""
    import pytest as _pytest

    from knext_spark.pipeline import dup_spans

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        dup_spans(df, w=0)
    with _pytest.raises(ValueError):
        dup_spans(df, min_docs=1)


def test_contaminated_spans_semantics(spark):
    """Hand-built benchmark of one question: the training doc that
    quotes it verbatim gets exactly the quoted range flagged; a clean
    doc and a too-short doc yield nothing; the benchmark's own rows
    never appear in the output. The ref side needs only a text column
    (different name, no doc_id)."""
    from knext_spark.pipeline import contaminated_spans

    q = "what is the capital of france paris"
    train = spark.createDataFrame(
        [
            (1, f"some intro text then {q} and trailing words"),
            (2, "entirely clean training content with nothing shared here"),
            (3, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    ref = spark.createDataFrame([(q,)], ["question"])
    rows = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in contaminated_spans(
            train, ref, ref_text_col="question", w=5
        ).collect()
    )
    # q is 7 tokens at positions 4..10 of doc 1
    assert rows == [(1, 4, 10, 7)]


def test_contaminated_spans_python_replay(spark):
    """Seeded pseudo-random train/benchmark corpora from a tiny vocab
    replayed in pure python: identical window scan, reference-shingle
    membership, and adjacent-interval merge."""
    import random

    from knext_spark.pipeline import contaminated_spans

    rng = random.Random(19)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    train = {
        d: [rng.choice(vocab) for _ in range(rng.randint(2, 20))]
        for d in range(1, 30)
    }
    bench = [
        [rng.choice(vocab) for _ in range(rng.randint(2, 12))] for _ in range(6)
    ]
    w = 4
    ref_sh = {
        " ".join(b[i : i + w])
        for b in bench
        for i in range(len(b) - w + 1)
    }
    expect = []
    for d, toks in train.items():
        hits = [
            i
            for i in range(len(toks) - w + 1)
            if " ".join(toks[i : i + w]) in ref_sh
        ]
        spans: list[list[int]] = []
        for i in hits:
            if spans and i <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], i + w - 1)
            else:
                spans.append([i, i + w - 1])
        expect += [(d, s, e, e - s + 1) for s, e in spans]
    tdf = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in train.items()], ["doc_id", "text"]
    )
    rdf = spark.createDataFrame([(" ".join(b),) for b in bench], ["text"])
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in contaminated_spans(tdf, rdf, w=w).collect()
    )
    assert got == sorted(expect) and len(got) > 5


def test_contaminated_spans_rejects_bad_params(spark):
    """w < 1 fails loudly."""
    import pytest as _pytest

    from knext_spark.pipeline import contaminated_spans

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        contaminated_spans(df, df, w=0)


def test_bpe_merges_sennrich_example(spark):
    """The canonical Sennrich et al. corpus (low:5, lower:2, newest:6,
    widest:3) learns exactly the textbook merge sequence, with the
    lexicographic tie-break deciding (e,s) over (s,t) at 9 and (e,w)
    over (n,e)/(w,est) at 6."""
    from knext_spark.pipeline import bpe_merges

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = [tuple(r) for r in bpe_merges(docs, k=6).collect()]
    assert got == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
        (4, "lo", "w", "low", 7),
        (5, "e", "w", "ew", 6),
        (6, "ew", "est", "ewest", 6),
    ]


def test_bpe_merges_greedy_overlap_chain(spark):
    """Overlapping self-pair chains: 'aaaa' folds to [aa,aa] and
    'aaaaa' to [aa,aa,a] (leftmost-greedy), so round 2 sees (aa,aa)
    three times — a wrong fold ([aa,a,aa]) would give two and a
    different merge table. Early stop: a corpus of single-char words
    yields zero merges."""
    from knext_spark.pipeline import bpe_merges

    docs = spark.createDataFrame([(1, "aaaa aaaa aaaaa")], ["doc_id", "text"])
    got = [tuple(r) for r in bpe_merges(docs, k=5).collect()]
    assert got[:2] == [(1, "a", "a", "aa", 10), (2, "aa", "aa", "aaaa", 3)]
    singles = spark.createDataFrame([(1, "a b c a b")], ["doc_id", "text"])
    assert bpe_merges(singles, k=3).count() == 0


def _py_bpe(freqs: dict, k: int):
    """Pure-python BPE replay: same tie-break, same greedy fold."""
    state = {w: tuple(w) for w in freqs}
    out = []
    for r in range(1, k + 1):
        pc: dict = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + freqs[w]
        if not pc:
            break
        (a, b), total = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((r, a, b, a + b, total))
        nxt = {}
        for w, syms in state.items():
            acc = [syms[0]]
            for x in syms[1:]:
                if acc[-1] == a and x == b:
                    acc[-1] = a + b
                else:
                    acc.append(x)
            nxt[w] = tuple(acc)
        state = nxt
    return out, state


def test_bpe_merges_python_replay(spark):
    """Seeded pseudo-random corpus over a 3-letter alphabet replayed
    in pure python: identical merge table for 10 rounds."""
    import random

    from knext_spark.pipeline import bpe_merges

    rng = random.Random(23)
    words = [
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 7)))
        for _ in range(200)
    ]
    freqs: dict = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    want, _ = _py_bpe(freqs, 10)
    docs = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    got = [tuple(r) for r in bpe_merges(docs, k=10).collect()]
    assert got == want and len(got) == 10


def test_bpe_encode_roundtrip(spark):
    """Encoding the training corpus with the learned merges reproduces
    the learner's final symbol state word-for-word, preserves document
    token order, and n_chars equals the corpus's alnum char count."""
    from knext_spark.pipeline import bpe_encode, bpe_merges

    docs = spark.createDataFrame(
        [(1, "lower newest"), (2, "newest widest low")], ["doc_id", "text"]
    )
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_merges(docs, k=4).collect()
    ]
    freqs = {"lower": 1, "newest": 2, "widest": 1, "low": 1}
    _, state = _py_bpe(freqs, 4)
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    assert out[1]["pieces"] == list(state["lower"]) + list(state["newest"])
    assert (
        out[2]["pieces"]
        == list(state["newest"]) + list(state["widest"]) + list(state["low"])
    )
    for d, words in ((1, ["lower", "newest"]), (2, ["newest", "widest", "low"])):
        assert out[d]["n_pieces"] == len(out[d]["pieces"])
        assert out[d]["n_chars"] == sum(len(w) for w in words)


def test_bpe_merges_rejects_bad_params(spark):
    """k < 1 fails loudly."""
    import pytest as _pytest

    from knext_spark.pipeline import bpe_merges

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        bpe_merges(df, k=0)


def _py_bloom_bits(keys, depth, b_hex, salt="bloom"):
    import hashlib

    bits = set()
    for k in keys:
        for r in range(depth):
            hx = hashlib.md5(f"{salt}:{r}:{k}".encode()).hexdigest()
            bits.add(f"{r}:{hx[:b_hex]}")
    return bits


def test_bloom_matches_python_replay_and_never_false_negative(spark):
    """Bloom filter (pipeline/sketch.py bloom_bits/bloom_probe): the
    bit table matches a pure-python md5 replay exactly; every inserted
    key probes true (no false negatives — the Bloom guarantee); a
    16-bit filter over 37 keys genuinely false-positives somewhere
    while a wide one rejects every unseen key — both regimes forced."""
    from knext_spark.pipeline import bloom_bits, bloom_probe

    keys = sorted({f"k{i % 37}" for i in range(200)})
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    bits = bloom_bits(df, "k", depth=3, b_hex=1)
    assert {r["bit"] for r in bits.collect()} == _py_bloom_bits(keys, 3, 1)

    unseen = [f"u{i}" for i in range(64)]
    qdf = spark.createDataFrame([(k,) for k in keys + unseen], "k string")
    got = {
        r["k"]: r["maybe_member"]
        for r in bloom_probe(bits, qdf, "k", depth=3, b_hex=1).collect()
    }
    assert all(got[k] for k in keys), "Bloom false-negatived a member"
    assert any(got[k] for k in unseen), (
        "a 16-bit filter holding 37 keys is saturated — unseen keys "
        "must false-positive"
    )
    wide = bloom_probe(
        bloom_bits(df, "k", depth=3, b_hex=6), qdf, "k", depth=3, b_hex=6
    )
    gw = {r["k"]: r["maybe_member"] for r in wide.collect()}
    assert all(gw[k] for k in keys)
    assert not any(gw[k] for k in unseen)


def test_bloom_merge_exactness_and_guards(spark):
    """Bit tables from disjoint slices merge (distinct) into exactly
    the whole-input table; parameter guards reject bad depth/width; a
    probe against a filter built at a different b_hex fails LOUDLY."""
    import pytest as _pytest

    from knext_spark.pipeline import bloom_bits, bloom_merge, bloom_probe

    rows = [(f"t{i % 11}",) for i in range(300)]
    df = spark.createDataFrame(rows, "k string")
    h1 = bloom_bits(df.where("k < 't5'"), "k", depth=4, b_hex=2)
    h2 = bloom_bits(df.where("k >= 't5'"), "k", depth=4, b_hex=2)
    merged = bloom_merge(h1.unionByName(h2))
    direct = bloom_bits(df, "k", depth=4, b_hex=2)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    with _pytest.raises(ValueError):
        bloom_bits(df, "k", depth=0)
    with _pytest.raises(ValueError):
        bloom_bits(df, "k", b_hex=9)
    q = spark.createDataFrame([("t1",)], "k string")
    with _pytest.raises(Exception, match="b_hex"):
        bloom_probe(bloom_bits(df, "k", depth=4, b_hex=4), q, "k",
                    depth=4, b_hex=1).collect()
