"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator family (SURVEY.md §2 +
the training-data pipeline mandate) onto the driver's synthetic tables;
``oracle_sql()`` gives the DuckDB-equivalent SQL. Cross-engine value
parity rules used throughout:

- all hashing is md5 (identical hex in Spark and DuckDB);
- double-valued scores are folded in identical order on both sides
  (Spark ``aggregate``/DuckDB ``list_reduce`` are both left folds), and
  exported as integer micros ``floor(x*1e6 + 0.5)`` where rank/compare
  stability matters;
- double->int conversions use floor() (DuckDB CAST rounds, Spark CAST
  truncates — floor agrees);
- integer-valued Spark columns are cast to bigint (DuckDB count/len
  return BIGINT).

All graph algorithms now carry full DuckDB oracles: triangle counting
as a 3-way self-join, connected components as a WITH RECURSIVE
transitive closure (min reachable id), and fixed-iteration PageRank /
label propagation as programmatically unrolled CTE chains that mirror
the engine's superstep arithmetic — same operation STRUCTURE, not a
bit-level guarantee: each engine folds its aggregation partials in
its own order, so micros equality additionally relies on no value
landing within ~1e-10 of a .5 micro-rounding boundary (see
_pagerank_sql; robustness evidenced at a second graph shape in
tests/test_entry_contract.py::test_pagerank_micros_oracle_second_graph
on top of the two driver SFs). The KGML pipeline is oracled through
``kgml_edges_mixed`` and ``kgml_edges_contract``: DuckDB has no XML
reader, but the corpus is deterministic, so the oracles embed the same
documents as literals and re-parse them with RE2 regex + list
comprehensions — an independent recomputation of the whole parse ->
flatten -> clique -> keep-last pipeline (mixed mode), extended by a
recursive-CTE reachability fixpoint that gates genes mode end-to-end
with the scale-path propagation variant (contract). Only
``kgml_edges`` (genes mode, propagate='faithful') stays rows-only BY
NECESSITY: the faithful propagation anchors on ``nx.shortest_path``'s
insertion-order BFS tie-breaking (reference genes.py:157-218), which
has no honest SQL equivalent when multiple shortest paths exist —
parity for that variant is covered by the byte-exact golden tests
against the executed reference (tests/test_knext_golden.py) instead.

DuckDB type parity notes: decimal literals are DECIMAL (not double) in
DuckDB, so every float constant is cast(... as double); sum(BIGINT) is
HUGEINT (which the driver canonicalizes as float64), so integer sums
are wrapped in cast(... as bigint); float32 columns are reproduced with
DuckDB's 4-byte FLOAT (verified bit-identical micros for all byte
values).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

TOKEN_RE = "[a-z0-9]+"
_STOP = ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"]
_LANGS = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "en": _STOP,
    "es": ["el", "la", "los", "que", "es", "una", "por", "con", "para", "del"],
    "fr": ["le", "la", "les", "et", "est", "une", "des", "que", "pour", "dans"],
}


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _micros(c) -> F.Column:
    return F.floor(c * 1000000 + F.lit(0.5)).cast("long")


_SPLITS = {"train": 0.9, "valid": 0.05, "test": 0.05}


def _split_sql(fractions: dict[str, float] = _SPLITS) -> str:
    """CASE expression built from the SAME cut strings the engine uses
    (pipeline/splits._thresholds) — one source of truth for both
    sides; fixed-length lowercase hex compares lexicographically like
    its numeric value, so no float arithmetic on either side."""
    from knext_spark.pipeline.splits import _thresholds

    cuts = _thresholds(fractions)
    whens = "\n                   ".join(
        f"when substr(md5(text), 1, 8) < '{bound}' then '{name}'"
        for name, bound in cuts[:-1]
    )
    return f"""
            select doc_id,
                   case {whens}
                        else '{cuts[-1][0]}' end as split
            from documents
        """


def _edge_table(spark: SparkSession, sf_dir: str, mod: int = 1000) -> DataFrame:
    """Deterministic graph derived from lineitem: src/dst in a shared
    mod-``mod`` id space (triangle-bearing, hub-skewed). ``mod`` varies
    the graph shape for robustness tests of the unrolled oracles."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.select(
            (F.col("l_orderkey") % mod).alias("src"),
            (F.col("l_partkey") % mod).alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


def _edge_sql(mod: int = 1000) -> str:
    return (
        f"select distinct l_orderkey % {mod} as src, l_partkey % {mod} as dst "
        "from lineitem"
    )


_EDGE_SQL = _edge_sql()


# ---------------------------------------------------------------- entry
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the lineitem-derived link graph at
    sf0.001 — the engine's headline capability (iterative DataFrame-join
    supersteps with checkpointing), returning the top-100 ranks."""
    from knext_spark.graph import pagerank

    edges = _edge_table(spark, "/root/testdata/sf0.001")
    res = pagerank(
        spark,
        edges,
        checkpoint_dir=tempfile.mkdtemp(prefix="entry_ckpt_"),
        run_id="entry",
        cadence=50,
    )
    return res.state.orderBy(F.desc("rank"), "node").limit(100)


# -------------------------------------------------------------- queries
def q_agg_collect_join(spark, sf_dir):
    """A1: per-group ordered collect + comma-join (knext subtype agg)."""
    li = _read(spark, sf_dir, "lineitem")
    rows = F.array_sort(F.collect_list(F.struct("l_linenumber", "l_returnflag")))
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.transform(rows, lambda r: r["l_returnflag"]), ",").alias(
            "flags"
        )
    )


def q_dedup_keep_last(spark, sf_dir):
    """A4: dedup keep-last via row_number window (clique overwrite)."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def q_broadcast_lookup_join(spark, sf_dir):
    """J1: broadcast dim lookup join + aggregation."""
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.floor("l_quantity").cast("long")).alias("sum_qty"),
        )
    )


def q_explode_tokens(spark, sf_dir):
    """J6/P7: split -> explode -> count (name-array fan-out)."""
    part = _read(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_type", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def q_prefix_filter(spark, sf_dir):
    """P8/F3: startswith predicate + count by group."""
    o = _read(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderpriority").startswith("1"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


def q_union_distinct(spark, sf_dir):
    """U3: union + distinct of two key sets."""
    o = _read(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = _read(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.unionByName(c).distinct()


def q_regex_modifier_roundtrip(spark, sf_dir):
    """P12/P13/F4/F5: extract terminal modifier, strip, re-append."""
    d = _read(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.nullif(F.regexp_extract("source", "([0-9]+)$", 1), F.lit("")).alias(
            "modifier"
        ),
        F.regexp_replace("source", "([0-9]+)$", "").alias("base"),
        F.concat(
            F.regexp_replace("source", "([0-9]+)$", ""),
            F.coalesce(
                F.nullif(F.regexp_extract("source", "([0-9]+)$", 1), F.lit("")),
                F.lit(""),
            ),
        ).alias("roundtrip"),
    )


def q_clique_pairs(spark, sf_dir):
    """J7/J8: within-group pair generation (clique expansion)."""
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("s1"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("s2"))
    return (
        a.join(b, "k")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("n_orders"))
    )


def q_degrees(spark, sf_dir):
    """A3/G2: in/out degree aggregation over the derived edge table."""
    from knext_spark.graph import degrees

    return degrees(_edge_table(spark, sf_dir)).select(
        "node", F.col("in_deg").cast("long").alias("in_deg"),
        F.col("out_deg").cast("long").alias("out_deg"),
    )


def q_graph_roots(spark, sf_dir):
    """G2: roots (in-degree 0) via left-anti join."""
    from knext_spark.graph import roots as _roots

    return _roots(_edge_table(spark, sf_dir))


def q_pricing_summary(spark, sf_dir):
    """Headline agg (TPC-H Q1 shape, exact integer arithmetic)."""
    li = _read(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.floor("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(_micros(F.col("l_extendedprice") / 1000000 * 100)).alias("sum_price_cents"),
    )


def q_window_topk(spark, sf_dir):
    """§2.5: per-key top-k by window rank."""
    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


def q_anti_join(spark, sf_dir):
    """left-anti join: customers with no orders."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_mktsegment")


def q_lookup_fallback(spark, sf_dir):
    """P5/F12: broadcast lookup with coalesce fallback on miss."""
    ev = _read(spark, sf_dir, "events")
    c = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        ev.join(F.broadcast(c), "user_id", "left")
        .select(F.coalesce("c_mktsegment", F.lit("unknown")).alias("segment"))
        .groupBy("segment")
        .agg(F.count("*").alias("n"))
    )


# ------------------------------------------------ pipeline: text analysis
def q_token_count(spark, sf_dir):
    from knext_spark.pipeline import token_count

    d = _read(spark, sf_dir, "documents")
    out = token_count(d)
    return out.select(
        "doc_id",
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("re_tokens").cast("long").alias("re_tokens"),
        F.col("chars").cast("long").alias("chars"),
    )


def q_deterministic_split(spark, sf_dir):
    """Content-hash train/valid/test assignment (pipeline/splits.py):
    lexicographic comparison of md5-hex prefixes against precomputed
    hex cut strings — no float arithmetic, so Spark and DuckDB agree
    row-for-row. Keyed on text: exact duplicates land in one split."""
    from knext_spark.pipeline import deterministic_split

    d = _read(spark, sf_dir, "documents")
    return deterministic_split(d, key_col="text", fractions=_SPLITS).select(
        "doc_id", "split"
    )


def q_quality_score(spark, sf_dir):
    from knext_spark.pipeline import quality_score

    d = _read(spark, sf_dir, "documents")
    out = quality_score(d)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        _micros(F.col("punct_ratio")).alias("punct_ratio_micros"),
        _micros(F.col("stopword_ratio")).alias("stopword_ratio_micros"),
        _micros(F.col("mean_token_len")).alias("mean_token_len_micros"),
        F.col("distinct_stopwords").cast("long").alias("distinct_stopwords"),
        _micros(F.col("quality")).alias("quality_micros"),
    )


def q_lang_id(spark, sf_dir):
    from knext_spark.pipeline import lang_id

    d = _read(spark, sf_dir, "documents")
    return lang_id(d).select(
        "doc_id", "pred_lang", F.col("marker_hits").cast("long").alias("marker_hits")
    )


def q_corpus_profile(spark, sf_dir):
    """Per-language corpus profile (pipeline/text.py:corpus_profile):
    one scan, one exchange; mean quality is a dyadic-rational sum
    (exact in any order) and the exact interpolated percentiles match
    DuckDB's quantile_cont definition (type-7, rank = p*(n-1))."""
    from knext_spark.pipeline import corpus_profile

    out = corpus_profile(_read(spark, sf_dir, "documents"))
    return out.select(
        "pred_lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("total_chars").cast("long").alias("total_chars"),
        _micros(F.col("mean_quality")).alias("mean_quality_micros"),
        _micros(F.col("p50_tokens")).alias("p50_tokens_micros"),
        _micros(F.col("p90_tokens")).alias("p90_tokens_micros"),
        _micros(F.col("p99_tokens")).alias("p99_tokens_micros"),
    )


def q_scrub_pii(spark, sf_dir):
    """PII scrubbing (pipeline/text.py:scrub_pii) over documents
    ENRICHED with deterministic synthetic PII (doc_id-derived email /
    IPv4 / phone / SSN-shaped suffixes built identically in both
    engines) so every pattern actually fires. Patterns come from the
    single PII_PATTERNS source of truth; output text compared by md5."""
    from knext_spark.pipeline import scrub_pii

    d = _read(spark, sf_dir, "documents")
    enriched = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" call +1 (555) 01"),
                    (F.col("doc_id") % 90 + 10).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" id 123-45-6789")).otherwise(
                F.lit("")
            ),
        ),
    )
    out = scrub_pii(enriched)
    from knext_spark.pipeline.text import PII_PATTERNS

    return out.select(
        "doc_id",
        F.md5(F.col("text")).alias("scrubbed_md5"),
        *[F.col(f"n_{n}").cast("long").alias(f"n_{n}") for n, _, _ in PII_PATTERNS],
        F.col("n_pii").cast("long").alias("n_pii"),
    )


def _scrub_pii_sql() -> str:
    from knext_spark.pipeline.text import PII_PATTERNS

    enrich = """
      select doc_id,
             text || ' contact user' || cast(doc_id as varchar)
                  || '@example.com from 10.0.'
                  || cast(doc_id % 256 as varchar) || '.7'
                  || case when doc_id % 3 = 0
                          then ' call +1 (555) 01' || cast(doc_id % 90 + 10 as varchar)
                          else '' end
                  || case when doc_id % 5 = 0 then ' id 123-45-6789' else '' end
               as text
      from documents
    """
    scrubbed = "text"
    counts, total = [], []
    for name, pat, token in PII_PATTERNS:
        lit = pat.replace("'", "''")
        counts.append(
            f"cast(len(regexp_extract_all(text, '{lit}')) as bigint) as n_{name}"
        )
        total.append(f"n_{name}")
        scrubbed = f"regexp_replace({scrubbed}, '{lit}', '{token}', 'g')"
    return f"""
        with enr as ({enrich})
        select doc_id,
               md5({scrubbed}) as scrubbed_md5,
               {', '.join(counts)},
               cast({' + '.join(total)} as bigint) as n_pii
        from enr
    """


def q_doc_fingerprint(spark, sf_dir):
    from knext_spark.pipeline import doc_fingerprint

    return doc_fingerprint(_read(spark, sf_dir, "documents"))


# ------------------------------------------------ pipeline: deduplication
def q_exact_dedup(spark, sf_dir):
    from knext_spark.pipeline import exact_dedup

    out = exact_dedup(_read(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "content_hash", F.col("group_size").cast("long").alias("group_size")
    )


def q_minhash_signatures(spark, sf_dir):
    from knext_spark.pipeline import minhash_signatures

    return minhash_signatures(_read(spark, sf_dir, "documents"), k=8, w=3)


def q_lsh_candidates(spark, sf_dir):
    from knext_spark.pipeline import minhash_signatures, lsh_candidate_pairs

    sig = minhash_signatures(_read(spark, sf_dir, "documents"), k=8, w=3)
    return lsh_candidate_pairs(sig, bands=4, rows=2)


def q_minhash_dedup(spark, sf_dir):
    from knext_spark.pipeline import minhash_dedup_pairs

    out = minhash_dedup_pairs(
        _read(spark, sf_dir, "documents"), k=8, w=3, bands=4, rows=2, threshold=0.2
    )
    return out.select("a", "b", _micros(F.col("jaccard")).alias("jaccard_micros"))


def q_dedup_against(spark, sf_dir):
    """Incremental dedup across the corpus boundary (pipeline/dedup.py
    dedup_against): docs with doc_id % 3 != 0 are the 'new batch',
    % 3 == 0 the 'seen corpus'. Exact via normalized-md5 anti-probe,
    near via cross-side LSH bands + exact-Jaccard verify — integers
    plus one division, micros-gated."""
    from knext_spark.pipeline import dedup_against

    docs = _read(spark, sf_dir, "documents")
    out = dedup_against(
        docs.where("doc_id % 3 != 0"),
        docs.where("doc_id % 3 = 0"),
        threshold=0.5,
    )
    return out.select(
        "doc_id",
        "exact_dup",
        F.col("exact_dup_of").cast("long").alias("exact_dup_of"),
        "near_dup",
        F.col("near_dup_of").cast("long").alias("near_dup_of"),
        _micros(F.col("near_jaccard")).alias("near_jaccard_micros"),
    )


def q_dedup_clusters(spark, sf_dir):
    """Transitive fuzzy-dedup clustering (pipeline/dedup.py:
    dedup_clusters): minhash pairs -> CC closure -> per-doc
    (cluster, is_canonical). Oracle closes the SAME pair set with a
    recursive CTE and takes the same min-key label."""
    from knext_spark.pipeline import dedup_clusters

    out = dedup_clusters(
        spark,
        _read(spark, sf_dir, "documents"),
        checkpoint_dir=tempfile.mkdtemp(prefix="q_ddc_"),
        k=8, w=3, bands=4, rows=2, threshold=0.2,
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster").cast("long").alias("cluster"),
        "is_canonical",
    )


def q_ngram_jaccard(spark, sf_dir):
    from knext_spark.pipeline import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        _read(spark, sf_dir, "documents"), w=3, threshold=0.1
    )
    return out.select("a", "b", _micros(F.col("jaccard")).alias("jaccard_micros"))


def q_simhash(spark, sf_dir):
    from knext_spark.pipeline import simhash

    return simhash(_read(spark, sf_dir, "documents"), bits=16)


def q_simhash_near_pairs(spark, sf_dir):
    from knext_spark.pipeline.dedup import simhash_near_pairs

    out = simhash_near_pairs(
        _read(spark, sf_dir, "documents"), bits=16, max_hamming=2, chunks=4
    )
    return out.select("a", "b", F.col("hamming").cast("long").alias("hamming"))


# -------------------------------------------- pipeline: similarity search
def q_cosine_topk(spark, sf_dir):
    from knext_spark.pipeline import cosine_topk

    out = cosine_topk(_read(spark, sf_dir, "embeddings"), k=3)
    return out.select(
        "vec_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        _micros(F.col("cosine")).alias("cosine_micros"),
    )


def q_ann_ivf(spark, sf_dir):
    """IVF-flat ANN (the data-adaptive scale path, complementing LSH):
    deterministic seed centroids -> inverted-list assignment -> nprobe
    probing -> exact in-list re-rank. Fully oracled: the centroid
    order-statistics sample, assignment argmax, and probe set are all
    reproduced in DuckDB SQL."""
    from knext_spark.pipeline import ivf_ann_topk

    out = ivf_ann_topk(
        _read(spark, sf_dir, "embeddings"), k=3, n_centroids=16, nprobe=2
    )
    return out.select(
        "vec_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        _micros(F.col("cosine")).alias("cosine_micros"),
        F.col("cid").cast("long").alias("cid"),
    )


def q_ann_ivf_refined(spark, sf_dir):
    """IVF with two deterministic Lloyd refinement iterations
    (similarity.ivf_centroids refine=2): assignment argmax + exact
    micros-int cluster means, so every step — and therefore the whole
    trained index — is reproduced bit-exactly by the unrolled
    materialized-CTE oracle. Same probe/re-rank shape as ann_ivf."""
    from knext_spark.pipeline import ivf_ann_topk

    out = ivf_ann_topk(
        _read(spark, sf_dir, "embeddings"), k=3, n_centroids=16, nprobe=2,
        refine=2,
    )
    return out.select(
        "vec_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        _micros(F.col("cosine")).alias("cosine_micros"),
        F.col("cid").cast("long").alias("cid"),
    )


def q_lsh_ann_buckets(spark, sf_dir):
    from knext_spark.pipeline.similarity import lsh_bucket

    emb = _read(spark, sf_dir, "embeddings")
    return (
        emb.select(lsh_bucket(F.col("embedding"), 4).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def q_ann_multiprobe(spark, sf_dir):
    """Multiprobe LSH ANN: same-bucket + 1-bit-flip probe candidates,
    exact cosine re-rank (Lv et al. VLDB'07 fixed probing sequence)."""
    from knext_spark.pipeline.similarity import lsh_ann_topk

    out = lsh_ann_topk(
        _read(spark, sf_dir, "embeddings"), k=3, planes=4, probes=2,
        # the DuckDB oracle applies no bucket cap, and with a FIXED
        # planes=4 (16 buckets) ordinary corpus growth would trip the
        # default cap on every bucket long before any degeneracy —
        # cap-free keeps the contract row oracle-equal at every SF.
        # The default-on cap is for planes="auto" callers, where the
        # expected bucket stays bounded as n grows.
        max_bucket=None,
    )
    return out.select(
        "vec_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        _micros(F.col("cosine")).alias("cosine_micros"),
    )


def q_ann_multiprobe_ranked(spark, sf_dir):
    """Perturbation-ranked multiprobe (Lv et al. VLDB'07 refinement):
    the probed buckets flip the planes with the smallest |projection|
    first — measurably better recall per probe than the fixed
    plane-order sequence (tests/test_pipeline_ops.py)."""
    from knext_spark.pipeline.similarity import lsh_ann_topk

    out = lsh_ann_topk(
        _read(spark, sf_dir, "embeddings"),
        k=3,
        planes=4,
        probes=2,
        probe_rank="distance",
        max_bucket=None,  # cap-free: see q_ann_multiprobe
    )
    return out.select(
        "vec_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        _micros(F.col("cosine")).alias("cosine_micros"),
    )


def q_embedding_near_dups(spark, sf_dir):
    from knext_spark.pipeline import embedding_near_dups

    out = embedding_near_dups(
        _read(spark, sf_dir, "embeddings"), threshold=0.2, planes=4,
        max_bucket=None,  # cap-free: see q_ann_multiprobe
    )
    return out.select("a", "b", _micros(F.col("cosine")).alias("cosine_micros"))


# ------------------------------------------------ pipeline: multimodal
def q_payload_stats(spark, sf_dir):
    from knext_spark.pipeline.multimodal import media_from_documents, payload_stats

    media = media_from_documents(_read(spark, sf_dir, "documents"))
    return payload_stats(media).select("media_id", "kind", "n_bytes", "payload_sha256")


def q_media_features(spark, sf_dir):
    """Arrow-batched decode stub (mapInPandas plumbing).

    The ``feature array<float>`` column is projected to a joined
    micros string: the driver's pandas canonicalizer cannot sort
    list-typed columns (unhashable), and the scalar form additionally
    enables a full DuckDB oracle (the fake feature is sha256-byte
    derived; DuckDB's 4-byte FLOAT reproduces the float32 rounding
    bit-for-bit).
    """
    from knext_spark.pipeline.multimodal import decode_features, media_from_documents

    media = media_from_documents(_read(spark, sf_dir, "documents"))
    out = decode_features(media, dim=8)
    return out.select(
        "media_id",
        "kind",
        "n_bytes",
        "payload_sha256",
        F.array_join(
            F.transform(F.col("feature"), lambda x: _micros(x.cast("double")).cast("string")),
            ",",
        ).alias("feature_micros"),
    )


# ------------------------------------------------------- graph algorithms
def q_triangles(spark, sf_dir):
    from knext_spark.graph import triangle_count

    return triangle_count(_edge_table(spark, sf_dir)).select(
        "node", F.col("triangles").cast("long").alias("triangles")
    )


_BFS_HOPS = 20  # engine max_iter == oracle recursion horizon


def q_bfs_distances(spark, sf_dir):
    """Multi-source BFS hop distances (graph/bfs.py) from the ~1% of
    nodes with node % 100 == 0; NULL beyond the shared _BFS_HOPS
    horizon (both engines cap identically, so the bound is inert on
    this small-diameter graph but alignment-safe in principle)."""
    from knext_spark.graph import bfs_distances

    edges = _edge_table(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") % 100 == 0)
    )
    return bfs_distances(edges, seeds, max_iter=_BFS_HOPS).select("node", "dist")


def q_pseudo_diameter(spark, sf_dir):
    """Double-sweep pseudo-diameter (graph/bfs.py pseudo_diameter):
    two chained BFS closures, sweep 2 seeded at sweep 1's farthest
    node (ties -> min id) — all integers, cross-engine exact; same
    _BFS_HOPS horizon as the other BFS oracles."""
    from knext_spark.graph import pseudo_diameter

    edges = _edge_table(spark, sf_dir)
    return pseudo_diameter(edges, sweeps=2, max_iter=_BFS_HOPS).select(
        "sweep", "source", "farthest", "ecc"
    )


def q_landmark_distances(spark, sf_dir):
    """Per-seed landmark BFS (graph/landmarks.py): (seed, node, dist)
    for every reached pair from the node%100 seed set — pure integers,
    so cross-engine exact; same _BFS_HOPS horizon as bfs_distances."""
    from knext_spark.graph import landmark_distances

    edges = _edge_table(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") % 100 == 0)
    )
    return landmark_distances(edges, seeds, max_iter=_BFS_HOPS).select(
        "seed", "node", "dist"
    )


_SPC_HOPS = 6  # path-counts horizon: engine max_iter == oracle unroll depth


def q_path_counts(spark, sf_dir):
    """Brandes forward pass (graph/betweenness.py): per-seed hop
    distance AND exact shortest-path count σ — pure integers, so the
    whole forward half of betweenness is hash-gated cross-engine (the
    backward δ accumulation is a float sum, nx-test-gated like the
    other order-dependent scores)."""
    from knext_spark.graph import shortest_path_counts

    edges = _edge_table(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") % 100 == 0)
    )
    return shortest_path_counts(edges, seeds, max_iter=_SPC_HOPS).select(
        "seed", "node", "dist", "sigma"
    )


_WALK_LEN = 5
_WALKS_PER_START = 2


def q_random_walks(spark, sf_dir):
    """Deterministic DeepWalk-style walk corpus (graph/walks.py):
    hash-argmin next-hop choice, so every position is a pure function
    of the data — all-long rows, hash-exact against the unrolled
    per-step CTE oracle."""
    from knext_spark.graph import random_walks

    edges = _edge_table(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") % 100 == 0)
    )
    return random_walks(
        edges, seeds, length=_WALK_LEN, walks_per_start=_WALKS_PER_START
    ).select("start", "walk", "step", "node")


_N2V_W = (1, 4, 2)  # (w_return, w_common, w_far): p = 4, q = 2


def q_node2vec_walks(spark, sf_dir):
    """node2vec-biased deterministic walks (graph/walks.py
    node2vec_walks): integer ticket weights keep the biased choice a
    pure md5 argmin — all longs/strings, hash-exact against the
    unrolled per-step CTE oracle (one extra (prev, dst) adjacency
    probe and a ticket unnest per step vs random_walks)."""
    from knext_spark.graph import node2vec_walks

    edges = _edge_table(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") % 100 == 0)
    )
    wr, wc, wf = _N2V_W
    return node2vec_walks(
        edges, seeds, length=_WALK_LEN, walks_per_start=_WALKS_PER_START,
        w_return=wr, w_common=wc, w_far=wf,
    ).select("start", "walk", "step", "node")


def _node2vec_sql(
    length: int = _WALK_LEN,
    walks: int = _WALKS_PER_START,
    edge_sql: str = _EDGE_SQL,
) -> str:
    """Unrolled node2vec walk oracle mirroring graph/walks.py
    node2vec_walks: per step, candidates classified against the
    PREVIOUS position (return / triangle-closing via a second e0
    probe / far), weight w tickets unnested, argmin of
    md5(start:walk:step:dst:ticket) with (hash, dst) tie order —
    integers and strings only."""
    wr, wc, wf = _N2V_W
    walk_rows = " union all ".join(f"select {r} as walk" for r in range(walks))
    parts = [f"""
    w0 as materialized (
      select node as start, cast(walk as bigint) as walk,
             cast(0 as bigint) as step, node, cast(null as bigint) as prev
      from seeds, ({walk_rows})
    )"""]
    for t in range(1, length + 1):
        p = t - 1
        parts.append(f"""
    c{t} as materialized (
      select p.start, p.walk, p.node as cur, e0.dst,
             case when p.prev is null then 1
                  when e0.dst = p.prev then {wr}
                  when a2.src is not null then {wc}
                  else {wf} end as w
      from w{p} p
      join e0 on e0.src = p.node
      left join e0 a2 on a2.src = p.prev and a2.dst = e0.dst
    ),
    w{t} as materialized (
      select start, walk, cast({t} as bigint) as step,
             dst as node, cur as prev
      from (
        select start, walk, cur, dst,
               row_number() over (
                 partition by start, walk
                 order by md5(start::varchar || ':' || walk::varchar
                              || ':{t}:' || dst::varchar
                              || ':' || tk::varchar), dst
               ) as rn
        from (
          select start, walk, cur, dst,
                 unnest(range(1, w + 1)) as tk
          from c{t}
        )
      ) where rn = 1
    )""")
    union = "\n      union all ".join(
        f"select start, walk, step, node from w{t}" for t in range(length + 1)
    )
    return f"""
    with e as materialized ({edge_sql}),
    e0 as materialized (select distinct src, dst from e),
    seeds as materialized (
      select node from (select src as node from e union select dst from e)
      where node % 100 = 0
    ),
    {",".join(parts)}
    {union}
    """


def q_clustering_coef(spark, sf_dir):
    """nx.clustering parity (graph/linkpred.py); micros so the double
    division hashes identically cross-engine (both sides compute the
    same IEEE expression from the same integers)."""
    from knext_spark.graph import clustering_coefficient

    return clustering_coefficient(_edge_table(spark, sf_dir)).select(
        "node", _micros(F.col("clustering")).alias("clustering_micros")
    )


def q_neighbor_jaccard(spark, sf_dir):
    """Common-neighbor link prediction on the SPARSE contract graph
    (mod=5000: ~60k edges over ~7k nodes): min_common=3 keeps the
    candidate set selective (~17k pairs at sf0.01) the same way the
    engine's min_common governor would at scale."""
    from knext_spark.graph import neighbor_jaccard

    return neighbor_jaccard(
        _edge_table(spark, sf_dir, mod=5000), min_common=3
    ).select(
        "a",
        "b",
        F.col("common").cast("long").alias("common"),
        F.col("union_size").cast("long").alias("union_size"),
        _micros(F.col("jaccard")).alias("jaccard_micros"),
    )


def q_link_features(spark, sf_dir):
    """Preferential-attachment link-prediction scores on the same
    sparse contract graph as neighbor_jaccard: deg(a)*deg(b) is a
    pure-integer product, so values hash exactly cross-engine (the
    adamic_adar / resource_allocation float SUMS are test-gated with a
    tolerance instead — accumulation order is engine-specific)."""
    from knext_spark.graph import neighbor_jaccard

    return neighbor_jaccard(
        _edge_table(spark, sf_dir, mod=5000),
        min_common=3,
        preferential_attachment=True,
    ).select(
        "a",
        "b",
        F.col("common").cast("long").alias("common"),
        F.col("preferential_attachment"),
    )


def q_assortativity(spark, sf_dir):
    """Newman degree assortativity (graph/degrees.py): one row of
    exact int64 moments + the coefficient as a fixed IEEE dag of them
    — the whole row hash-exact (the symmetric-Pearson denominator
    needs no sqrt, so no libm dependence either)."""
    from knext_spark.graph import degree_assortativity

    return degree_assortativity(_edge_table(spark, sf_dir)).select(
        "n_ends",
        "sum_d",
        "sum_dd",
        "sum_d2",
        _micros(F.col("assortativity")).alias("assortativity_micros"),
    )


def q_modularity(spark, sf_dir):
    """Per-community Newman modularity breakdown (graph/modularity.py)
    for the deterministic node%7 labeling: internal edge and degree
    totals are exact integers, each community's contribution is a
    fixed dag of correctly-rounded IEEE ops on them — micros-safe
    (the SCALAR Q, a float sum over this frame, is nx-test-gated)."""
    from knext_spark.graph import community_contributions

    edges = _edge_table(spark, sf_dir)
    labels = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", (F.col("node") % 7).alias("label"))
    )
    return community_contributions(edges, labels).select(
        "label",
        "internal_edges",
        "degree_sum",
        _micros(F.col("contribution")).alias("contribution_micros"),
    )


def q_contamination(spark, sf_dir):
    """Benchmark-contamination screen (pipeline/contamination.py):
    every ~97th document stands in for the eval suite; counts are
    integers and the ratio one two-integer division — micros-safe."""
    from knext_spark.pipeline import contamination

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    return contamination(docs, bench, w=3).select(
        "doc_id",
        "n_ngrams",
        "n_hits",
        _micros(F.col("contamination")).alias("contamination_micros"),
    )


def q_stratified_sample(spark, sf_dir):
    """Exact-quota per-language sample (pipeline/splits.py
    stratified_sample): 20 docs per lang, chosen by smallest
    md5(doc_id) — pure strings/integers, hash-exact."""
    from knext_spark.pipeline import stratified_sample

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return stratified_sample(
        docs, 20, stratum_col="lang", key_col="doc_id"
    ).select("doc_id", "lang")


_MIX_RATES = {"en": 0.35, "fr": 0.6, "de": 0.8, "es": 1.0}


def q_weighted_sample(spark, sf_dir):
    """Temperature-style corpus mixing (pipeline/splits.py
    weighted_sample): per-language keep-rates compiled to md5-hex cut
    strings — pure strings end-to-end, hash-exact; the oracle CASE is
    generated from the SAME rate_hex() cuts (one source of truth)."""
    from knext_spark.pipeline import weighted_sample

    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    return weighted_sample(
        docs, _MIX_RATES, stratum_col="lang", key_col="doc_id", salt="mix"
    ).select("doc_id", "lang")


def _weighted_sample_sql() -> str:
    from knext_spark.pipeline.splits import rate_hex

    whens = []
    for lang, rate in _MIX_RATES.items():
        cut = rate_hex(rate)
        pred = (
            "true"
            if cut is None
            else f"substr(md5('mix:' || cast(doc_id as varchar)), 1, 8) < '{cut}'"
        )
        whens.append(f"when lang = '{lang}' then {pred}")
    case = "\n                     ".join(whens)
    return f"""
            select doc_id, lang from documents
            where case {case}
                       else false end
        """


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog approximate distinct tokens per language
    (pipeline/sketch.py): registers/rho from md5 hex STRING ops only,
    the harmonic sum an ordered left fold of exact power-of-two
    doubles — hash-exact across engines (the linear-counting ln
    follows tfidf's 1-ulp micros reasoning)."""
    from knext_spark.pipeline import hll_distinct
    from knext_spark.pipeline.text import tokens_col

    docs = _read(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(tokens_col("text")).alias("token")
    )
    out = hll_distinct(tok, "token", ["lang"], k_hex=3)
    return out.select(
        "lang",
        "n_registers",
        "v_zero",
        _micros(F.col("estimate")).alias("estimate_micros"),
    )


def _hll_sql(k_hex: int = 3) -> str:
    """DuckDB recomputation of the whole HLL pipeline, generated from
    the same constants (alpha via pipeline/sketch._alpha — one source
    of truth; both engines parse the identical repr literal)."""
    from knext_spark.pipeline.sketch import _alpha

    m = 16**k_hex
    a_m2 = repr(_alpha(m) * m * m)
    return f"""
            with tok as (
              select lang, unnest({_TOKENS}) as token from documents
            ),
            h as (
              select lang, md5('hll:' || token) as hx from tok
            ),
            r0 as (
              select lang, substr(hx, 1, {k_hex}) as register,
                     substr(hx, {k_hex + 1}, 12) as suf
              from h
            ),
            r as (
              select lang, register,
                     case when length(regexp_extract(suf, '^0*')) = 12 then 49
                          else 4 * length(regexp_extract(suf, '^0*'))
                               + case when substr(suf, length(regexp_extract(suf, '^0*')) + 1, 1) >= '8' then 0
                                      when substr(suf, length(regexp_extract(suf, '^0*')) + 1, 1) >= '4' then 1
                                      when substr(suf, length(regexp_extract(suf, '^0*')) + 1, 1) >= '2' then 2
                                      else 3 end
                               + 1 end as rho
              from r0
            ),
            mx as (
              select lang, register, max(rho) as rho
              from r group by lang, register
            ),
            iv as (
              select lang, register,
                     cast(1.0 as double) / cast((1::bigint << rho) as double) as inv
              from mx
            ),
            agg as (
              select lang, count(*) as n_registers,
                     list(inv order by register) as l
              from iv group by lang
            ),
            est as (
              select lang, n_registers, {m} - n_registers as v_zero,
                     list_reduce(l, (a, b) -> a + b)
                       + cast({m} - n_registers as double) as s
              from agg
            )
            select lang,
                   cast(n_registers as bigint) as n_registers,
                   cast(v_zero as bigint) as v_zero,
                   cast(floor(
                     case when {a_m2} / s <= {repr(2.5 * m)} and v_zero > 0
                          then cast({m} as double)
                               * ln(cast({m} as double) / cast(v_zero as double))
                          else {a_m2} / s end * 1000000 + 0.5) as bigint
                   ) as estimate_micros
            from est
        """


def q_lm_score(spark, sf_dir):
    """Char-bigram LM scoring against the English slice
    (pipeline/lm.py lm_score): integer counts, the per-doc sum an
    ordered (bigram-string) left fold, ln the only libm call —
    micros-gated like tfidf."""
    from knext_spark.pipeline import lm_score

    docs = _read(spark, sf_dir, "documents")
    out = lm_score(docs, ref=docs.where("lang = 'en'"))
    return out.select(
        "doc_id",
        "n_bigrams",
        _micros(F.col("avg_logp")).alias("avg_logp_micros"),
    )


_LM_BIGRAMS = (
    "list_transform(range(1, length(lower(text))),"
    " i -> substr(lower(text), i, 2))"
)

_HQ_MICROS = [250000, 500000, 900000, 990000]  # q * 1e6, integers


def q_token_hist_quantiles(spark, sf_dir):
    """Mergeable fixed-bin histogram + interpolated quantiles of the
    per-doc token count, per language (pipeline/sketch.py histogram /
    histogram_quantiles): integer `div` binning, cumulative-sum window
    bin search, one float dag with NO libm — hash-exact."""
    from knext_spark.pipeline import histogram, histogram_quantiles
    from knext_spark.pipeline.text import tokens_col

    docs = _read(spark, sf_dir, "documents")
    tc = docs.select("lang", F.size(tokens_col("text")).alias("v"))
    h = histogram(tc, "v", 0, 2048, 64, ["lang"])
    qs = [m / 1000000 for m in _HQ_MICROS]
    out = histogram_quantiles(h, qs, 0, 2048, 64, ["lang"])
    return out.select(
        "lang",
        _micros(F.col("q")).alias("q_micros"),
        F.col("n"),
        _micros(F.col("estimate")).alias("est_micros"),
    )


def q_dup_spans(spark, sf_dir):
    """Maximal cross-doc duplicated token spans (pipeline/dedup.py
    dup_spans — the exact-substring-dedup span-extraction shape):
    w=5 windows occurring in >= 2 distinct docs, merged per doc by a
    running-max interval window. All integers — hash-exact against a
    full DuckDB recomputation of the same window/semi-join/merge dag
    (_dup_spans_sql)."""
    from knext_spark.pipeline import dup_spans

    return dup_spans(_read(spark, sf_dir, "documents"), w=5, min_docs=2)


def q_contaminated_spans(spark, sf_dir):
    """Decontamination spans (pipeline/dedup.py contaminated_spans):
    split documents into a pseudo-benchmark (doc_id % 10 == 0) and a
    training side, report every maximal training-token span whose w=5
    windows appear verbatim in the benchmark. All integers —
    hash-exact against a full DuckDB recomputation of the same
    window/semi-join/merge dag (_contam_spans_sql)."""
    from knext_spark.pipeline import contaminated_spans

    docs = _read(spark, sf_dir, "documents")
    ref = docs.where(F.col("doc_id") % 10 == 0)
    train = docs.where(F.col("doc_id") % 10 != 0)
    return contaminated_spans(train, ref, w=5)


def q_bpe_merges(spark, sf_dir):
    """First 8 BPE merges learned over the documents corpus
    (pipeline/bpe.py bpe_merges — Sennrich-style subword learning on
    the word-frequency dictionary). Deterministic (count desc, pair
    asc tie-break); integer counts and plain-string symbols —
    hash-exact against a full DuckDB recomputation that unrolls all 8
    rounds with the identical list_reduce greedy-merge fold
    (_bpe_sql)."""
    from knext_spark.pipeline import bpe_merges

    return bpe_merges(_read(spark, sf_dir, "documents"), k=8)


def q_cms_token_counts(spark, sf_dir):
    """Count-min sketch point estimates (pipeline/sketch.py cms_table /
    cms_lookup): build a depth=4 x 16-bucket sketch over every token
    of the corpus, then estimate the frequency of the distinct tokens
    of the doc_id % 97 == 0 slice (the contamination row's stand-in
    query set). w_hex=1 ON PURPOSE: the synthetic corpus has ~31
    distinct tokens, so 16 buckets force real collisions and the row
    exercises the min-over-rows estimate, not just a 1:1 passthrough
    (production callers size w_hex to the key cardinality). Estimates
    never undercount; every output is an integer min of integer bucket
    counts — hash-exact against a full DuckDB recomputation of the
    same md5 dag."""
    from knext_spark.pipeline import cms_lookup, cms_table
    from knext_spark.pipeline.text import tokens_col

    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens_col("text")).alias("token"))
    sketch = cms_table(toks, "token", depth=4, w_hex=1)
    qs = docs.where("doc_id % 97 = 0").select(
        F.explode(tokens_col("text")).alias("token")
    )
    return cms_lookup(sketch, qs, "token", depth=4, w_hex=1)


def q_bloom_seen(spark, sf_dir):
    """Bloom-filter membership (pipeline/sketch.py bloom_bits /
    bloom_probe): build a depth=4 x 256-bit filter over the tokens of
    the even-doc half ('the seen corpus'), then probe every distinct
    corpus token PLUS a 'zz:'-prefixed twin of each (guaranteed-unseen
    keys, so the row carries both outcomes). b_hex=2 ON PURPOSE: ~124
    set bits of 256 put the false-positive rate near 5%, so the row
    exercises the collision path, not a 1:1 passthrough (production
    callers size b_hex to the key cardinality). Never a false
    negative; all-string bit state — hash-exact against a full DuckDB
    recomputation of the same md5 dag."""
    from knext_spark.pipeline import bloom_bits, bloom_probe
    from knext_spark.pipeline.text import tokens_col

    docs = _read(spark, sf_dir, "documents")
    seen = docs.where("doc_id % 2 = 0").select(
        F.explode(tokens_col("text")).alias("token")
    )
    bits = bloom_bits(seen, "token", depth=4, b_hex=2)
    base = docs.select(F.explode(tokens_col("text")).alias("token")).distinct()
    qs = base.unionByName(
        base.select(F.concat(F.lit("zz:"), F.col("token")).alias("token"))
    )
    return bloom_probe(bits, qs, "token", depth=4, b_hex=2)


def _bloom_sql(depth: int = 4, b_hex: int = 2, salt: str = "bloom") -> str:
    """Full DuckDB recomputation of the bloom row: the same
    md5(salt:row:token) bit dag (bit id = 'row:hex'), distinct set
    bits, all-depth-present membership — hash-exact (strings and
    booleans only)."""
    return f"""
        with tok as (
          select unnest({_TOKENS}) as token from documents
          where doc_id % 2 = 0
        ),
        rws as (select unnest(range(0, {depth})) as row),
        bits as (
          select distinct
                 cast(rws.row as varchar) || ':' ||
                 substr(md5('{salt}:' || cast(rws.row as varchar) || ':' || token),
                        1, {b_hex}) as bit
          from tok, rws
        ),
        q0 as (
          select distinct unnest({_TOKENS}) as token from documents
        ),
        q as (
          select token from q0
          union all
          select 'zz:' || token from q0
        ),
        probe as (
          select q.token,
                 cast(rws.row as varchar) || ':' ||
                 substr(md5('{salt}:' || cast(rws.row as varchar) || ':' || q.token),
                        1, {b_hex}) as bit
          from q, rws
        )
        select p.token, count(b.bit) = {depth} as maybe_member
        from probe p
        left join bits b on b.bit = p.bit
        group by p.token
    """


# contract thresholds: the synthetic corpus is 10-99-token docs with
# at most ONE distinct English stopword (it spreads its mass across 5
# languages), so the Gopher production defaults would fail every row
# identically — these keep the row DISCRIMINATIVE (both pass and fail
# rows, several reason combinations). One dict drives both engines.
_GOPHER_CONTRACT = {
    "min_tokens": 30,
    "min_distinct_stopwords": 1,
    "max_repetition": 0.2,
}


def q_vocab_topk(spark, sf_dir):
    """Global token-frequency vocabulary (pipeline/text.py
    vocab_topk): tf/df integers, (tf desc, token) rank — hash-exact."""
    from knext_spark.pipeline import vocab_topk

    return vocab_topk(_read(spark, sf_dir, "documents"), k=200)


def q_gopher_filter(spark, sf_dir):
    """Composite Gopher-style gate (pipeline/text.py gopher_filter):
    every rule reuses an already-oracled metric expression; reasons
    array in fixed rule order, so the whole row (array column
    included) hashes exactly. Oracle generated from the SAME
    GOPHER_THRESHOLDS + _GOPHER_CONTRACT dicts."""
    from knext_spark.pipeline import gopher_filter

    docs = _read(spark, sf_dir, "documents")
    return gopher_filter(docs, thresholds=_GOPHER_CONTRACT).select(
        "doc_id",
        "n_tokens",
        F.array_join("reasons", ",").alias("reasons"),
        "passes",
    )


def _gopher_sql() -> str:
    from knext_spark.pipeline.text import GOPHER_THRESHOLDS

    T = dict(GOPHER_THRESHOLDS)
    T.update(_GOPHER_CONTRACT)
    stop = _sql_list(_STOP)
    dd = "cast({} as double)".format
    return f"""
            with q as (
              select doc_id,
                     len({_TOKENS}) as n_tok,
                     length(text) as n_chars,
                     length(text) - length(
                       regexp_replace(text, '[^A-Za-z0-9 \t\n]', '', 'g')
                     ) as punct,
                     len(list_intersect({_TOKENS}, {stop})) as n_stop_distinct,
                     case when len({_TOKENS}) > 0
                          then list_reduce(
                                 list_transform({_TOKENS}, t -> length(t)),
                                 (x, y) -> x + y
                               )::double / len({_TOKENS})
                          else 0.0 end as mean_tok_len,
                     case when len({_TOKENS}) >= 3
                          then list_transform(range(1, len({_TOKENS}) - 1),
                               i -> array_to_string(({_TOKENS})[i:i+2], ' '))
                          else [] end as wins
              from documents
            ),
            s as (
              select doc_id, n_tok, n_stop_distinct, mean_tok_len,
                     case when n_chars > 0 then punct / n_chars
                          else 0.0 end as punct_ratio,
                     case when len(wins) > 0
                          then 1.0 - len(list_distinct(wins))::double
                                     / len(wins)::double
                          else 0.0 end as repetition
              from q
            ),
            r as (
              select doc_id, n_tok,
                     list_filter([
                       case when n_tok < {int(T["min_tokens"])}
                            then 'too_short' end,
                       case when n_tok > {int(T["max_tokens"])}
                            then 'too_long' end,
                       case when mean_tok_len < {dd(repr(T["min_mean_token_len"]))}
                              or mean_tok_len > {dd(repr(T["max_mean_token_len"]))}
                            then 'token_len' end,
                       case when punct_ratio > {dd(repr(T["max_punct_ratio"]))}
                            then 'punct' end,
                       case when n_stop_distinct < {int(T["min_distinct_stopwords"])}
                            then 'stopwords' end,
                       case when repetition > {dd(repr(T["max_repetition"]))}
                            then 'repetitive' end
                     ], x -> x is not null) as reasons
              from s
            )
            select doc_id,
                   cast(n_tok as bigint) as n_tokens,
                   coalesce(array_to_string(reasons, ','), '') as reasons,
                   len(reasons) = 0 as passes
            from r
        """


def q_repetition(spark, sf_dir):
    """Intra-doc duplicate-n-gram fraction (pipeline/text.py
    repetition_ratio — Gopher-style boilerplate detector): counts are
    integers, the ratio a fixed 1 - d/t IEEE dag — micros-safe."""
    from knext_spark.pipeline import repetition_ratio

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_ratio(docs, w=3).select(
        "doc_id",
        "total_ngrams",
        "distinct_ngrams",
        _micros(F.col("repetition")).alias("repetition_micros"),
    )


def q_pack_sequences(spark, sf_dir):
    """Deterministic concat-and-chunk packing assignment
    (pipeline/packing.py): md5-sharded streams, window prefix sums,
    integer DIV chunk ids — every output column an integer."""
    from knext_spark.pipeline import pack_sequences

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_sequences(docs, budget=512, n_shards=8)


def q_line_dedup(spark, sf_dir):
    """CCNet-style line-level boilerplate removal (pipeline/dedup.py
    line_dedup). The synthetic documents are single-line word soup, so
    the query first rewrites each doc into 3-token lines (a pure
    projection both engines express identically); with ~30 distinct
    words, 3-token lines repeat across documents heavily — real
    boilerplate behavior at sf scale. Integer counts + exact string
    rebuild: hash-safe."""
    from knext_spark.pipeline import line_dedup

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    nlines = F.ceil(F.size(toks) / F.lit(3.0)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nlines - F.lit(1)),
        lambda i: F.array_join(F.slice(toks, i * 3 + 1, F.lit(3)), " "),
    )
    d2 = d.select("doc_id", F.array_join(lines, "\n").alias("text"))
    return line_dedup(d2, max_docs=4, min_chars=6)


def q_tfidf_topk(spark, sf_dir):
    """Top-k TF-IDF keywords per doc (pipeline/text.py tfidf_topk):
    integer tf/df, rank from a deterministic (score desc, token asc)
    window; the double score ships as micros."""
    from knext_spark.pipeline import tfidf_topk

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_topk(d, k=3).select(
        "doc_id",
        "token",
        "tf",
        "df",
        _micros(F.col("tfidf")).alias("tfidf_micros"),
        "rank",
    )


_PR_ITERS = 10  # fixed-iteration contract mode; oracle unrolls the same K


def q_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank (tol=0, K pinned) so the unrolled
    DuckDB oracle computes the identical K power-iteration steps —
    deterministic cross-engine at micros precision."""
    from knext_spark.graph import pagerank

    res = pagerank(
        spark,
        _edge_table(spark, sf_dir),
        tol=0.0,
        max_iter=_PR_ITERS,
        checkpoint_dir=tempfile.mkdtemp(prefix="q_pr_"),
        run_id="q",
        cadence=50,
    )
    return res.state.select("node", _micros(F.col("rank")).alias("rank_micros"))


def q_pagerank_weighted(spark, sf_dir):
    """The WEIGHTED PageRank path (non-uniform edge weights
    1 + (src+dst) % 5): out-weight sums are integer-valued doubles
    (exact in any accumulation order), w_norm one division — the same
    micros determinism argument as q_pagerank, now exercising the
    weight normalization the uniform row leaves at 1/out_degree."""
    from knext_spark.graph import pagerank

    edges = _edge_table(spark, sf_dir).withColumn(
        "weight",
        (F.lit(1) + (F.col("src") + F.col("dst")) % 5).cast("double"),
    )
    res = pagerank(
        spark,
        edges,
        tol=0.0,
        max_iter=_PR_ITERS,
        checkpoint_dir=tempfile.mkdtemp(prefix="q_prw_"),
        run_id="qw",
        cadence=50,
    )
    return res.state.select("node", _micros(F.col("rank")).alias("rank_micros"))


def q_connected_components(spark, sf_dir):
    """encode_ids=True: the contraction runs on dense order-preserving
    int64 codes (graph/encode.py) and the result is decoded back to
    the original string ids — the oracle match itself proves the
    round-trip. (q_pagerank stays on raw ids: its micros-exact oracle
    is sensitive to float summation order, which re-keying the
    aggregation would perturb; cc/lpa compare ids, where order
    preservation makes encoded runs bit-identical.)"""
    from knext_spark.graph import connected_components

    edges = _edge_table(spark, sf_dir).select(
        F.col("src").cast("string").alias("src"), F.col("dst").cast("string").alias("dst")
    )
    res = connected_components(
        spark, edges, checkpoint_dir=tempfile.mkdtemp(prefix="q_cc_"), cadence=10,
        encode_ids=True,
    )
    return res.state


def q_label_propagation(spark, sf_dir):
    """encode_ids=True — see q_connected_components: decoded labels
    are bit-identical because the encoding preserves the id order the
    pinned tie-break compares."""
    from knext_spark.graph import label_propagation

    edges = _edge_table(spark, sf_dir).select(
        F.col("src").cast("string").alias("src"), F.col("dst").cast("string").alias("dst")
    )
    res = label_propagation(
        spark, edges, max_iter=10,
        checkpoint_dir=tempfile.mkdtemp(prefix="q_lpa_"), cadence=10,
        encode_ids=True,
    )
    return res.state


# one corpus for both kgml contract rows and the kgml_edges_mixed oracle
_KGML_DOCS = 24
_KGML_SEED = 42


def q_kgml_edges(spark, sf_dir):
    """Flagship knext parse: synthesized KGML corpus -> canonical edge
    table (parity-tested against the executed reference elsewhere)."""
    from knext_spark.corpus import docs_from_rows, gen_corpus_rows
    from knext_spark.knext import build_edges
    from knext_spark.parse import parse_docs

    rows = gen_corpus_rows(n_docs=_KGML_DOCS, seed=_KGML_SEED)
    parsed = parse_docs(docs_from_rows(spark, rows))
    return build_edges(parsed, mixed=False, unique=True).select(
        "doc_id", "pathway", "entry1", "entry2", "type", "value", "name"
    )


def q_kgml_edges_mixed(spark, sf_dir):
    """The same parse -> edge pipeline in mixed mode (clique rows
    dropped, no propagation — reference genes.py:280-284 mixed branch).
    Unlike genes mode this is fully SQL-expressible, so it carries a
    complete DuckDB oracle (_kgml_mixed_sql) that re-parses the
    identical corpus from embedded literals — the hash gate for the
    XML-parse path (S4/P1-P7/J7/A1/A4 in one plan)."""
    from knext_spark.corpus import docs_from_rows, gen_corpus_rows
    from knext_spark.knext import build_edges
    from knext_spark.parse import parse_docs

    rows = gen_corpus_rows(n_docs=_KGML_DOCS, seed=_KGML_SEED)
    parsed = parse_docs(docs_from_rows(spark, rows))
    return build_edges(parsed, mixed=True, unique=True).select(
        "doc_id", "pathway", "entry1", "entry2", "type", "value", "name"
    )


def q_k_core(spark, sf_dir):
    """k-core of the lineitem-derived graph (iterative peeling to the
    fixpoint; exact integer outputs). Oracle: unrolled materialized-CTE
    peeling rounds — idempotent at the fixpoint, so the generous unroll
    equals the converged engine result (see _kcore_sql)."""
    from knext_spark.graph import k_core

    return k_core(_edge_table(spark, sf_dir), k=3)


def _layer_edges(spark, sf_dir):
    """Deterministic LAYERED digraph from lineitem for the topological
    operator: 12 layers x 250 slots, forward edges layer k -> k+1, plus
    back edges (adjacent-layer reversals on the rows where
    (l_orderkey + l_partkey) % 41 = 0, CONFINED to layers >= 9) that
    create cycles whose downstream sets must flag -1. Layering bounds
    the Kahn depth at 12 by construction — deep enough to exercise the
    iteration, shallow enough that the unrolled oracle (and the
    per-level Spark rounds) stay cheap at any SF; confining the back
    edges to the top layers keeps levels 0-8 populated at ANY density
    (unconfined back edges poison every layer once the graph is dense,
    collapsing the row to levels {-1, 0})."""
    li = _read(spark, sf_dir, "lineitem")
    layer = F.col("l_orderkey") % 12
    slot = F.col("l_partkey") % 250
    slot2 = F.col("l_suppkey") % 250
    fwd = li.where(layer < 11).select(
        (layer * 250 + slot).alias("src"),
        ((layer + 1) * 250 + slot2).alias("dst"),
    )
    back = li.where(
        (layer >= 9)
        & (layer < 11)
        & ((F.col("l_orderkey") + F.col("l_partkey")) % 41 == 0)
    ).select(
        ((layer + 1) * 250 + slot2).alias("src"),
        (layer * 250 + slot).alias("dst"),
    )
    return fwd.unionByName(back).distinct()


def q_topo_levels(spark, sf_dir):
    """Topological levels + cycle detection by Kahn peeling
    (graph/toposort.py topological_levels) over the layered lineitem
    digraph: level = longest-path depth from any source, -1 = on or
    downstream of a directed cycle. Exact integers. Oracle: unrolled
    materialized-CTE peeling rounds, idempotent at the fixpoint
    (_toposort_sql), same failure direction as k_core's."""
    from knext_spark.graph import topological_levels

    return topological_levels(_layer_edges(spark, sf_dir))


def _chord_edges(spark, sf_dir, n=2000):
    """Deterministic SPARSE ring-chord digraph from lineitem for the
    priority-peeling operators: node = l_orderkey % n, edges to the
    next 1-or-2 neighbor (offset 1 + l_partkey % 2), so out-degree <= 2
    and undirected degree <= 4 BY CONSTRUCTION at any SF — the peeling
    depth (longest strictly-priority-decreasing path, the round count
    of ``coloring``) stays O(log n) no matter how dense lineitem gets,
    where the mod-1000 contract graph would degenerate to one winner
    per round once nearly complete."""
    li = _read(spark, sf_dir, "lineitem")
    src = F.col("l_orderkey") % n
    return li.select(
        src.alias("src"),
        ((src + 1 + F.col("l_partkey") % 2) % n).alias("dst"),
    ).distinct()


def _chord_sql(n: int = 2000) -> str:
    return (
        f"select distinct l_orderkey % {n} as src, "
        f"(l_orderkey % {n} + 1 + l_partkey % 2) % {n} as dst from lineitem"
    )


_CHORD_SQL = _chord_sql()


def q_mis(spark, sf_dir):
    """Deterministic maximal independent set (graph/mis.py mis) over
    the sparse ring-chord graph: Luby rounds with md5-ticket
    priorities, winners dominate their neighbors out. ``mis_round`` =
    the 0-based round the node won (renamed from the operator's
    ``round`` — a SQL reserved word). Oracle: the SAME algorithm
    unrolled as materialized CTEs (_peel_sql dominate=True),
    idempotent at the fixpoint, k_core's failure direction."""
    from knext_spark.graph import mis

    return mis(_chord_edges(spark, sf_dir)).select(
        "node", F.col("round").alias("mis_round")
    )


def q_coloring(spark, sf_dir):
    """Proper greedy coloring by priority peeling (graph/mis.py
    coloring) over the sparse ring-chord graph: winners leave with
    color = round; adjacent nodes can never win together. Oracle:
    _peel_sql dominate=False, same unrolled-CTE discipline."""
    from knext_spark.graph import coloring

    return coloring(_chord_edges(spark, sf_dir))


def q_anf(spark, sf_dir):
    """Approximate neighborhood function / HyperBall (graph/anf.py
    anf): per-node 3-hop ball-size estimates over the sparse
    ring-chord graph by HLL register max-merge rounds — the registers,
    merge, and estimate are pipeline/sketch.py's, so the oracle is the
    hll_distinct_tokens replica with ``node`` as the group key over a
    fixed 3-round unrolled merge (_anf_sql). Estimate micros-gated
    like the hll row (same single-ln 1-ulp reasoning)."""
    from knext_spark.graph import anf

    out = anf(_chord_edges(spark, sf_dir), hops=3, k_hex=3)
    return out.select(
        "node",
        "n_registers",
        "v_zero",
        _micros(F.col("estimate")).alias("estimate_micros"),
    )


def _anf_sql(hops: int = 3, k_hex: int = 3, edge: str = _CHORD_SQL) -> str:
    """DuckDB replay of the whole ANF pipeline: the engine's exact
    md5 register/rho derivation (pipeline/sketch.py, salt 'anf'),
    ``hops`` unrolled max-merge rounds along the symmetrized edges,
    then the _hll_sql estimate tail keyed by node. Fixed-H unroll —
    no fixpoint argument needed, the round count IS the operator's
    parameter."""
    from knext_spark.pipeline.sketch import _alpha

    m = 16**k_hex
    a_m2 = repr(_alpha(m) * m * m)
    rho = f"""case when length(regexp_extract(suf, '^0*')) = 12 then 49
                   else 4 * length(regexp_extract(suf, '^0*'))
                        + case when substr(suf, length(regexp_extract(suf, '^0*')) + 1, 1) >= '8' then 0
                               when substr(suf, length(regexp_extract(suf, '^0*')) + 1, 1) >= '4' then 1
                               when substr(suf, length(regexp_extract(suf, '^0*')) + 1, 1) >= '2' then 2
                               else 3 end
                        + 1 end"""
    parts = [
        f"""
        with e0 as materialized (
          with e as ({edge})
          select distinct a, b from (
            select src as a, dst as b from e where src <> dst
            union all
            select dst as a, src as b from e where src <> dst
          )
        ),
        h0 as materialized (
          select node, substr(hx, 1, {k_hex}) as register,
                 substr(hx, {k_hex + 1}, 12) as suf
          from (
            select a as node, md5('anf:' || cast(a as varchar)) as hx
            from (select distinct a from e0)
          )
        ),
        r0 as materialized (
          select node, register, {rho} as rho from h0
        )"""
    ]
    prev = "r0"
    for i in range(1, hops + 1):
        parts.append(f""",
        r{i} as materialized (
          select node, register, max(rho) as rho from (
            select node, register, rho from {prev}
            union all
            select e.a as node, r.register, r.rho
            from e0 e join {prev} r on r.node = e.b
          ) group by node, register
        )""")
        prev = f"r{i}"
    parts.append(f""",
        iv as (
          select node, register,
                 cast(1.0 as double) / cast((1::bigint << rho) as double) as inv
          from {prev}
        ),
        agg as (
          select node, count(*) as n_registers,
                 list(inv order by register) as l
          from iv group by node
        ),
        est as (
          select node, n_registers, {m} - n_registers as v_zero,
                 list_reduce(l, (a, b) -> a + b)
                   + cast({m} - n_registers as double) as s
          from agg
        )
        select node,
               cast(n_registers as bigint) as n_registers,
               cast(v_zero as bigint) as v_zero,
               cast(floor(
                 case when {a_m2} / s <= {repr(2.5 * m)} and v_zero > 0
                      then cast({m} as double)
                           * ln(cast({m} as double) / cast(v_zero as double))
                      else {a_m2} / s end * 1000000 + 0.5) as bigint
               ) as estimate_micros
        from est
    """)
    return "".join(parts)


def _peel_sql(dominate: bool, rounds: int, edge: str = _CHORD_SQL) -> str:
    """Unrolled priority-peeling rounds shared by the ``mis`` and
    ``coloring`` oracles: round i's winners are the still-active nodes
    whose injective priority (md5('mis:'||id) || ':' || id — the exact
    engine expression, graph/mis.py _priority) beats every remaining
    neighbor's; ``dominate`` also removes the winners' neighbors (MIS)
    where coloring removes only the winners. Idempotent at the
    fixpoint — a w_i past convergence is empty, so extra rounds add no
    rows; a deeper-than-unroll graph LOSES rows and fails the gate
    loudly (k_core's failure direction). CTEs are MATERIALIZED for the
    usual DuckDB re-expansion reason."""
    parts = [
        f"""
        with e0 as materialized (
          with e as ({edge})
          select distinct a, b from (
            select src as a, dst as b from e where src <> dst
            union all
            select dst as a, src as b from e where src <> dst
          )
        ),
        n0 as materialized (select distinct a from e0),
        pr as materialized (
          select a,
                 md5('mis:' || cast(a as varchar)) || ':'
                   || cast(a as varchar) as p
          from n0
        )"""
    ]
    prev_n, prev_e = "n0", "e0"
    sel = []
    for i in range(1, rounds + 1):
        parts.append(f""",
        w{i} as materialized (
          select n.a from {prev_n} n
          join pr on pr.a = n.a
          left join (
            select e.a, min(p2.p) as mp
            from {prev_e} e join pr p2 on p2.a = e.b
            group by e.a
          ) m on m.a = n.a
          where m.mp is null or pr.p < m.mp
        )""")
        if dominate:
            parts.append(f""",
        r{i} as materialized (
          select a from w{i}
          union
          select e.b as a from {prev_e} e join w{i} w on w.a = e.a
        )""")
            rem = f"r{i}"
        else:
            rem = f"w{i}"
        parts.append(f""",
        n{i} as materialized (
          select a from {prev_n} where a not in (select a from {rem})
        ),
        e{i} as materialized (
          select a, b from {prev_e}
          where a not in (select a from {rem})
            and b not in (select a from {rem})
        )""")
        sel.append(
            f"select a as node, cast({i - 1} as bigint) as "
            f"{'mis_round' if dominate else 'color'} from w{i}"
        )
        prev_n, prev_e = f"n{i}", f"e{i}"
    parts.append("\n" + "\nunion all\n".join(sel))
    return "".join(parts)


def q_k_truss(spark, sf_dir):
    """k-truss of the SPARSE contract graph (mod=5000 — the dense
    mod-1000 graph never peels at small k): iterative edge peeling by
    within-subgraph triangle support, exact integers. Oracle: unrolled
    materialized-CTE peeling rounds, idempotent at the fixpoint
    (_ktruss_sql), same failure direction as k_core's."""
    from knext_spark.graph import k_truss

    return k_truss(_edge_table(spark, sf_dir, mod=5000), k=4).select(
        "a", "b", "support"
    )


def _ktruss_sql(k: int = 4, rounds: int = 16, edge: str | None = None) -> str:
    """Unrolled k-truss peeling: each round keeps edges with >= k-2
    common neighbors in the surviving subgraph (count(*) over the
    two-sided symmetric-adjacency join = triangle support — no self
    loops exist, so every joined row is a real common neighbor).
    Idempotent at the fixpoint like _kcore_sql; a deeper-peeling graph
    fails the gate loudly rather than passing wrongly. Valid for
    k >= 3 only: the inner support join cannot see 0-support edges,
    which the k = 2 truss would have to keep."""
    if k < 3:
        raise ValueError("_ktruss_sql is valid for k >= 3 only")
    edge = edge or _edge_sql(5000)
    parts = [
        f"""
        with e0 as materialized (
          with e as ({edge})
          select least(src, dst) as a, greatest(src, dst) as b
          from e where src <> dst
          group by 1, 2
        )"""
    ]
    prev = "e0"
    for i in range(1, rounds + 1):
        parts.append(f""",
        adj{i} as materialized (
          select a as u, b as v from {prev}
          union all
          select b as u, a as v from {prev}
        ),
        t{i} as materialized (
          select e.a, e.b
          from {prev} e
          join adj{i} s1 on s1.u = e.a
          join adj{i} s2 on s2.u = e.b and s2.v = s1.v
          group by e.a, e.b
          having count(*) >= {k - 2}
        )""")
        prev = f"t{i}"
    parts.append(f""",
        adjf as (
          select a as u, b as v from {prev}
          union all
          select b as u, a as v from {prev}
        )
        select e.a, e.b, cast(count(*) as bigint) as support
        from {prev} e
        join adjf s1 on s1.u = e.a
        join adjf s2 on s2.u = e.b and s2.v = s1.v
        group by e.a, e.b
    """)
    return "".join(parts)


def q_hits(spark, sf_dir):
    """Fixed-iteration HITS hubs & authorities (tol=0, K pinned to
    _PR_ITERS) so the unrolled DuckDB oracle computes the identical K
    Kleinberg power-iteration steps — max-normalized per step,
    sum-normalized at return, deterministic cross-engine at micros
    precision (same float-boundary caveat as _pagerank_sql)."""
    from knext_spark.graph import hits

    res = hits(
        spark,
        _edge_table(spark, sf_dir),
        tol=0.0,
        max_iter=_PR_ITERS,
        checkpoint_dir=tempfile.mkdtemp(prefix="q_hits_"),
        run_id="q",
        cadence=50,
    )
    return res.state.select(
        "node",
        _micros(F.col("hub")).alias("hub_micros"),
        _micros(F.col("auth")).alias("auth_micros"),
    )


def q_personalized_pagerank(spark, sf_dir):
    """Fixed-iteration personalized PageRank (tol=0, K pinned): seeds
    are the graph nodes divisible by 97 (deterministic, in-graph, so
    the rank vector keeps total mass 1), teleport AND dangling
    redistribution follow the normalized seed vector — nx.pagerank's
    personalization semantics. The unrolled DuckDB oracle (_ppr_sql)
    mirrors the engine's update AND its driver-side rank-sum recursion
    op-for-op."""
    from knext_spark.graph import pagerank

    edges = _edge_table(spark, sf_dir)
    pers = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") % 97 == 0)
        .select("node", F.lit(1.0).alias("p"))
    )
    res = pagerank(
        spark,
        edges,
        tol=0.0,
        max_iter=_PR_ITERS,
        personalization=pers,
        checkpoint_dir=tempfile.mkdtemp(prefix="q_ppr_"),
        run_id="q",
        cadence=50,
    )
    return res.state.select("node", _micros(F.col("rank")).alias("rank_micros"))


def q_scc(spark, sf_dir):
    """Strongly connected components (trim + forward-coloring rounds,
    graph/scc.py); scc = min member id, so the recursive-CTE
    mutual-reachability oracle (_scc_sql) is an exact integer match."""
    from knext_spark.graph import strongly_connected_components

    res = strongly_connected_components(
        spark,
        _edge_table(spark, sf_dir),
        checkpoint_dir=tempfile.mkdtemp(prefix="q_scc_"),
        run_id="q",
    )
    return res.state.select(
        F.col("node").cast("long").alias("node"),
        F.col("scc").cast("long").alias("scc"),
    )


def q_asof_join(spark, sf_dir):
    """Backward as-of join, self-temporal: every event gets the user's
    most recent signup event at-or-before its timestamp (union+window
    plan — one shuffle, no range-join blowup; see pipeline/temporal.py).
    Integer epoch-micros + bigint payload keep every column exact."""
    from knext_spark.pipeline import asof_join

    ev = _read(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    right = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts_us", "event_id"
    )
    out = asof_join(
        ev.drop("event_type"),
        right,
        key="user_id",
        left_ts="ts_us",
        right_ts="ts_us",
        payload="event_id",
    )
    return out.select("event_id", "user_id", "ts_us", "asof_event_id")


def q_range_join(spark, sf_dir):
    """Forward range join, self-temporal: every signup event pairs with
    all same-user events in the following 30 minutes (bucketized band
    join — equi-join on (key, floor(t/delta)) over two exploded buckets,
    never a nested-loop range predicate; see pipeline/temporal.py)."""
    from knext_spark.pipeline import range_join

    ev = _read(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    left = ev.where(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts_us"
    )
    right = ev.select("user_id", "ts_us", "event_id")
    out = range_join(
        left,
        right,
        key="user_id",
        left_ts="ts_us",
        right_ts="ts_us",
        delta=1_800_000_000,
        payload="event_id",
    )
    return out.select("event_id", "user_id", "ts_us", "range_event_id", "gap")


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization of the events table (batch operator;
    its applyInPandasWithState streaming twin is gated stream==batch in
    tests/test_streaming.py). Integer epoch-micros semantics make every
    output column exact cross-engine."""
    from knext_spark.streaming import sessionize

    return sessionize(_read(spark, sf_dir, "events"), gap_minutes=30)


def q_kgml_edges_contract(spark, sf_dir):
    """Genes mode end-to-end with the scale-path propagation variant
    (propagate_contract — pure-DataFrame fixpoint contraction, no
    per-doc grouping assumption; knext_spark/knext/propagate.py:143).
    Carries a complete DuckDB oracle whose recursive CTE computes the
    true reachability fixpoint, hash-gating the has_cpd gate, path
    purge, propagation closure, and conditional clique drop."""
    from knext_spark.corpus import docs_from_rows, gen_corpus_rows
    from knext_spark.knext import build_edges
    from knext_spark.parse import parse_docs

    rows = gen_corpus_rows(n_docs=_KGML_DOCS, seed=_KGML_SEED)
    parsed = parse_docs(docs_from_rows(spark, rows))
    return build_edges(
        parsed, mixed=False, unique=True, propagate="contract"
    ).select("doc_id", "pathway", "entry1", "entry2", "type", "value", "name")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "agg_collect_join": q_agg_collect_join,
        "dedup_keep_last": q_dedup_keep_last,
        "broadcast_lookup_join": q_broadcast_lookup_join,
        "explode_tokens": q_explode_tokens,
        "prefix_filter": q_prefix_filter,
        "union_distinct": q_union_distinct,
        "regex_modifier_roundtrip": q_regex_modifier_roundtrip,
        "clique_pairs": q_clique_pairs,
        "degrees": q_degrees,
        "graph_roots": q_graph_roots,
        "pricing_summary": q_pricing_summary,
        "window_topk": q_window_topk,
        "anti_join": q_anti_join,
        "lookup_fallback": q_lookup_fallback,
        "token_count": q_token_count,
        "deterministic_split": q_deterministic_split,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "corpus_profile": q_corpus_profile,
        "scrub_pii": q_scrub_pii,
        "doc_fingerprint": q_doc_fingerprint,
        "exact_dedup": q_exact_dedup,
        "minhash_signatures": q_minhash_signatures,
        "lsh_candidates": q_lsh_candidates,
        "minhash_dedup": q_minhash_dedup,
        "dedup_against": q_dedup_against,
        "dedup_clusters": q_dedup_clusters,
        "ngram_jaccard": q_ngram_jaccard,
        "simhash": q_simhash,
        "simhash_near_pairs": q_simhash_near_pairs,
        "cosine_topk": q_cosine_topk,
        "ann_ivf": q_ann_ivf,
        "ann_ivf_refined": q_ann_ivf_refined,
        "lsh_ann_buckets": q_lsh_ann_buckets,
        "ann_multiprobe": q_ann_multiprobe,
        "ann_multiprobe_ranked": q_ann_multiprobe_ranked,
        "embedding_near_dups": q_embedding_near_dups,
        "payload_stats": q_payload_stats,
        "media_features": q_media_features,
        "triangles": q_triangles,
        "bfs_distances": q_bfs_distances,
        "pseudo_diameter": q_pseudo_diameter,
        "landmark_distances": q_landmark_distances,
        "path_counts": q_path_counts,
        "random_walks": q_random_walks,
        "node2vec_walks": q_node2vec_walks,
        "clustering_coef": q_clustering_coef,
        "neighbor_jaccard": q_neighbor_jaccard,
        "link_features": q_link_features,
        "assortativity": q_assortativity,
        "modularity_communities": q_modularity,
        "contamination": q_contamination,
        "stratified_sample": q_stratified_sample,
        "weighted_sample": q_weighted_sample,
        "hll_distinct_tokens": q_hll_distinct,
        "lm_score": q_lm_score,
        "token_hist_quantiles": q_token_hist_quantiles,
        "gopher_filter": q_gopher_filter,
        "vocab_topk": q_vocab_topk,
        "repetition": q_repetition,
        "line_dedup": q_line_dedup,
        "tfidf_topk": q_tfidf_topk,
        "pack_sequences": q_pack_sequences,
        "pagerank": q_pagerank,
        "pagerank_weighted": q_pagerank_weighted,
        "personalized_pagerank": q_personalized_pagerank,
        "hits": q_hits,
        "scc": q_scc,
        "connected_components": q_connected_components,
        "label_propagation": q_label_propagation,
        "kgml_edges": q_kgml_edges,
        "kgml_edges_mixed": q_kgml_edges_mixed,
        "kgml_edges_contract": q_kgml_edges_contract,
        "sessionize": q_sessionize,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "k_core": q_k_core,
        "k_truss": q_k_truss,
        "topo_levels": q_topo_levels,
        "mis": q_mis,
        "coloring": q_coloring,
        "anf": q_anf,
        "cms_token_counts": q_cms_token_counts,
        "bloom_seen": q_bloom_seen,
        "dup_spans": q_dup_spans,
        "contaminated_spans": q_contaminated_spans,
        "bpe_merges": q_bpe_merges,
    }


# ------------------------------------------------------------ oracle SQL
_TOKENS = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _shingles_sql(w: int = 3) -> str:
    return f"""
      case when len({_TOKENS}) >= {w}
           then list_distinct(list_transform(range(1, len({_TOKENS}) - {w - 2}),
                i -> array_to_string(({_TOKENS})[i:i+{w - 1}], ' ')))
           when len({_TOKENS}) > 0
           then [array_to_string({_TOKENS}, ' ')]
           else [] end
    """


def _minhash_sql(k: int = 8) -> str:
    mins = ",\n      ".join(
        f"min(md5('{s}:' || sh)) as mh_{s}" for s in range(k)
    )
    return f"""
    with sh as (
      select doc_id, unnest({_shingles_sql(3)}) as sh from documents
    )
    select doc_id, {mins} from sh group by doc_id
    """


def _simhash_sql(bits: int = 16) -> str:
    sums = ",\n      ".join(
        f"cast(sum((cast(floor(('0x' || substr(md5(t), {b // 4 + 1}, 1))::int"
        f" / {2 ** (b % 4)}) as bigint) % 2) * 2 - 1) as bigint) as s_{b}"
        for b in range(bits)
    )
    fp = " + ".join(f"case when s_{b} > 0 then {2 ** b} else 0 end" for b in range(bits))
    return f"""
    with tok as (select doc_id, unnest({_TOKENS}) as t from documents),
    sums as (select doc_id, {sums} from tok group by doc_id)
    select doc_id, cast({fp} as bigint) as simhash from sums
    """


_COS = """
    list_reduce(list_transform(range(1, len({a})+1),
        i -> ({a})[i]::double * ({b})[i]::double), (x,y) -> x+y) /
    (sqrt(list_reduce(list_transform(range(1, len({a})+1),
        i -> ({a})[i]::double * ({a})[i]::double), (x,y) -> x+y)) *
     sqrt(list_reduce(list_transform(range(1, len({b})+1),
        i -> ({b})[i]::double * ({b})[i]::double), (x,y) -> x+y)))
"""


def _dot_sql(p: int, vec: str = "embedding") -> str:
    """Signed hyperplane projection, index-order fold — bit-identical
    to knext_spark.pipeline.similarity._plane_dot."""
    return (
        f"list_reduce(list_transform(range(0, len({vec})), i -> "
        f"({vec})[i+1]::double * ((('0x' || substr(md5('{p}' || ',' || i::varchar), 1, 8))::bigint"
        f" % 2001 - 1000) / 1000.0)), (x,y) -> x+y)"
    )


def _bucket_sql(planes: int = 4, vec: str = "embedding") -> str:
    terms = []
    for p in range(planes):
        terms.append(f"case when ({_dot_sql(p, vec)}) >= 0 then {2 ** p} else 0 end")
    return "cast(" + " + ".join(terms) + " as bigint)"


def _lang_sql() -> str:
    hits = {
        c: f"len(list_filter({_TOKENS}, t -> list_contains({_sql_list(ws)}, t)))"
        for c, ws in _LANGS.items()
    }
    g = f"greatest({hits['de']}, {hits['en']}, {hits['es']}, {hits['fr']})"
    pred = f"""
      case when {hits['de']} >= {hits['en']} and {hits['de']} >= {hits['es']} and {hits['de']} >= {hits['fr']} then 'de'
           when {hits['en']} >= {hits['es']} and {hits['en']} >= {hits['fr']} then 'en'
           when {hits['es']} >= {hits['fr']} then 'es'
           else 'fr' end
    """
    return f"""
    select doc_id,
           case when {g} > 0 then ({pred}) else 'und' end as pred_lang,
           cast({g} as bigint) as marker_hits
    from documents
    """


def _quality_sql() -> str:
    stop = _sql_list(_STOP)
    return f"""
    with q as (
      select doc_id,
             len({_TOKENS}) as n_tok,
             length(text) as n_chars,
             length(text) - length(regexp_replace(text, '[^A-Za-z0-9 \t\n]', '', 'g')) as punct,
             len(list_filter({_TOKENS}, t -> list_contains({stop}, t))) as n_stop_freq,
             len(list_intersect({_TOKENS}, {stop})) as n_stop_distinct,
             case when len({_TOKENS}) > 0
                  then list_reduce(list_transform({_TOKENS}, t -> length(t)), (x,y) -> x+y)::double / len({_TOKENS})
                  else 0.0 end as mean_tok_len
      from documents
    ), s as (
      select doc_id, n_tok, n_stop_distinct, mean_tok_len,
             case when n_chars > 0 then punct / n_chars else 0.0 end as punct_ratio,
             case when n_tok > 0 then n_stop_freq / n_tok else 0.0 end as stop_ratio,
             case when n_tok between 20 and 10000 then 1.0 else 0.0 end as len_score
      from q
    )
    select doc_id,
           cast(n_tok as bigint) as n_tokens,
           cast(floor(punct_ratio * 1000000 + 0.5) as bigint) as punct_ratio_micros,
           cast(floor(stop_ratio * 1000000 + 0.5) as bigint) as stopword_ratio_micros,
           cast(floor(mean_tok_len * 1000000 + 0.5) as bigint) as mean_token_len_micros,
           cast(n_stop_distinct as bigint) as distinct_stopwords,
           cast(floor((len_score
              + (case when punct_ratio <= 0.2 then 1.0 else 0.0 end)
              + (case when stop_ratio >= 0.05 then 1.0 else 0.0 end)
              + (case when mean_tok_len >= 2.5 and mean_tok_len <= 10.0 then 1.0 else 0.0 end)
             ) / 4.0 * 1000000 + 0.5) as bigint) as quality_micros
    from s
    """


def _lsh_cand_sql() -> str:
    band_sel = " union all ".join(
        f"select doc_id, {b} as band, md5(mh_{2 * b} || '|' || mh_{2 * b + 1}) as band_key from sig"
        for b in range(4)
    )
    return f"""
    with sig as ({_minhash_sql(8)}),
    bands as ({band_sel}),
    kept as (
      select band, band_key from bands group by band, band_key having count(*) <= 10000
    ),
    bk as (select bands.* from bands join kept using (band, band_key))
    select distinct a.doc_id as a, b.doc_id as b
    from bk a join bk b on a.band = b.band and a.band_key = b.band_key and a.doc_id < b.doc_id
    """


def _jaccard_sql(threshold: float, with_lsh: bool) -> str:
    lsh_filter = (
        "join (select a, b from cand) c on i.a = c.a and i.b = c.b" if with_lsh else ""
    )
    cand_cte = f", cand as ({_lsh_cand_sql().replace('documents', 'documents')})" if with_lsh else ""
    return f"""
    with sh as (
      select doc_id, {_shingles_sql(3)} as shs from documents
    ){cand_cte},
    ex as (select doc_id, unnest(shs) as sh from sh),
    inter as (
      select a.doc_id as a, b.doc_id as b, count(*) as inter
      from ex a join ex b on a.sh = b.sh and a.doc_id < b.doc_id
      group by 1, 2
    ),
    sizes as (select doc_id, len(shs) as n from sh)
    select i.a, i.b,
           cast(floor(i.inter / (na.n + nb.n - i.inter) * 1000000 + 0.5) as bigint) as jaccard_micros
    from inter i {lsh_filter}
    join sizes na on na.doc_id = i.a
    join sizes nb on nb.doc_id = i.b
    where i.inter / (na.n + nb.n - i.inter) >= {threshold}
    """


def _media_features_sql(dim: int = 8) -> str:
    """The fake decoder's feature[i] = float32(byte_i(sha256(payload)) / 255.0)
    with payload = utf-8 bytes of text; dim=8 <= 32 so one digest
    suffices. DuckDB FLOAT is IEEE float32 — micros verified identical
    for all 256 byte values."""
    vals = ", ".join(
        f"cast(floor(cast(cast((('0x' || substr(sha256(text), {2 * i + 1}, 2))::int) / 255.0 as float) as double)"
        f" * 1000000 + 0.5) as bigint)::varchar"
        for i in range(dim)
    )
    return f"""
    select cast(doc_id as varchar) as media_id,
           case (doc_id % 3 + 1)
             when 1 then 'image' when 2 then 'audio' else 'video' end as kind,
           cast(octet_length(encode(text)) as bigint) as n_bytes,
           sha256(text) as payload_sha256,
           concat_ws(',', {vals}) as feature_micros
    from documents
    """


def _pagerank_sql(
    k: int = _PR_ITERS, edge_sql: str = _EDGE_SQL, weighted: bool = False
) -> str:
    """Unrolled K-step power iteration mirroring knext_spark.graph
    .pagerank op-for-op: w_norm = 1.0/out_w first then rank*w_norm,
    dangling mass via the 1 - sum(contribs) identity, rank' =
    alpha*(contrib + dm/n) + (1-alpha)/n — same operation STRUCTURE,
    but the accumulation order inside each engine's partial/final sum
    aggregation is its own, so micros equality additionally relies on
    no rank value landing within ~1e-10 of a .5 micro-rounding
    boundary (holds on this deterministic corpus at the driver's SFs;
    a disagreement here would indicate a boundary hit, not an
    algorithmic divergence)."""
    its = []
    for i in range(1, k + 1):
        p = i - 1
        # AS MATERIALIZED is load-bearing: DuckDB inlines CTEs per
        # reference, and each r{i} references its predecessors more
        # than once — without materialization the unrolled chain
        # re-evaluates exponentially (2^K plans)
        its.append(f"""
    c{i} as materialized (
      select ne.dst as node, sum(r{p}.rank * ne.w_norm) as contrib
      from ne join r{p} on r{p}.node = ne.src group by ne.dst
    ),
    s{i} as materialized (select cast(1.0 as double) - coalesce(sum(contrib), cast(0.0 as double)) as dm from c{i}),
    r{i} as materialized (
      select nodes.node,
             cast(0.85 as double) * (coalesce(c{i}.contrib, cast(0.0 as double))
                                     + (select dm from s{i}) / (select n from nn))
             + (cast(1.0 as double) - cast(0.85 as double)) / (select n from nn) as rank
      from nodes left join c{i} on c{i}.node = nodes.node
    )""")
    if weighted:
        # edge_sql must yield (src, dst, weight); integer-valued double
        # weights sum exactly in any order, so out_w is deterministic
        norm = """
    outw as materialized (select src, cast(sum(weight) as double) as out_w from e group by src),
    ne as materialized (select e.src, e.dst, cast(e.weight as double) / outw.out_w as w_norm
           from e join outw on outw.src = e.src),"""
    else:
        norm = """
    outw as materialized (select src, cast(count(*) as double) as out_w from e group by src),
    ne as materialized (select e.src, e.dst, cast(1.0 as double) / outw.out_w as w_norm
           from e join outw on outw.src = e.src),"""
    return f"""
    with e as materialized ({edge_sql}),{norm}
    nodes as materialized (select src as node from e union select dst as node from e),
    nn as materialized (select count(*) as n from nodes),
    r0 as materialized (select node, cast(1.0 as double) / (select n from nn) as rank from nodes),
    {",".join(its)}
    select node, cast(floor(rank * 1000000 + 0.5) as bigint) as rank_micros from r{k}
    """


_WEDGE_SQL = (
    f"select src, dst, cast(1 + (src + dst) % 5 as double) as weight "
    f"from ({_EDGE_SQL})"
)


def _path_counts_sql(h: int = _SPC_HOPS, edge_sql: str = _EDGE_SQL) -> str:
    """Unrolled per-level shortest-path-counting oracle mirroring
    graph/betweenness.shortest_path_counts level-for-level: level i's
    σ is the sum of level i-1 predecessors' σ, reached-set anti-join
    via NOT EXISTS. Both sides cap at the same horizon h, so the
    truncation (if the graph were deeper) is alignment-safe. All
    integers — hash-exact."""
    parts = [
        f"""
    l0 as materialized (
      select node as seed, node, cast(1 as bigint) as sigma from seeds
    ),
    r0 as materialized (
      select seed, node, cast(0 as bigint) as dist, sigma from l0
    )"""
    ]
    for i in range(1, h + 1):
        p = i - 1
        parts.append(f"""
    l{i} as materialized (
      select l{p}.seed, e0.dst as node, cast(sum(l{p}.sigma) as bigint) as sigma
      from l{p} join e0 on e0.src = l{p}.node
      where not exists (
        select 1 from r{p} where r{p}.seed = l{p}.seed and r{p}.node = e0.dst
      )
      group by l{p}.seed, e0.dst
    ),
    r{i} as materialized (
      select * from r{p}
      union all
      select seed, node, cast({i} as bigint) as dist, sigma from l{i}
    )""")
    return f"""
    with e as materialized ({edge_sql}),
    e0 as materialized (select src, dst from e where src <> dst),
    seeds as materialized (
      select node from (select src as node from e union select dst from e)
      where node % 100 = 0
    ),
    {",".join(parts)}
    select seed, node, dist, sigma from r{h}
    """


def _random_walks_sql(
    length: int = 5, walks: int = 2, edge_sql: str = _EDGE_SQL
) -> str:
    """Unrolled per-step walk oracle mirroring graph/walks.py: the
    same md5(start:walk:step:dst) hash-argmin next-hop (ties by dst)
    — all integers/strings, hash-exact."""
    walk_rows = " union all ".join(f"select {r} as walk" for r in range(walks))
    parts = [f"""
    w0 as materialized (
      select node as start, cast(walk as bigint) as walk,
             cast(0 as bigint) as step, node
      from seeds, ({walk_rows})
    )"""]
    for t in range(1, length + 1):
        p = t - 1
        parts.append(f"""
    w{t} as materialized (
      select start, walk, cast({t} as bigint) as step, dst as node from (
        select p.start, p.walk, e0.dst,
               row_number() over (
                 partition by p.start, p.walk
                 order by md5(p.start::varchar || ':' || p.walk::varchar
                              || ':{t}:' || e0.dst::varchar), e0.dst
               ) as rn
        from w{p} p join e0 on e0.src = p.node
      ) where rn = 1
    )""")
    union = "\n      union all ".join(
        f"select start, walk, step, node from w{t}" for t in range(length + 1)
    )
    return f"""
    with e as materialized ({edge_sql}),
    e0 as materialized (select distinct src, dst from e),
    seeds as materialized (
      select node from (select src as node from e union select dst from e)
      where node % 100 = 0
    ),
    {",".join(parts)}
    {union}
    """


def _ppr_sql(k: int = _PR_ITERS, edge_sql: str = _EDGE_SQL) -> str:
    """Unrolled K-step PERSONALIZED power iteration mirroring
    knext_spark.graph.pagerank(personalization=...) op-for-op: seeds =
    nodes divisible by 97 with raw weight 1.0, normalized by their
    Spark-side sum (an exact integer-valued double, so the division
    mirrors bit-for-bit); rank' = alpha*(contrib + dm*p) + (1-alpha)*p;
    and — the part a naive oracle would miss — the engine's DRIVER-SIDE
    rank-sum recursion rs_i = alpha*(cs_i + dm_i*pm) + (1-alpha)*pm
    with dm_i = rs_{i-1} - cs_i, reproduced as scalar CTEs. pm (the
    in-graph personalization mass) is a distributed float sum in both
    engines, so micros equality carries the usual summation-order
    caveat of _pagerank_sql."""
    its = []
    for i in range(1, k + 1):
        p = i - 1
        its.append(f"""
    c{i} as materialized (
      select ne.dst as node, sum(r{p}.rank * ne.w_norm) as contrib
      from ne join r{p} on r{p}.node = ne.src group by ne.dst
    ),
    cs{i} as materialized (select coalesce(sum(contrib), cast(0.0 as double)) as cs from c{i}),
    dm{i} as materialized (select (select rs from rs{p}) - (select cs from cs{i}) as dm),
    r{i} as materialized (
      select np.node,
             cast(0.85 as double) * (coalesce(c{i}.contrib, cast(0.0 as double))
                                     + (select dm from dm{i}) * np.p)
             + (cast(1.0 as double) - cast(0.85 as double)) * np.p as rank
      from np left join c{i} on c{i}.node = np.node
    ),
    rs{i} as materialized (
      select cast(0.85 as double) * ((select cs from cs{i}) + (select dm from dm{i}) * (select m from pm))
             + (cast(1.0 as double) - cast(0.85 as double)) * (select m from pm) as rs
    )""")
    return f"""
    with e as materialized ({edge_sql}),
    outw as materialized (select src, cast(count(*) as double) as out_w from e group by src),
    ne as materialized (select e.src, e.dst, cast(1.0 as double) / outw.out_w as w_norm
           from e join outw on outw.src = e.src),
    nodes as materialized (select src as node from e union select dst as node from e),
    nn as materialized (select count(*) as n from nodes),
    tot as materialized (select sum(cast(1.0 as double)) as t from nodes where node % 97 = 0),
    np as materialized (select node,
           case when node % 97 = 0 then cast(1.0 as double) / (select t from tot)
                else cast(0.0 as double) end as p
           from nodes),
    pm as materialized (select sum(p) as m from np),
    r0 as materialized (select node, cast(1.0 as double) / (select n from nn) as rank from nodes),
    rs0 as materialized (select cast(1.0 as double) as rs),
    {",".join(its)}
    select node, cast(floor(rank * 1000000 + 0.5) as bigint) as rank_micros from r{k}
    """


def _scc_sql(edge_sql: str = _EDGE_SQL) -> str:
    """Mutual-reachability strongly connected components: scc(v) = min
    over {{u : v ->* u and u ->* v}} via one recursive-CTE forward
    closure self-joined on swapped pairs — exactly the min-member
    canonical label knext_spark.graph.scc produces. Node set comes
    from the RAW edge list (self-loop-only nodes are singleton SCCs;
    the engine trims them the same way)."""
    return f"""
    with recursive
    ea as materialized (select src, dst from ({edge_sql})),
    nodes as materialized (select src as node from ea union select dst as node from ea),
    e0 as materialized (select src, dst from ea where src <> dst),
    reach(a, b) as (
      select node as a, node as b from nodes
      union
      select r.a, e.dst as b from reach r join e0 e on e.src = r.b
    ),
    mut as (
      select r1.a as node, min(r1.b) as scc
      from reach r1 join reach r2 on r2.a = r1.b and r2.b = r1.a
      group by r1.a
    )
    select cast(node as bigint) as node, cast(scc as bigint) as scc from mut
    """


def _hits_sql(k: int = _PR_ITERS, edge_sql: str = _EDGE_SQL) -> str:
    """Unrolled K-step Kleinberg power iteration mirroring
    knext_spark.graph.hits op-for-op: a_raw = h^T A then h_raw = A
    a_raw (from the UN-normalized a_raw), each vector max-normalized
    per step, both sum-normalized at the end — same operation
    STRUCTURE, each engine's own summation order, so micros equality
    additionally relies on no value landing within ~1e-10 of a .5
    micro-rounding boundary (the _pagerank_sql caveat; a disagreement
    here would indicate a boundary hit, not an algorithmic
    divergence)."""
    its = []
    for i in range(1, k + 1):
        p = i - 1
        # AS MATERIALIZED is load-bearing: DuckDB inlines CTEs per
        # reference, and each step references its predecessors more
        # than once — without materialization the unrolled chain
        # re-evaluates exponentially
        its.append(f"""
    ar{i} as materialized (
      select e.dst as node, sum(h{p}.hub * e.weight) as v
      from e join h{p} on h{p}.node = e.src group by e.dst
    ),
    hr{i} as materialized (
      select e.src as node, sum(ar{i}.v * e.weight) as v
      from e join ar{i} on ar{i}.node = e.dst group by e.src
    ),
    a{i} as materialized (
      select nodes.node,
             coalesce(ar{i}.v, cast(0.0 as double)) / (select max(v) from ar{i}) as auth
      from nodes left join ar{i} on ar{i}.node = nodes.node
    ),
    h{i} as materialized (
      select nodes.node,
             coalesce(hr{i}.v, cast(0.0 as double)) / (select max(v) from hr{i}) as hub
      from nodes left join hr{i} on hr{i}.node = nodes.node
    )""")
    return f"""
    with e as materialized (select src, dst, cast(1.0 as double) as weight from ({edge_sql})),
    nodes as materialized (select src as node from e union select dst as node from e),
    nn as materialized (select count(*) as n from nodes),
    h0 as materialized (select node, cast(1.0 as double) / (select n from nn) as hub from nodes),
    {",".join(its)}
    select h{k}.node,
           cast(floor(h{k}.hub / (select sum(hub) from h{k}) * 1000000 + 0.5) as bigint) as hub_micros,
           cast(floor(a{k}.auth / (select sum(auth) from a{k}) * 1000000 + 0.5) as bigint) as auth_micros
    from h{k} join a{k} on a{k}.node = h{k}.node
    """


def _cc_sql() -> str:
    """Transitive-closure connected components: component = min node id
    reachable over the undirected edge set (string-lexicographic min,
    matching the engine's string-id star-forest root)."""
    return f"""
    with recursive
    e0 as materialized (select cast(src as varchar) as src, cast(dst as varchar) as dst
           from ({_EDGE_SQL})),
    nodes as materialized (select src as node from e0 union select dst as node from e0),
    ue as materialized (select src as a, dst as b from e0 where src <> dst
           union
           select dst as a, src as b from e0 where src <> dst),
    reach(node, r) as (
      select node, node from nodes
      union
      select reach.node, ue.b from reach join ue on ue.a = reach.r
    )
    select node, min(r) as component from reach group by node
    """


def _lpa_sql(k: int = 10) -> str:
    """Unrolled synchronous LPA mirroring knext_spark.graph.lpa's
    pinned deterministic rule: label'(v) = lexicographically smallest
    among max-frequency neighbor labels; isolated nodes keep theirs.
    The update is idempotent at the fixpoint, so unrolling exactly
    max_iter steps reproduces the engine's early-stopped state too."""
    its = []
    for i in range(1, k + 1):
        p = i - 1
        # AS MATERIALIZED: DuckDB inlines CTEs per reference; l{i}
        # references l{p} twice, so the unrolled chain would otherwise
        # re-evaluate exponentially
        its.append(f"""
    f{i} as materialized (select ue.a as node, l{p}.label as lbl, count(*) as cnt
             from ue join l{p} on l{p}.node = ue.b group by 1, 2),
    b{i} as materialized (select node, lbl from (
               select node, lbl,
                      row_number() over (partition by node order by cnt desc, lbl asc) as rn
               from f{i}) where rn = 1),
    l{i} as materialized (select l{p}.node, coalesce(b{i}.lbl, l{p}.label) as label
             from l{p} left join b{i} on b{i}.node = l{p}.node)""")
    return f"""
    with e0 as materialized (select cast(src as varchar) as src, cast(dst as varchar) as dst
                from ({_EDGE_SQL})),
    nodes as materialized (select src as node from e0 union select dst as node from e0),
    ue as materialized (select src as a, dst as b from e0 where src <> dst
           union
           select dst as a, src as b from e0 where src <> dst),
    l0 as materialized (select node, node as label from nodes),
    {",".join(its)}
    select node, label from l{k}
    """


def _kcore_sql(k: int = 3, rounds: int = 24, edge: str | None = None) -> str:
    """Unrolled k-core peeling. Each round drops nodes whose current
    undirected degree is < k and their incident edges; peeling is
    idempotent at the fixpoint, so ``rounds`` only needs to be >= the
    graph's peeling depth (24 is generous for the mod-1000 lineitem
    graphs; a deeper graph fails the gate loudly rather than passing
    wrongly). CTEs are MATERIALIZED — DuckDB inlines per reference and
    the chain would otherwise re-expand exponentially."""
    edge = edge or _EDGE_SQL
    parts = [
        f"""
        with e0 as materialized (
          with e as ({edge})
          select distinct src, dst from (
            select src, dst from e where src <> dst
            union all
            select dst as src, src as dst from e where src <> dst
          )
        )"""
    ]
    prev = "e0"
    for i in range(1, rounds + 1):
        parts.append(f""",
        s{i} as materialized (
          select p.src, p.dst from {prev} p
          join (select src, count(*) c from {prev} group by src) a
            on a.src = p.src and a.c >= {k}
          join (select src, count(*) c from {prev} group by src) b
            on b.src = p.dst and b.c >= {k}
        )""")
        prev = f"s{i}"
    parts.append(f"""
        select src as node, cast(count(*) as bigint) as core_deg
        from {prev} group by src
    """)
    return "".join(parts)


def _toposort_sql(rounds: int = 16) -> str:
    """Unrolled Kahn peeling over the layered lineitem digraph
    (_layer_edges twin). Each round levels the remaining nodes with no
    remaining incoming edge; peeling is idempotent at the fixpoint and
    the layering bounds the depth at 12, so 16 rounds are generous —
    a deeper graph fails the gate loudly rather than passing wrongly
    (the k-core oracle's failure direction). CTEs are MATERIALIZED for
    the same re-expansion reason as _kcore_sql's."""
    parts = [
        """
        with li as materialized (
          select l_orderkey % 12 as layer, l_partkey % 250 as slot,
                 l_suppkey % 250 as slot2,
                 (l_orderkey + l_partkey) % 41 = 0 as back
          from lineitem where l_orderkey % 12 < 11
        ),
        re0 as materialized (
          select distinct src, dst from (
            select layer*250 + slot as src, (layer+1)*250 + slot2 as dst from li
            union all
            select (layer+1)*250 + slot2 as src, layer*250 + slot as dst
            from li where back and layer >= 9
          )
        ),
        rn0 as materialized (
          select distinct a from (
            select src as a from re0 union all select dst as a from re0
          )
        )"""
    ]
    for i in range(rounds):
        parts.append(f""",
        f{i} as materialized (
          select a from rn{i} where a not in (select dst from re{i})
        ),
        rn{i + 1} as materialized (
          select a from rn{i} where a not in (select a from f{i})
        ),
        re{i + 1} as materialized (
          select src, dst from re{i} where src not in (select a from f{i})
        )""")
    levels = "\n          union all\n          ".join(
        f"select a, {i} as level from f{i}" for i in range(rounds)
    )
    parts.append(f"""
        select a as node, cast(level as bigint) as level from (
          {levels}
          union all
          select a, -1 as level from rn{rounds}
        )
    """)
    return "".join(parts)


def _dup_spans_sql(w: int = 5, min_docs: int = 2) -> str:
    """Full DuckDB recomputation of dup_spans: same positional
    windows (DuckDB range(1, 0) is empty, so the short-doc guard is
    the where clause; Spark needs the explicit n >= w guard because
    sequence(0, n-w) DESCENDS there), same per-doc-distinct frequency
    aggregate, semi join, running-max interval merge — pure integers,
    hash-exact."""
    e = w - 1
    return f"""
        with tok as (
          select doc_id, {_TOKENS} as toks from documents
        ),
        wins as (
          select doc_id,
                 unnest(list_transform(range(1, len(toks) - {w} + 2),
                        i -> {{'pos': i - 1,
                               'sh': array_to_string(toks[i:i+{e}], ' ')}})) as u
          from tok where len(toks) >= {w}
        ),
        occ as (select doc_id, u.pos as pos, u.sh as sh from wins),
        dup as (
          select sh from (select distinct sh, doc_id from occ)
          group by sh having count(*) >= {min_docs}
        ),
        hits as (select o.doc_id, o.pos from occ o semi join dup using (sh)),
        flag as (
          select doc_id, pos,
                 case when max(pos + {e}) over w1 is null
                           or pos > max(pos + {e}) over w1 + 1
                      then 1 else 0 end as is_new
          from hits
          window w1 as (partition by doc_id order by pos
                        rows between unbounded preceding and 1 preceding)
        ),
        sp as (
          select doc_id, pos,
                 sum(is_new) over (partition by doc_id order by pos
                     rows between unbounded preceding and current row) as span_id
          from flag
        )
        select doc_id,
               cast(min(pos) as bigint) as span_start,
               cast(max(pos) + {e} as bigint) as span_end,
               cast(max(pos) + {e} - min(pos) + 1 as bigint) as n_tokens
        from sp group by doc_id, span_id
    """


def _contam_spans_sql(w: int = 5) -> str:
    """Full DuckDB recomputation of contaminated_spans over the
    doc_id % 10 pseudo-benchmark split: same positional windows as
    _dup_spans_sql, reference side reduced to its distinct shingles,
    semi join, running-max interval merge — pure integers,
    hash-exact."""
    e = w - 1
    return f"""
        with tok as (
          select doc_id, {_TOKENS} as toks from documents
        ),
        wins as (
          select doc_id,
                 unnest(list_transform(range(1, len(toks) - {w} + 2),
                        i -> {{'pos': i - 1,
                               'sh': array_to_string(toks[i:i+{e}], ' ')}})) as u
          from tok where len(toks) >= {w}
        ),
        occ as (select doc_id, u.pos as pos, u.sh as sh from wins),
        refsh as (select distinct sh from occ where doc_id % 10 = 0),
        hits as (
          select o.doc_id, o.pos from occ o semi join refsh using (sh)
          where o.doc_id % 10 <> 0
        ),
        flag as (
          select doc_id, pos,
                 case when max(pos + {e}) over w1 is null
                           or pos > max(pos + {e}) over w1 + 1
                      then 1 else 0 end as is_new
          from hits
          window w1 as (partition by doc_id order by pos
                        rows between unbounded preceding and 1 preceding)
        ),
        sp as (
          select doc_id, pos,
                 sum(is_new) over (partition by doc_id order by pos
                     rows between unbounded preceding and current row) as span_id
          from flag
        )
        select doc_id,
               cast(min(pos) as bigint) as span_start,
               cast(max(pos) + {e} as bigint) as span_end,
               cast(max(pos) + {e} - min(pos) + 1 as bigint) as n_tokens
        from sp group by doc_id, span_id
    """


def _bpe_sql(k: int = 8) -> str:
    """Full DuckDB recomputation of bpe_merges: k unrolled rounds,
    each = adjacent-pair count over the word-frequency dictionary,
    (total desc, a, b) argmax, and the SAME leftmost-greedy
    list_reduce fold the engine uses (string accumulator joined by
    chr(31); merging appends the right symbol directly so the last
    symbol becomes the concatenation — see pipeline/bpe.py module
    docstring for why single-pass string replace would be wrong).
    Integer counts, plain-string symbols — hash-exact."""
    parts = [f"""
        with w0 as (
          select word, cast(count(*) as bigint) as cnt,
                 array_to_string(regexp_extract_all(word, '.'), chr(31)) as s
          from (select unnest({_TOKENS}) as word from documents)
          group by word
        )"""]
    for r in range(1, k + 1):
        parts.append(f""",
        p{r} as (
          select u.a as a, u.b as b, cast(sum(cnt) as bigint) as total
          from (
            select cnt,
                   unnest(list_transform(range(1, len(sy)),
                          i -> {{'a': sy[i], 'b': sy[i+1]}})) as u
            from (select cnt, string_split(s, chr(31)) as sy from w{r-1})
          ) group by u.a, u.b
        ),
        b{r} as (select a, b, total from p{r} order by total desc, a, b limit 1),
        w{r} as (
          select word, cnt,
                 list_reduce(string_split(s, chr(31)), (acc, x) ->
                   case when (acc = b{r}.a or ends_with(acc, chr(31) || b{r}.a))
                             and x = b{r}.b
                        then acc || x else acc || chr(31) || x end) as s
          from w{r-1} cross join b{r}
        )""")
    sel = "\n        union all ".join(
        f"select cast({r} as bigint) as merge_round, a as left_sym,"
        f" b as right_sym, a || b as merged, total as pair_count from b{r}"
        for r in range(1, k + 1)
    )
    return "".join(parts) + "\n        " + sel


def _cms_sql(depth: int = 4, w_hex: int = 2, salt: str = "cms") -> str:
    """Full DuckDB recomputation of the count-min sketch row: the same
    md5(salt:row:token) bucket dag, integer counts, integer min —
    hash-exact (no floats anywhere)."""
    return f"""
        with tok as (
          select unnest({_TOKENS}) as token from documents
        ),
        rws as (select unnest(range(0, {depth})) as row),
        sk as (
          select rws.row,
                 substr(md5('{salt}:' || cast(rws.row as varchar) || ':' || token),
                        1, {w_hex}) as bucket,
                 count(*) as cnt
          from tok, rws group by 1, 2
        ),
        q as (
          select distinct unnest({_TOKENS}) as token
          from documents where doc_id % 97 = 0
        ),
        probe as (
          select q.token, rws.row,
                 substr(md5('{salt}:' || cast(rws.row as varchar) || ':' || q.token),
                        1, {w_hex}) as bucket
          from q, rws
        )
        select p.token, cast(min(coalesce(sk.cnt, 0)) as bigint) as estimate
        from probe p
        left join sk on sk.row = p.row and sk.bucket = p.bucket
        group by p.token
    """


_KGML_COMBOS = (
    "flatten([ [ {{'a': {l}[i], 'b': {l}[j]}} for j in range(i+1, len({l})+1) ] "
    "for i in range(1, len({l})+1) ])"
)


def _kgml_kept_cte(n_docs: int = _KGML_DOCS, seed: int = _KGML_SEED) -> str:
    """Shared CTE chain for the KGML oracles: embedded corpus ->
    regex parse -> flatten -> pair expansion -> aggregation -> keep-last
    (`kept`, rn = 1 selects the surviving row per (doc, entry1, entry2)).

    DuckDB has no XML reader, but the corpus is a deterministic function
    of (n_docs, seed), so the oracle embeds the SAME documents as string
    literals and re-parses them independently: RE2 regex pulls entry /
    relation / subtype attributes out of the markup (attribute-order
    robust; subtype values like '-->' contain '>' so subtypes are
    matched on their quoted attributes, never with '[^>]*'), list
    comprehensions rebuild itertools.combinations pair order, and the
    keep-last window reproduces the reference's pandas drop_duplicates
    (genes.py:236). doc_id is precomputed with hashlib (independent of
    Spark's JVM sha2) from the same (repo, path, commit) inputs.
    """
    import hashlib

    from knext_spark.corpus import gen_corpus_rows

    vals = []
    for repo, path, commit, _lang, content in gen_corpus_rows(
        n_docs=n_docs, seed=seed
    ):
        doc_id = hashlib.sha256(
            "\x00".join([repo, path, commit]).encode()
        ).hexdigest()
        vals.append(f"('{doc_id}', '{content.replace(chr(39), chr(39) * 2)}')")
    values = ",\n".join(vals)
    combos = _KGML_COMBOS.format(l="combined")
    combos1 = _KGML_COMBOS.format(l="arr1")
    combos2 = _KGML_COMBOS.format(l="arr2")
    return rf"""
with kdocs(doc_id, content) as (values
{values}
),
base as (
  select doc_id,
         regexp_replace(regexp_extract(regexp_extract(content, '<pathway [^>]*>'),
                        ' name="([^"]*)"', 1), '^path:', '') as pathway,
         content
  from kdocs
),
etags as (
  select doc_id, unnest(regexp_extract_all(content, '<entry [^>]*>')) as etag
  from base
),
conv as (
  select doc_id,
         regexp_extract(etag, ' id="([^"]*)"', 1) as eid,
         array_to_string(list_transform(
             string_split(regexp_extract(etag, ' name="([^"]*)"', 1), ' '),
             t -> t || '-' || regexp_extract(etag, ' id="([^"]*)"', 1)), ' ') as cname
  from etags
),
rels as (
  select doc_id, pathway,
         unnest(regexp_extract_all(content, '<relation[\s\S]*?</relation>')) as rblock,
         unnest(range(1, len(regexp_extract_all(content, '<relation[\s\S]*?</relation>'))+1)) as rel_idx
  from base
),
subs as (
  select doc_id, pathway, rel_idx,
         regexp_extract(rblock, ' entry1="([^"]*)"', 1) as e1,
         regexp_extract(rblock, ' entry2="([^"]*)"', 1) as e2,
         regexp_extract(rblock, ' type="([^"]*)"', 1) as rtype,
         unnest(regexp_extract_all(rblock, '<subtype\s+name="[^"]*"\s+value="[^"]*"')) as stag,
         unnest(range(1, len(regexp_extract_all(rblock, '<subtype\s+name="[^"]*"\s+value="[^"]*"'))+1)) as sub_idx
  from rels
),
raw0 as (
  select doc_id, pathway, rel_idx, sub_idx, e1, e2, rtype,
         regexp_extract(stag, 'name="([^"]*)"', 1) as sname,
         regexp_extract(stag, 'value="([^"]*)"', 1) as svalue
  from subs
),
raw as (
  select r.doc_id, r.pathway, r.rel_idx, r.sub_idx, r.rtype, r.sname,
         case when r.sname = 'compound'
              then coalesce(cv.cname, r.svalue) else r.svalue end as value,
         string_split(coalesce(c1.cname, 'nan'), ' ') as arr1,
         string_split(coalesce(c2.cname, 'nan'), ' ') as arr2
  from raw0 r
  left join conv c1 on c1.doc_id = r.doc_id and c1.eid = r.e1
  left join conv c2 on c2.doc_id = r.doc_id and c2.eid = r.e2
  left join conv cv on cv.doc_id = r.doc_id and cv.eid = r.svalue
                   and r.sname = 'compound'
),
withpairs as (
  select *, arr1 || arr2 as combined from raw
),
exp as (
  select doc_id, pathway, rel_idx, sub_idx, rtype, sname, value,
         unnest({combos}) as pair,
         unnest(range(1, len({combos})+1)) as pair_idx
  from withpairs
),
agg as (
  select doc_id, pathway, pair.a as entry1, pair.b as entry2,
         string_agg(rtype, ',' order by rel_idx, sub_idx, pair_idx) as type,
         string_agg(value, ',' order by rel_idx, sub_idx, pair_idx) as value,
         string_agg(sname, ',' order by rel_idx, sub_idx, pair_idx) as name,
         0 as priority,
         null::bigint as rel_idx, null::bigint as sub_idx, null::bigint as pair_idx
  from exp
  group by doc_id, pathway, pair.a, pair.b
),
cliqbase as (
  select doc_id, pathway, rel_idx, sub_idx,
         (case when len(arr1) > 1 then {combos1} else [] end) ||
         (case when len(arr2) > 1 then {combos2} else [] end) as pairlist
  from withpairs
),
cliq as (
  select doc_id, pathway,
         (unnest(pairlist)).a as entry1, (unnest(pairlist)).b as entry2,
         'type 2' as type, 'undirectional' as value, 'clique' as name,
         1 as priority,
         rel_idx, sub_idx,
         unnest(range(1, len(pairlist)+1)) as pair_idx
  from cliqbase
),
merged as (
  select * from agg union all select * from cliq
),
kept as (
  select *, row_number() over (
    partition by doc_id, entry1, entry2
    order by priority desc, rel_idx desc nulls last,
             sub_idx desc nulls last, pair_idx desc nulls last
  ) as rn
  from merged
)"""


def _kgml_mixed_sql(n_docs: int = _KGML_DOCS, seed: int = _KGML_SEED) -> str:
    """Full DuckDB oracle for kgml_edges_mixed (reference genes.py:280-284
    mixed branch: keep-last output minus clique rows, no propagation).
    Verified bit-identical to the engine on the 25-doc corpus including
    the real hsa00232.xml reference fixture (788 rows)."""
    return f"""{_kgml_kept_cte(n_docs, seed)}
select doc_id, pathway, entry1, entry2, type, value, name
from kept
where rn = 1 and name <> 'clique'
"""


def _kgml_contract_sql(n_docs: int = _KGML_DOCS, seed: int = _KGML_SEED) -> str:
    """Full DuckDB oracle for kgml_edges_contract — genes mode with the
    engine's SCALE-PATH propagation variant (propagate_contract:
    CPp(g1,g2) iff a path g1 -> n+ -> g2 exists with every intermediate
    node non-gene; knext_spark/knext/propagate.py:143). The closure is a
    recursive CTE (UNION dedup = the engine's left_anti + distinct
    frontier), so the oracle is the TRUE fixpoint — if the engine ever
    truncated at max_iters the gate would catch it. Also reproduces the
    genes-mode has_cpd gate computed BEFORE the path filter
    (reference genes.py:280-293 quirk), the path-endpoint purge, the
    set-union of CPp rows with existing rows, the non-gene endpoint
    purge, and the clique drop applied only to propagated (has_cpd)
    documents. Verified bit-identical to the engine on the 25-doc
    corpus including the real hsa00232.xml fixture (668 rows)."""
    return f"""{_kgml_kept_cte(n_docs, seed)},
base7 as (
  select doc_id, pathway, entry1, entry2, type, value, name
  from kept where rn = 1
),
flagged as (
  select *,
         max(case when entry1 like 'cpd:%' or entry2 like 'cpd:%'
                    or entry1 like 'undefined%' or entry2 like 'undefined%'
                  then 1 else 0 end)
           over (partition by doc_id) = 1 as has_cpd
  from base7
),
pathfiltered as (
  select * from flagged
  where entry1 not like 'path%' and entry2 not like 'path%'
),
wo as (
  select doc_id, pathway, entry1, entry2, type, value, name
  from pathfiltered where not has_cpd
),
wc as (
  select doc_id, pathway, entry1, entry2, type, value, name
  from pathfiltered where has_cpd
),
g2n as (
  select distinct doc_id, entry1 as gene, entry2 as node from wc
  where not (entry1 like 'cpd%' or entry1 like 'undefined%' or entry1 like 'path%')
    and (entry2 like 'cpd%' or entry2 like 'undefined%' or entry2 like 'path%')
),
n2n as (
  select distinct doc_id, entry1 as jfrom, entry2 as jto from wc
  where (entry1 like 'cpd%' or entry1 like 'undefined%' or entry1 like 'path%')
    and (entry2 like 'cpd%' or entry2 like 'undefined%' or entry2 like 'path%')
),
n2g as (
  select distinct doc_id, entry1 as jfrom, entry2 as jgene from wc
  where (entry1 like 'cpd%' or entry1 like 'undefined%' or entry1 like 'path%')
    and not (entry2 like 'cpd%' or entry2 like 'undefined%' or entry2 like 'path%')
),
reach as (
  with recursive r(doc_id, gene, node) as (
    select doc_id, gene, node from g2n
    union
    select r.doc_id, r.gene, n2n.jto
    from r join n2n on n2n.doc_id = r.doc_id and n2n.jfrom = r.node
  )
  select * from r
),
docpath as (
  select doc_id, min(pathway) as pathway from wc group by doc_id
),
cpp as (
  select distinct reach.doc_id, docpath.pathway,
         reach.gene as entry1, n2g.jgene as entry2,
         'CPp' as type, 'Custom' as value, 'compound propagation' as name
  from reach
  join n2g on n2g.doc_id = reach.doc_id and n2g.jfrom = reach.node
  join docpath on docpath.doc_id = reach.doc_id
),
wc_out as (
  select * from wc union select * from cpp
),
wc_kept as (
  select * from wc_out
  where not (entry1 like 'cpd%' or entry1 like 'undefined%' or entry1 like 'path%')
    and not (entry2 like 'cpd%' or entry2 like 'undefined%' or entry2 like 'path%')
    and name <> 'clique'
)
select doc_id, pathway, entry1, entry2, type, value, name from wc_kept
union all
select doc_id, pathway, entry1, entry2, type, value, name from wo
"""


def _ivf_refined_sql(
    refine: int, nprobe: int = 2, k: int = 3, n_centroids: int = 16
) -> str:
    """Unrolled Lloyd iterations as materialized CTEs (MATERIALIZED is
    load-bearing: DuckDB inlines CTEs per reference, so an unrolled
    chain would otherwise re-evaluate exponentially). Each step is the
    bit-exact twin of similarity._lloyd_step: argmax-cosine assignment
    (sim desc, cid asc), micros-int component sums (exact and
    order-independent on both engines), mean = s / n / 1e6 in the same
    association, empty clusters keep the previous centroid."""
    steps = [
        f"""
        cents0 as materialized (
          select row_number() over (order by h, ck) as cid,
                 list_transform(cv, x -> x::double) as cv
          from (select md5(cast(vec_id as varchar)) as h, vec_id as ck,
                       embedding as cv
                from embeddings order by h, ck limit {n_centroids})
        )"""
    ]
    for i in range(refine):
        steps.append(
            f"""
        asg{i} as materialized (
          select id, v, cid from (
            select id, v, cid,
                   row_number() over (partition by id order by sim desc, cid asc) as rn
            from (
              select e.vec_id as id, e.embedding as v, c.cid,
                     {_COS.format(a="e.embedding", b="c.cv")} as sim
              from embeddings e cross join cents{i} c
            )
          ) where rn = 1
        ),
        mean{i} as (
          select cid, pos, sum(q) / count(*) / 1000000.0 as m
          from (
            select cid,
                   unnest(range(1, len(v)+1)) as pos,
                   cast(floor(unnest(v)::double * 1000000 + 0.5) as bigint) as q
            from asg{i}
          ) group by cid, pos
        ),
        cents{i + 1} as materialized (
          select c.cid, coalesce(n.cv, c.cv) as cv
          from cents{i} c
          left join (select cid, list(m order by pos) as cv
                     from mean{i} group by cid) n using (cid)
        )"""
        )
    final = f"cents{refine}"
    return f"""
        with {",".join(steps)},
        sims as (
          select e.vec_id as id, e.embedding as v, c.cid,
                 {_COS.format(a="e.embedding", b="c.cv")} as sim
          from embeddings e cross join {final} c
        ),
        ranked as (
          select id, v, cid,
                 row_number() over (partition by id order by sim desc, cid asc) as rn
          from sims
        ),
        cand as (select id as nid, v as nv, cid from ranked where rn = 1),
        probe as (select id as qid, v as qv, cid from ranked where rn <= {nprobe}),
        pairs as (
          select qid, nid, cid, {_COS.format(a="qv", b="nv")} as cosine
          from probe join cand using (cid) where qid <> nid
        )
        select vec_id, neighbor_id, rank, cosine_micros, cid from (
          select qid as vec_id, nid as neighbor_id,
                 row_number() over (partition by qid order by cosine desc, nid asc) as rank,
                 cast(floor(cosine * 1000000 + 0.5) as bigint) as cosine_micros,
                 cast(cid as bigint) as cid
          from pairs
        ) where rank <= {k}
    """


def oracle_sql() -> dict[str, str]:
    edge = _EDGE_SQL
    return {
        "agg_collect_join": """
            select l_orderkey,
                   string_agg(l_returnflag, ',' order by l_linenumber, l_returnflag) as flags
            from lineitem group by l_orderkey
        """,
        "dedup_keep_last": """
            select user_id, event_id, event_type from (
              select user_id, event_id, event_type,
                     row_number() over (partition by user_id order by ts desc, event_id desc) as rn
              from events
            ) where rn = 1
        """,
        "broadcast_lookup_join": """
            select p_brand, count(*) as n_items,
                   cast(sum(cast(floor(l_quantity) as bigint)) as bigint) as sum_qty
            from lineitem join part on l_partkey = p_partkey
            group by p_brand
        """,
        "explode_tokens": """
            select word, count(*) as n
            from (select unnest(string_split(p_type, ' ')) as word from part)
            group by word
        """,
        "prefix_filter": """
            select o_orderstatus, count(*) as n from orders
            where o_orderpriority like '1%' group by o_orderstatus
        """,
        "union_distinct": """
            select o_custkey as custkey from orders
            union
            select c_custkey as custkey from customer
        """,
        "regex_modifier_roundtrip": """
            select doc_id,
                   nullif(regexp_extract(source, '([0-9]+)$', 1), '') as modifier,
                   regexp_replace(source, '([0-9]+)$', '') as base,
                   regexp_replace(source, '([0-9]+)$', '')
                     || coalesce(nullif(regexp_extract(source, '([0-9]+)$', 1), ''), '') as roundtrip
            from documents
        """,
        "clique_pairs": """
            with li as (select distinct l_orderkey, l_suppkey from lineitem)
            select a.l_suppkey as s1, b.l_suppkey as s2, count(*) as n_orders
            from li a join li b on a.l_orderkey = b.l_orderkey and a.l_suppkey < b.l_suppkey
            group by 1, 2
        """,
        "degrees": f"""
            with e as ({edge}),
            outd as (select src as node, count(*) as out_deg from e group by src),
            ind as (select dst as node, count(*) as in_deg from e group by dst)
            select coalesce(outd.node, ind.node) as node,
                   cast(coalesce(in_deg, 0) as bigint) as in_deg,
                   cast(coalesce(out_deg, 0) as bigint) as out_deg
            from outd full outer join ind using (node)
        """,
        "graph_roots": f"""
            with e as ({edge})
            select distinct src as node from e
            where src not in (select dst from e)
        """,
        "pricing_summary": """
            select l_returnflag, l_linestatus, count(*) as n_rows,
                   cast(sum(cast(floor(l_quantity) as bigint)) as bigint) as sum_qty,
                   cast(sum(cast(floor(l_extendedprice / 1000000 * 100 * 1000000 + 0.5) as bigint)) as bigint) as sum_price_cents
            from lineitem group by l_returnflag, l_linestatus
        """,
        "window_topk": """
            select o_custkey, o_orderkey, rnk from (
              select o_custkey, o_orderkey,
                     row_number() over (partition by o_custkey
                                        order by o_totalprice desc, o_orderkey asc) as rnk
              from orders
            ) where rnk <= 3
        """,
        "anti_join": """
            select c_custkey, c_mktsegment from customer
            where c_custkey not in (select o_custkey from orders)
        """,
        "lookup_fallback": """
            select coalesce(c_mktsegment, 'unknown') as segment, count(*) as n
            from events left join customer on user_id = c_custkey
            group by 1
        """,
        "token_count": f"""
            select doc_id,
                   cast(len(regexp_split_to_array(trim(text), '\\s+')) as bigint) as ws_tokens,
                   cast(len({_TOKENS}) as bigint) as re_tokens,
                   cast(length(text) as bigint) as chars
            from documents
        """,
        "quality_score": _quality_sql(),
        "deterministic_split": _split_sql(),
        "lang_id": _lang_sql(),
        "scrub_pii": _scrub_pii_sql(),
        "corpus_profile": f"""
            with l as ({_lang_sql()}),
            qq as (
              select doc_id,
                     len({_TOKENS}) as n_tok,
                     length(text) as n_chars,
                     length(text) - length(regexp_replace(text, '[^A-Za-z0-9 \t\n]', '', 'g')) as punct,
                     len(list_filter({_TOKENS}, t -> list_contains({_sql_list(_STOP)}, t))) as n_stop_freq,
                     case when len({_TOKENS}) > 0
                          then list_reduce(list_transform({_TOKENS}, t -> length(t)), (x,y) -> x+y)::double / len({_TOKENS})
                          else 0.0 end as mean_tok_len
              from documents
            ),
            p as (
              select doc_id, n_tok, n_chars,
                     ((case when n_tok between 20 and 10000 then 1.0 else 0.0 end)
                      + (case when (case when n_chars > 0 then punct / n_chars else 0.0 end) <= 0.2 then 1.0 else 0.0 end)
                      + (case when (case when n_tok > 0 then n_stop_freq / n_tok else 0.0 end) >= 0.05 then 1.0 else 0.0 end)
                      + (case when mean_tok_len >= 2.5 and mean_tok_len <= 10.0 then 1.0 else 0.0 end)
                     ) / 4.0 as quality
              from qq
            )
            select l.pred_lang,
                   cast(count(*) as bigint) as n_docs,
                   cast(sum(p.n_tok) as bigint) as total_tokens,
                   cast(sum(p.n_chars) as bigint) as total_chars,
                   cast(floor(avg(p.quality) * 1000000 + 0.5) as bigint) as mean_quality_micros,
                   cast(floor(quantile_cont(p.n_tok, 0.5) * 1000000 + 0.5) as bigint) as p50_tokens_micros,
                   cast(floor(quantile_cont(p.n_tok, 0.9) * 1000000 + 0.5) as bigint) as p90_tokens_micros,
                   cast(floor(quantile_cont(p.n_tok, 0.99) * 1000000 + 0.5) as bigint) as p99_tokens_micros
            from l join p using (doc_id)
            group by l.pred_lang
        """,
        "doc_fingerprint": f"""
            select doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) as exact_fp,
                   case when len({_TOKENS}) > 0 then
                     list_min(list_transform(range(1, greatest(len({_TOKENS}) - 7, 1) + 1),
                       i -> md5(array_to_string(({_TOKENS})[i:i+7], ' '))))
                   else null end as rolling_fp
            from documents
        """,
        "exact_dedup": """
            select doc_id, content_hash, cast(group_size as bigint) as group_size from (
              select doc_id,
                     md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) as content_hash,
                     row_number() over (partition by md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) order by doc_id) as rn,
                     count(*) over (partition by md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) as group_size
              from documents
            ) where rn = 1
        """,
        "minhash_signatures": _minhash_sql(8),
        "lsh_candidates": _lsh_cand_sql(),
        "minhash_dedup": _jaccard_sql(0.2, with_lsh=True),
        "dedup_against": f"""
            with sig as ({_minhash_sql(8)}),
            bands as ({" union all ".join(
                f"select doc_id, {b} as band,"
                f" md5(mh_{2 * b} || '|' || mh_{2 * b + 1}) as band_key from sig"
                for b in range(4)
            )}),
            nh as (
              select doc_id as a,
                     md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) as h
              from documents where doc_id % 3 <> 0
            ),
            shh as (
              select doc_id as b,
                     md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) as h
              from documents where doc_id % 3 = 0
            ),
            exact as (
              select a, min(b) as exact_dup_of
              from nh left join shh using (h) group by a
            ),
            bn as (select * from bands where doc_id % 3 <> 0),
            bs as (select * from bands where doc_id % 3 = 0),
            kn as (
              select band, band_key from bn
              group by band, band_key having count(*) <= 10000
            ),
            ks as (
              select band, band_key from bs
              group by band, band_key having count(*) <= 10000
            ),
            bn2 as (select bn.* from bn join kn using (band, band_key)),
            bs2 as (select bs.* from bs join ks using (band, band_key)),
            cand as (
              select distinct n.doc_id as a, s.doc_id as b
              from bn2 n join bs2 s using (band, band_key)
            ),
            sh as (select doc_id, {_shingles_sql(3)} as shs from documents),
            exn as (
              select s.doc_id as a, unnest(s.shs) as sh from sh s
              where s.doc_id in (select a from cand)
            ),
            exs as (
              select s.doc_id as b, unnest(s.shs) as sh from sh s
              where s.doc_id in (select b from cand)
            ),
            inter as (
              select exn.a, exs.b, count(*) as inter
              from exn join exs on exn.sh = exs.sh
              join cand on cand.a = exn.a and cand.b = exs.b
              group by exn.a, exs.b
            ),
            sizes as (select doc_id, len(shs) as n from sh),
            ver as (
              select i.a, i.b,
                     i.inter / (na.n + nb.n - i.inter) as j
              from inter i
              join sizes na on na.doc_id = i.a
              join sizes nb on nb.doc_id = i.b
              where i.inter / (na.n + nb.n - i.inter) >= 0.5
            ),
            near as (
              select a, near_dup_of, j from (
                select a, b as near_dup_of, j,
                       row_number() over (partition by a order by b) as rn
                from ver
              ) where rn = 1
            )
            select n.doc_id,
                   e.exact_dup_of is not null as exact_dup,
                   cast(e.exact_dup_of as bigint) as exact_dup_of,
                   near.near_dup_of is not null as near_dup,
                   cast(near.near_dup_of as bigint) as near_dup_of,
                   cast(floor(near.j * 1000000 + 0.5) as bigint)
                     as near_jaccard_micros
            from (
              select distinct doc_id from documents where doc_id % 3 <> 0
            ) n
            left join exact e on e.a = n.doc_id
            left join near on near.a = n.doc_id
        """,
        "dedup_clusters": f"""
            with recursive mh as ({_jaccard_sql(0.2, with_lsh=True)}),
            und as (select a, b from mh union select b as a, a as b from mh),
            pn as (select distinct a as node from und),
            tc(node, r) as (
              select node, node from pn
              union
              select tc.node, u.b from tc join und u on u.a = tc.r
            ),
            clu as (select node, min(r) as cluster from tc group by node)
            select cast(d.doc_id as bigint) as doc_id,
                   cast(coalesce(c.cluster, d.doc_id) as bigint) as cluster,
                   coalesce(c.cluster, d.doc_id) = d.doc_id as is_canonical
            from documents d left join clu c on c.node = d.doc_id
        """,
        "ngram_jaccard": _jaccard_sql(0.1, with_lsh=False),
        "simhash": _simhash_sql(16),
        "simhash_near_pairs": f"""
            with fp as ({_simhash_sql(16)})
            select a.doc_id as a, b.doc_id as b,
                   cast(bit_count(xor(a.simhash, b.simhash)) as bigint) as hamming
            from fp a join fp b on a.doc_id < b.doc_id
            where bit_count(xor(a.simhash, b.simhash)) <= 2
        """,
        "cosine_topk": f"""
            with p as (
              select a.vec_id as qid, b.vec_id as nid,
                     {_COS.format(a="a.embedding", b="b.embedding")} as cosine
              from embeddings a join embeddings b on a.vec_id <> b.vec_id
            )
            select qid as vec_id, nid as neighbor_id, rank, cosine_micros from (
              select qid, nid,
                     row_number() over (partition by qid order by cosine desc, nid asc) as rank,
                     cast(floor(cosine * 1000000 + 0.5) as bigint) as cosine_micros
              from p
            ) where rank <= 3
        """,
        "ann_ivf": f"""
            with picked as (
              select md5(cast(vec_id as varchar)) as h, vec_id as ck, embedding as cv
              from embeddings order by h, ck limit 16
            ),
            cents as (select row_number() over (order by h, ck) as cid, cv from picked),
            sims as (
              select e.vec_id as id, e.embedding as v, c.cid,
                     {_COS.format(a="e.embedding", b="c.cv")} as sim
              from embeddings e cross join cents c
            ),
            ranked as (
              select id, v, cid,
                     row_number() over (partition by id order by sim desc, cid asc) as rn
              from sims
            ),
            cand as (select id as nid, v as nv, cid from ranked where rn = 1),
            probe as (select id as qid, v as qv, cid from ranked where rn <= 2),
            pairs as (
              select qid, nid, cid, {_COS.format(a="qv", b="nv")} as cosine
              from probe join cand using (cid) where qid <> nid
            )
            select vec_id, neighbor_id, rank, cosine_micros, cid from (
              select qid as vec_id, nid as neighbor_id,
                     row_number() over (partition by qid order by cosine desc, nid asc) as rank,
                     cast(floor(cosine * 1000000 + 0.5) as bigint) as cosine_micros,
                     cast(cid as bigint) as cid
              from pairs
            ) where rank <= 3
        """,
        "ann_ivf_refined": _ivf_refined_sql(2),
        "lsh_ann_buckets": f"""
            select {_bucket_sql(4)} as bucket, count(*) as n
            from embeddings group by 1
        """,
        "ann_multiprobe": f"""
            with b as (select vec_id, embedding, {_bucket_sql(4)} as bucket from embeddings),
            qp as (select vec_id as qid,
                          unnest([bucket, xor(bucket, 1), xor(bucket, 2)]) as bucket
                   from b),
            cand as (select vec_id as nid, bucket from b),
            pairs as (select distinct qp.qid, cand.nid
                      from qp join cand using (bucket) where qp.qid <> cand.nid),
            scored as (select p.qid, p.nid,
                              {_COS.format(a="x.embedding", b="y.embedding")} as cosine
                       from pairs p
                       join b x on x.vec_id = p.qid
                       join b y on y.vec_id = p.nid)
            select qid as vec_id, nid as neighbor_id, rank, cosine_micros from (
              select qid, nid,
                     row_number() over (partition by qid order by cosine desc, nid asc) as rank,
                     cast(floor(cosine * 1000000 + 0.5) as bigint) as cosine_micros
              from scored
            ) where rank <= 3
        """,
        "ann_multiprobe_ranked": f"""
            with b as (
              select vec_id, embedding, {_bucket_sql(4)} as bucket,
                     {_dot_sql(0)} as d0, {_dot_sql(1)} as d1,
                     {_dot_sql(2)} as d2, {_dot_sql(3)} as d3
              from embeddings
            ),
            margins as (
              select vec_id, bucket, 0 as p, abs(d0) as m from b
              union all select vec_id, bucket, 1, abs(d1) from b
              union all select vec_id, bucket, 2, abs(d2) from b
              union all select vec_id, bucket, 3, abs(d3) from b
            ),
            ranked as (
              select vec_id, bucket, p,
                     row_number() over (partition by vec_id order by m asc, p asc) as rnk
              from margins
            ),
            qp as (
              select vec_id as qid, bucket from b
              union
              select vec_id, xor(bucket, (1::bigint << p)) from ranked where rnk <= 2
            ),
            cand as (select vec_id as nid, bucket from b),
            pairs as (select distinct qp.qid, cand.nid
                      from qp join cand using (bucket) where qp.qid <> cand.nid),
            scored as (select p.qid, p.nid,
                              {_COS.format(a="x.embedding", b="y.embedding")} as cosine
                       from pairs p
                       join b x on x.vec_id = p.qid
                       join b y on y.vec_id = p.nid)
            select qid as vec_id, nid as neighbor_id, rank, cosine_micros from (
              select qid, nid,
                     row_number() over (partition by qid order by cosine desc, nid asc) as rank,
                     cast(floor(cosine * 1000000 + 0.5) as bigint) as cosine_micros
              from scored
            ) where rank <= 3
        """,
        "embedding_near_dups": f"""
            with b as (select vec_id, embedding, {_bucket_sql(4)} as bucket from embeddings),
            pairs as (
              select distinct x.vec_id as a, y.vec_id as b,
                     {_COS.format(a="x.embedding", b="y.embedding")} as cosine
              from b x join b y on x.bucket = y.bucket and x.vec_id < y.vec_id
            )
            select a, b, cast(floor(cosine * 1000000 + 0.5) as bigint) as cosine_micros
            from pairs where cosine >= 0.2
        """,
        "payload_stats": """
            select cast(doc_id as varchar) as media_id,
                   case (doc_id % 3 + 1)
                     when 1 then 'image' when 2 then 'audio' else 'video' end as kind,
                   cast(octet_length(encode(text)) as bigint) as n_bytes,
                   sha256(text) as payload_sha256
            from documents
        """,
        "triangles": f"""
            with e as ({edge}),
            e0 as (select distinct least(src, dst) as a, greatest(src, dst) as b
                   from e where src <> dst),
            nodes as (select src as node from e union select dst from e),
            tri as (
              select e1.a as x, e1.b as y, e2.b as z
              from e0 e1
              join e0 e2 on e1.a = e2.a and e1.b < e2.b
              join e0 e3 on e3.a = e1.b and e3.b = e2.b
            ),
            tn as (select unnest([x, y, z]) as node from tri),
            cnt as (select node, count(*) as c from tn group by node)
            select nodes.node, cast(coalesce(cnt.c, 0) as bigint) as triangles
            from nodes left join cnt using (node)
        """,
        "pseudo_diameter": f"""
            with recursive e0 as ({_EDGE_SQL}),
            e as (
              select distinct src, dst from (
                select src, dst from e0
                union all
                select dst as src, src as dst from e0
              )
            ),
            nodes as (select distinct src as node from e),
            s1 as (select min(node) as node from nodes),
            r1(node, d) as (
              select node, 0 from s1
              union
              select e.dst, r1.d + 1
              from r1 join e on e.src = r1.node
              where r1.d < {_BFS_HOPS}
            ),
            m1 as (select node, min(d) as dist from r1 group by node),
            f1 as (
              select node, dist from m1 order by dist desc, node asc limit 1
            ),
            r2(node, d) as (
              select node, 0 from f1
              union
              select e.dst, r2.d + 1
              from r2 join e on e.src = r2.node
              where r2.d < {_BFS_HOPS}
            ),
            m2 as (select node, min(d) as dist from r2 group by node),
            f2 as (
              select node, dist from m2 order by dist desc, node asc limit 1
            )
            select cast(1 as int) as sweep, s1.node as source,
                   f1.node as farthest, cast(f1.dist as bigint) as ecc
            from s1, f1
            union all
            select cast(2 as int), f1.node, f2.node, cast(f2.dist as bigint)
            from f1, f2
        """,
        "bfs_distances": f"""
            with recursive e as (
              select distinct src, dst from ({_EDGE_SQL})
            ),
            -- NOT `union`: under WITH RECURSIVE, DuckDB 1.0 gives any
            -- `A union B` CTE recursive-iteration semantics (no dedup
            -- between base and step) even without a self-reference —
            -- `select 1 union select 1` yields TWO rows there
            nodes as (
              select distinct node from (
                select src as node from e union all select dst from e
              )
            ),
            seeds as (select node from nodes where node % 100 = 0),
            r(node, d) as (
              select node, 0 from seeds
              union
              select e.dst, r.d + 1
              from r join e on e.src = r.node
              where r.d < {_BFS_HOPS}
            ),
            md as (select node, min(d) as dist from r group by node)
            select nodes.node, cast(md.dist as bigint) as dist
            from nodes left join md using (node)
        """,
        "path_counts": _path_counts_sql(),
        "random_walks": _random_walks_sql(_WALK_LEN, _WALKS_PER_START),
        "node2vec_walks": _node2vec_sql(),
        "landmark_distances": f"""
            with recursive e as (
              select distinct src, dst from ({_EDGE_SQL})
            ),
            -- `union all` + outer distinct, NOT `union`: see the
            -- bfs_distances note on DuckDB WITH RECURSIVE semantics
            nodes as (
              select distinct node from (
                select src as node from e union all select dst from e
              )
            ),
            seeds as (select node from nodes where node % 100 = 0),
            r(seed, node, d) as (
              select node, node, 0 from seeds
              union
              select r.seed, e.dst, r.d + 1
              from r join e on e.src = r.node
              where r.d < {_BFS_HOPS}
            )
            select seed, node, cast(min(d) as bigint) as dist
            from r group by seed, node
        """,
        "clustering_coef": f"""
            with e as ({edge}),
            e0 as (select distinct least(src, dst) as a, greatest(src, dst) as b
                   from e where src <> dst),
            nodes as (select src as node from e union select dst from e),
            tri as (
              select e1.a as x, e1.b as y, e2.b as z
              from e0 e1
              join e0 e2 on e1.a = e2.a and e1.b < e2.b
              join e0 e3 on e3.a = e1.b and e3.b = e2.b
            ),
            tn as (select unnest([x, y, z]) as node from tri),
            cnt as (select node, count(*) as c from tn group by node),
            deg as (
              select node, count(*) as d
              from (select a as node from e0 union all select b from e0)
              group by node
            )
            select nodes.node,
                   cast(floor(
                     case when coalesce(deg.d, 0) >= 2
                          then 2.0 * coalesce(cnt.c, 0) / (deg.d * (deg.d - 1))
                          else 0.0 end * 1000000 + 0.5) as bigint
                   ) as clustering_micros
            from nodes left join cnt using (node) left join deg using (node)
        """,
        "neighbor_jaccard": f"""
            with e as ({_edge_sql(5000)}),
            e0 as (select distinct least(src, dst) as a, greatest(src, dst) as b
                   from e where src <> dst),
            adj as (select a as w, b as x from e0
                    union all
                    select b as w, a as x from e0),
            deg as (select w, count(*) as d from adj group by w),
            p as (
              select l.x as a, r.x as b, count(*) as common
              from adj l join adj r on l.w = r.w and l.x < r.x
              group by l.x, r.x
              having count(*) >= 3
            ),
            np as (
              select p.* from p
              left join e0 on p.a = e0.a and p.b = e0.b
              where e0.a is null
            )
            select np.a, np.b,
                   cast(np.common as bigint) as common,
                   cast(da.d + db.d - np.common as bigint) as union_size,
                   cast(floor(
                     cast(np.common as double) / (da.d + db.d - np.common)
                     * 1000000 + 0.5) as bigint) as jaccard_micros
            from np
            join deg da on np.a = da.w
            join deg db on np.b = db.w
        """,
        "link_features": f"""
            with e as ({_edge_sql(5000)}),
            e0 as (select distinct least(src, dst) as a, greatest(src, dst) as b
                   from e where src <> dst),
            adj as (select a as w, b as x from e0
                    union all
                    select b as w, a as x from e0),
            deg as (select w, count(*) as d from adj group by w),
            p as (
              select l.x as a, r.x as b, count(*) as common
              from adj l join adj r on l.w = r.w and l.x < r.x
              group by l.x, r.x
              having count(*) >= 3
            ),
            np as (
              select p.* from p
              left join e0 on p.a = e0.a and p.b = e0.b
              where e0.a is null
            )
            select np.a, np.b,
                   cast(np.common as bigint) as common,
                   cast(da.d * db.d as bigint) as preferential_attachment
            from np
            join deg da on np.a = da.w
            join deg db on np.b = db.w
        """,
        "assortativity": f"""
            with e as ({_EDGE_SQL}),
            e0 as (select distinct least(src, dst) as a, greatest(src, dst) as b
                   from e where src <> dst),
            deg as (select node, count(*) as d
                    from (select a as node from e0 union all select b from e0)
                    group by node),
            ends as (
              select da.d as da, db.d as db
              from e0
              join deg da on e0.a = da.node
              join deg db on e0.b = db.node
            ),
            mom as (
              select cast(2 * count(*) as bigint) as n_ends,
                     cast(sum(da + db) as bigint) as sum_d,
                     cast(2 * sum(da * db) as bigint) as sum_dd,
                     cast(sum(da * da + db * db) as bigint) as sum_d2
              from ends
            )
            select n_ends, sum_d, sum_dd, sum_d2,
                   cast(floor(
                     (n_ends::double * sum_dd::double
                      - sum_d::double * sum_d::double)
                     / (n_ends::double * sum_d2::double
                        - sum_d::double * sum_d::double)
                     * 1000000 + 0.5) as bigint) as assortativity_micros
            from mom
        """,
        "modularity_communities": f"""
            with e as ({_EDGE_SQL}),
            e0 as (select distinct least(src, dst) as a, greatest(src, dst) as b
                   from e where src <> dst),
            m as (select count(*) as m from e0),
            nodes as (select src as node from e union select dst as node from e),
            lab as (select node, node % 7 as label from nodes),
            deg as (select node, count(*) as d
                    from (select a as node from e0 union all select b from e0)
                    group by node),
            internal as (
              select la.label as label, count(*) as internal_edges
              from e0
              join lab la on e0.a = la.node
              join lab lb on e0.b = lb.node
              where la.label = lb.label
              group by la.label
            ),
            dsum as (
              select lab.label, sum(deg.d) as degree_sum
              from deg join lab using (node) group by lab.label
            )
            select dsum.label,
                   cast(coalesce(internal.internal_edges, 0) as bigint) as internal_edges,
                   cast(dsum.degree_sum as bigint) as degree_sum,
                   cast(floor((
                     coalesce(internal.internal_edges, 0)::double / (select m from m)
                     - (dsum.degree_sum::double / (2.0 * (select m from m)))
                       * (dsum.degree_sum::double / (2.0 * (select m from m)))
                   ) * 1000000 + 0.5) as bigint) as contribution_micros
            from dsum left join internal using (label)
        """,
        "contamination": f"""
            with dsh as (
              select doc_id, unnest({_shingles_sql(3)}) as sh from documents
            ),
            bsh as (
              select distinct sh from (
                select unnest({_shingles_sql(3)}) as sh
                from documents where doc_id % 97 = 0
              )
            ),
            agg as (
              select dsh.doc_id, count(*) as n_ngrams,
                     sum(case when bsh.sh is not null then 1 else 0 end) as n_hits
              from dsh left join bsh on dsh.sh = bsh.sh
              group by dsh.doc_id
            )
            select d.doc_id,
                   cast(coalesce(agg.n_ngrams, 0) as bigint) as n_ngrams,
                   cast(coalesce(agg.n_hits, 0) as bigint) as n_hits,
                   cast(floor(
                     case when coalesce(agg.n_ngrams, 0) > 0
                          then agg.n_hits::double / agg.n_ngrams::double
                          else 0.0 end * 1000000 + 0.5) as bigint
                   ) as contamination_micros
            from documents d left join agg using (doc_id)
        """,
        "stratified_sample": """
            with r as (
              select doc_id, lang,
                     row_number() over (
                       partition by lang
                       order by md5(cast(doc_id as varchar)), doc_id
                     ) as rn
              from documents
            )
            select doc_id, lang from r where rn <= 20
        """,
        "weighted_sample": _weighted_sample_sql(),
        "hll_distinct_tokens": _hll_sql(),
        "token_hist_quantiles": f"""
            with tc as (
              select lang, len({_TOKENS}) as v from documents
            ),
            h as (
              select lang,
                     least(greatest(v * 64, 0) // 2048, 63) as bin,
                     count(*) as cnt
              from tc group by lang, bin
            ),
            c as (
              select lang, bin, cnt,
                     sum(cnt) over (
                       partition by lang order by bin
                     ) as cum,
                     sum(cnt) over (partition by lang) as n
              from h
            ),
            qv as (select unnest({_HQ_MICROS}) as qm),
            tgt as (
              select c.*, qv.qm,
                     greatest(cast(ceil(
                       cast(qm as double) / cast(1000000 as double)
                         * cast(n as double)
                     ) as bigint), 1) as target
              from c cross join qv
            ),
            sel as (
              select lang, qm, n, bin, cnt, cum, target,
                     row_number() over (
                       partition by lang, qm order by bin
                     ) as rn
              from tgt where cum >= target
            )
            select lang,
                   cast(qm as bigint) as q_micros,
                   cast(n as bigint) as n,
                   cast(floor(
                     (cast(0 as double)
                      + (cast(bin as double)
                         + cast(target - (cum - cnt) as double)
                           / cast(cnt as double)) * cast(32 as double))
                     * 1000000 + 0.5) as bigint) as est_micros
            from sel where rn = 1
        """,
        "lm_score": f"""
            with ref as (
              select text from documents where lang = 'en'
            ),
            mb as (
              select unnest({_LM_BIGRAMS}) as bigram from ref
            ),
            model as (
              select bigram, count(*) as cnt from mb group by bigram
            ),
            tot as (
              select cast(sum(cnt) as bigint) as total,
                     cast(count(*) as bigint) as v
              from model
            ),
            db as (
              select doc_id, unnest({_LM_BIGRAMS}) as bigram from documents
            ),
            tf as (
              select doc_id, bigram, count(*) as tf
              from db group by doc_id, bigram
            ),
            terms as (
              select tf.doc_id, tf.bigram, tf.tf,
                     tf.tf::double
                       * (ln(coalesce(model.cnt, 0)::double + 1.0)
                          - ln((tot.total + tot.v)::double)) as term
              from tf left join model using (bigram) cross join tot
            ),
            agg as (
              select doc_id, cast(sum(tf) as bigint) as n_bigrams,
                     list_reduce(list(term order by bigram), (a, b) -> a + b) as s
              from terms group by doc_id
            )
            select d.doc_id,
                   cast(coalesce(agg.n_bigrams, 0) as bigint) as n_bigrams,
                   cast(floor(agg.s / agg.n_bigrams::double * 1000000 + 0.5)
                        as bigint) as avg_logp_micros
            from documents d left join agg using (doc_id)
        """,
        "line_dedup": """
            with toksrc as (
              select doc_id, string_split(text, ' ') as tk from documents
            ),
            d2 as (
              select doc_id,
                     array_to_string(
                       list_transform(range(0, cast(ceil(len(tk) / 3.0) as int)),
                         i -> array_to_string(tk[i*3+1:i*3+3], ' ')),
                       chr(10)) as text
              from toksrc
            ),
            lines as (
              select doc_id,
                     unnest(string_split(text, chr(10))) as line,
                     unnest(range(1, len(string_split(text, chr(10))) + 1)) as pos
              from d2
            ),
            m as (
              select doc_id, pos, line,
                     md5(lower(trim(line))) as lhash,
                     length(lower(trim(line))) < 6 as exempt
              from lines
            ),
            boiler as (
              select lhash from (
                select lhash, count(distinct doc_id) as doc_freq
                from m where not exempt group by lhash
              ) where doc_freq > 4
            )
            select m.doc_id,
                   cast(count(*) as bigint) as n_lines,
                   cast(sum(case when b.lhash is null or m.exempt
                                 then 1 else 0 end) as bigint) as n_kept,
                   coalesce(string_agg(
                     case when b.lhash is null or m.exempt then m.line end,
                     chr(10) order by m.pos), '') as clean_text
            from m left join boiler b on m.lhash = b.lhash
            group by m.doc_id
        """,
        "tfidf_topk": f"""
            with tok as (
              select doc_id, unnest({_TOKENS}) as token from documents
            ),
            tf as (
              select doc_id, token, count(*) as tf
              from tok group by doc_id, token
            ),
            dfreq as (select token, count(*) as df from tf group by token),
            n as (select count(distinct doc_id) as n_docs from documents),
            s as (
              select tf.doc_id, tf.token, tf.tf, dfreq.df,
                     tf.tf * (ln((n.n_docs + 1) / (dfreq.df + 1)) + 1) as tfidf,
                     row_number() over (
                       partition by tf.doc_id
                       order by tf.tf * (ln((n.n_docs + 1) / (dfreq.df + 1)) + 1)
                                desc, tf.token
                     ) as rnk
              from tf join dfreq using (token) cross join n
            )
            select doc_id, token,
                   cast(tf as bigint) as tf,
                   cast(df as bigint) as df,
                   cast(floor(tfidf * 1000000 + 0.5) as bigint) as tfidf_micros,
                   cast(rnk as int) as "rank"
            from s where rnk <= 3
        """,
        "gopher_filter": _gopher_sql(),
        "vocab_topk": f"""
            with tok as (
              select doc_id, unnest({_TOKENS}) as token from documents
            ),
            agg as (
              select token,
                     cast(count(*) as bigint) as tf,
                     cast(count(distinct doc_id) as bigint) as df
              from tok group by token
            )
            select token, tf, df, cast(rank as int) as rank from (
              select token, tf, df,
                     row_number() over (order by tf desc, token asc) as rank
              from agg
            ) where rank <= 200
        """,
        "repetition": f"""
            with t as (
              select doc_id, {_TOKENS} as toks from documents
            ),
            g as (
              select doc_id,
                     case when len(toks) >= 3
                          then list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
                          else [] end as wins
              from t
            )
            select doc_id,
                   cast(len(wins) as bigint) as total_ngrams,
                   cast(len(list_distinct(wins)) as bigint) as distinct_ngrams,
                   cast(floor(
                     case when len(wins) > 0
                          then 1.0 - len(list_distinct(wins))::double
                                     / len(wins)::double
                          else 0.0 end * 1000000 + 0.5) as bigint
                   ) as repetition_micros
            from g
        """,
        "pack_sequences": """
            with t as (
              select doc_id,
                     md5(cast(doc_id as varchar)) as h,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+')) as tokens
              from documents
            ),
            s as (
              select doc_id,
                     ('0x' || substr(h, 1, 8))::bigint % 8 as shard,
                     h, cast(tokens as bigint) as tokens
              from t
            ),
            w as (
              select doc_id, shard, tokens,
                     sum(tokens) over (partition by shard order by h, doc_id
                                       rows unbounded preceding) - tokens as off
              from s
            )
            select doc_id,
                   cast(shard as bigint) as shard,
                   tokens,
                   cast(off as bigint) as "offset",
                   cast(off // 512 as bigint) as bin_start,
                   cast(greatest(off + tokens - 1, off) // 512 as bigint) as bin_end
            from w
        """,
        "media_features": _media_features_sql(8),
        "pagerank": _pagerank_sql(_PR_ITERS),
        "pagerank_weighted": _pagerank_sql(_PR_ITERS, _WEDGE_SQL, weighted=True),
        "personalized_pagerank": _ppr_sql(_PR_ITERS),
        "hits": _hits_sql(_PR_ITERS),
        "scc": _scc_sql(),
        "connected_components": _cc_sql(),
        "label_propagation": _lpa_sql(10),
        # kgml_edges (genes mode, propagate='faithful'): rows-only —
        # the faithful propagation anchors on nx.shortest_path's
        # insertion-order BFS tie-break, which has no honest SQL
        # equivalent; parity is the byte-exact golden suite vs the
        # executed reference. The parse pipeline is hash-gated through
        # kgml_edges_mixed, and genes mode end-to-end through
        # kgml_edges_contract (scale-path propagation variant).
        "kgml_edges_mixed": _kgml_mixed_sql(),
        "kgml_edges_contract": _kgml_contract_sql(),
        "sessionize": """
            with e as (select user_id, epoch_us(ts) as us from events),
            d as (
              select user_id, us,
                     case when lag(us) over (partition by user_id order by us) is null
                            or us - lag(us) over (partition by user_id order by us) > 1800000000
                          then 1 else 0 end as new_s
              from e
            ),
            s as (
              select user_id, us,
                     sum(new_s) over (partition by user_id order by us
                                      rows unbounded preceding) as session_id
              from d
            )
            select user_id, cast(session_id as bigint) as session_id,
                   min(us) as session_start_us,
                   cast(count(*) as bigint) as n_events,
                   max(us) - min(us) as duration_us
            from s group by user_id, session_id
        """,
        "asof_join": """
            with l as (
              select event_id, user_id, epoch_us(ts) as us from events
            ),
            r0 as (
              select user_id, epoch_us(ts) as us, event_id from events
              where event_type = 'signup'
            ),
            r as (
              select user_id, us, event_id as payload from (
                select *, row_number() over (
                  partition by user_id, us
                  order by event_id desc, event_id desc
                ) as rn from r0
              ) where rn = 1
            ),
            -- struct marker mirrors the engine: a right row is a
            -- non-null OBSERVATION even when its payload is null, so
            -- a matched null payload attaches (merge_asof semantics)
            -- instead of forwarding an older timestamp's payload
            u as (
              select user_id as k, us as t, 1 as tag,
                     struct_pack(p := payload) as obs,
                     null::bigint as event_id
              from r
              union all
              select user_id, us, 2, null, event_id from l
            ),
            w as (
              select *, (last_value(obs ignore nulls) over (
                partition by k order by t, tag
                rows between unbounded preceding and current row
              )).p as asof_event_id
              from u
            )
            select event_id, k as user_id, t as ts_us, asof_event_id
            from w where tag = 2
        """,
        "range_join": """
            with l as (
              select event_id, user_id, epoch_us(ts) as us from events
              where event_type = 'signup'
            ),
            r as (
              select user_id, epoch_us(ts) as us, event_id from events
            )
            select l.event_id, l.user_id, l.us as ts_us,
                   r.event_id as range_event_id, r.us - l.us as gap
            from l join r on l.user_id = r.user_id
                         and r.us >= l.us and r.us <= l.us + 1800000000
        """,
        "k_core": _kcore_sql(3),
        "k_truss": _ktruss_sql(4),
        "topo_levels": _toposort_sql(),
        "mis": _peel_sql(dominate=True, rounds=20),
        "coloring": _peel_sql(dominate=False, rounds=28),
        "anf": _anf_sql(hops=3, k_hex=3),
        "cms_token_counts": _cms_sql(w_hex=1),
        "bloom_seen": _bloom_sql(),
        "dup_spans": _dup_spans_sql(),
        "contaminated_spans": _contam_spans_sql(),
        "bpe_merges": _bpe_sql(8),
    }
