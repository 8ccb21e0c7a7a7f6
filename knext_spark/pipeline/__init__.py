"""Large-scale training-data pipeline operators.

Beyond the reference's own capabilities, the engine ships the
operations a 100 TB training-data pipeline needs (task mandate):
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force cosine top-k, IVF-flat +
LSH-bucketed ANN), text analysis (language-ID, quality scoring, token
counting, fingerprinting), and multimodal binary-column plumbing.

Design rules:
- pure built-in pyspark.sql.functions (JVM, whole-stage codegen) in
  every hot path; Python only in the clearly-marked multimodal decode
  stubs (Arrow-batched mapInPandas);
- every deterministic operator is expressible in ANSI SQL too — the
  same md5-based hashing on both sides lets the DuckDB oracle in
  __spark_entry__.oracle_sql() reproduce values bit-for-bit;
- pair-generating operators (near-dup, similarity) use inverted-index
  or LSH-bucket joins, never a raw cross join, so candidate generation
  scales as O(matching pairs), not O(n^2).
"""

from knext_spark.pipeline.text import (  # noqa: F401
    corpus_profile,
    doc_fingerprint,
    gopher_filter,
    lang_id,
    quality_score,
    repetition_ratio,
    scrub_pii,
    tfidf_topk,
    token_count,
    vocab_topk,
    tokens_col,
)
from knext_spark.pipeline.contamination import contamination  # noqa: F401
from knext_spark.pipeline.sketch import (  # noqa: F401
    bloom_bits,
    bloom_merge,
    bloom_probe,
    cms_lookup,
    cms_merge,
    cms_table,
    histogram,
    histogram_quantiles,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from knext_spark.pipeline.packing import pack_sequences  # noqa: F401
from knext_spark.pipeline.bpe import bpe_encode, bpe_merges  # noqa: F401
from knext_spark.pipeline.lm import char_bigram_counts, lm_score  # noqa: F401
from knext_spark.pipeline.dedup import (  # noqa: F401
    contaminated_spans,
    dedup_against,
    dup_spans,
    dedup_clusters,
    exact_dedup,
    line_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
    shingles_col,
)
from knext_spark.pipeline.temporal import asof_join, range_join  # noqa: F401
from knext_spark.pipeline.splits import (  # noqa: F401
    deterministic_sample,
    deterministic_split,
    rate_hex,
    stratified_sample,
    split_col,
    temperature_rates,
    weighted_sample,
)
from knext_spark.pipeline.similarity import (  # noqa: F401
    cosine_topk,
    hot_buckets,
    ivf_ann_topk,
    ivf_centroids,
    lsh_ann_topk,
    embedding_near_dups,
)
