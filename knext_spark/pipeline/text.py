"""Text analysis operators: tokenization, counting, quality, language
ID, fingerprinting. All pure Catalyst expressions (no UDFs), designed
to be reproducible in ANSI SQL (DuckDB oracle parity — same regexes,
same md5-based hashes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_RE = "[a-z0-9]+"

# tiny marker-word inventories for the n-gram/stopword language
# heuristic; ASCII-only on purpose (locale-stable lower())
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "des", "que", "pour", "dans"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con", "para", "del"],
}

STOPWORDS_EN = LANG_MARKERS["en"]


def tokens_col(text: Column | str) -> Column:
    """Lowercased alnum tokens (BPE-ish regex split; word-level)."""
    return F.regexp_extract_all(F.lower(F.col(text) if isinstance(text, str) else text), F.lit(TOKEN_RE), 0)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + regex token count + char count."""
    return df.select(
        "doc_id",
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("ws_tokens"),
        F.size(tokens_col(text_col)).alias("re_tokens"),
        F.length(text_col).alias("chars"),
    )


def _quality_exprs(text_col: str = "text") -> dict[str, Column]:
    """The quality feature expressions, shared verbatim between
    :func:`quality_score` (per-doc contract surface) and
    :func:`corpus_profile` (one-scan aggregate)."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    # punct chars = chars NOT in [A-Za-z0-9 \t\n]. translate() with the
    # allowed set as delete-chars counts them via a plain char map —
    # value-identical to the regexp_replace strip it replaces, but with
    # no per-row regex scan or result-string allocation (measured 2.4s
    # -> 0.2s on the 10x bench corpus; guide §1.2 per-task work)
    _allowed = (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 \t\n"
    )
    punct = F.length(F.translate(F.col(text_col), _allowed, ""))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.array_intersect(toks, stop_arr))  # distinct-marker count
    # token-level stopword frequency (counts duplicates):
    n_stop_freq = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_tok_len = F.when(n_tok > 0, F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ) / n_tok).otherwise(F.lit(0.0))

    len_score = F.when((n_tok >= 20) & (n_tok <= 10000), 1.0).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    punct_score = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, n_stop_freq / n_tok).otherwise(F.lit(0.0))
    stop_score = F.when(stop_ratio >= 0.05, 1.0).otherwise(0.0)
    tok_len_score = F.when((mean_tok_len >= 2.5) & (mean_tok_len <= 10.0), 1.0).otherwise(0.0)
    return {
        "n_tokens": n_tok,
        "punct_ratio": punct_ratio.cast("double"),
        "stopword_ratio": stop_ratio.cast("double"),
        "mean_token_len": mean_tok_len.cast("double"),
        "distinct_stopwords": n_stop,
        "quality": (
            (len_score + punct_score + stop_score + tok_len_score) / 4.0
        ).cast("double"),
    }


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score:

    - length score: docs under 20 tokens or over 10k tokens are low
      quality for training;
    - punctuation ratio: non-alnum-non-space chars / chars;
    - stopword ratio: english stopword tokens / tokens (a floor of
      natural-language-ness);
    - mean token length (gibberish/code detector).
    Composite = mean of the four component scores, in [0, 1].
    """
    e = _quality_exprs(text_col)
    return df.select(
        "doc_id", *[e[k].alias(k) for k in (
            "n_tokens", "punct_ratio", "stopword_ratio", "mean_token_len",
            "distinct_stopwords", "quality",
        )]
    )


def _lang_best(text_col: str = "text") -> Column:
    """The argmax (hits, code) struct shared between :func:`lang_id`
    and :func:`corpus_profile`."""
    toks = tokens_col(text_col)
    scores = []
    for code, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(w) for w in markers])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias("hits"),
                F.lit(code).alias("code"),
            )
        )
    # argmax hits, tie-break min code: sort by (-hits, code) -> take first
    return F.array_sort(
        F.array(*scores),
        lambda a, b: F.when(a["hits"] > b["hits"], -1)
        .when(a["hits"] < b["hits"], 1)
        .when(a["code"] < b["code"], -1)
        .when(a["code"] > b["code"], 1)
        .otherwise(0),
    )[0]


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: per language, count token hits
    against a 10-word inventory; predict the argmax (ties: lexicographic
    language code; zero hits -> 'und')."""
    best = _lang_best(text_col)
    return df.select(
        "doc_id",
        F.when(best["hits"] > 0, best["code"]).otherwise("und").alias("pred_lang"),
        best["hits"].alias("marker_hits"),
    )


def corpus_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language corpus profile — the reporting aggregate a
    training-data pipeline runs after filtering: doc / token / char
    totals, mean composite quality, and exact interpolated
    token-count quantiles (p50/p90/p99) grouped by predicted language.

    Scale shape: ONE scan (all features are projections of the same
    row — reuses :func:`_lang_best` and :func:`_quality_exprs` rather
    than joining the per-doc operator outputs, which would cost three
    scans and two shuffles) and ONE exchange (the groupBy on the
    ~5-value language key; count/sum are map-side combinable, the
    exact percentile collects per-group token counts and is the
    documented small-group-cardinality trade-off — for a truly huge
    group count switch to approx_percentile).

    The mean quality is exactly cross-engine reproducible: each
    composite is a dyadic rational (k/4), so the double sum is exact
    in any order.
    """
    best = _lang_best(text_col)
    q = _quality_exprs(text_col)
    per_doc = df.select(
        F.when(best["hits"] > 0, best["code"]).otherwise("und").alias("pred_lang"),
        F.size(tokens_col(text_col)).alias("re_tokens"),
        F.length(text_col).alias("chars"),
        q["quality"].alias("quality"),
    )
    return per_doc.groupBy("pred_lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("re_tokens").alias("total_tokens"),
        F.sum("chars").alias("total_chars"),
        F.avg("quality").alias("mean_quality"),
        F.expr("percentile(re_tokens, array(0.5, 0.9, 0.99))").alias("_tq"),
    ).select(
        "pred_lang", "n_docs", "total_tokens", "total_chars", "mean_quality",
        F.col("_tq")[0].alias("p50_tokens"),
        F.col("_tq")[1].alias("p90_tokens"),
        F.col("_tq")[2].alias("p99_tokens"),
    )


def _repetition_counts(text_col: str = "text", w: int = 3):
    """(total, distinct) w-shingle OCCURRENCE counts — shared by
    :func:`repetition_ratio` and :func:`gopher_filter`."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    # greatest(.., 1): sequence(1, 0) would run DESCENDING into an
    # invalid slice(.., 0) — the when() below discards the clamped row
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, w), " "),
    )
    total = F.when(n >= w, F.size(windows)).otherwise(F.lit(0))
    distinct = F.when(n >= w, F.size(F.array_distinct(windows))).otherwise(
        F.lit(0)
    )
    return total, distinct


def repetition_ratio(
    df: DataFrame, text_col: str = "text", w: int = 3
) -> DataFrame:
    """Intra-document repetition — the standard boilerplate/decoder-
    loop detector (Gopher/Dolma's "duplicate n-gram fraction"): of a
    doc's w-shingle OCCURRENCES, what fraction are repeats of a
    shingle already seen in the same doc? repetition = 1 −
    distinct_shingles / total_shingles (0.0 when the doc has < w
    tokens: no window repeats). High values flag generated/templated
    text a training pipeline should drop or down-weight.

    Pure Catalyst projection (transform + array_distinct on the
    per-row token array — no shuffle, no UDF); counts are integers and
    the ratio one two-integer division, so the DuckDB oracle
    reproduces values bit-for-bit.
    """
    total, distinct = _repetition_counts(text_col, w)
    return df.select(
        "doc_id",
        total.cast("long").alias("total_ngrams"),
        distinct.cast("long").alias("distinct_ngrams"),
        F.when(
            total > 0,
            F.lit(1.0) - distinct.cast("double") / total.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("repetition"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 of the normalized text (exact) and a
    content-defined rolling fingerprint = min md5 over 8-token shingles
    (robust to local edits — a single edit changes only the shingles
    covering it, and the min usually survives)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    toks = tokens_col(text_col)
    n = F.size(toks)
    w = 8
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1))),
        lambda i: F.md5(F.array_join(F.slice(toks, i, w), " ").cast("binary")),
    )
    return df.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("exact_fp"),
        F.when(n > 0, F.array_min(shingle_hashes)).alias("rolling_fp"),
    )


# PII patterns in the Java-regex ∩ RE2 common subset (no lookarounds,
# no backreferences; \b is ASCII-equivalent on this data) so the
# DuckDB oracle applies the IDENTICAL patterns. Order matters and is
# part of the contract: emails first (their local part can contain
# digit runs a later pattern might chew up), then SSN-shaped ids,
# then IPv4, then the conservative phone shape.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9()\-. ]{6,}[0-9]", "<PHONE>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Mask emails / SSN-shaped ids / IPv4s / +international phones —
    the redaction pass a training-data pipeline runs before anything
    else sees the text. Pure Catalyst ``regexp_replace`` chain plus
    per-pattern hit counts (``regexp_count`` on the ORIGINAL text, so
    counts are independent of replacement order even though the
    scrubbed text is order-sensitive by design).

    Cost at any scale: a projection (no shuffle, no UDF). Patterns are
    deliberately in the Java-regex ∩ RE2 subset so the same strings
    drive the DuckDB oracle; the conservative phone shape (leading
    ``+``) trades recall for a near-zero false-positive rate on
    numeric prose — loosening it is a caller decision, not a default.
    """
    scrubbed = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.select(
        "doc_id", scrubbed.alias(text_col), *counts
    ).withColumn("n_pii", sum(F.col(f"n_{n}") for n, _, _ in PII_PATTERNS))


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF keywords per document (corpus keyword extraction /
    topic tagging for training-data curation).

    tf = raw term count within the document (tokens_col tokenization);
    df = number of documents containing the term; idf is the smoothed
    sklearn form ``ln((N + 1) / (df + 1)) + 1`` so unseen-term idf is
    finite and corpus-size-monotone. Ties break deterministically by
    (score desc, token asc). Output: ``(key, token, tf, df, tfidf,
    rank)`` with tfidf a raw double (contract callers integerize).

    Scale: explode -> (key, token) count (map-side combinable) ->
    token doc-frequency derived from that SAME aggregate (tf rows are
    already distinct per (doc, token), so df is a count, not a
    count-distinct — no second pass over the corpus); N arrives as a
    broadcast 1-row aggregate (lazy — no driver count()); the final
    top-k is one window over the doc key. Three shuffles total, all
    on keys whose cardinality shrinks monotonically.
    """
    from pyspark.sql import Window

    toks = df.select(key, F.explode(tokens_col(text_col)).alias("token"))
    tf = toks.groupBy(key, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    ndocs = df.agg(F.count_distinct(F.col(key)).alias("n_docs"))
    score = F.col("tf") * (
        F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1
    )
    w = Window.partitionBy(key).orderBy(F.desc("tfidf_raw"), F.asc("token"))
    return (
        tf.join(dfreq, "token")
        .join(F.broadcast(ndocs))
        .withColumn("tfidf_raw", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            key,
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("tfidf_raw").alias("tfidf"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


GOPHER_THRESHOLDS = {
    "min_tokens": 50,
    "max_tokens": 100000,
    "min_mean_token_len": 3.0,
    "max_mean_token_len": 10.0,
    "max_punct_ratio": 0.3,
    "min_distinct_stopwords": 2,
    "max_repetition": 0.3,
}
"""Default Gopher-style rule thresholds (Rae et al. 2021, §A1.1
adapted to this engine's features). Single source of truth: the
engine expressions AND the DuckDB oracle generator both read these,
so a threshold change cannot desynchronize the gate."""


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    w: int = 3,
    thresholds: dict | None = None,
) -> DataFrame:
    """Composite Gopher-style document gate — the standard pre-training
    quality filter bundle, flag-don't-drop: (doc_id, n_tokens,
    reasons, passes) where ``reasons`` lists every failed rule in
    fixed rule order (empty array = clean) and ``passes`` is
    ``reasons == []``. Rules, each reusing the already-oracled metric
    expressions (quality features + duplicate-w-gram fraction):

    - ``too_short`` / ``too_long``: token count outside
      [min_tokens, max_tokens];
    - ``token_len``: mean token length outside
      [min_mean_token_len, max_mean_token_len] (gibberish/code);
    - ``punct``: punctuation ratio above max_punct_ratio;
    - ``stopwords``: fewer than min_distinct_stopwords distinct
      English stopwords (the natural-language floor);
    - ``repetitive``: duplicate w-gram fraction above max_repetition.

    Pure Catalyst projection — zero shuffle, zero UDF; at 100 TB this
    rides the ingest scan for free and downstream stages filter on
    ``passes`` (predicate pushdown keeps dropped docs unread).
    """
    t = dict(GOPHER_THRESHOLDS)
    t.update(thresholds or {})
    e = _quality_exprs(text_col)
    total, distinct = _repetition_counts(text_col, w)
    repetition = F.when(
        total > 0, F.lit(1.0) - distinct.cast("double") / total.cast("double")
    ).otherwise(F.lit(0.0))
    rules = [
        ("too_short", e["n_tokens"] < F.lit(int(t["min_tokens"]))),
        ("too_long", e["n_tokens"] > F.lit(int(t["max_tokens"]))),
        (
            "token_len",
            (e["mean_token_len"] < F.lit(float(t["min_mean_token_len"])))
            | (e["mean_token_len"] > F.lit(float(t["max_mean_token_len"]))),
        ),
        ("punct", e["punct_ratio"] > F.lit(float(t["max_punct_ratio"]))),
        (
            "stopwords",
            e["distinct_stopwords"] < F.lit(int(t["min_distinct_stopwords"])),
        ),
        ("repetitive", repetition > F.lit(float(t["max_repetition"]))),
    ]
    reasons = F.filter(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in rules]),
        lambda x: x.isNotNull(),
    )
    return df.select(
        "doc_id",
        e["n_tokens"].cast("long").alias("n_tokens"),
        reasons.alias("reasons"),
        (F.size(reasons) == 0).alias("passes"),
    )


def vocab_topk(
    df: DataFrame, k: int = 1000, text_col: str = "text"
) -> DataFrame:
    """Global token-frequency vocabulary: the k most frequent tokens
    with term frequency, document frequency and a deterministic rank
    (tf desc, then token — reproducible vocab files for tokenizer
    seeding / frequency-based filtering). One explode + one map-side-
    combinable groupBy(token); the final top-k orders the VOCABULARY
    (bounded by distinct tokens, not corpus size), so the single-
    partition window is over the small aggregate, never the corpus.
    All-integer outputs — hash-exact against the DuckDB oracle."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    tok = df.select(
        F.col("doc_id"), F.explode(tokens_col(text_col)).alias("token")
    )
    agg = tok.groupBy("token").agg(
        F.count("*").cast("long").alias("tf"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("token", "tf", "df", F.col("rank").cast("int").alias("rank"))
    )
