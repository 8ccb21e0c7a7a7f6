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
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9 \t\n]", "")
    )
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

    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        punct_ratio.cast("double").alias("punct_ratio"),
        stop_ratio.cast("double").alias("stopword_ratio"),
        mean_tok_len.cast("double").alias("mean_token_len"),
        n_stop.alias("distinct_stopwords"),
        ((len_score + punct_score + stop_score + tok_len_score) / 4.0)
        .cast("double")
        .alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: per language, count token hits
    against a 10-word inventory; predict the argmax (ties: lexicographic
    language code; zero hits -> 'und')."""
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
    best = F.array_sort(
        F.array(*scores),
        lambda a, b: F.when(a["hits"] > b["hits"], -1)
        .when(a["hits"] < b["hits"], 1)
        .when(a["code"] < b["code"], -1)
        .when(a["code"] > b["code"], 1)
        .otherwise(0),
    )[0]
    return df.select(
        "doc_id",
        F.when(best["hits"] > 0, best["code"]).otherwise("und").alias("pred_lang"),
        best["hits"].alias("marker_hits"),
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
