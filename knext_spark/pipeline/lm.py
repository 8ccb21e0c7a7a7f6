"""Character-bigram language-model scoring — the perplexity filter.

The CCNet recipe scores every document against a reference-corpus
language model and drops the worst tail; production uses KenLM, but
the *pipeline shape* is the interesting part at 100 TB: train a
model ON a reference slice (one aggregation — the model is a
vocabulary-bounded dim table), broadcast it, and score the corpus in
a single pass. This module implements that shape with an add-one-
smoothed character-bigram model — deterministic, dependency-free, and
expressible in both engines, so the whole scorer is DuckDB-oracled
(the real-KenLM swap would keep the identical plan and replace one
dim table).

Math: p(bg) = (count_ref(bg) + 1) / (total_ref + V) with V = distinct
reference bigrams; a document's score is the average log-probability
of its character bigrams, avg_logp = sum(tf_bg * logp(bg)) / n_bigrams
(higher = more reference-like; OOV bigrams get count 0). NULL when the
text has < 2 chars.

Cross-engine exactness discipline (same as tfidf): every count is an
integer; ``ln`` is the only libm call (micros-gated, 1-ulp boundary
reasoning); the per-document sum folds (bigram, tf x logp) terms in
BIGRAM-STRING order on both sides (Spark ``aggregate`` / DuckDB
``list_reduce`` over a sorted list — identical IEEE dag).

Scale: the model is at most |charset|^2 rows — broadcast; scoring is
explode -> map-side-combinable (doc, bigram) tf -> broadcast probe ->
one groupBy(doc). Nothing grows with corpus size except the linear
scan. The reference has no scoring surface (SURVEY §2.5) —
engine-mandate operator in the quality-filter family with
quality_score/repetition_ratio.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bigrams(text_col: str) -> Column:
    """Array of character bigrams of lower(text_col); empty for texts
    shorter than 2 chars (sequence(1, 0) is empty)."""
    t = f"lower(`{text_col}`)"
    # explicit short-text guard: Spark's sequence(1, 0) DESCENDS
    # ([1, 0]) rather than being empty like DuckDB's range(1, 1)
    return F.expr(
        f"case when length({t}) < 2 then array()"
        f" else transform(sequence(1, length({t}) - 1),"
        f" i -> substring({t}, i, 2)) end"
    )


def char_bigram_counts(
    ref: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The trained model's count table: (bigram, cnt) over the
    reference corpus — at most |charset|^2 rows, a broadcastable dim."""
    return (
        ref.select(F.explode(_bigrams(text_col)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
    )


def lm_score(
    docs: DataFrame,
    ref: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_bigrams, avg_logp) for every document: average
    add-one-smoothed bigram log-probability under the model trained on
    ``ref`` (default: ``docs`` itself — self-scoring flags the corpus'
    own outliers; pass a clean slice, e.g. one language, to score
    against it). ``avg_logp`` is NULL for texts shorter than 2 chars.
    """
    if ref is None:
        ref = docs
    model = char_bigram_counts(ref, text_col)
    totals = model.agg(
        F.sum("cnt").cast("long").alias("__total"),
        F.count("*").cast("long").alias("__v"),
    )
    tf = (
        docs.select(
            F.col(id_col), F.explode(_bigrams(text_col)).alias("bigram")
        )
        .groupBy(id_col, "bigram")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        tf.join(F.broadcast(model), "bigram", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.col("bigram"),
            F.col("tf"),
            (
                F.col("tf").cast("double")
                * (
                    F.log(F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + 1.0)
                    - F.log((F.col("__total") + F.col("__v")).cast("double"))
                )
            ).alias("term"),
        )
    )
    terms = F.array_sort(
        F.collect_list(F.struct(F.col("bigram"), F.col("term")))
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.aggregate(
            terms, F.lit(0.0), lambda acc, x: acc + x["term"]
        ).alias("__sum"),
    )
    out = agg.select(
        id_col,
        "n_bigrams",
        (F.col("__sum") / F.col("n_bigrams").cast("double")).alias("avg_logp"),
    )
    # docs with no bigrams (text < 2 chars) never reach `tf`; restore
    # them with NULL score so every input row is represented
    return (
        docs.select(id_col)
        .distinct()
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            "avg_logp",
        )
    )
