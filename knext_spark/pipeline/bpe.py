"""Distributed BPE merge learning (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
subword-tokenizer twin of the word-level :func:`vocab_topk`.

The scalable formulation is the original one: BPE statistics depend
only on the WORD-FREQUENCY dictionary, not the corpus, so after one
corpus pass (tokenize → groupBy word → count) every merge round runs
over vocabulary-bounded state — tens of millions of rows at 100 TB,
not trillions. Each round is (a) one map-side-combinable pair-count
aggregate, (b) a 1-row argmax collect (count desc, pair asc — the
deterministic tie-break), (c) a pure-projection merge application.
The driver loop is k rounds deep like every superstep operator here
(PageRank, k-core, Kahn peeling); per-round state is eagerly
localCheckpoint-ed so the lazy chain never re-executes prior rounds
(the measured hazard documented on the BFS cadence knob).

Merge application is a leftmost-greedy fold, expressed identically in
the engine (``F.aggregate``) and the DuckDB oracle (``list_reduce``):
the accumulator is the chr(31)-joined symbol string, a merge of
(a, b) appends ``b`` directly (the last symbol ``a`` textually
becomes ``a || b``), a non-merge appends separator + symbol. Symbols
are concatenations of ``[a-z0-9]`` token characters, so the separator
can never collide and the suffix test ``acc = a OR endswith(acc,
sep || a)`` is exact. The fold IS the classic greedy semantics:
after a merge the new last symbol ``ab`` is strictly longer than
``a``, so an overlapping re-merge cannot fire ("aaaaa" with ("a","a")
folds to [aa, aa, a], never [aa, a, aa] — the single-pass
string-replace shortcut gets this wrong, which is why neither engine
uses it). All-integer counts and plain-string symbols — hash-exact
against the driver oracle (row ``bpe_merges``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from knext_spark.pipeline.text import tokens_col

SEP = chr(31)

MERGES_SCHEMA = T.StructType(
    [
        T.StructField("merge_round", T.LongType(), False),
        T.StructField("left_sym", T.StringType(), False),
        T.StructField("right_sym", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def _merge_fold(sy: Column, a: str, b: str) -> Column:
    """Leftmost-greedy application of merge (a, b) to a symbol array,
    returning the new chr(31)-joined symbol string."""
    tail = F.slice(sy, 2, F.greatest(F.size(sy) - 1, F.lit(0)))

    def step(acc: Column, x: Column) -> Column:
        is_a = (acc == F.lit(a)) | acc.endswith(F.lit(SEP + a))
        return F.when(is_a & (x == F.lit(b)), F.concat(acc, x)).otherwise(
            F.concat(acc, F.lit(SEP), x)
        )

    return F.aggregate(tail, F.element_at(sy, 1), step)


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, total) adjacent-symbol pair counts weighted by word
    frequency; map-side combinable, vocabulary-bounded input."""
    sy = F.split("s", SEP)
    pairs = words.where(F.size(sy) >= 2).select(
        "cnt",
        # the size >= 2 guard matters: Spark's sequence(1, 0) DESCENDS
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(sy) - 1),
                lambda i: F.struct(
                    F.element_at(sy, i).alias("a"),
                    F.element_at(sy, i + 1).alias("b"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("cnt").alias("total"))


def bpe_merges(
    df: DataFrame, k: int = 10, text_col: str = "text"
) -> DataFrame:
    """Learn the first ``k`` BPE merges over a document corpus.
    Returns ``(merge_round, left_sym, right_sym, merged, pair_count)``
    with 1-based rounds; stops early (fewer rows) if the vocabulary
    runs out of adjacent pairs. Tokenization is the shared
    :func:`knext_spark.pipeline.text.tokens_col`; symbols start as
    single characters of each word (no end-of-word marker — merges
    never cross word boundaries because folding is per word).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .select(
            "word",
            "cnt",
            F.array_join(
                F.regexp_extract_all("word", F.lit("."), 0), SEP
            ).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    out: list[tuple] = []
    for r in range(1, k + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("total"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, total = best[0]["a"], best[0]["b"], best[0]["total"]
        out.append((r, a, b, a + b, total))
        prev = words
        words = words.select(
            "word", "cnt", _merge_fold(F.split("s", SEP), a, b).alias("s")
        ).localCheckpoint(eager=True)
        prev.unpersist()
    return spark.createDataFrame(out, MERGES_SCHEMA)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Apply learned merges to a corpus: ``(key, pieces, n_pieces,
    n_chars)`` where ``pieces`` is the per-document subword sequence
    (word boundaries respected, document order preserved). A pure
    projection — the ``merges`` list (collected output of
    :func:`bpe_merges`, as (left, right) tuples in round order) is
    compiled into a chain of the same leftmost-greedy folds the
    learner used, so encoding the training corpus reproduces the
    learner's final symbol state exactly (round-trip pytest)."""
    toks = tokens_col(text_col)
    word = F.array_join(F.regexp_extract_all(F.col("__w"), F.lit("."), 0), SEP)
    for a, b in merges:
        word = _merge_fold(F.split(word, SEP), a, b)
    exploded = df.select(
        F.col(key), F.posexplode(toks).alias("pos", "__w")
    ).select(key, "pos", F.split(word, SEP).alias("wp"))
    return (
        exploded.groupBy(key)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "wp"))
                ).wp
            ).alias("pieces")
        )
        .select(
            key,
            "pieces",
            F.size("pieces").cast("long").alias("n_pieces"),
            F.aggregate(
                "pieces",
                F.lit(0).cast("long"),
                lambda acc, p: acc + F.length(p),
            ).alias("n_chars"),
        )
    )
