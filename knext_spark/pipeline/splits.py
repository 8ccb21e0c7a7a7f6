"""Deterministic dataset splitting & sampling by content hash.

A 100 TB training pipeline needs train/valid/test assignment that is
(a) reproducible run-to-run and cluster-size-independent (``F.rand``
is neither), (b) stable under re-ingestion (a document keeps its split
when the corpus is rebuilt), and (c) free — a projection, no shuffle,
no state. The standard construction: hash a stable key (the content
itself, or a document id), map the hash into [0, 1), and cut at the
cumulative split fractions.

Implementation detail that makes the DuckDB oracle bit-exact: the
split decision compares the first 8 lowercase-hex chars of
``md5(key)`` LEXICOGRAPHICALLY against precomputed 8-hex-digit
threshold strings. Fixed-length lowercase hex compares identically to
its numeric value ('0' < '9' < 'a' < 'f' in ASCII), Spark and DuckDB
produce the same md5 hex for the same bytes, and no float arithmetic
is involved anywhere — so the engine column and the oracle's CASE
expression agree on every row at any scale.

Scale: pure Catalyst (whole-stage codegen), zero shuffle, zero UDF;
the predicate pushes down to the scan when used as a filter
(``deterministic_sample``). The reference has no sampling/splitting
surface (SURVEY.md §2.5) — engine-mandate operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEX_SPACE = 16**8  # first 8 hex chars of the md5 digest


def _hash_prefix(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, 8)


def _thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, exclusive upper bound as 8-hex-digit string)] in
    declaration order; the last split absorbs any rounding residue."""
    total = sum(fractions.values())
    if not fractions or total <= 0:
        raise ValueError("fractions must be a non-empty dict of positive weights")
    out, cum = [], 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        if frac < 0:
            raise ValueError(f"negative fraction for split {name!r}")
        cum += frac / total
        out.append((name, format(min(int(cum * _HEX_SPACE), _HEX_SPACE - 1), "08x")))
    out.append((items[-1][0], "g" * 8))  # 'g' > 'f': catches everything
    return out


def split_col(key: Column, fractions: dict[str, float]) -> Column:
    """The split-assignment expression alone (composable into any
    projection/filter)."""
    prefix = _hash_prefix(key)
    cuts = _thresholds(fractions)
    expr = F.lit(cuts[-1][0])
    for name, bound in reversed(cuts[:-1]):
        expr = F.when(prefix < F.lit(bound), F.lit(name)).otherwise(expr)
    return expr


def deterministic_split(
    df: DataFrame,
    key_col: str = "text",
    fractions: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a stable split label from ``fractions``
    (weights normalized; e.g. {"train": 0.9, "valid": 0.05,
    "test": 0.05}). Keyed on ``key_col`` — key on content for
    leakage-safe splits (exact duplicates land in the same split), on
    a document id for content-independent ones."""
    if fractions is None:
        fractions = {"train": 0.9, "valid": 0.05, "test": 0.05}
    return df.withColumn(out_col, split_col(F.col(key_col), fractions))


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "text"
) -> DataFrame:
    """Keep a stable ~``rate`` fraction of rows (same row set on every
    run and at every cluster size, unlike ``DataFrame.sample``). A
    filter, so Catalyst pushes it toward the scan."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    if rate == 1.0:
        return df
    bound = format(min(int(rate * _HEX_SPACE), _HEX_SPACE - 1), "08x")
    return df.where(_hash_prefix(F.col(key_col)) < F.lit(bound))


def stratified_sample(
    df: DataFrame,
    n_per_stratum: int,
    stratum_col: str,
    key_col: str = "text",
) -> DataFrame:
    """Exactly ``min(n, stratum size)`` rows per stratum, chosen
    deterministically: the n smallest ``md5(key)`` values in each
    stratum (ties broken by the key itself). The balanced-corpus
    counterpart of :func:`deterministic_sample` — rate-based hashing
    gives each stratum a ~proportional slice, this gives each stratum
    an exact QUOTA (e.g. n docs per language), stable run-to-run and
    cluster-size-independent.

    Cost: one exchange (hash-partition by stratum) + an in-partition
    sort — the windowed-top-n shape; at web scale a giant stratum's
    sort is the straggler and the standard fix applies (pre-filter
    each stratum with deterministic_sample at a rate that overshoots
    the quota, then rank the survivors).
    """
    if n_per_stratum <= 0:
        raise ValueError("n_per_stratum must be positive")
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def rate_hex(rate: float) -> str | None:
    """The exclusive 8-hex-digit upper bound a keep-rate compiles to
    (None = keep everything). Shared by the engine column and the
    DuckDB oracle generator — one source of truth, no float arithmetic
    at evaluation time on either side."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return None
    return format(min(int(rate * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def temperature_rates(
    counts: dict[str, int], temperature: float = 0.5
) -> dict[str, float]:
    """Per-stratum keep-rates for temperature-based corpus mixing
    (multilingual-LM style: sampling probability proportional to
    ``count^T``). A row of stratum ``s`` is kept with rate
    ``min(1, (smallest_count / count_s)^(1-T))`` — kept mass stays
    proportional to ``count_s^T`` while the smallest stratum keeps
    rate exactly 1.0 at T < 1 — i.e. rebalance by down-sampling the
    head, never by replicating the tail. T = 1 keeps everything;
    T = 0 aims at equal expected sizes (capped at each stratum's own
    size). Driver-side floats only: the output feeds
    :func:`weighted_sample`, which compiles each rate to a hex cut
    string, so float math never reaches the data path."""
    if not counts:
        raise ValueError("counts must be non-empty")
    if not 0.0 <= temperature <= 1.0:
        raise ValueError("temperature must be in [0, 1]")
    if min(counts.values()) <= 0:
        raise ValueError("all counts must be positive")
    smallest = min(counts.values())
    return {
        s: min(1.0, (smallest / n) ** (1.0 - temperature))
        for s, n in counts.items()
    }


def weighted_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic per-stratum down-sampling: keep a stable
    ~``rates[stratum]`` fraction of each stratum's rows (data-mixing /
    rebalancing for training corpora; pair with
    :func:`temperature_rates` for temperature mixing). Strata missing
    from ``rates`` fall back to ``default_rate`` (0.0 = drop —
    explicit allowlist semantics).

    Mechanics: keep row iff the first 8 hex chars of
    ``md5(salt || ':' || key)`` compare lexicographically below the
    stratum's precompiled hex cut (see module docstring) — pure
    strings, so Spark and the DuckDB oracle agree on every row at any
    scale, and the kept set is identical run-to-run and cluster-size-
    independent. Monotone in the rates: raising any stratum's rate
    only ever ADDS rows (nested samples — reproducible ablations).
    The ``salt`` decorrelates this decision from other hash-based
    operators keyed on the same column (splits, packing shards).

    Scale: a pure projection filter — zero shuffle, zero UDF, pushes
    down to the scan. The per-stratum CASE is O(|rates|) comparisons
    of 8-char strings; for thousands of strata prefer a broadcast-join
    of a (stratum, cut) dim, same semantics.
    """
    cuts = {s: rate_hex(r) for s, r in rates.items()}
    default_cut = rate_hex(default_rate)
    prefix = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))), 1, 8
    )
    # cut == None means rate 1.0: trivially true predicate.
    default_pred = (
        F.lit(True) if default_cut is None else prefix < F.lit(default_cut)
    )
    pred = default_pred
    for s, cut in cuts.items():
        keep = F.lit(True) if cut is None else prefix < F.lit(cut)
        pred = F.when(F.col(stratum_col) == F.lit(s), keep).otherwise(pred)
    return df.where(pred)
