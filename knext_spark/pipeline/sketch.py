"""HyperLogLog approximate distinct counting — mergeable sketches.

Exact ``count(distinct key)`` over 100 TB is a full shuffle of every
distinct key; the HLL sketch (Flajolet et al. 2007) replaces it with a
fixed ``m``-register state per group: register = the first hash bits,
value = max over rows of rho(remaining bits) (rho = position of the
first 1-bit). ``groupBy(group, register).max(rho)`` is map-side
combinable, so the shuffle carries at most ``groups x m`` tiny rows no
matter the input size, and register tables MERGE by max — partial
sketches per partition/day/source union into a corpus sketch for free
(:func:`hll_merge`). Standard error ~= 1.04/sqrt(m) (m = 4096 ->
~1.6%).

Cross-engine exactness (the repo's oracle discipline): Spark's own
``approx_count_distinct`` is a JVM-internal sketch DuckDB cannot
reproduce, so this implementation derives EVERYTHING from ``md5`` hex
strings both engines produce identically:

- register id   = first ``k_hex`` hex chars of ``md5(salt:key)`` —
  kept AS A STRING (m = 16^k_hex), so no numeric conversion exists on
  either side;
- rho           = 1 + leading zero BITS of the next 12 hex chars
  (48-bit suffix), computed with string ops only: 4 x (leading '0'
  chars, via regexp) + a CASE on the first non-zero hex char
  ('8'-'f' -> 0, '4'-'7' -> 1, '2'-'3' -> 2, '1' -> 3);
- 2^-rho        = ``1.0 / (1::bigint << rho)`` — a power of two, so
  the double is EXACT (no libm);
- the harmonic sum folds registers in register-string order on both
  sides (Spark ``aggregate`` / DuckDB ``list_reduce`` are left folds)
  — identical IEEE dag, bit-identical sum;
- the one libm call (``ln`` in the small-range correction) follows the
  same 1-ulp reasoning as tfidf's idf (micros-gated, boundary risk
  ~1e-10).

The reference has no distinct-counting surface at all (its one
``distinct`` is exact row dedup, genes.py:210-212) — engine-mandate
operator for the corpus-profiling family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_RHO_HEX = 12  # 48-bit suffix for rho; max rho = 49 (1::bigint << 49 is safe)


def _alpha(m: int) -> float:
    """Bias constant alpha_m (Flajolet et al. 2007, m >= 128).
    Evaluated once in Python; both engines then parse the same repr()
    literal to the same double."""
    return 0.7213 / (1.0 + 1.079 / m)


def _rho_from_suffix(suffix: Column) -> Column:
    """1 + leading-zero-bit count of the 48-bit hex suffix, pure
    string ops (see module docstring)."""
    z = F.length(F.regexp_extract(suffix, "^0*", 0))
    first = suffix.substr(z + F.lit(1), F.lit(1))
    extra = (
        F.when(first >= "8", F.lit(0))
        .when(first >= "4", F.lit(1))
        .when(first >= "2", F.lit(2))
        .otherwise(F.lit(3))
    )
    return (
        F.when(z == _RHO_HEX, F.lit(4 * _RHO_HEX + 1))
        .otherwise(z * 4 + extra + 1)
        .cast("int")
    )


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | tuple[str, ...] = (),
    k_hex: int = 3,
    salt: str = "hll",
) -> DataFrame:
    """The sketch state: one row per (group, register) with the max
    rho seen — ``groups x 16^k_hex`` rows at most, map-side combined
    before the (tiny) shuffle. Duplicate keys are harmless by
    construction (same key -> same register/rho). Register tables from
    disjoint slices of the data union-and-:func:`hll_merge` into the
    sketch of the union — the property that makes incremental corpus
    accounting free."""
    if not 1 <= k_hex <= 8:
        raise ValueError(f"k_hex must be in [1, 8], got {k_hex}")
    # count(distinct) semantics: NULL keys are ignored (hashing NULL
    # would otherwise poison the whole group's ordered fold to NULL)
    df = df.where(F.col(key_col).isNotNull())
    hx = F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    reg = F.substring(hx, 1, k_hex)
    rho = _rho_from_suffix(F.substring(hx, k_hex + 1, _RHO_HEX))
    gcols = [F.col(c) for c in group_cols]
    return (
        df.select(*gcols, reg.alias("register"), rho.alias("rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    registers: DataFrame, group_cols: list[str] | tuple[str, ...] = ()
) -> DataFrame:
    """Merge register tables (e.g. a union of per-day sketches) into
    one sketch per group: max per register, map-side combinable."""
    return registers.groupBy(*group_cols, "register").agg(
        F.max("rho").alias("rho")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | tuple[str, ...] = (),
    k_hex: int = 3,
) -> DataFrame:
    """Collapse a register table to per-group estimates. Returns
    (group_cols..., n_registers, v_zero, estimate):

    - raw estimate  E = alpha_m * m^2 / S, with
      S = sum over ALL m registers of 2^-rho (absent registers hold
      rho = 0, contributing 1.0 each — folded as the exact integer
      ``v_zero * 1.0``);
    - small-range correction (linear counting) when E <= 2.5 m and
      empty registers remain: E = m * ln(m / v_zero).

    The register fold is ordered (array_sort by register string), so
    the DuckDB oracle reproduces S bit-for-bit; see module docstring.
    One groupBy on group_cols over <= m rows per group — driver-free,
    collect-free.
    """
    m = 16**k_hex
    alpha = _alpha(m)
    # loud guard against a register table built at a different k_hex
    # (v_zero would silently go negative): assert_true returns NULL on
    # pass, throws on the first mismatched row
    registers = registers.where(
        F.assert_true(
            F.length("register") == k_hex,
            F.lit(f"register width != k_hex={k_hex} — table built with a different k_hex"),
        ).isNull()
    )
    # 2^-rho per register BEFORE the fold: an exact power-of-two double
    # (integer shift + one exact division, no libm).
    inv = F.expr(
        "cast(1.0 as double) / cast(shiftleft(cast(1 as bigint), rho) as double)"
    )
    regs = F.array_sort(
        F.collect_list(F.struct(F.col("register"), inv.alias("inv")))
    )
    out = registers.groupBy(*group_cols).agg(regs.alias("__regs"))
    s_present = F.aggregate(
        F.col("__regs"),
        F.lit(0.0),
        lambda acc, x: acc + x["inv"],
    )
    n_reg = F.size("__regs").cast("long")
    v_zero = F.lit(m).cast("long") - n_reg
    s_total = s_present + v_zero.cast("double")
    raw = F.lit(alpha * m * m) / s_total
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(raw)
    return out.select(
        *group_cols,
        n_reg.alias("n_registers"),
        v_zero.alias("v_zero"),
        corrected.alias("estimate"),
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | tuple[str, ...] = (),
    k_hex: int = 3,
    salt: str = "hll",
) -> DataFrame:
    """End-to-end approximate ``count(distinct key_col)`` per group:
    :func:`hll_registers` -> :func:`hll_estimate`. Two map-side-
    combinable aggregations, the second over <= 16^k_hex rows per
    group; nothing in the plan grows with the number of distinct
    keys."""
    return hll_estimate(
        hll_registers(df, key_col, group_cols, k_hex, salt),
        group_cols,
        k_hex,
    )


def cms_table(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | tuple[str, ...] = (),
    depth: int = 4,
    w_hex: int = 2,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch state (Cormode & Muthukrishnan 2005): one row
    per (group, hash-row, bucket) with the occurrence count of keys
    landing there — the mergeable frequency twin of the HLL sketch
    above. ``bucket = first w_hex hex chars of md5(salt:row:key)``,
    kept AS A STRING like HLL's registers so no numeric conversion
    exists on either engine; ``depth`` independent hash rows come from
    salting the row index into the hash input.

    Scale shape: the posexplode multiplies rows x ``depth`` BEFORE a
    map-side-combinable count, so the shuffle carries at most
    ``groups x depth x 16^w_hex`` rows no matter the input size, and
    sketches from disjoint slices MERGE by summing counts
    (:func:`cms_merge`) — incremental corpus token accounting for
    free. Point estimates (:func:`cms_lookup`) NEVER undercount; they
    overcount by collision mass bounded by ~2N/16^w_hex with
    probability 1 - 2^-depth. All-integer outputs — hash-exact across
    engines."""
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if not 1 <= w_hex <= 8:
        raise ValueError(f"w_hex must be in [1, 8], got {w_hex}")
    df = df.where(F.col(key_col).isNotNull())
    rows = F.array([F.lit(r) for r in range(depth)])
    probe = df.select(
        *[F.col(c) for c in group_cols],
        F.col(key_col).cast("string").alias("__k"),
        F.explode(rows).alias("row"),
    )
    bucket = F.substring(
        F.md5(
            F.concat(
                F.lit(f"{salt}:"),
                F.col("row").cast("string"),
                F.lit(":"),
                F.col("__k"),
            )
        ),
        1,
        w_hex,
    )
    return (
        probe.select(
            *[F.col(c) for c in group_cols], "row", bucket.alias("bucket")
        )
        .groupBy(*group_cols, "row", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_merge(
    sketches: DataFrame, group_cols: list[str] | tuple[str, ...] = ()
) -> DataFrame:
    """Merge sketch tables (e.g. a union of per-day sketches) into one
    per group: sum per (row, bucket), map-side combinable. The merged
    table equals :func:`cms_table` over the concatenated input exactly
    (counts are plain sums)."""
    return sketches.groupBy(*group_cols, "row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_lookup(
    sketch: DataFrame,
    queries: DataFrame,
    key_col: str,
    group_cols: list[str] | tuple[str, ...] = (),
    depth: int = 4,
    w_hex: int = 2,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate the frequency of each query key against a
    :func:`cms_table` sketch: ``estimate = min over the depth rows of
    the key's bucket count`` (an absent (row, bucket) cell is an exact
    0 — the left join's coalesce). Returns
    (group_cols..., key_col, estimate).

    ``depth``/``w_hex``/``salt`` must match the sketch's build
    parameters — a width mismatch is caught loudly by the same
    assert_true guard as :func:`hll_estimate`'s. The sketch side is
    broadcast (<= groups x depth x 16^w_hex rows by construction), so
    the probe never shuffles the query table."""
    sketch = sketch.where(
        F.assert_true(
            F.length("bucket") == w_hex,
            F.lit(
                f"bucket width != w_hex={w_hex} — sketch built with a different w_hex"
            ),
        ).isNull()
    )
    q = queries.where(F.col(key_col).isNotNull()).dropDuplicates(
        [*group_cols, key_col]
    )
    rows = F.array([F.lit(r) for r in range(depth)])
    probe = q.select(
        *[F.col(c) for c in group_cols],
        F.col(key_col),
        F.explode(rows).alias("row"),
    )
    bucket = F.substring(
        F.md5(
            F.concat(
                F.lit(f"{salt}:"),
                F.col("row").cast("string"),
                F.lit(":"),
                F.col(key_col).cast("string"),
            )
        ),
        1,
        w_hex,
    )
    probed = probe.withColumn("bucket", bucket).join(
        F.broadcast(sketch), [*group_cols, "row", "bucket"], "left"
    )
    return probed.groupBy(*group_cols, key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
            "estimate"
        )
    )


def histogram(
    df: DataFrame,
    value_col: str,
    lo: int,
    hi: int,
    bins: int = 64,
    group_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Mergeable fixed-bin histogram: (group_cols..., bin, cnt) with
    ``bin = clamp((v - lo) * bins div (hi - lo), 0, bins - 1)`` over
    INTEGER bounds — pure integer arithmetic (``div``, never float
    division), so the DuckDB oracle agrees on every row at any
    magnitude and histograms from disjoint slices merge by summing
    counts. The 100 TB story: exact quantiles need a full sort; this
    is one map-side-combinable groupBy whose shuffle carries at most
    ``groups x bins`` rows. Values outside [lo, hi) clamp into the
    edge bins (they stay visible instead of silently vanishing)."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    # count semantics: NULL values are ignored (a NULL bin row would
    # corrupt the quantile window, which sorts NULL first)
    df = df.where(F.col(value_col).isNotNull())
    v = F.col(value_col).cast("long")
    # clamp the numerator at 0 BEFORE the integer division so the
    # floor semantics of negative division never matter
    num = F.greatest(
        (v - F.lit(int(lo))) * F.lit(int(bins)), F.lit(0).cast("long")
    )
    tmp = df.select(*[F.col(c) for c in group_cols], num.alias("__num"))
    b = F.least(
        F.expr(f"__num div {int(hi - lo)}"), F.lit(bins - 1).cast("long")
    )
    return (
        tmp.select(*[F.col(c) for c in group_cols], b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    qs: list[float],
    lo: int,
    hi: int,
    bins: int = 64,
    group_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Per-group approximate quantiles from a :func:`histogram` table:
    for each q, find the first bin whose cumulative count reaches
    ``target = max(1, ceil(q * N))`` and interpolate linearly inside
    it — ``est = lo + (bin + (target - cum_before) / cnt_bin) * width``
    — error bounded by one bin width. Returns
    (group_cols..., q, n, estimate).

    Cross-engine exactness: counts and targets are integers (``ceil``
    of an exact double product; q and width are parsed from the same
    repr literals on both sides), the bin search is a cumulative-sum
    window over the <= ``bins`` rows of each group, and the estimate
    is one fixed IEEE dag of integer-valued doubles — hash-exact, no
    libm anywhere."""
    from pyspark.sql import Window

    if not qs:
        raise ValueError("qs must be a non-empty list of quantiles")
    width = (hi - lo) / bins  # python IEEE division, repr-shared
    w = Window.partitionBy(*group_cols).orderBy("bin")
    wg = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy(
        F.lit(1)
    )
    c = hist.select(
        *group_cols,
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("__cum"),
        F.sum("cnt").over(wg).cast("long").alias("n"),
    )
    pieces = []
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        target = F.greatest(
            F.ceil(F.lit(float(q)) * F.col("n").cast("double")).cast("long"),
            F.lit(1).cast("long"),
        )
        cand = c.withColumn("__target", target).where(
            F.col("__cum") >= F.col("__target")
        )
        first = cand.withColumn(
            "__rn", F.row_number().over(w)
        ).where(F.col("__rn") == 1)
        est = F.lit(float(lo)) + (
            F.col("bin").cast("double")
            + (F.col("__target") - (F.col("__cum") - F.col("cnt"))).cast(
                "double"
            )
            / F.col("cnt").cast("double")
        ) * F.lit(width)
        pieces.append(
            first.select(
                *group_cols,
                F.lit(float(q)).alias("q"),
                F.col("n"),
                est.alias("estimate"),
            )
        )
    out = pieces[0]
    for r in pieces[1:]:
        out = out.unionByName(r)
    return out


def bloom_bits(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | tuple[str, ...] = (),
    depth: int = 4,
    b_hex: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Bloom-filter state (Bloom 1970): one row per (group, set bit) —
    the mergeable MEMBERSHIP twin of the HLL/CMS sketches above.
    ``bit = first b_hex hex chars of md5(salt:row:key)`` for ``depth``
    salted hash rows, kept AS A STRING like CMS buckets so no numeric
    conversion exists on either engine (m = 16^b_hex bits; the row
    index is folded into the bit id as ``row:hex`` so the depth hash
    families never collide with each other).

    Scale shape: the posexplode multiplies rows x ``depth`` BEFORE a
    distinct whose shuffle carries at most ``groups x depth x
    16^b_hex`` rows no matter the input size; bit tables from disjoint
    slices MERGE by plain distinct union (:func:`bloom_merge`) — the
    'seen corpus' accounting that lets a 100 TB dedup pass probe
    membership from a broadcast table instead of joining the corpus.
    Probes (:func:`bloom_probe`) NEVER false-negative; false positives
    are ~(1 - e^(-d*n/m))^d. All-string state — hash-exact across
    engines."""
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if not 1 <= b_hex <= 8:
        raise ValueError(f"b_hex must be in [1, 8], got {b_hex}")
    df = df.where(F.col(key_col).isNotNull())
    rows = F.array([F.lit(r) for r in range(depth)])
    probe = df.select(
        *[F.col(c) for c in group_cols],
        F.col(key_col).cast("string").alias("__k"),
        F.explode(rows).alias("__row"),
    )
    bit = F.concat(
        F.col("__row").cast("string"),
        F.lit(":"),
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{salt}:"),
                    F.col("__row").cast("string"),
                    F.lit(":"),
                    F.col("__k"),
                )
            ),
            1,
            b_hex,
        ),
    )
    return (
        probe.select(*[F.col(c) for c in group_cols], bit.alias("bit"))
        .dropDuplicates([*group_cols, "bit"])
    )


def bloom_merge(
    bits: DataFrame, group_cols: list[str] | tuple[str, ...] = ()
) -> DataFrame:
    """Merge bit tables (e.g. a union of per-day filters) into one per
    group: plain distinct, map-side combinable. The merged table
    equals :func:`bloom_bits` over the concatenated input exactly."""
    return bits.dropDuplicates([*group_cols, "bit"])


def bloom_probe(
    bits: DataFrame,
    queries: DataFrame,
    key_col: str,
    group_cols: list[str] | tuple[str, ...] = (),
    depth: int = 4,
    b_hex: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Probe each query key against a :func:`bloom_bits` table:
    ``maybe_member`` = all ``depth`` of the key's bits are set (never
    a false negative; false-positive rate per the build docstring).
    Returns (group_cols..., key_col, maybe_member).

    ``depth``/``b_hex``/``salt`` must match the build parameters — a
    width mismatch is caught loudly by the same assert_true guard as
    the HLL/CMS probes. The bit side is broadcast (<= groups x depth x
    16^b_hex rows by construction), so the probe never shuffles the
    query table — the point of the structure at 100 TB."""
    # exact hex-suffix width check: bit rows are "<row>:<hex>", so the
    # chars after the colon must number exactly b_hex. The previous
    # `length(bit) <= b_hex + 2` bound assumed a single-digit row index
    # (false alarm at depth >= 11) and silently accepted tables built
    # with a SMALLER b_hex (universal false negatives) — the loud-catch
    # contract needs the equality.
    bits = bits.where(
        F.assert_true(
            F.length("bit") - F.instr(F.col("bit"), ":") == b_hex,
            F.lit(
                f"bit hex width != {b_hex} — table built with a different b_hex"
            ),
        ).isNull()
    )
    q = queries.where(F.col(key_col).isNotNull()).dropDuplicates(
        [*group_cols, key_col]
    )
    rows = F.array([F.lit(r) for r in range(depth)])
    probe = q.select(
        *[F.col(c) for c in group_cols],
        F.col(key_col),
        F.explode(rows).alias("__row"),
    )
    bit = F.concat(
        F.col("__row").cast("string"),
        F.lit(":"),
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{salt}:"),
                    F.col("__row").cast("string"),
                    F.lit(":"),
                    F.col(key_col).cast("string"),
                )
            ),
            1,
            b_hex,
        ),
    )
    probed = probe.withColumn("bit", bit).join(
        F.broadcast(bits.withColumn("__hit", F.lit(1))),
        [*group_cols, "bit"],
        "left",
    )
    return probed.groupBy(*group_cols, key_col).agg(
        (F.count("__hit") == depth).alias("maybe_member")
    )
