"""Temporal joins Spark lacks as built-ins: as-of join, range join.

``asof_join`` matches every left row to the single right row with the
greatest right timestamp <= the left timestamp (backward as-of, the
time-series standard: "the latest state known at event time").

Implementation is the UNION + WINDOW pattern, not a range join:
tag both inputs, union them on (key, t), and carry the right side's
matched OBSERVATION forward with ``last(..., ignorenulls=True)`` over
a (key)-partitioned, (t, tag)-ordered running window. That is one
shuffle on the join key plus one (key, t) shuffle for the
deterministic right-side collapse (audited: exactly 2 exchanges in
the physical plan) and a per-key sort — linear in rows — where a
naive ``l.t >= r.t`` theta-join is a per-key cross product
(O(|L_k| x |R_k|)) that Spark plans as BroadcastNestedLoop or a range
join blowup at 100 TB. Right rows sort BEFORE left rows at equal
timestamps (tag order), making the match backward-INCLUSIVE.

NULL right payloads are real observations: the carried value is a
non-null single-field STRUCT wrapping the payload (right rows always
carry a struct, left rows carry NULL), so a matched right row whose
payload is legitimately NULL attaches NULL — pandas
``merge_asof``-compatible — instead of silently forwarding an older
timestamp's payload (the ``last(payload, ignorenulls)`` footgun).
The DuckDB oracle (driver row ``asof_join``) uses the same
struct-marker construction.

Determinism: several right rows can share (key, t); the window's
last-wins would then depend on sort ties, so the right side is first
collapsed to one row per (key, t) — row_number ordered by
(tie desc, payload desc), stated in the API and reproduced identically
in the DuckDB oracle.

SKEW (``bucket_delta``): the single-window plan sorts a key's WHOLE
timeline in one task — a hot key (one user with 100M events) is a
straggler no partition count fixes. ``bucket_delta=<int, same unit as
the timestamps>`` switches to a two-level bucketed carry-forward
(same family as LPA's hot-key broadcast split): rows get a secondary
partition key ``bucket = t div bucket_delta``, the running window runs
WITHIN (key, bucket) — so the hot timeline splits across tasks — and
the across-bucket carry is reconstructed from a compact per-(key,
bucket) summary frame (one row per non-empty bucket: the bucket's
final right observation), where a second, tiny window computes each
bucket's carry-in (the latest observation in any STRICTLY earlier
bucket; correct because every right row of an earlier bucket has
t' < bucket start <= left t). Exactly the same output as the
single-window plan — gated by an equivalence test — at the cost of
one extra small aggregate + one (key, bucket) join that reuses the
window's partitioning.

``range_join`` pairs every left row with every right row whose
timestamp falls in ``[l.t, l.t + delta]``. Catalyst plans the naive
``r.t between l.t and l.t + delta`` predicate as a broadcast
nested-loop (per-key cross product) — the scale pattern here is the
BUCKETIZED BAND JOIN: bucket = floor(t / delta); a right row in the
window necessarily lives in the left row's bucket or the next one, so the left
side explodes to exactly those two buckets, the join is an equi-join
on (key, bucket), and the exact range predicate filters the ~2x
candidate superset. Each (l, r) pair is generated at most once (a
right row has ONE bucket), so no dedup is needed. Bucket ids are the
bucket START ``t - pmod(t, delta)`` — pure integer arithmetic
(``floor(t / delta)`` promotes long/int to double, exact only below
2^53 in the chosen unit); adjacent bucket = id + delta.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _bucket_start(col: Column, delta: int) -> Column:
    """The bucket id for timestamp ``col`` at width ``delta``: the
    bucket's START, ``col - pmod(col, delta)``, in pure integer
    arithmetic. Any injective monotone function of floor(t/delta)
    serves as a bucket id (adjacent bucket = +delta), and the floor
    MULTIPLE avoids division entirely — ``floor(col / delta)``
    promotes long to double and silently floors into the wrong bucket
    at magnitudes >= 2^53. ``pmod`` is non-negative, so this floors
    (not truncates) for negative timestamps too."""
    return (col - F.pmod(col, F.lit(int(delta)))).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: str,
    tie: str | None = None,
    bucket_delta: int | None = None,
) -> DataFrame:
    """Backward as-of join -> all left columns + ``asof_<payload>``
    (the matched right row's payload column; null when no right row is
    at or before the left timestamp — and null when the MATCHED row's
    payload is null, which is an observation, not a gap). ``tie``
    breaks several right rows sharing (key, ts) by its MAX, then max
    payload (defaults to the payload column itself). ``bucket_delta``
    (same integer unit as the timestamps) enables the skew path — see
    module docstring; output is identical."""
    tie = tie or payload
    dw = Window.partitionBy("__k", "__t").orderBy(
        F.desc("__tie"), F.desc("__payload")
    )
    r = (
        right.select(
            F.col(key).alias("__k"),
            F.col(right_ts).alias("__t"),
            F.col(tie).alias("__tie"),
            F.col(payload).alias("__payload"),
        )
        .withColumn("__rn", F.row_number().over(dw))
        .where(F.col("__rn") == 1)
        .select(
            "__k",
            "__t",
            F.lit(1).alias("__tag"),
            # non-null marker struct: a right row is an observation
            # even when its payload is NULL
            F.struct(F.col("__payload").alias("p")).alias("__obs"),
        )
    )
    lcols = left.columns
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(2).alias("__tag"),
        F.lit(None).cast(r.schema["__obs"].dataType).alias("__obs"),
        F.struct(*lcols).alias("__row"),
    )
    u = r.withColumn(
        "__row", F.lit(None).cast(l.schema["__row"].dataType)
    ).unionByName(l)

    if bucket_delta is None:
        w = (
            Window.partitionBy("__k")
            .orderBy("__t", "__tag")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn(
            "__asof", F.last("__obs", ignorenulls=True).over(w)
        )
    else:
        matched = _asof_bucketed(u, int(bucket_delta))

    return matched.where(F.col("__tag") == 2).select(
        *[F.col("__row")[c].alias(c) for c in lcols],
        F.col("__asof")["p"].alias(f"asof_{payload}"),
    )


def _asof_bucketed(u: DataFrame, delta: int) -> DataFrame:
    """Two-level carry-forward over the tagged union ``u`` (see module
    docstring): within-bucket running last + per-(key, bucket) carry-in
    from the compact bucket-summary frame. Adds ``__asof``."""
    ub = u.withColumn("__b", _bucket_start(F.col("__t"), delta))
    wb = (
        Window.partitionBy("__k", "__b")
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ub.withColumn(
        "__local", F.last("__obs", ignorenulls=True).over(wb)
    )
    # one row per non-empty (key, bucket): the bucket's final right
    # observation (max_by over the collapsed right side is
    # deterministic — one right row per (key, t)), null for buckets
    # holding only left rows. Carry-in for bucket b = latest non-null
    # bucket-final observation over buckets < b (frame ends at -1, so
    # a bucket never carries itself).
    summary = (
        ub.groupBy("__k", "__b")
        .agg(
            F.max_by(
                "__obs", F.when(F.col("__tag") == 1, F.col("__t"))
            ).alias("__bobs")
        )
    )
    wc = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summary.select(
        "__k",
        "__b",
        F.last("__bobs", ignorenulls=True).over(wc).alias("__carry"),
    )
    return local.join(carry, ["__k", "__b"], "left").withColumn(
        "__asof", F.coalesce(F.col("__local"), F.col("__carry"))
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    delta: int,
    payload: str,
) -> DataFrame:
    """Forward range join -> one row per (left row, right row with
    ``right_ts`` in [left_ts, left_ts + delta]), carrying all left
    columns plus ``range_<payload>`` and ``gap`` (right_ts - left_ts).
    Timestamps and ``delta`` share one integer unit (epoch micros in
    the driver contract)."""
    lcols = left.columns
    lb = _bucket_start(F.col(left_ts), delta)
    l = left.select(
        F.struct(*lcols).alias("__row"),
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__lt"),
        F.explode(F.array(lb, lb + F.lit(int(delta)))).alias("__b"),
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__rt"),
        _bucket_start(F.col(right_ts), delta).alias("__b"),
        F.col(payload).alias("__payload"),
    )
    gap = F.col("__rt") - F.col("__lt")
    return (
        l.join(r, ["__k", "__b"])
        .where((gap >= 0) & (gap <= delta))
        .select(
            *[F.col("__row")[c].alias(c) for c in lcols],
            F.col("__payload").alias(f"range_{payload}"),
            gap.alias("gap"),
        )
    )
