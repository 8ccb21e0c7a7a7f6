"""Temporal joins Spark lacks as built-ins: as-of join, range join.

``asof_join`` matches every left row to the single right row with the
greatest right timestamp <= the left timestamp (backward as-of, the
time-series standard: "the latest state known at event time").

Implementation is the UNION + WINDOW pattern, not a range join:
tag both inputs, union them on (key, t), and carry the right side's
payload forward with ``last(..., ignorenulls=True)`` over a
(key)-partitioned, (t, tag)-ordered running window. That is one
shuffle on the join key plus one (key, t) shuffle for the
deterministic right-side collapse (audited: exactly 2 exchanges in
the physical plan) and a per-key sort — linear in rows — where a
naive ``l.t >= r.t`` theta-join is a per-key cross product
(O(|L_k| x |R_k|)) that Spark plans as BroadcastNestedLoop or a range
join blowup at 100 TB. Right rows sort BEFORE left rows at equal
timestamps (tag order), making the match backward-INCLUSIVE.

Determinism: several right rows can share (key, t); the window's
last-wins would then depend on sort ties, so the right side is first
collapsed to one row per (key, t) — row_number ordered by
(tie desc, payload desc), stated in the API and reproduced identically
in the DuckDB oracle (driver row ``asof_join``).

``range_join`` pairs every left row with every right row whose
timestamp falls in ``[l.t, l.t + delta]``. Catalyst plans the naive
``r.t between l.t and l.t + delta`` predicate as a broadcast
nested-loop (per-key cross product) — the scale pattern here is the
BUCKETIZED BAND JOIN: bucket = floor(t / delta); a right row in the
window necessarily lives in the left row's bucket or the next one, so the left
side explodes to exactly those two buckets, the join is an equi-join
on (key, bucket), and the exact range predicate filters the ~2x
candidate superset. Each (l, r) pair is generated at most once (a
right row has ONE bucket), so no dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: str,
    tie: str | None = None,
) -> DataFrame:
    """Backward as-of join -> all left columns + ``asof_<payload>``
    (the right column to attach; null when no right row is at or
    before the left timestamp). ``tie`` breaks several right rows
    sharing (key, ts) by its MAX, then max payload (defaults to the
    payload column itself)."""
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
        .select("__k", "__t", F.lit(1).alias("__tag"), "__payload")
    )
    lcols = left.columns
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(2).alias("__tag"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*lcols).alias("__row"),
    )
    u = r.withColumn(
        "__row", F.lit(None).cast(l.schema["__row"].dataType)
    ).unionByName(l)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "__asof", F.last("__payload", ignorenulls=True).over(w)
    ).where(F.col("__tag") == 2)
    return matched.select(
        *[F.col("__row")[c].alias(c) for c in lcols],
        F.col("__asof").alias(f"asof_{payload}"),
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
    lb = F.floor(F.col(left_ts) / delta).cast("long")
    l = left.select(
        F.struct(*lcols).alias("__row"),
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__lt"),
        F.explode(F.array(lb, lb + 1)).alias("__b"),
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__rt"),
        F.floor(F.col(right_ts) / delta).cast("long").alias("__b"),
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
