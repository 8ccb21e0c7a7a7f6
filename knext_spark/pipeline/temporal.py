"""Temporal joins Spark lacks as built-ins: as-of join.

``asof_join`` matches every left row to the single right row with the
greatest right timestamp <= the left timestamp (backward as-of, the
time-series standard: "the latest state known at event time").

Implementation is the UNION + WINDOW pattern, not a range join:
tag both inputs, union them on (key, t), and carry the right side's
payload forward with ``last(..., ignorenulls=True)`` over a
(key)-partitioned, (t, tag)-ordered running window. That is ONE
shuffle on the join key and a per-key sort — linear in rows — where a
naive ``l.t >= r.t`` theta-join is a per-key cross product
(O(|L_k| x |R_k|)) that Spark plans as BroadcastNestedLoop or a range
join blowup at 100 TB. Right rows sort BEFORE left rows at equal
timestamps (tag order), making the match backward-INCLUSIVE.

Determinism: several right rows can share (key, t); the window's
last-wins would then depend on sort ties, so the right side is first
collapsed to one row per (key, t) — row_number ordered by
(tie desc, payload desc), stated in the API and reproduced identically
in the DuckDB oracle (driver row ``asof_join``).
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
