"""Sessionization — batch (declarative windows) and streaming
(custom stateful operator via ``applyInPandasWithState``).

A session is a maximal run of a user's events where consecutive
event-time gaps are <= ``gap_minutes``; a strictly larger gap starts a
new session. Semantics are defined on integer epoch-microseconds so
the batch operator, the streaming operator, and the DuckDB oracle
(driver row ``sessionize``) agree exactly — no float folds, no
timezone-dependent values (duration is a difference, so the NTZ->LTZ
cast shift cancels).

- ``sessionize`` (batch): two windows — lag() marks session starts,
  a running sum numbers sessions per user, one aggregation collapses
  them. ONE shuffle on user_id (both windows and the groupBy share the
  partitioning, so Catalyst plans a single exchange); scales linearly
  in events with per-user skew bounded by the busiest user.
- ``sessionize_stream``: the same semantics as a streaming operator.
  Spark has no built-in per-group gap-session aggregation with custom
  emit shape, so this is the mandated ``applyInPandasWithState`` path
  (Arrow-batched, zero per-row Python in the plan): state = the one
  OPEN session per user (session counter, start/last micros, count);
  each micro-batch folds its (sorted) group rows into the state,
  EMITS sessions closed by an observed gap, and keeps the open tail in
  state across batches (checkpointed — a killed/restarted query
  resumes mid-session). An event-time timeout flushes an open session
  once the watermark passes last_ts + gap, so idle users drain without
  waiting for their next event.

Session numbering across micro-batches assumes per-user event-time
progress between batches (within a batch, rows are sorted in the
operator); that is what the watermark guarantees for non-late data,
and late rows inside the allowance are still folded correctly within
their arrival batch. One inherent bounded-state caveat: a timeout
flush REMOVES the user's state (keeping every ever-seen user forever
is exactly the unbounded-state failure mode stateful streaming must
avoid), so a user who goes idle past the gap horizon and later
returns restarts ``session_id`` at 1. Consumers that need a stable
session key should use ``(user_id, session_start_us)`` — emitted for
that purpose and unique per session; global renumbering is the batch
operator's job.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

from pyspark.sql import DataFrame, Window, functions as F, types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("duration_us", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("sid", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Batch sessionization -> (user_id, session_id, n_events,
    duration_us); session_id numbers a user's sessions 1..k in event
    time."""
    gap_us = int(gap_minutes) * 60_000_000
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    w = Window.partitionBy(user).orderBy("us")
    run = Window.partitionBy(user).orderBy("us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    e = events.select(F.col(user).alias("user_id"), us.alias("us"))
    flagged = e.withColumn(
        "new_s",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_s").over(run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("us").alias("session_start_us"),
        F.count("*").cast("long").alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


def _fold_session(
    key: Tuple[Any, ...],
    pdfs: Iterable["pd.DataFrame"],  # noqa: F821
    state,
    gap_us: int,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        sid, start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            [(user_id, sid, start_us, n, last_us - start_us)],
            columns=[f.name for f in SESSION_SCHEMA.fields],
        )
        return
    sid, start_us, last_us, n = (
        state.get if state.exists else (0, None, None, 0)
    )
    closed = []
    # the group's rows arrive as an ITERATOR of Arrow chunks — gather
    # them all before sorting, a per-chunk sort is not a sort
    batch_us = sorted(
        int(t) for pdf in pdfs for t in pdf["us"]
    )
    for t in batch_us:
        if last_us is None:
            sid, start_us, last_us, n = sid + 1, t, t, 1
        elif t - last_us > gap_us:
            closed.append((user_id, sid, start_us, n, last_us - start_us))
            sid, start_us, last_us, n = sid + 1, t, t, 1
        else:
            last_us, n = max(last_us, t), n + 1
    state.update((sid, start_us, last_us, n))
    # flush once the watermark passes the open session's gap horizon;
    # ceil to ms so the timeout is never EARLIER than the exact
    # (last_us + gap_us) horizon (separate // truncation of each term
    # could fire up to 1ms early)
    state.setTimeoutTimestamp(-(-(last_us + gap_us) // 1000))
    yield pd.DataFrame(
        closed, columns=[f.name for f in SESSION_SCHEMA.fields]
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    user: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Streaming sessionization with per-user state (see module
    docstring). Returns a streaming frame of CLOSED sessions in
    SESSION_SCHEMA."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_minutes) * 60_000_000
    e = events.withColumn("ts", F.col(ts).cast("timestamp")).select(
        F.col(user).alias("user_id"),
        F.col("ts"),
        F.unix_micros(F.col("ts")).alias("us"),
    )
    return (
        e.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            lambda key, pdfs, state: _fold_session(key, pdfs, state, gap_us),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
