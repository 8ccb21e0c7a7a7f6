"""Structured Streaming ingestion & windowed aggregation.

The reference is a batch CLI (no streaming anywhere — SURVEY.md §2.9);
these are the engine's forward-looking stream paths:

- ``ingest_stream``: continuous KGML arrival — a file-watch stream over
  a drop directory; every micro-batch lands new documents in the docs
  corpus table via the same idempotent MERGE the batch ingest uses
  (anti-join on (repo, path, commit) — the streaming analogue of the
  reference's skip-if-exists at `/root/reference/src/knext/call.py:38-39`).
  foreachBatch keeps the sink transactional per micro-batch and lets
  the batch edge pipeline run unchanged downstream.
- ``windowed_event_counts``: watermarked tumbling-window aggregation
  over an event stream (late data dropped past the watermark) — the
  standard Structured Streaming shape for rollups at 100 TB/day scale.

Both run with ``trigger(availableNow=True)`` in tests (bounded drain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def ingest_stream(
    spark: SparkSession,
    watch_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Watch ``watch_dir`` for new XML files; land each micro-batch into
    the docs corpus table idempotently. Returns the StreamingQuery."""
    from knext_spark.corpus.table import write_docs

    raw = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .load(watch_dir)
    )
    docs = raw.select(
        F.lit("stream").alias("repo"),
        F.input_file_name().alias("path"),
        F.sha2(F.col("value").cast("binary"), 256).substr(1, 12).alias("commit"),
        F.lit("xml").alias("lang"),
        F.col("value").alias("content"),
    )

    def land(batch_df: DataFrame, batch_id: int) -> None:
        write_docs(batch_df, table_dir, idempotent=True, n_buckets=8)

    writer = docs.writeStream.foreachBatch(land).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type over a
    (possibly streaming) events frame with an event-time ``ts``."""
    # watermarks need TIMESTAMP (ltz); parquet often carries NTZ
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )
