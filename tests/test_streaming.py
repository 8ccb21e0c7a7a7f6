"""Streaming ingest + watermarked windowed aggregation (SURVEY.md §2.9
stretch): file-watch -> idempotent corpus landing; streamed windowed
counts equal the batch computation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_ingest_stream_idempotent(spark, tmp_path, corpus_rows):
    from knext_spark.corpus.table import read_docs
    from knext_spark.streaming import ingest_stream

    watch = tmp_path / "drop"
    watch.mkdir()
    for _, path, _, _, content in corpus_rows[:5]:
        (watch / os.path.basename(path)).write_text(content)

    q = ingest_stream(
        spark, str(watch), str(tmp_path / "docs"), str(tmp_path / "ckpt1")
    )
    q.awaitTermination(120)
    n1 = read_docs(spark, str(tmp_path / "docs")).count()
    assert n1 == 5

    # second drop: 2 new files + 1 duplicate content (same sha -> same
    # commit, same path -> idempotent skip)
    for _, path, _, _, content in corpus_rows[5:7]:
        (watch / os.path.basename(path)).write_text(content)
    q = ingest_stream(
        spark, str(watch), str(tmp_path / "docs"), str(tmp_path / "ckpt2")
    )
    q.awaitTermination(120)
    n2 = read_docs(spark, str(tmp_path / "docs")).count()
    assert n2 == 7  # 5 old skipped, 2 new landed

    # the landed docs parse through the unchanged batch pipeline
    from knext_spark.knext import build_edges
    from knext_spark.parse import parse_docs

    edges = build_edges(
        parse_docs(read_docs(spark, str(tmp_path / "docs"))), mixed=True
    )
    assert edges.count() > 0


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    from knext_spark.streaming import windowed_event_counts

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.parquet(str(tmp_path / "events_src"))

    stream = spark.readStream.schema(events.schema).parquet(
        str(tmp_path / "events_src")
    )
    q = (
        windowed_event_counts(stream, window="1 day", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # availableNow + append emits only windows closed by the final
    # watermark; compare those against the batch computation
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("select * from wincounts").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in windowed_event_counts(events).collect()
    }
    assert got, "stream emitted no closed windows"
    for k, v in got.items():
        assert batch[k] == v
