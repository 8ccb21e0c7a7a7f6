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


def test_sessionize_stream_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: closed sessions emitted
    by the streaming operator (flushed by far-future sentinel events in
    a SECOND availableNow run against the same checkpoint — which also
    exercises state recovery across query restarts) must equal the
    batch windows-based sessionize on the same events."""
    from pyspark.sql import functions as F

    from knext_spark.streaming import sessionize, sessionize_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = tmp_path / "events_src"
    # one time-sorted file: the operator's numbering contract assumes
    # per-user event-time progress ACROSS micro-batches (availableNow
    # batches by file), which random multi-file partitioning violates
    events.orderBy("ts").coalesce(1).write.parquet(str(src))

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(str(src))
        q = (
            sessionize_stream(stream, gap_minutes=30, watermark="1 hour")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    # sentinel flush: one far-future event per user closes every open
    # tail session when the restarted query folds it into state
    sent = events.groupBy("user_id").agg(
        (F.max("ts") + F.expr("interval 365 days")).alias("ts")
    ).select(
        F.lit(10**9).alias("event_id"),
        "ts",
        "user_id",
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    sent.select([c for c in events.columns]).write.mode("append").parquet(str(src))
    run_once()

    # key on (user, session_start): stable across the operator's
    # documented sid-restart-after-timeout-flush caveat; drop the
    # sentinel-started sessions themselves (they start after every
    # real event)
    cutoff = events.agg(
        F.unix_micros(F.max(F.col("ts").cast("timestamp")))
    ).first()[0]
    got = {
        (r["user_id"], r["session_start_us"]): (r["n_events"], r["duration_us"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
        if r["session_start_us"] <= cutoff
    }
    batch = {
        (r["user_id"], r["session_start_us"]): (r["n_events"], r["duration_us"])
        for r in sessionize(events, gap_minutes=30).collect()
    }
    assert got == batch


def test_projection_ops_stream_equals_batch(spark, tmp_path):
    """The stateless pipeline projections (scrub_pii, lang_id,
    token_count, quality_score) compose with Structured Streaming
    as-is — no shuffle, no state — and a streamed run over the same
    parquet bytes must equal the batch run row-for-row."""
    from knext_spark.pipeline import lang_id, scrub_pii

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(str(tmp_path / "docs_src"))
    stream = spark.readStream.schema(docs.schema).parquet(str(tmp_path / "docs_src"))

    q = (
        scrub_pii(stream)
        .writeStream.format("memory")
        .queryName("pii_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["text"], r["n_pii"])
        for r in spark.sql("select * from pii_stream").collect()
    }
    want = {
        r["doc_id"]: (r["text"], r["n_pii"]) for r in scrub_pii(docs).collect()
    }
    assert got == want and len(got) == 500

    q2 = (
        lang_id(stream)
        .writeStream.format("memory")
        .queryName("lang_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = {
        r["doc_id"]: r["pred_lang"]
        for r in spark.sql("select * from lang_stream").collect()
    }
    want2 = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert got2 == want2


def test_new_projection_ops_stream_equals_batch(spark, tmp_path):
    """gopher_filter and weighted_sample are also pure projections —
    streamed over the same bytes they must equal the batch run
    row-for-row (the filter gates an ingest stream; the sampler
    down-weights it)."""
    from knext_spark.pipeline import gopher_filter, weighted_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(str(tmp_path / "docs_src"))
    stream = spark.readStream.schema(docs.schema).parquet(
        str(tmp_path / "docs_src")
    )

    th = {"min_tokens": 30, "min_distinct_stopwords": 1}
    q = (
        gopher_filter(stream, thresholds=th)
        .writeStream.format("memory")
        .queryName("gopher_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckg"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (tuple(r["reasons"]), r["passes"])
        for r in spark.sql("select * from gopher_stream").collect()
    }
    want = {
        r["doc_id"]: (tuple(r["reasons"]), r["passes"])
        for r in gopher_filter(docs, thresholds=th).collect()
    }
    assert got == want and len(got) == 500

    rates = {"en": 0.5, "fr": 1.0, "de": 0.25, "es": 0.75, "zh": 0.1}
    q2 = (
        weighted_sample(stream, rates, "lang", "doc_id")
        .writeStream.format("memory")
        .queryName("ws_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckw"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = {r["doc_id"] for r in spark.sql("select * from ws_stream").collect()}
    want2 = {
        r["doc_id"] for r in weighted_sample(docs, rates, "lang", "doc_id").collect()
    }
    assert got2 == want2 and 0 < len(got2) < 500


def test_bloom_bits_accumulate_over_stream(spark, tmp_path):
    """The incremental seen-corpus pattern: each microbatch's
    bloom_bits append to a bits table via foreachBatch, and the
    bloom_merge of the accumulated table equals the batch-built filter
    over all the data EXACTLY (distinct-union mergeability is what
    makes the filter maintainable without re-reading the corpus)."""
    from knext_spark.pipeline import bloom_bits, bloom_merge

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(str(tmp_path / "docs_src"))
    stream = spark.readStream.schema(docs.schema).parquet(
        str(tmp_path / "docs_src")
    )
    bits_dir = str(tmp_path / "bits")

    def fold(batch_df, batch_id):
        bloom_bits(batch_df, "text", depth=3, b_hex=3).write.mode(
            "append"
        ).parquet(bits_dir)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    merged = sorted(
        r["bit"] for r in bloom_merge(spark.read.parquet(bits_dir)).collect()
    )
    direct = sorted(
        r["bit"] for r in bloom_bits(docs, "text", depth=3, b_hex=3).collect()
    )
    assert merged == direct and len(merged) > 0
