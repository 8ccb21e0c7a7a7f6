"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
the Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec work is STUBBED —
the decode libraries (PIL/ffmpeg/librosa) are not in this container —
behind ``decode_stub`` (deterministic fake) / NotImplementedError, as
the task mandates.

Batch shape: mapInPandas receives Arrow batches; binary columns arrive
as pandas object-dtype of bytes. ``spark.sql.execution.arrow
.maxRecordsPerBatch`` bounds batch memory (set it so batch_rows *
avg_payload fits the executor; e.g. 10k rows of 1 MB images is 10 GB —
too big, so media pipelines set it to ~256).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_from_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a media table from the documents table (test rig):
    payload = utf-8 bytes of the text; kind round-robins by doc_id."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Pure-Catalyst metadata pass: byte length + sha256 per payload —
    no Python, runs at full codegen speed (the 100 TB integrity scan)."""
    return media.select(
        "media_id",
        "kind",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake 'decoder': hash-derived feature vector.
    Stands in for a real image/audio decode + model forward pass."""
    import hashlib

    out = []
    h = b""
    while len(out) < dim:
        h = hashlib.sha256(h + (payload or b"")).digest()
        out.extend(b / 255.0 for b in h)
    return [float(x) for x in out[:dim]]


def decode_features(
    media: DataFrame, dim: int = 16, real_decoder: bool = False
) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas.

    ``real_decoder=True`` is the clearly-marked stub for the actual
    codec path (PIL/ffmpeg absent in this container) -> raises
    NotImplementedError per task instructions. The default path runs
    the deterministic fake so the distributed plumbing (batching,
    schema, shuffle boundaries) is fully exercised and tested.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if real_decoder:
                raise NotImplementedError(
                    "real image/audio/video decoding requires codec libraries "
                    "not present in this environment; wire PIL/ffmpeg here"
                )
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                data = bytes(payload) if payload is not None else b""
                rows.append(
                    (
                        mid,
                        kind,
                        len(data),
                        hashlib.sha256(data).hexdigest(),
                        _fake_feature(data, dim),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) —
    the Spark-side fan-out that a real decoder would fill. Duration
    from metadata; payload untouched (column-pruned away by Catalyst
    unless the consumer asks for it)."""
    n_frames = F.greatest(
        (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int"),
        F.lit(1),
    )
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_ts_ms"),
    )
