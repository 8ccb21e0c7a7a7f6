from knext_spark.streaming.ingest import (  # noqa: F401
    ingest_stream,
    windowed_event_counts,
)
