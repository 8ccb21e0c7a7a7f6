from knext_spark.streaming.ingest import (  # noqa: F401
    ingest_stream,
    windowed_event_counts,
)
from knext_spark.streaming.sessions import (  # noqa: F401
    sessionize,
    sessionize_stream,
)
