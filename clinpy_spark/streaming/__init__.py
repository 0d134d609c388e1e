from clinpy_spark.streaming.events import (  # noqa: F401
    read_event_stream,
    streaming_session_counts,
    streaming_tumbling_counts,
)
