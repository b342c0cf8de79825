"""Structured Streaming layer — streaming twins of the batch event ops."""

from piper_spark.streaming.events import (  # noqa: F401
    EVENTS_SCHEMA,
    read_event_stream,
    run_available_now,
    stream_dedup,
    stream_ohlc,
    stream_sessionize,
    stream_sliding,
    stream_tumbling,
)
