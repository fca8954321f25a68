from es_analytics_spark.streaming.drain import drain_txlog_feed
from es_analytics_spark.streaming.ingest import (
    replay_stream,
    stream_events,
    windowed_event_counts,
    session_window_agg,
    dedup_within_watermark,
)

__all__ = [
    "drain_txlog_feed",
    "replay_stream",
    "stream_events",
    "windowed_event_counts",
    "session_window_agg",
    "dedup_within_watermark",
]
