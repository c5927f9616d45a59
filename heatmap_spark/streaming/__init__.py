"""Structured Streaming surface: incremental heatmaps + windowed aggs."""

from heatmap_spark.streaming.incremental import (
    read_events_stream,
    streaming_session_stats,
    streaming_tile_counts,
    streaming_tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "streaming_tile_counts",
    "streaming_tumbling_counts",
    "streaming_session_stats",
]
