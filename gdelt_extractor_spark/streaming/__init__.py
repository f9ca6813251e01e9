"""Structured-Streaming surface: the reference's update loop made
incremental, plus the stateful sessionizer."""

from .sessions import streaming_sessionize
from .updates import (
    dedup_stream,
    join_static_dim,
    run_foreach_batch,
    run_to_memory_sink,
    stream_gdelt_dir,
    windowed_counts,
    with_event_time,
)

__all__ = [
    "dedup_stream", "join_static_dim", "run_foreach_batch",
    "run_to_memory_sink", "stream_gdelt_dir", "streaming_sessionize",
    "windowed_counts", "with_event_time",
]
