from nicefox_graphdb_spark.streaming.events import (
    EVENT_SCHEMA,
    cleanup_dir,
    event_stream_from_dir,
    hourly_rollup,
    run_to_memory,
    sessionize,
    sliding_rollup,
    stage_events_as_stream_source,
    stream_dedup,
    user_running_stats,
)

__all__ = [
    "EVENT_SCHEMA",
    "cleanup_dir",
    "event_stream_from_dir",
    "hourly_rollup",
    "run_to_memory",
    "sessionize",
    "sliding_rollup",
    "stage_events_as_stream_source",
    "stream_dedup",
    "user_running_stats",
]
