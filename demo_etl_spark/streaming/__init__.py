from demo_etl_spark.streaming.event_streams import (
    read_events_stream,
    run_available_now,
    session_stream,
    sliding_stream,
    tumbling_stream,
    user_totals_stateful_stream,
)

__all__ = [
    "read_events_stream",
    "tumbling_stream",
    "sliding_stream",
    "session_stream",
    "user_totals_stateful_stream",
    "run_available_now",
]
