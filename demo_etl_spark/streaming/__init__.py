from demo_etl_spark.streaming.event_streams import (
    dedup_stream,
    purchase_click_stream_join,
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
    "dedup_stream",
    "purchase_click_stream_join",
    "run_available_now",
]
