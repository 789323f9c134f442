from demo_etl_spark.lineage.tracker import (
    LineageEvent,
    LineageTracker,
    attach_query_listener,
    column_lineage,
    column_lineage_dot,
    detach_query_listener,
)

__all__ = [
    "LineageEvent",
    "LineageTracker",
    "attach_query_listener",
    "column_lineage",
    "column_lineage_dot",
    "detach_query_listener",
]
