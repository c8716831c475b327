from .windows import (
    streaming_click_purchase_join,
    streaming_gopher_filter,
    streaming_dedup_events,
    streaming_left_outer_interval_join,
    streaming_session_windows,
    streaming_static_enrichment,
    streaming_sliding_counts,
    streaming_stateful_sessions,
    streaming_tumbling_counts,
    streaming_upsert_counts,
)

__all__ = [
    "streaming_click_purchase_join",
    "streaming_gopher_filter",
    "streaming_dedup_events",
    "streaming_left_outer_interval_join",
    "streaming_session_windows",
    "streaming_static_enrichment",
    "streaming_sliding_counts",
    "streaming_stateful_sessions",
    "streaming_tumbling_counts",
    "streaming_upsert_counts",
]
