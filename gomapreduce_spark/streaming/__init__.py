from .windows import streaming_tumbling_counts, streaming_session_windows

__all__ = ["streaming_tumbling_counts", "streaming_session_windows"]
