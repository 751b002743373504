from .worker import HeartbeatListener, dedup_stream, tumbling_window_stream, vectorize_stream

__all__ = ["HeartbeatListener", "dedup_stream", "tumbling_window_stream", "vectorize_stream"]
