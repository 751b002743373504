from .worker import HeartbeatListener, dedup_stream, vectorize_stream

__all__ = ["HeartbeatListener", "dedup_stream", "vectorize_stream"]
