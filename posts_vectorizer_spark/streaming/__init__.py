from .worker import HeartbeatListener, vectorize_stream

__all__ = ["HeartbeatListener", "vectorize_stream"]
