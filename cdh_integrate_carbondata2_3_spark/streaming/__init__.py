from .streams import StreamManager, append_streaming_batch, finish_streaming, handoff  # noqa: F401
