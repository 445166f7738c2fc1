from .stream import run_streaming_extraction  # noqa: F401
