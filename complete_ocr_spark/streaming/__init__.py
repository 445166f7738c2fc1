from .dedup_stream import near_dup_flags, run_streaming_dedup  # noqa: F401
from .stream import run_streaming_extraction  # noqa: F401
