from .dedup_stream import near_dup_flags, run_streaming_dedup  # noqa: F401
from .stateful import run_streaming_sessions  # noqa: F401
from .stream import run_streaming_extraction  # noqa: F401
from .windowed import run_windowed_event_counts, windowed_event_counts  # noqa: F401
