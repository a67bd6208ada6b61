from .incremental import run_incremental, stream_file_source, windowed_counts
from .stateful import stateful_sessionize

__all__ = [
    "run_incremental",
    "stream_file_source",
    "windowed_counts",
    "stateful_sessionize",
]
