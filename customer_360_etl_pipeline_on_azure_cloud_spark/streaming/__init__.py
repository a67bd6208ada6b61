from .incremental import run_incremental, stream_file_source, windowed_counts

__all__ = ["run_incremental", "stream_file_source", "windowed_counts"]
