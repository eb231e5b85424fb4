from .ingest import stream_bronze_to_silver, stream_windowed_counts

__all__ = ["stream_bronze_to_silver", "stream_windowed_counts"]
