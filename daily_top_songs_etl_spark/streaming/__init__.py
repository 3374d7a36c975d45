"""Structured-Streaming incremental ingestion + event-time window ops."""

from .daily_stream import run_landing_stream
from .windows import sessionized, tumbling_counts

__all__ = ["run_landing_stream", "tumbling_counts", "sessionized"]
