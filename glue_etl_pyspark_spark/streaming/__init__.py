"""Structured Streaming operators over the events table (SURVEY.md §2.10)."""

from .ops import drain_to_memory, events_stream, stage_stream_dir

__all__ = ["events_stream", "drain_to_memory", "stage_stream_dir"]
