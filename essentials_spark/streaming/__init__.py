"""Structured Streaming ingestion for continuously-arriving transcripts."""

from essentials_spark.streaming.ingest import (  # noqa: F401
    TRANSCRIPT_DDL,
    GraphMaintenance,
    incremental_key_edges,
    stream_transcripts,
    windowed_tool_counts,
)
