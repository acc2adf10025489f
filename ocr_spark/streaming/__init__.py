"""Structured Streaming analogs (SURVEY.md §2.10)."""

from ocr_spark.streaming.sessionize import (  # noqa: F401
    run_incremental_extract, streaming_session_counts,
)
