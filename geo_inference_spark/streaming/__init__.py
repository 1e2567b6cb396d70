"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.10), so the engine's
core is batch too; this package exposes the streaming shape of the
same pipelines for continuously-arriving page data: file-source
ingestion, event-time windowed aggregation with watermarks, and the
PIP join applied per micro-batch via foreachBatch (stateless
stages reuse the exact batch operators).
"""

from .pipeline import (  # noqa: F401
    dedup_stream,
    geocode_stream,
    read_pages_stream,
    run_stream_to_memory,
    windowed_lang_counts,
)
