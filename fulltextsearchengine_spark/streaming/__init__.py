"""Structured Streaming extensions.

The reference engine is strictly batch (SURVEY.md §2.9: no streaming,
no incremental indexing — IndexWriter wipes and rebuilds). These
modules ADD the streaming capabilities a transcript pipeline needs:
segment-based incremental indexing (Lucene-style append-only segments
via foreachBatch) and watermarked windowed event aggregation.
"""

from .stream_index import merge_segment_stats, run_incremental_index

__all__ = ["run_incremental_index", "merge_segment_stats"]
