"""Sources/sinks: transcript table readers, corpus adapters, index storage.

Reference analogs: the parser stack (parsing/LinesMemoryParser.java,
SequentialReviewParser.java — SURVEY.md §2.1 S1-S4) collapses to schema
enforcement because our input is already a structured table, exactly as
SURVEY.md §2.1 prescribes.
"""

from .transcripts import TRANSCRIPT_SCHEMA, read_transcripts, transcripts_from_documents, write_synthetic_transcripts

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "read_transcripts",
    "transcripts_from_documents",
    "write_synthetic_transcripts",
]
