"""Distributed operators (SURVEY.md §2): docID assignment, index build,
ranked search, posting-block compression, WAND, dedup, similarity."""
