"""Staged plans: checkpoint-resumable pipelines with per-partition
lineage + metrics (north_rule requirement)."""

from .lineage import StageRunner

__all__ = ["StageRunner"]
