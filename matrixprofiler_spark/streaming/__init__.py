"""Incremental / resumable orchestration (snapshot checkpoints + lineage)."""

from .checkpoint import RollupJob, read_manifest

__all__ = ["RollupJob", "read_manifest"]
