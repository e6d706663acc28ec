"""Partitioning / skew planning helpers."""

from .partitioning import PartitionPlan, plan_partitions

__all__ = ["PartitionPlan", "plan_partitions"]
