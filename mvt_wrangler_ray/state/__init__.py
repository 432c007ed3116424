"""Checkpoint / lineage: range-partitioned resumable sinks."""

from .lineage import LineageWriter, resume_plan, write_partitioned

__all__ = ["LineageWriter", "resume_plan", "write_partitioned"]
