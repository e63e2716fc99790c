"""Shared utilities: profiling, stage timing."""
from .profiling import StageTimer, profile_trace, timed_stage

__all__ = ["StageTimer", "profile_trace", "timed_stage"]
