"""Utilities: observability, logging."""

from .profiling import Metrics, metrics, trace, profile_trace

__all__ = ["Metrics", "metrics", "trace", "profile_trace"]
