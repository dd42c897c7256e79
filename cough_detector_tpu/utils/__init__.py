"""Utilities: observability (metrics, throughput/latency, profiler
traces) and the persistent XLA compile cache."""

from .compile_cache import enable_compile_cache
from .observability import (
    JsonlLogger,
    LatencyTracker,
    Throughput,
    capture_trace,
    trace_span,
)

__all__ = [
    "JsonlLogger",
    "enable_compile_cache",
    "LatencyTracker",
    "Throughput",
    "capture_trace",
    "trace_span",
]
