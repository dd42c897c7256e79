"""Utilities: observability (metrics, throughput/latency, profiler traces)."""

from .observability import (
    JsonlLogger,
    LatencyTracker,
    Throughput,
    capture_trace,
    trace_span,
)

__all__ = [
    "JsonlLogger",
    "LatencyTracker",
    "Throughput",
    "capture_trace",
    "trace_span",
]
