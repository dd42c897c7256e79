"""Observability: structured JSONL metrics, throughput/latency counters,
and jax.profiler trace annotation helpers.

The reference's only observability is tqdm bars and prints
(reference: src/train.py:82-106, SURVEY.md §5); here step-time,
clips/sec/chip and detection-latency percentiles are first-class.

Production wiring (every symbol here has a real call site):
  * `JsonlLogger` — the train loop's per-epoch metrics.jsonl
    (train/loop.py) and the featurize CLI's summary line.
  * `LatencyTracker` — the serving daemon's tick-cost and delivery-lag
    percentiles (serve/server.py; bounded, like every other serve-side
    buffer).
  * `Throughput` — the featurize CLI's steady-state clips/s (warmup
    batch — the XLA compile — discarded).
  * `trace_span` / `capture_trace` — `bench.py --trace DIR` wraps the
    headline measurement in a device trace with per-phase annotations;
    the resulting profile is summarized in BASELINE.md.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import deque
from pathlib import Path
from typing import Deque, Dict, Optional

import numpy as np


class JsonlLogger:
    """Append-only JSONL metric stream."""

    def __init__(self, path: str):
        self._path = Path(path)
        self._path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = self._path.open("a")

    def log(self, **record) -> None:
        record.setdefault("t", time.time())
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()


class Throughput:
    """clips/sec/chip counter with warmup discard."""

    def __init__(self, warmup: int = 1):
        self._warmup = warmup
        self._n_calls = 0
        self._items = 0
        self._seconds = 0.0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, items: int) -> None:
        if self._t0 is None:
            raise RuntimeError("Throughput.stop() without a prior start()")
        dt = time.perf_counter() - self._t0
        self._n_calls += 1
        if self._n_calls > self._warmup:
            self._items += items
            self._seconds += dt

    @property
    def items_per_sec(self) -> float:
        return self._items / self._seconds if self._seconds else 0.0


class LatencyTracker:
    """p50/p90/p99 over recorded latencies (seconds).

    Bounded by construction: only the most recent `maxlen` samples are
    kept (a long-lived server must not grow a sample list without bound
    — the same discipline as every other serve-side buffer). Writers
    call `record`; readers in another thread must take `snapshot()`
    under whatever lock excludes writers and compute percentiles on the
    snapshot (iterating a deque during a concurrent append is a
    RuntimeError)."""

    def __init__(self, maxlen: Optional[int] = 4096):
        self._samples: Deque[float] = deque(maxlen=maxlen)

    def record(self, seconds: float) -> None:
        self._samples.append(seconds)

    def snapshot(self) -> np.ndarray:
        """The retained samples as an array (copy, safe to reduce)."""
        return np.asarray(self._samples, dtype=np.float64)

    def percentiles(self) -> Dict[str, float]:
        arr = self.snapshot()
        if not arr.size:
            return {"p50": 0.0, "p90": 0.0, "p99": 0.0, "n": 0}
        return {
            "p50": float(np.percentile(arr, 50)),
            "p90": float(np.percentile(arr, 90)),
            "p99": float(np.percentile(arr, 99)),
            "n": int(arr.size),
        }


@contextlib.contextmanager
def trace_span(name: str):
    """jax.profiler annotation (no-op cost when no trace is active)."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture a full device trace viewable in TensorBoard/Perfetto."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
