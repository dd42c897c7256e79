"""Multi-client detection server over the batched streaming engine.

One `StreamingDetector` with a fixed slot capacity serves every connected
client: each client OPENs one or more stream slots, sends f32 PCM, and
receives EVENT frames for detections on its slots. All slots advance in
lockstep device ticks — absent audio is silence — so the device side stays
one SPMD program per tick regardless of client count (SURVEY.md §2.9; the
reference has no serving daemon to mirror).

Tick policies:
  * "timer" (production): a ticker thread fires every chunk duration,
    zero-filling slots that have no buffered audio. Real-time cadence.
  * "eager" (tests / offline drains): tick whenever every OPEN slot has a
    full chunk buffered; deterministic, runs as fast as the device allows.

Failure containment: per-slot buffers are bounded (default 30 s); overflow
drops the OLDEST audio and counts it (`stats()["dropped_samples"]`) — the
quarantine-with-counts convention (docs/PARITY.md divergence #4). Protocol
violations close only the offending connection.

Scale note: the DEVICE side sustains ~16k real-time streams/chip
(BASELINE.md sweep, measured on the in-process engine); this daemon's
host side (Python socket readers + per-tick slot assembly) is the
binding constraint well before that. For >~1k streams per host, run
several daemons behind a load balancer or embed `StreamingDetector`
directly in a native frontend — the device tick is shared either way.
"""

from __future__ import annotations

import socket
import threading
import time
from collections import deque
from typing import Dict, List, Optional

import numpy as np

from ..config import Config
from ..stream.detector import StreamingDetector
from . import protocol


class _Slot:
    __slots__ = ("owner", "buffer", "buffered", "lock")

    def __init__(self, owner: "_Client"):
        self.owner = owner
        self.buffer: deque = deque()          # of np.float32 arrays
        self.buffered = 0                     # total samples queued
        self.lock = threading.Lock()

    def push(self, samples: np.ndarray, cap: int) -> int:
        """Queue samples; returns how many OLD samples were dropped."""
        dropped = 0
        with self.lock:
            self.buffer.append(samples)
            self.buffered += samples.size
            while self.buffered > cap and len(self.buffer) > 1:
                old = self.buffer.popleft()
                self.buffered -= old.size
                dropped += old.size
        return dropped

    def pull(self, n: int) -> np.ndarray:
        """Dequeue exactly n samples, zero-padded if underrun."""
        out = np.zeros(n, np.float32)
        got = 0
        with self.lock:
            while got < n and self.buffer:
                head = self.buffer[0]
                take = min(n - got, head.size)
                out[got : got + take] = head[:take]
                if take == head.size:
                    self.buffer.popleft()
                else:
                    self.buffer[0] = head[take:]
                self.buffered -= take
                got += take
        return out


class _Client:
    def __init__(self, sock: socket.socket, addr):
        self.sock = sock
        self.addr = addr
        self.slots: List[int] = []
        self.send_lock = threading.Lock()

    def send(self, data: bytes) -> None:
        with self.send_lock:
            self.sock.sendall(data)


class DetectionServer:
    """See module docstring. Capacity (`num_streams`) is fixed at start —
    static shapes keep the tick a single compiled program."""

    def __init__(
        self,
        *,
        model_path: Optional[str] = None,
        variables: Optional[dict] = None,
        config: Optional[Config] = None,
        host: str = "127.0.0.1",
        port: int = 0,
        num_streams: int = 256,
        chunk_size: int = 1600,
        confidence_threshold: float = 0.5,
        smoothing_window: int = 3,
        debounce_seconds: float = 0.5,
        tick_policy: str = "timer",
        buffer_seconds: float = 30.0,
        mesh=None,
        precision_mode: str = "high",
    ):
        if tick_policy not in ("timer", "eager"):
            raise ValueError(f"unknown tick_policy {tick_policy!r}")
        self._detector = StreamingDetector(
            model_path,
            variables=variables,
            config=config,
            num_streams=num_streams,
            chunk_size=chunk_size,
            confidence_threshold=confidence_threshold,
            smoothing_window=smoothing_window,
            debounce_seconds=debounce_seconds,
            mesh=mesh,
            precision_mode=precision_mode,
        )
        self.num_streams = num_streams
        self.chunk_size = chunk_size
        sr = self._detector.config.features.sample_rate
        self._tick_seconds = chunk_size / sr
        self._buffer_cap = max(chunk_size, int(buffer_seconds * sr))
        self._tick_policy = tick_policy

        self._slots: Dict[int, _Slot] = {}
        self._free = list(range(num_streams - 1, -1, -1))
        self._reg_lock = threading.Lock()
        self._stats = {
            "ticks": 0, "events": 0, "dropped_samples": 0,
            "connections": 0, "refused": 0,
        }
        self._tick_times: deque = deque(maxlen=1024)  # bounded: long-lived
        self._stats_lock = threading.Lock()  # counters touched by N threads
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []

        self._listener = socket.create_server((host, port))
        self.address = self._listener.getsockname()

    # -- lifecycle -------------------------------------------------------

    def start(self) -> None:
        # Compile the tick program BEFORE accepting clients (first jit of
        # the full tick takes minutes on a cold TPU; a serving daemon must
        # not spend its first client's real-time budget compiling).
        self._detector.process_chunk(
            np.zeros((self.num_streams, self.chunk_size), np.float32)
        )
        self._detector.reset()
        self._threads = [
            threading.Thread(target=self._accept_loop, daemon=True),
            threading.Thread(target=self._tick_loop, daemon=True),
        ]
        for t in self._threads:
            t.start()

    def stop(self) -> None:
        self._stop.set()
        try:
            self._listener.close()
        except OSError:
            pass
        for t in self._threads:
            t.join(timeout=5.0)

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    def stats(self) -> dict:
        with self._reg_lock:
            open_slots = len(self._slots)
        with self._stats_lock:
            out = {**self._stats, "open_streams": open_slots}
        if self._tick_times:
            arr = np.asarray(self._tick_times)
            out["tick_ms_p50"] = round(float(np.percentile(arr, 50)) * 1e3, 3)
            out["tick_ms_p99"] = round(float(np.percentile(arr, 99)) * 1e3, 3)
        return out

    # -- network side ----------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, addr = self._listener.accept()
            except OSError:
                return  # listener closed
            with self._stats_lock:
                self._stats["connections"] += 1
            client = _Client(sock, addr)
            t = threading.Thread(
                target=self._client_loop, args=(client,), daemon=True
            )
            t.start()

    def _client_loop(self, client: _Client) -> None:
        try:
            while not self._stop.is_set():
                frame = protocol.read_frame(client.sock)
                if frame is None:
                    return
                self._handle(client, frame)
        except (ConnectionError, OSError):
            pass
        finally:
            self._release_client(client)

    def _handle(self, client: _Client, frame: protocol.Frame) -> None:
        if frame.type == protocol.OPEN:
            with self._reg_lock:
                if not self._free:
                    with self._stats_lock:
                        self._stats["refused"] += 1
                    client.send(
                        protocol.encode(
                            protocol.ERROR, 0, b"no free stream slots"
                        )
                    )
                    return
                slot_id = self._free.pop()
                self._slots[slot_id] = _Slot(client)
                client.slots.append(slot_id)
            client.send(protocol.encode(protocol.OPENED, slot_id))
        elif frame.type == protocol.AUDIO:
            slot = self._slots.get(frame.stream)
            if slot is None or slot.owner is not client:
                raise ConnectionError(f"AUDIO for unowned slot {frame.stream}")
            samples = np.frombuffer(frame.payload, np.float32)
            dropped = slot.push(samples.copy(), self._buffer_cap)
            if dropped:
                with self._stats_lock:
                    self._stats["dropped_samples"] += dropped
        elif frame.type == protocol.CLOSE:
            self._release_slot(client, frame.stream)
        else:
            raise ConnectionError(f"unexpected frame type {frame.type}")

    def _release_slot(self, client: _Client, slot_id: int) -> None:
        with self._reg_lock:
            slot = self._slots.get(slot_id)
            if slot is not None and slot.owner is client:
                del self._slots[slot_id]
                self._free.append(slot_id)
                if slot_id in client.slots:
                    client.slots.remove(slot_id)

    def _release_client(self, client: _Client) -> None:
        for slot_id in list(client.slots):
            self._release_slot(client, slot_id)
        try:
            client.sock.close()
        except OSError:
            pass

    # -- device side -----------------------------------------------------

    def _ready(self) -> bool:
        with self._reg_lock:
            slots = list(self._slots.values())
        return bool(slots) and all(
            s.buffered >= self.chunk_size for s in slots
        )

    def _tick_loop(self) -> None:
        while not self._stop.is_set():
            if self._tick_policy == "eager":
                if not self._ready():
                    self._stop.wait(0.001)
                    continue
            else:
                self._stop.wait(self._tick_seconds)
                if self._stop.is_set():
                    return
                with self._reg_lock:
                    any_open = bool(self._slots)
                if not any_open:
                    continue
            self._tick_once()

    def _tick_once(self) -> None:
        chunk = np.zeros((self.num_streams, self.chunk_size), np.float32)
        with self._reg_lock:
            live = dict(self._slots)
        for slot_id, slot in live.items():
            chunk[slot_id] = slot.pull(self.chunk_size)
        t0 = time.perf_counter()
        detections = self._detector.process_chunk(chunk)
        self._tick_times.append(time.perf_counter() - t0)
        with self._stats_lock:
            self._stats["ticks"] += 1
        for det in detections:
            slot = live.get(det.stream)
            if slot is None:
                continue  # slot released mid-tick; stale event
            with self._stats_lock:
                self._stats["events"] += 1
            try:
                slot.owner.send(
                    protocol.encode_event(
                        det.stream, det.time_seconds, det.confidence
                    )
                )
            except OSError:
                pass  # client went away; its slots release on reader exit
