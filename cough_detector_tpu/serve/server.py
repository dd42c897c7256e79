"""Multi-client detection server over the batched streaming engine.

One `StreamingDetector` with a fixed slot capacity serves every connected
client: each client OPENs one or more stream slots, sends f32 PCM, and
receives EVENT frames for detections on its slots. All slots advance in
lockstep device ticks — absent audio is silence — so the device side stays
one SPMD program per tick regardless of client count (SURVEY.md §2.9; the
reference has no serving daemon to mirror).

Tick policies:
  * "timer" (production): the ticker fires on an absolute-deadline schedule
    (every chunk duration of wall time, independent of processing time),
    zero-filling slots that have no buffered audio. Real-time cadence.
  * "eager" (tests / offline drains): tick whenever every OPEN slot has a
    full chunk buffered; runs as fast as the device allows. Stream clocks
    FREEZE while no slot has audio (no silence is ever injected into an
    idle or in-flight stream), so a drain is deterministic: the same
    offered audio yields the same events regardless of host load. The one
    wall-clock element is the liveness deadline (`liveness_seconds`):
    when readiness is ASYMMETRIC — one tenant's lane has a full chunk
    while another's sits empty — for a full liveness period, the server
    ticks anyway and the starved lanes zero-fill, so a silent tenant can
    never stall a live one. Disable with liveness_seconds=float("inf")
    for pure lockstep.

Isolation and containment:
  * Slot reuse is clean: when a slot is granted, its device-side state
    rows (ring buffer, smoothing history, debounce clock) are zeroed on
    the tick thread before any of the new tenant's audio is scored, event
    timestamps are reported relative to the slot's own open time, and
    events from windows that overlap pre-open zero padding (the lockstep
    clock emits windows immediately) are suppressed.
  * Per-slot audio buffers are bounded (default 30 s); overflow drops the
    OLDEST audio and counts it (`stats()["dropped_samples"]`) — the
    quarantine-with-counts convention (docs/PARITY.md divergence #4).
  * Outbound frames go through bounded per-client queues drained by a
    writer thread, so one stalled client can NEVER block the tick loop;
    events to a full queue are dropped and counted
    (`stats()["events_dropped"]`).
  * Protocol violations get a best-effort ERROR frame, then only the
    offending connection is closed.

Pipeline (performance-critical): the timer thread only ASSEMBLES and
DISPATCHES device ticks — ticks chain through donated state and never
wait on a host fetch. A pool of fetch workers pulls each tick's single
packed event tensor (round trips overlap; one fetch costs ~27-80 ms over
the dev tunnel, microseconds on a local chip), and a router thread
re-serializes completions so clients see events strictly in tick order.
Real-time cadence is therefore independent of fetch latency until the
fetch pool saturates.

Scale note: the DEVICE side sustains ~16k real-time streams/chip
(BASELINE.md sweep, measured on the in-process engine); this daemon's
host side (Python socket readers + per-tick slot assembly + event
routing) binds first — see BASELINE.md's measured `bench.py --daemon`
ramp for where cadence breaks on this host. Beyond that, run several
daemons behind a load balancer or embed `StreamingDetector` directly in
a native frontend — the device tick is shared either way.
"""

from __future__ import annotations

import queue
import socket
import sys
import threading
import time
from collections import deque
from typing import Dict, List, Optional

import numpy as np

from ..config import Config
from ..stream.detector import StreamingDetector
from ..utils.observability import LatencyTracker
from . import protocol


class _ProtocolViolation(ConnectionError):
    """Client broke the wire contract; reply ERROR and drop it."""


def quantize_i16(x: np.ndarray) -> np.ndarray:
    """f32 audio → int16 PCM: i = clip(round(x*32768), -32768, 32767),
    rounding half away from zero — bit-exact twin of the C++
    quantize-on-assemble row converter (native/cdt_ingest.cpp cvt_row)
    and inverse of the in-jit dequant in stream/ring.py (x = i/32768).
    Non-finite samples (any 4 wire bytes decode to a valid f32, so NaN
    can arrive from a client): NaN → 0, ±inf → full scale — pinned
    explicitly in BOTH twins because the raw float→int conversion is
    undefined for them. This is the half-bandwidth H2D tick format: at
    1,024 streams the f32 tick uploads ~65 MB/s, which saturates a
    ~60 MB/s host↔device link; 16-bit PCM is also what capture hardware
    emits, so quantizing here reproduces the mic-faithful signal, not
    an approximation of it."""
    v = np.clip(np.nan_to_num(x * 32768.0, nan=0.0), -32768.0, 32767.0)
    return np.trunc(v + np.copysign(0.5, v)).astype(np.int16)


# μ-law companding constants (G.711-style continuous μ-law, μ=255).
# 1/ln(1+μ): multiplying by the reciprocal keeps the C++ twin
# (cdt_ingest.cpp cvt_row<uint8>) bit-exact without a per-sample divide.
_MULAW_MU = 255.0
_MULAW_INV_LN = 1.0 / np.log(256.0)


def quantize_mulaw(x: np.ndarray) -> np.ndarray:
    """f32 audio → 8-bit μ-law (μ=255): compand with
    sign(x)·ln(1+255|x|)/ln(256) over x clipped to [-1,1], then map
    [-1,1] → codes [0,255] rounding half away from zero. Bit-exact twin
    of the C++ quantize-on-assemble converter (native/cdt_ingest.cpp
    cvt_row<uint8>; both compute in float64) and inverse of the in-jit
    dequant in stream/ring.py. Non-finite convention matches
    quantize_i16: NaN → code 128 (zero), ±inf → full scale.

    This is the QUARTER-bandwidth H2D tick format for links where even
    the int16 tick saturates (the dev tunnel's ~60 MB/s wall lands at
    2,048 int16 streams). μ-law is telephony's standard 8-bit codec:
    quantization noise rides the signal level (~38 dB SNR) instead of
    the full scale, so quiet audio — most of a cough stream — keeps
    int16-like fidelity. Measured effect on confidences is documented
    in docs/PARITY.md; opt-in via h2d_dtype="mulaw"."""
    v = np.clip(
        np.nan_to_num(x, nan=0.0, posinf=1.0, neginf=-1.0), -1.0, 1.0
    ).astype(np.float64)
    m = np.sign(v) * np.log1p(_MULAW_MU * np.abs(v)) * _MULAW_INV_LN
    # Mid-tread: m ∈ [-1,1] → signed level round(m·127) ∈ [-127,127] →
    # code u = level+128 ∈ [1,255] (code 0 unused, as in G.711). The
    # tread matters: x=0 MUST map to a code that decodes to exactly 0 —
    # a mid-riser's half-step DC offset on digital silence would be
    # blown up to full scale by the per-window peak normalization in
    # the scoring path.
    lvl = np.trunc(m * 127.0 + np.copysign(0.5, m))
    return (lvl + 128.0).astype(np.uint8)


def dequantize_mulaw(u: np.ndarray) -> np.ndarray:
    """Host-side inverse of quantize_mulaw (f64 math, f32 result) —
    the reference decoder tests compare the in-jit dequant against."""
    y = (u.astype(np.float64) - 128.0) / 127.0
    x = np.sign(y) * np.expm1(np.abs(y) * np.log(256.0)) / _MULAW_MU
    return x.astype(np.float32)


def h2d_silence(shape, dtype) -> np.ndarray:
    """Digital silence in a given H2D tick format: 0 for float32/int16,
    code 128 for μ-law (whose mid-tread zero is NOT the 0 byte)."""
    fill = 128 if np.dtype(dtype) == np.uint8 else 0
    return np.full(shape, fill, dtype)


class _Slot:
    __slots__ = ("owner", "buffer", "buffered", "lock", "open_sample")

    def __init__(self, owner: "_Client", open_sample: int):
        self.owner = owner
        self.buffer: deque = deque()          # of np.float32 arrays
        self.buffered = 0                     # total samples queued
        self.lock = threading.Lock()
        self.open_sample = open_sample        # server stream-sample at OPEN

    def push(self, samples: np.ndarray, cap: int) -> int:
        """Queue samples; returns how many OLD samples were dropped.
        Overflow drops EXACTLY (buffered - cap) samples from the oldest
        end, trimming partial frames — the same newest-wins arithmetic
        as the C++ plane's ring (cdt_ingest.cpp advances `rd` by the
        exact overflow), so both backends retain identical audio and
        report identical dropped_samples for identical wire bytes.
        (An earlier version popped whole frames, retaining up to a
        frame less than the C++ ring — r4 review.) The cap binds even
        for a SINGLE over-cap frame (a 16 MiB AUDIO frame is 262 s of
        audio): the newest `cap` samples are kept."""
        dropped = 0
        with self.lock:
            self.buffer.append(samples)
            self.buffered += samples.size
            need = self.buffered - cap
            while need > 0:
                head = self.buffer[0]
                take = min(need, head.size)
                if take == head.size:
                    self.buffer.popleft()
                else:
                    self.buffer[0] = head[take:]
                self.buffered -= take
                dropped += take
                need -= take
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
    """One connection: a reader loop (server-driven) plus a writer thread
    draining a bounded outbox, so sends never block the tick loop."""

    OUTBOX_FRAMES = 1024

    def __init__(self, sock: socket.socket, addr):
        self.sock = sock
        self.addr = addr
        self.slots: List[int] = []
        self.outbox: "queue.Queue[Optional[bytes]]" = queue.Queue(
            maxsize=self.OUTBOX_FRAMES
        )
        self.writer = threading.Thread(target=self._write_loop, daemon=True)
        self.writer.start()

    def send(self, data: bytes) -> bool:
        """Enqueue a frame; False (dropped) if the client isn't draining."""
        try:
            self.outbox.put_nowait(data)
            return True
        except queue.Full:
            return False

    def close(self) -> None:
        try:
            self.outbox.put_nowait(None)  # writer exits after the sentinel
        except queue.Full:
            pass  # writer is stuck in sendall; the shutdown unblocks it
        try:
            # shutdown() wakes any thread blocked in recv/sendall on this
            # socket; close() alone leaves them stuck (kernel holds the fd).
            self.sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        try:
            self.sock.close()
        except OSError:
            pass

    def _write_loop(self) -> None:
        try:
            while True:
                data = self.outbox.get()
                if data is None:
                    return
                self.sock.sendall(data)
        except (ConnectionError, OSError):
            return


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
        liveness_seconds: Optional[float] = None,
        buffer_seconds: float = 30.0,
        mesh=None,
        precision_mode: str = "high",
        delivery_workers: int = 4,
        backend: str = "auto",
        h2d_dtype: str = "float32",
        ingest_workers: int = 1,
    ):
        """`backend`: "python" (portable socket tier, this module),
        "native" (C++ epoll data plane, native/cdt_ingest.cpp — no
        Python in the per-frame path, ~4x the stream ceiling), or
        "auto" (native when the toolchain built it, else python). Both
        speak the identical wire protocol and support both tick
        policies (the native plane's eager-readiness predicate is
        cdt_ingest_ready, the C++ twin of this module's _ready()).

        `ingest_workers` (native backend only): number of C++ epoll I/O
        threads. Connections partition across workers round-robin at
        accept; slot/tick/event semantics are identical at any count
        (event-parity tested at 4 workers vs 1). Default 1 suits this
        one-core dev host; raise on multi-core production hosts where
        one core's frame parsing (~10k frames/s) is the ceiling.

        `h2d_dtype`: dtype of the per-tick host→device batch. "float32"
        (default, exact) or "int16" (16-bit PCM: quantize on assemble —
        in C++ for the native plane — dequantize inside the jit tick;
        see quantize_i16). int16 halves the tick's upload bytes, which
        doubles the stream ceiling when the host↔device link is
        bandwidth-bound (dev tunnel: ~60 MB/s vs the 65 MB/s a 1,024
        stream f32 tick needs). Logits move by O(1e-5) — within the
        1e-3 parity budget, re-measured on chip (docs/PARITY.md).
        "mulaw" (8-bit μ-law companding, see quantize_mulaw) quarters
        the f32 bytes for links where even int16 saturates; its
        signal-tracking quantization noise is an approximation (measured
        confidence deltas in docs/PARITY.md), so it is the explicit
        opt-in for bandwidth-starved deployments, not a default.

        `liveness_seconds` (eager policy only): how long one tenant may
        stall the lockstep tick before the server ticks anyway,
        zero-filling the starved lanes. A liveness tick fires ONLY when
        readiness is asymmetric — at least one open slot has a full
        chunk buffered while another does not — so an all-idle daemon
        (or one whose every lane's audio is merely in flight) never
        ticks: eager streams' clocks freeze while no audio is offered,
        which is what makes eager drains deterministic. Default (None)
        is one tick period (chunk_size / sample_rate); float("inf")
        disables liveness ticks entirely (pure lockstep: a silent
        tenant then stalls everyone — only for tests/drains that
        control every lane)."""
        if tick_policy not in ("timer", "eager"):
            raise ValueError(f"unknown tick_policy {tick_policy!r}")
        if backend == "auto":
            from . import native_ingest

            backend = "native" if native_ingest.available() else "python"
        if backend not in ("python", "native"):
            raise ValueError(f"unknown backend {backend!r}")
        _h2d_dtypes = {
            "float32": np.float32, "int16": np.int16, "mulaw": np.uint8,
        }
        if h2d_dtype not in _h2d_dtypes:
            raise ValueError(f"unknown h2d_dtype {h2d_dtype!r}")
        self.h2d_dtype = h2d_dtype
        self._h2d = _h2d_dtypes[h2d_dtype]
        self.backend = backend
        self._ingest_workers = max(1, int(ingest_workers))
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
        self._host, self._port = host, port
        self._sample_rate = self._detector.config.features.sample_rate
        self._tick_seconds = chunk_size / self._sample_rate
        if liveness_seconds is None:
            liveness_seconds = self._tick_seconds
        if not liveness_seconds > 0:
            raise ValueError("liveness_seconds must be > 0")
        self._liveness_seconds = float(liveness_seconds)
        self._buffer_cap = max(chunk_size, int(buffer_seconds * self._sample_rate))
        self._tick_policy = tick_policy

        self._slots: Dict[int, _Slot] = {}
        self._free = list(range(num_streams - 1, -1, -1))
        self._reg_lock = threading.Lock()
        # Every accepted connection, so stop() can close them (else each
        # _client_loop stays blocked in recv and remote clients hang).
        self._live_clients: set = set()
        # Slots granted but not yet state-scrubbed, as (slot_id,
        # threshold-or-None) pairs; the tick thread zeroes their device
        # rows (and installs the tenant's per-stream threshold) before
        # pulling any of their audio.
        self._pending_resets: List[tuple] = []
        # Mid-stream THRESH retunes, (slot_id, threshold) — applied by
        # the tick thread AFTER any resets (a grant and a retune in the
        # same tick resolve to the retune), scrubbing nothing.
        self._pending_thresholds: List[tuple] = []
        self._stats = {
            "ticks": 0, "events": 0, "events_dropped": 0,
            "dropped_samples": 0, "connections": 0, "refused": 0,
            "tick_errors": 0, "tick_dispatch_errors": 0,
        }
        # Last tick-thread dispatch failure (repr), surfaced in stats():
        # the tick loop contains exceptions instead of dying silently.
        self._last_tick_error: Optional[str] = None
        # Bounded latency trackers (utils/observability.py): tick cost on
        # the timer thread, dispatch→delivered pipeline lag.
        self._tick_times = LatencyTracker(maxlen=1024)
        self._lag_times = LatencyTracker(maxlen=1024)
        self._stats_lock = threading.Lock()  # counters touched by N threads
        # Device ticks in flight: the timer thread DISPATCHES each tick
        # (device work chains through donated state, no host fetch) and
        # hands the on-device events here; a pool of fetch workers pulls
        # each tick's packed event tensor (their host↔device round trips
        # OVERLAP — one round trip costs ~27-80 ms over the dev tunnel,
        # more than a whole 256-stream tick's compute, and a single
        # fetcher caps delivery at ~1/RT ticks/s), and the router thread
        # re-serializes results so clients always see events in tick
        # order. Bounded: if delivery falls chronically behind, the timer
        # blocks and the missed cadence shows in stats.
        self._delivery_workers = max(1, delivery_workers)
        self._inflight: "queue.Queue" = queue.Queue(
            maxsize=2 * self._delivery_workers
        )
        self._fetched: Dict[int, tuple] = {}  # serial → (live, dets, t0)
        self._fetched_cond = threading.Condition()
        self._dispatched = 0  # tick serial, single-writer: tick thread
        self._routed = 0  # ticks claimed by the router, single-writer
        # The _inflight queue only bounds dispatch→fetch. If ONE fetch
        # hangs (the dev tunnel can stall for multi-second stretches
        # without raising), the other workers keep completing later
        # serials into _fetched while the router waits on the hung one —
        # unbounded growth, and on the native backend the assembly-buffer
        # pool would eventually wrap onto the hung tick's buffer while
        # its device_put may still be reading it. So dispatch is ALSO
        # gated on the router's progress (_wait_dispatch_slot): at most
        # _max_ahead ticks may exist between dispatch and routing, which
        # caps _fetched at _max_ahead entries and is exactly the
        # assembly-pool size, so a buffer can never be reused before its
        # tick's fetch has completed.
        self._max_ahead = 3 * self._delivery_workers + 2
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []

        if backend == "native":
            # The C++ plane is created in start(), AFTER the tick compile:
            # cdt_ingest_start accepts and replies OPENED immediately, so
            # binding here would let a client open a slot and stream audio
            # for the whole minutes-long cold compile — the 30 s buffer
            # cap silently dropping most of it with no error anywhere.
            # (The python tier's accept LOOP likewise only runs post-
            # compile; its pre-bound listener just queues connects in the
            # OS backlog, which open_stream surfaces as a loud timeout.)
            self._ingest = None
            self._native_pending = True
            self.address = None  # bound at start()
            self._listener = None
            # slot id → (generation, open_sample): the control-plane view
            # the router needs for retiming + reuse-safe event delivery.
            self._slot_meta: Dict[int, tuple] = {}
            # Rotating assembly buffers: a tick's device_put may still be
            # reading its host array while later ticks dispatch. Dispatch
            # can run at most _max_ahead ticks past the router (see
            # _wait_dispatch_slot), and routing a serial implies its
            # fetch — hence its H2D read — completed, so a pool of
            # exactly _max_ahead buffers can never be overwritten while
            # an in-flight tick still reads one.
            self._assemble_bufs = [
                np.zeros((num_streams, chunk_size), self._h2d)
                for _ in range(self._max_ahead)
            ]
            # granted()/thresh_updates() DRAIN the C++ plane's queues, but
            # the device scrub/retune they trigger can fail transiently
            # (the tick loop contains exceptions). Drained items stay
            # here until the device call SUCCEEDS — otherwise a granted
            # slot is already activated for assembly while its lane still
            # carries the previous tenant's smoothing/debounce/threshold
            # state (silent cross-tenant leakage; r4 advisor). Tick-thread
            # private: only _tick_once_native touches these.
            self._unscrubbed_grants: List[tuple] = []
            self._unapplied_retunes: List[tuple] = []
        else:
            self._ingest = None
            self._native_pending = False
            self._listener = socket.create_server((host, port))
            self.address = self._listener.getsockname()

    # -- lifecycle -------------------------------------------------------

    def start(self) -> None:
        # Compile the tick program BEFORE accepting clients (first jit of
        # the full tick takes minutes on a cold TPU; a serving daemon must
        # not spend its first client's real-time budget compiling). The
        # warm tick uses the configured H2D dtype — the int16 tick is a
        # distinct XLA program from the f32 one.
        self._detector.collect_events(self._detector.tick_async(
            h2d_silence((self.num_streams, self.chunk_size), self._h2d)
        ))
        # Pre-warm the slot-scrub program too: its fixed-shape lane mask
        # means this is the ONLY compile it will ever need, so the first
        # real OPEN can never stall the timer loop on a cold-TPU compile.
        self._detector.reset_streams([])
        # Same for the scrub-free threshold retune (THRESH frames).
        self._detector.set_thresholds([], [])
        self._detector.reset()
        if self._native_pending:
            from .native_ingest import NativeIngest

            self._ingest = NativeIngest(
                self._host, self._port, self.num_streams, self.chunk_size,
                self._buffer_cap, num_workers=self._ingest_workers,
            )
            self.address = self._ingest.address
        self._threads = ([
            threading.Thread(target=self._accept_loop, daemon=True),
        ] if self._ingest is None else []) + [
            threading.Thread(target=self._tick_loop, daemon=True),
            threading.Thread(target=self._router_loop, daemon=True),
        ] + [
            threading.Thread(target=self._fetch_loop, daemon=True)
            for _ in range(self._delivery_workers)
        ]
        for t in self._threads:
            t.start()

    def stop(self) -> None:
        self._stop.set()
        if self._listener is not None:
            try:
                self._listener.close()
            except OSError:
                pass
        # Close every live connection: a bare listener close leaves each
        # _client_loop blocked in recv and every remote client hung with
        # no FIN — one leaked fd + two threads per connection per
        # stop/start cycle. (The native plane's stop already closes its
        # conn fds; this is the python twin of that.)
        with self._reg_lock:
            live = list(self._live_clients)
            self._live_clients.clear()
        for c in live:
            c.close()
        for t in self._threads:
            t.join(timeout=5.0)
        if self._ingest is not None:
            self._ingest.stop()

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    def _bump(self, key: str, n: int = 1) -> None:
        with self._stats_lock:
            self._stats[key] += n


    def stats(self) -> dict:
        """`ticks` counts DELIVERED ticks (events fetched + routed);
        tick_ms_* is the dispatch cost on the real-time timer thread,
        delivery_lag_ms_* the dispatch→routed pipeline latency. With the
        native backend the socket-side counters (connections, refused,
        dropped_samples, events, events_dropped, open_streams) come from
        the C++ plane."""
        if self._ingest is not None:
            native = self._ingest.stats()
            with self._stats_lock:
                out = {
                    **self._stats,
                    **native,
                    "backend": "native",
                    "ticks": self._stats["ticks"],
                    "dispatched": self._dispatched,
                    "routed": self._routed,
                }
                ticks = self._tick_times.snapshot()
                lags = self._lag_times.snapshot()
        else:
            with self._reg_lock:
                open_slots = len(self._slots)
            with self._stats_lock:
                out = {
                    **self._stats,
                    "backend": "python",
                    "open_streams": open_slots,
                    # Dispatch-side tick clock (single-writer: tick
                    # thread); dispatched minus routed is the live
                    # pipeline depth, bounded by _max_ahead.
                    "dispatched": self._dispatched,
                    "routed": self._routed,
                }
                ticks = self._tick_times.snapshot()
                lags = self._lag_times.snapshot()
        if self._last_tick_error is not None:
            out["last_tick_error"] = self._last_tick_error
        # One percentile-formatting tail for both backends: the stats
        # schema must never drift between them.
        if ticks.size:
            out["tick_ms_p50"] = round(float(np.percentile(ticks, 50)) * 1e3, 3)
            out["tick_ms_p99"] = round(float(np.percentile(ticks, 99)) * 1e3, 3)
        if lags.size:
            out["delivery_lag_ms_p50"] = round(
                float(np.percentile(lags, 50)) * 1e3, 3
            )
            out["delivery_lag_ms_p99"] = round(
                float(np.percentile(lags, 99)) * 1e3, 3
            )
        return out

    # -- network side ----------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, addr = self._listener.accept()
            except OSError:
                return  # listener closed
            self._bump("connections")
            client = _Client(sock, addr)
            with self._reg_lock:
                self._live_clients.add(client)
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
        except _ProtocolViolation as err:
            client.send(protocol.encode(protocol.ERROR, 0, str(err).encode()))
            time.sleep(0.05)  # give the writer a beat to flush the verdict
        except (ConnectionError, OSError):
            pass
        finally:
            self._release_client(client)

    def _handle(self, client: _Client, frame: protocol.Frame) -> None:
        if frame.type == protocol.OPEN:
            try:
                threshold = protocol.decode_open_threshold(frame)
            except ValueError as err:
                raise _ProtocolViolation(str(err))
            with self._reg_lock:
                if self._free:
                    slot_id = self._free.pop()
                    # open_sample is provisional: the tick thread pins it
                    # exactly when it scrubs the slot (the tick boundary
                    # where this tenant's audio stream actually begins).
                    # _dispatched is the dispatch-side tick clock — the
                    # same clock the scrub uses.
                    self._slots[slot_id] = _Slot(
                        client, self._dispatched * self.chunk_size
                    )
                    client.slots.append(slot_id)
                    self._pending_resets.append((slot_id, threshold))
                else:
                    slot_id = None
            if slot_id is None:
                self._bump("refused")
                client.send(
                    protocol.encode(protocol.ERROR, 0, b"no free stream slots")
                )
            elif not client.send(protocol.encode(protocol.OPENED, slot_id)):
                # The grant reply could not even be QUEUED (outbox
                # saturated): the client will never learn the slot id, so
                # it can never CLOSE it — release immediately or capacity
                # leaks one slot per swallowed reply.
                self._release_slot(client, slot_id)
                self._bump("refused")
        elif frame.type == protocol.AUDIO:
            slot = self._slots.get(frame.stream)
            if slot is None or slot.owner is not client:
                raise _ProtocolViolation(
                    f"AUDIO for unowned slot {frame.stream}"
                )
            if len(frame.payload) % 4:
                raise _ProtocolViolation(
                    f"AUDIO payload not float32-aligned "
                    f"({len(frame.payload)} bytes)"
                )
            samples = np.frombuffer(frame.payload, np.float32)
            dropped = slot.push(samples.copy(), self._buffer_cap)
            if dropped:
                self._bump("dropped_samples", dropped)
        elif frame.type == protocol.THRESH:
            slot = self._slots.get(frame.stream)
            if slot is None or slot.owner is not client:
                raise _ProtocolViolation(
                    f"THRESH for unowned slot {frame.stream}"
                )
            try:
                thr = protocol.decode_thresh(frame)
            except ValueError as err:
                raise _ProtocolViolation(str(err))
            with self._reg_lock:
                # Last-writer-wins per slot: retunes only apply between
                # ticks, so intermediate values were never observable —
                # and a THRESH-spamming client cannot grow this list
                # past num_streams entries.
                for i, (sid, _) in enumerate(self._pending_thresholds):
                    if sid == frame.stream:
                        self._pending_thresholds[i] = (frame.stream, thr)
                        break
                else:
                    self._pending_thresholds.append((frame.stream, thr))
        elif frame.type == protocol.CLOSE:
            self._release_slot(client, frame.stream)
        else:
            raise _ProtocolViolation(f"unexpected frame type {frame.type}")

    def _release_slot(self, client: _Client, slot_id: int) -> None:
        with self._reg_lock:
            slot = self._slots.get(slot_id)
            if slot is not None and slot.owner is client:
                del self._slots[slot_id]
                self._free.append(slot_id)
                if slot_id in client.slots:
                    client.slots.remove(slot_id)
                # Cross-tenant isolation: a queued reset or THRESH
                # retune from the departing tenant must never apply to
                # this slot's NEXT tenant (open→retune→close→reopen
                # inside one tick period would otherwise leak the old
                # sensitivity into the new stream). Purging here also
                # bounds both lists at num_streams entries.
                self._pending_resets = [
                    (sid, t) for sid, t in self._pending_resets
                    if sid != slot_id
                ]
                self._pending_thresholds = [
                    (sid, t) for sid, t in self._pending_thresholds
                    if sid != slot_id
                ]

    def _release_client(self, client: _Client) -> None:
        for slot_id in list(client.slots):
            self._release_slot(client, slot_id)
        with self._reg_lock:
            self._live_clients.discard(client)
        client.close()

    # -- device side -----------------------------------------------------

    def _ready(self) -> bool:
        return self._readiness() == 2

    def _readiness(self) -> int:
        """Tri-state eager readiness (twin: cdt_ingest_readiness):
        2 = >=1 open slot and EVERY open slot has a full chunk buffered
        (tick now); 1 = some open slot is ready while another is not
        (a live tenant is being stalled — the liveness deadline
        applies); 0 = no open slot has a full chunk (nobody is stalled;
        the eager loop must not tick — a zero-fill tick here would
        inject silence into streams whose audio is merely in flight)."""
        if self._ingest is not None:
            return self._ingest.readiness()
        with self._reg_lock:
            slots = list(self._slots.values())
        if not slots:
            return 0
        n_ready = sum(
            1 for s in slots if s.buffered >= self.chunk_size
        )
        if n_ready == 0:
            return 0
        return 2 if n_ready == len(slots) else 1

    def _tick_loop(self) -> None:
        if self._tick_policy == "eager":
            # Lockstep readiness with an ASYMMETRY-GATED liveness
            # deadline: one tenant that opens a slot and then goes
            # silent must not stall scoring for tenants that do feed
            # (isolation contract), so once readiness has been
            # asymmetric (_readiness()==1: someone has a full chunk,
            # someone else doesn't) for liveness_seconds, tick anyway —
            # the starved lanes zero-fill, exactly as under the timer
            # policy. While NO open slot has a full chunk there is
            # nobody to protect, so no deadline is armed and no tick
            # fires: an eager stream's clock freezes while no audio is
            # offered, which is what makes eager drains deterministic
            # (the r3 flake was the old unconditional deadline
            # injecting zero-fill ticks mid-stream whenever full-suite
            # CPU contention delayed frame parsing by one tick period).
            deadline = None
            while not self._stop.is_set():
                r = self._readiness()
                if r == 2:
                    self._tick_once()
                    deadline = None
                elif r == 1:
                    now = time.monotonic()
                    if deadline is None:
                        deadline = now + self._liveness_seconds
                    elif now >= deadline:
                        self._tick_once()
                        deadline = None
                    else:
                        self._stop.wait(min(0.001, deadline - now))
                else:
                    deadline = None
                    self._stop.wait(0.001)
            return
        # Timer mode: absolute deadlines, so the cadence is tick_seconds of
        # WALL time — processing time doesn't stretch the period (a fixed
        # post-tick sleep would run ~(tick+processing) and fall behind real
        # time forever). If we're more than one period late (e.g. a client
        # burst or scheduler stall), resync rather than spiral.
        next_t = time.monotonic() + self._tick_seconds
        while not self._stop.is_set():
            delay = next_t - time.monotonic()
            if delay > 0:
                if self._stop.wait(delay):
                    return
            next_t += self._tick_seconds
            if next_t < time.monotonic() - self._tick_seconds:
                next_t = time.monotonic() + self._tick_seconds
            if self._ingest is not None:
                any_open = self._ingest.stats()["open_streams"] > 0
            else:
                with self._reg_lock:
                    any_open = bool(self._slots)
            if any_open:
                self._tick_once()

    def _tick_once_native(self) -> None:
        """Native-backend tick: the C++ plane already buffered the audio;
        this thread scrubs newly granted lanes, assembles the batch with
        one ctypes call (no per-frame Python anywhere), and dispatches.

        Grants/retunes drained from the C++ queues are only CONSUMED
        after their device call succeeds: a contained scrub failure
        leaves them in the pending stash and the next tick retries
        (reset_streams/set_thresholds are idempotent), so an activated
        lane can never serve a new tenant with the previous occupant's
        smoothing history, debounce clock or threshold. A slot re-granted
        while its scrub is still pending dedups to the NEWEST tenant."""
        self._unscrubbed_grants.extend(self._ingest.granted())
        granted = self._unscrubbed_grants
        if granted:
            if len({sid for sid, _, _ in granted}) != len(granted):
                newest = {g[0]: g for g in granted}
                granted = list(newest.values())
            self._detector.reset_streams(
                [sid for sid, _, _ in granted],
                thresholds=[thr for _, _, thr in granted],
            )
            start_sample = self._dispatched * self.chunk_size
            for sid, gen, _ in granted:
                self._slot_meta[sid] = (gen, start_sample)
            self._unscrubbed_grants = []
            # A retune still pending from a FAILED earlier tick belongs
            # to the slot's previous tenant; the fresh grant's scrub
            # supersedes it (this tick's new retunes are drained below,
            # AFTER this purge, so same-tick grant+retune still resolves
            # to the retune).
            if self._unapplied_retunes:
                granted_sids = {sid for sid, _, _ in granted}
                self._unapplied_retunes = [
                    r for r in self._unapplied_retunes
                    if r[0] not in granted_sids
                ]
        self._unapplied_retunes.extend(self._ingest.thresh_updates())
        retunes = self._unapplied_retunes
        if retunes:
            # After grants: same-tick grant + retune resolve to the
            # retune. Scrub-free (detector.set_thresholds).
            self._detector.set_thresholds(
                [sid for sid, _ in retunes],
                [thr for _, thr in retunes],
            )
            self._unapplied_retunes = []
        buf = self._assemble_bufs[self._dispatched % len(self._assemble_bufs)]
        self._ingest.assemble(buf)
        # snapshot: retiming is tick-local (only this thread mutates it)
        self._dispatch_tick(buf, dict(self._slot_meta))

    def _wait_dispatch_slot(self) -> bool:
        """Block until dispatch is fewer than _max_ahead ticks ahead of
        ROUTING (rationale in __init__); False if the server stopped
        while waiting. A chronically stalled delivery pipeline parks the
        real-time timer HERE — missed cadence, visible in stats — rather
        than growing _fetched without bound."""
        with self._fetched_cond:
            while (
                self._dispatched - self._routed >= self._max_ahead
                and not self._stop.is_set()
            ):
                self._fetched_cond.wait(timeout=0.2)
        return not self._stop.is_set()

    def _dispatch_tick(self, batch, live) -> None:
        """The shared dispatch tail of both backends: time the async
        dispatch, claim the next serial, and hand the on-device events
        to the fetch pool."""
        t0 = time.perf_counter()
        events = self._detector.tick_async(batch)
        with self._stats_lock:
            self._tick_times.record(time.perf_counter() - t0)
        serial = self._dispatched
        self._dispatched += 1
        while not self._stop.is_set():
            try:
                self._inflight.put((serial, live, events, t0), timeout=0.5)
                return
            except queue.Full:
                continue  # delivery chronically behind: the timer loop
                # stalls here and the missed cadence is visible in stats
                # rather than memory growing without bound.

    def _tick_once(self) -> None:
        """Assemble + DISPATCH one device tick; never fetches. Event
        fetch/routing happens on the delivery thread one tick behind
        (see _inflight in __init__), so the real-time cadence of this
        loop is independent of host↔device round-trip latency.

        Exceptions are CONTAINED: the tick thread is the daemon's
        heartbeat, and a transient device/tunnel failure must not kill
        it silently while the accept loop keeps admitting clients — the
        error is counted (tick_dispatch_errors), surfaced in stats()
        (last_tick_error) and logged to stderr, and the loop keeps
        trying. The serial is only claimed after a successful dispatch,
        so a failed tick never wedges the in-order router."""
        if not self._wait_dispatch_slot():
            return
        try:
            if self._ingest is not None:
                self._tick_once_native()
            else:
                self._tick_once_python()
        except Exception as err:
            with self._stats_lock:
                self._stats["tick_dispatch_errors"] += 1
                self._last_tick_error = repr(err)
            print(f"serve: tick dispatch failed: {err!r}", file=sys.stderr)

    def _tick_once_python(self) -> None:
        chunk = np.zeros((self.num_streams, self.chunk_size), np.float32)
        with self._reg_lock:
            live = dict(self._slots)
            resets = self._pending_resets
            self._pending_resets = []
            retunes = self._pending_thresholds
            self._pending_thresholds = []
        # Scrub reused slots BEFORE pulling their audio: their rows still
        # hold the previous tenant's ring/history/debounce state, and this
        # thread is the only one dispatching device work (reset_streams is
        # not safe against a concurrent tick dispatch; the delivery thread
        # only reads already-materialized event arrays).
        try:
            if resets:
                self._detector.reset_streams(
                    [sid for sid, _ in resets],
                    thresholds=[thr for _, thr in resets],
                )
                start_sample = self._dispatched * self.chunk_size
                for sid, _ in resets:
                    slot = live.get(sid)
                    if slot is not None:
                        slot.open_sample = start_sample
                resets = []  # applied — failure below must not requeue
            if retunes:
                # After resets: a grant and a THRESH in the same tick
                # resolve to the retune. Scrub-free
                # (detector.set_thresholds).
                self._detector.set_thresholds(
                    [sid for sid, _ in retunes],
                    [thr for _, thr in retunes],
                )
                retunes = []
        except Exception:
            # The drain above is destructive; a contained device failure
            # must not lose the scrub/retune (same-tenant-leak hazard as
            # the native plane — r4 advisor). Requeue what was NOT applied
            # ahead of anything readers appended meanwhile; entries a
            # newer pending item supersedes are dropped.
            with self._reg_lock:
                newer_r = {sid for sid, _ in self._pending_resets}
                self._pending_resets = [
                    r for r in resets if r[0] not in newer_r
                ] + self._pending_resets
                newer_t = {sid for sid, _ in self._pending_thresholds}
                self._pending_thresholds = [
                    r for r in retunes if r[0] not in newer_t
                ] + self._pending_thresholds
            raise
        pulled = 0
        for slot_id, slot in live.items():
            pulled += min(slot.buffered, self.chunk_size)
            chunk[slot_id] = slot.pull(self.chunk_size)
        if self._h2d is np.int16:
            chunk = quantize_i16(chunk)
        elif self._h2d is np.uint8:
            chunk = quantize_mulaw(chunk)
        try:
            self._dispatch_tick(chunk, live)
        except Exception:
            # The pull above already consumed the audio; a failed dispatch
            # discards it, so account it — keeping drop totals equal to
            # the native plane's under the same transient error.
            if pulled:
                self._bump("dropped_samples", pulled)
            raise

    def _fetch_loop(self) -> None:
        """Pull one tick's events off the device (blocking round trip) —
        several of these run concurrently so round trips overlap. A
        failed fetch must still POST its serial (with no detections):
        the in-order router would otherwise wait on that serial forever
        and delivery would wedge for every client."""
        while not self._stop.is_set():
            try:
                serial, live, events, t0 = self._inflight.get(timeout=0.2)
            except queue.Empty:
                continue
            try:
                detections = self._detector.collect_events(events)
            except Exception as err:  # transient device/transfer failure
                detections = []
                self._bump("tick_errors")
                # stderr: the daemon's stdout is a machine-readable
                # JSON-lines stream (cli/serve.py supervisor contract).
                print(
                    f"serve: tick {serial} event fetch failed: {err!r}",
                    file=sys.stderr,
                )
            with self._fetched_cond:
                self._fetched[serial] = (live, detections, t0)
                self._fetched_cond.notify_all()

    def _router_loop(self) -> None:
        """Route fetched ticks to clients strictly in tick order (the
        fetch pool completes out of order)."""
        next_serial = 0
        while not self._stop.is_set():
            with self._fetched_cond:
                while (
                    next_serial not in self._fetched
                    and not self._stop.is_set()
                ):
                    self._fetched_cond.wait(timeout=0.2)
                if self._stop.is_set():
                    return
                live, detections, t_dispatch = self._fetched.pop(next_serial)
                # Claim the serial BEFORE delivering: popping it proves
                # its fetch (and H2D read) completed, which is what the
                # dispatch gate and the assembly-buffer pool wait on —
                # delivery latency must not eat into the cadence budget.
                self._routed = next_serial + 1
                self._fetched_cond.notify_all()
            try:
                self._deliver(live, detections)
            except Exception as err:  # never wedge in-order delivery
                self._bump("tick_errors")
                print(
                    f"serve: tick {next_serial} delivery failed: {err!r}",
                    file=sys.stderr,
                )
            with self._stats_lock:
                self._lag_times.record(time.perf_counter() - t_dispatch)
                self._stats["ticks"] += 1
            next_serial += 1

    def _deliver(self, live, detections) -> None:
        if self._ingest is not None:
            self._deliver_native(live, detections)
            return
        window_s = self._detector.stream_config.window_duration
        for det in detections:
            slot = live.get(det.stream)
            if slot is None:
                continue  # slot released mid-tick; stale event
            # Report time relative to the slot's own open, not server
            # uptime (both sides are exact integer sample counts).
            t_rel = det.time_seconds - slot.open_sample / self._sample_rate
            # All slots share the lockstep window clock, so a slot opened
            # mid-stream emits windows immediately — zero-padded until a
            # full window of the tenant's own audio exists. Those windows
            # scored synthetic silence, not the tenant's signal: suppress
            # them (a fresh single stream would not have emitted them).
            if t_rel < window_s - 1e-9:
                continue
            if slot.owner.send(
                protocol.encode_event(det.stream, t_rel, det.confidence)
            ):
                self._bump("events")
            else:
                self._bump("events_dropped")

    def _deliver_native(self, live, detections) -> None:
        """Route one tick's detections through the C++ plane: retime
        against each slot's open_sample (captured at tick time), suppress
        pre-open padding windows, and hand the batch to
        cdt_ingest_send_events — generation-checked there so a slot
        released or re-granted mid-flight can never receive another
        tenant's event."""
        window_s = self._detector.stream_config.window_duration
        slots, gens, times, confs = [], [], [], []
        for det in detections:
            meta = live.get(det.stream)
            if meta is None:
                continue
            gen, open_sample = meta
            t_rel = det.time_seconds - open_sample / self._sample_rate
            if t_rel < window_s - 1e-9:
                continue  # scored pre-open zero padding, not tenant audio
            slots.append(det.stream)
            gens.append(gen)
            times.append(round(t_rel, 6))
            confs.append(det.confidence)
        if slots:
            self._ingest.send_events(
                np.asarray(slots, np.int32), np.asarray(gens, np.uint32),
                np.asarray(times, np.float64), np.asarray(confs, np.float32),
            )
