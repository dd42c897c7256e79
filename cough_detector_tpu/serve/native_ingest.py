"""ctypes bindings for the native (C++) serving socket plane.

`native/cdt_ingest.cpp` owns the daemon's entire socket tier — accept,
framing, slot allocation, per-slot ring buffers, event encode/writeback
— in one epoll thread, no Python (and no GIL) in the per-frame path.
The Python server keeps the device plane and calls: `granted()` at each
tick start (new tenants to scrub), `assemble()` to fill the (S, chunk)
batch, and `send_events()` from the delivery router. Built on demand
with g++, same pattern as data/native_loader.py; `available()` is False
without a toolchain and the server falls back to the pure-Python socket
tier (same wire protocol, lower ceiling — BASELINE.md daemon table).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "cdt_ingest.cpp"
_LIB = _NATIVE_DIR / "libcdt_ingest.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[Path]:
    # Staleness policy and compiler invocation live in ONE place
    # (utils/native_build.py), shared with the data loader and the
    # bench load generator.
    from ..utils.native_build import build_native

    return build_native(_SRC, _LIB)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _SRC.exists() or _build() is None:
            _build_failed = True
            print("native ingest build failed; python socket tier in use")
            return None
        try:
            lib = _bind(ctypes.CDLL(str(_LIB)))
        except (OSError, AttributeError) as err:
            # A stale/foreign-platform/truncated .so must DEGRADE to the
            # python socket tier (the documented auto-backend contract),
            # not crash DetectionServer construction.
            _build_failed = True
            print(f"native ingest load failed ({err}); "
                  "python socket tier in use")
            return None
        _lib = lib
        return lib


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.cdt_ingest_start.restype = ctypes.c_void_p
    lib.cdt_ingest_start.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_long, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.cdt_ingest_port.restype = ctypes.c_int
    lib.cdt_ingest_port.argtypes = [ctypes.c_void_p]
    lib.cdt_ingest_granted.restype = ctypes.c_int
    lib.cdt_ingest_granted.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_uint),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.cdt_ingest_thresh_updates.restype = ctypes.c_int
    lib.cdt_ingest_thresh_updates.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.cdt_ingest_assemble.restype = ctypes.c_int
    lib.cdt_ingest_assemble.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
    ]
    lib.cdt_ingest_assemble_i16.restype = ctypes.c_int
    lib.cdt_ingest_assemble_i16.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_short),
    ]
    lib.cdt_ingest_assemble_u8.restype = ctypes.c_int
    lib.cdt_ingest_assemble_u8.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte),
    ]
    lib.cdt_ingest_ready.restype = ctypes.c_int
    lib.cdt_ingest_ready.argtypes = [ctypes.c_void_p]
    lib.cdt_ingest_readiness.restype = ctypes.c_int
    lib.cdt_ingest_readiness.argtypes = [ctypes.c_void_p]
    lib.cdt_ingest_send_events.restype = None
    lib.cdt_ingest_send_events.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_uint),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.cdt_ingest_stats.restype = None
    lib.cdt_ingest_stats.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_longlong),
        ctypes.c_int,
    ]
    lib.cdt_ingest_stop.restype = None
    lib.cdt_ingest_stop.argtypes = [ctypes.c_void_p]
    return lib


def available() -> bool:
    return _load() is not None


class NativeIngest:
    """One native socket plane instance (see module docstring)."""

    def __init__(
        self,
        host: str,
        port: int,
        num_streams: int,
        chunk: int,
        buffer_cap: int,
        num_workers: int = 1,
    ):
        """num_workers: I/O (epoll) threads in the C++ plane. Connections
        partition across workers round-robin at accept; the slot registry
        is shared, so assemble()/granted()/send_events semantics are
        identical at any worker count. Default 1 — right for this
        one-core dev host; raise on multi-core production hosts where
        frame parsing outruns a single core (BASELINE.md daemon table)."""
        lib = _load()
        if lib is None:
            raise RuntimeError("native ingest unavailable (no toolchain?)")
        self._lib = lib
        # The C plane binds with inet_pton (numeric IPv4 only): resolve
        # names like "localhost" here so every --host the python tier
        # accepts works identically under backend=native.
        import socket as socketlib

        try:
            host_ip = socketlib.getaddrinfo(
                host, None, socketlib.AF_INET
            )[0][4][0]
        except socketlib.gaierror as err:
            raise OSError(f"cannot resolve host {host!r}: {err}") from err
        errbuf = ctypes.create_string_buffer(256)
        self._h = lib.cdt_ingest_start(
            host_ip.encode(), port, num_streams, chunk, buffer_cap,
            int(num_workers), errbuf, len(errbuf),
        )
        if not self._h:
            raise OSError(
                f"native ingest start failed: "
                f"{errbuf.value.decode(errors='replace')}"
            )
        self.num_streams = num_streams
        self.chunk = chunk
        self.address = (host, int(lib.cdt_ingest_port(self._h)))
        self._granted_ids = np.empty(num_streams, np.int32)
        self._granted_gens = np.empty(num_streams, np.uint32)
        self._granted_thrs = np.empty(num_streams, np.float32)
        self._final_stats: Optional[dict] = None
        # Serializes every ctypes call against stop(): the `_h is None`
        # guards alone are TOCTOU — a concurrent stop() (e.g. a /stats
        # scrape racing daemon shutdown) could free the C++ Server
        # between the check and the call, handing the C ABI a NULL or
        # dangling pointer (segfault). assemble() is on the tick hot
        # path; an uncontended mutex acquire is ~100 ns.
        self._call_lock = threading.RLock()

    def granted(self) -> List[Tuple[int, int, Optional[float]]]:
        """(slot, generation, threshold) triples granted since the last
        call — threshold is the tenant's own confidence threshold from
        its OPEN frame, or None for the server default. Calling this
        ACTIVATES the slots for assembly — scrub the device lanes before
        the tick that follows."""
        with self._call_lock:
            return self._granted_locked()

    def _granted_locked(self) -> List[Tuple[int, int, Optional[float]]]:
        if self._h is None:
            return []
        n = self._lib.cdt_ingest_granted(
            self._h,
            self._granted_ids.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int)
            ),
            self._granted_gens.ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint)
            ),
            self._granted_thrs.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)
            ),
            self.num_streams,
        )
        return [
            (
                int(self._granted_ids[i]),
                int(self._granted_gens[i]),
                None
                if np.isnan(self._granted_thrs[i])
                else float(self._granted_thrs[i]),
            )
            for i in range(n)
        ]

    def thresh_updates(self) -> List[Tuple[int, float]]:
        """(slot, threshold) mid-stream THRESH retunes since the last
        call — apply AFTER this tick's grants (a grant and a retune in
        the same tick resolve to the retune), scrub-free."""
        with self._call_lock:
            if self._h is None:
                return []
            n = self._lib.cdt_ingest_thresh_updates(
                self._h,
                self._granted_ids.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int)
                ),
                self._granted_thrs.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)
                ),
                self.num_streams,
            )
            return [
                (int(self._granted_ids[i]), float(self._granted_thrs[i]))
                for i in range(n)
            ]

    def assemble(self, dst: np.ndarray) -> int:
        """Fill dst (num_streams, chunk) with one tick of audio
        (silence-filled underruns); returns the open-slot count. dst may
        be f32 (exact samples), int16 (quantize-on-assemble in C++ — the
        half-bandwidth H2D format; convention matches serve.quantize_i16
        and the in-jit dequant in stream/ring.py) or uint8 (8-bit μ-law
        compand-on-assemble, quarter bandwidth; twin of
        serve.quantize_mulaw; silence is code 128)."""
        assert dst.shape == (self.num_streams, self.chunk)
        assert dst.dtype in (np.float32, np.int16, np.uint8)
        assert dst.flags.c_contiguous
        with self._call_lock:
            return self._assemble_locked(dst)

    def _assemble_locked(self, dst: np.ndarray) -> int:
        if self._h is None:
            dst[:] = 128 if dst.dtype == np.uint8 else 0
            return 0
        if dst.dtype == np.int16:
            return int(self._lib.cdt_ingest_assemble_i16(
                self._h,
                dst.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            ))
        if dst.dtype == np.uint8:
            return int(self._lib.cdt_ingest_assemble_u8(
                self._h,
                dst.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            ))
        return int(self._lib.cdt_ingest_assemble(
            self._h,
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ))

    def ready(self) -> bool:
        """Eager-tick predicate: ≥1 open slot and every open slot has a
        full chunk buffered (pending slots included — the next tick
        activates them before assembling). Twin of the python tier's
        _ready()."""
        with self._call_lock:
            if self._h is None:
                return False
            return bool(self._lib.cdt_ingest_ready(self._h))

    def readiness(self) -> int:
        """Tri-state eager readiness (cdt_ingest_readiness), the C++
        twin of the python tier's _readiness(): 2 = every open slot has
        a full chunk (tick now); 1 = some ready, some starved (the
        liveness deadline applies); 0 = no open slot has a full chunk
        (nobody is stalled — the eager loop must not tick)."""
        with self._call_lock:
            if self._h is None:
                return 0
            return int(self._lib.cdt_ingest_readiness(self._h))

    def send_events(
        self,
        slots: np.ndarray,
        gens: np.ndarray,
        times: np.ndarray,
        confs: np.ndarray,
    ) -> None:
        n = len(slots)
        if n == 0:
            return
        with self._call_lock:
            if self._h is None:
                return
            self._send_events_locked(slots, gens, times, confs, n)

    def _send_events_locked(self, slots, gens, times, confs, n) -> None:
        slots = np.ascontiguousarray(slots, np.int32)
        gens = np.ascontiguousarray(gens, np.uint32)
        times = np.ascontiguousarray(times, np.float64)
        confs = np.ascontiguousarray(confs, np.float32)
        self._lib.cdt_ingest_send_events(
            self._h, n,
            slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            gens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint)),
            times.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            confs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )

    def stats(self) -> dict:
        with self._call_lock:
            return self._stats_locked()

    def _stats_locked(self) -> dict:
        if self._h is None:
            # Post-stop callers (final CLI stats line) get the snapshot
            # taken at stop — never a NULL handle into the C ABI.
            return dict(self._final_stats or {
                "connections": 0, "refused": 0, "dropped_samples": 0,
                "events": 0, "events_dropped": 0, "open_streams": 0,
            })
        out = (ctypes.c_longlong * 6)()
        self._lib.cdt_ingest_stats(self._h, out, 6)
        return {
            "connections": int(out[0]),
            "refused": int(out[1]),
            "dropped_samples": int(out[2]),
            "events": int(out[3]),
            "events_dropped": int(out[4]),
            "open_streams": int(out[5]),
        }

    def stop(self) -> None:
        with self._call_lock:  # RLock: _stats_locked reenters fine
            if self._h:
                self._final_stats = self._stats_locked()
                self._lib.cdt_ingest_stop(self._h)
                self._h = None
