"""ctypes bindings for the native (C++) batch loader.

The shared library is built on demand from native/cdt_loader.cpp with g++
(cached beside the source); everything falls back to the pure-Python loader
when a toolchain isn't available, so the native tier is a pure accelerant —
same numerics, same quarantine semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "cdt_loader.cpp"
_LIB = _NATIVE_DIR / "libcdt_loader.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[Path]:
    # Staleness policy and compiler invocation live in ONE place
    # (utils/native_build.py), shared with the serving plane and the
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
        if not _SRC.exists():
            _build_failed = True
            print("native loader source missing; using the python decode path")
            return None
        path = _build()
        if path is None:
            _build_failed = True
            # One loud line, once: silent degradation hides a 'why is ingest
            # slow' problem (quarantine-with-counts spirit, docs/PARITY.md).
            print("native loader build failed; using the python decode path")
            return None
        lib = ctypes.CDLL(str(path))
        lib.cdt_load_batch_shifted.restype = ctypes.c_int
        lib.cdt_load_batch_shifted.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_long, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.cdt_load_clip.restype = ctypes.c_long
        lib.cdt_load_clip.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.c_char_p, ctypes.c_int,
        ]
        _lib = lib
        return lib


def available() -> bool:
    return _load() is not None


def load_batch(
    paths: Sequence[str],
    segment_samples: int,
    target_sr: int = 16000,
    n_threads: int = 8,
    shift_fracs: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, int, str]:
    """Decode+resample+center-fit a batch of WAV paths natively.

    Returns (waves (N, segment) float32, n_ok, error_summary). Failed clips
    are zero rows with their errors reported — quarantine-with-count, per
    the reference postmortem rule (reference: IMPROVEMENT_PLAN.md:13-29).
    shift_fracs (optional, per clip) displaces each crop window by
    round(frac * clip_len) samples — the crop-time time-shift augmentation,
    same semantics as datasets._crop_window.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (no toolchain?)")

    n = len(paths)
    out = np.zeros((n, segment_samples), np.float32)
    c_paths = (ctypes.c_char_p * n)(
        *[str(p).encode() for p in paths]
    )
    errbuf = ctypes.create_string_buffer(4096)
    if shift_fracs is not None:
        fr = np.ascontiguousarray(shift_fracs, dtype=np.float64)
        fr_ptr = fr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    else:
        fr_ptr = ctypes.POINTER(ctypes.c_double)()
    n_ok = lib.cdt_load_batch_shifted(
        c_paths, n, target_sr, segment_samples, fr_ptr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads, errbuf, len(errbuf),
    )
    return out, int(n_ok), errbuf.value.decode(errors="replace")


def load_clip(
    path: str, target_sr: int = 16000, max_seconds: float = 600.0
) -> np.ndarray:
    """Decode+resample one WAV to mono float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (no toolchain?)")
    cap = int(target_sr * max_seconds)
    out = np.empty(cap, np.float32)
    errbuf = ctypes.create_string_buffer(1024)
    n = lib.cdt_load_clip(
        str(path).encode(), target_sr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap, errbuf, len(errbuf),
    )
    if n < 0:
        from .audio_io import AudioDecodeError

        raise AudioDecodeError(errbuf.value.decode(errors="replace"))
    return out[:n].copy()
