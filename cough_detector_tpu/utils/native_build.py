"""Build-if-stale for the in-repo C++ components — the ONE owner of the
staleness policy and compiler invocation shared by the data loader
(`data/native_loader.py`), the serving socket plane
(`serve/native_ingest.py`) and the bench load generator
(`bench._ensure_loadgen`), so a future change (flags, error surfacing,
content-hash staleness) cannot silently miss a copy.

Policy: rebuild unless the artifact is STRICTLY newer than its source —
equal mtimes (fresh checkout, copied tree, archive extraction,
mtime-preserving sync) may hide a stale or foreign-platform binary, and
a rebuild costs seconds once.
"""

from __future__ import annotations

import subprocess
from pathlib import Path
from typing import Optional

_SHARED_FLAGS = ("-O3", "-fPIC", "-shared", "-pthread", "-std=c++17")
_BINARY_FLAGS = ("-O2", "-pthread", "-std=c++17")


def build_native(
    src, out, *, shared: bool = True, timeout: float = 120.0
) -> Optional[Path]:
    """Compile `src` to `out` (a shared library, or a standalone binary
    with shared=False) when missing or stale. Returns the artifact path,
    or None when the toolchain is unavailable or the compile fails —
    callers degrade to their Python tier (and say so, once)."""
    src, out = Path(src), Path(out)
    if not src.exists():
        return None
    if out.exists() and out.stat().st_mtime > src.stat().st_mtime:
        return out
    flags = _SHARED_FLAGS if shared else _BINARY_FLAGS
    try:
        subprocess.run(
            ["g++", *flags, "-o", str(out), str(src)],
            check=True, capture_output=True, timeout=timeout,
        )
        return out
    except (OSError, subprocess.SubprocessError):
        return None
