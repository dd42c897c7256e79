"""Persistent XLA compilation cache for cold-start-sensitive processes.

The serving daemon's tick program and the training step take 30 s to
minutes to compile on a cold TPU runtime (the single biggest cost of a
daemon restart — `cdt-serve` deliberately delays its readiness line
until the compile finishes). JAX's persistent compilation cache stores
the serialized compiled executable keyed by (program, compiler options,
platform); with it enabled, a restarted daemon or resumed training run
skips XLA compilation entirely and loads the executable from disk.

The reference has no equivalent (torch eager has no compile step to
cache); this is TPU-native operational surface. Measured on the dev
chip: the daemon's 256-stream tick program cold start drops from
minutes to seconds on the second run (BASELINE.md).
"""

from __future__ import annotations

from pathlib import Path


def enable_compile_cache(cache_dir: str) -> str:
    """Route every subsequent XLA compile in this process through a
    persistent on-disk cache at `cache_dir` (created if missing).

    Must run before the programs it should cover are compiled; safe to
    call more than once (last directory wins). Returns the directory.
    """
    import jax

    path = Path(cache_dir).expanduser()
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    # Cache every program, not just slow-compiling ones: the daemon's
    # slot-scrub and warmup programs are small but still cost a tunnel
    # round trip + compile each restart.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return str(path)
