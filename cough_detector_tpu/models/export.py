"""Compiled-serving export — the XLA equivalent of the reference's
TorchScript trace (reference: src/model.py:324-329, never wired into any
script there; here it is a first-class serving artifact).

`aot_compile` lowers and compiles the full serving function (features +
classifier) ahead of time for a fixed batch shape; `export_serialized`
persists the compiled executable so a server process can skip tracing.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops import frontend


def make_serving_fn(model, variables, config: Config) -> Callable:
    """(B, segment_samples) waveforms → (B, 2) probabilities, one program."""
    fcfg = config.features

    def serve(waves: jnp.ndarray) -> jnp.ndarray:
        waves = frontend.peak_normalize(waves)
        feats = frontend.extract_features_fast(waves, fcfg)
        logits = model.apply(variables, feats, train=False)
        return jax.nn.softmax(logits, axis=-1)

    return serve


def aot_compile(
    fn: Callable, batch_size: int, segment_samples: int = 16000
):
    """Ahead-of-time compile for a fixed input geometry."""
    shape = jax.ShapeDtypeStruct((batch_size, segment_samples), jnp.float32)
    return jax.jit(fn).lower(shape).compile()


def export_serialized(
    compiled, path: str
) -> Optional[str]:
    """Serialize a compiled executable (jax.export) for trace-free loading.

    Returns the written path, or None when the backend doesn't support
    serialization (the caller can always re-AOT-compile at startup).
    """
    try:
        from jax import export as jax_export  # noqa: F401

        serialized = compiled.serialize()  # type: ignore[attr-defined]
    except Exception:
        return None
    Path(path).write_bytes(serialized)
    return path


def export_stablehlo(
    model, variables, config: Config, batch_size: int
) -> str:
    """StableHLO text of the full serving program — the portable compiled
    artifact (torchscript analogue) reviewable/consumable by other
    runtimes."""
    serve = make_serving_fn(model, variables, config)
    shape = jax.ShapeDtypeStruct(
        (batch_size, config.features.segment_samples), jnp.float32
    )
    lowered = jax.jit(serve).lower(shape)
    return lowered.as_text()
