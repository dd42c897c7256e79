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
    """Persist an AOT-compiled executable for trace-free loading
    (`jax.experimental.serialize_executable`) — payload plus the in/out
    pytree defs `deserialize_and_load` needs, in one pickle.

    Returns the written path, or None when the backend/executable doesn't
    support serialization (the caller can always re-AOT-compile at
    startup). Load with `load_serialized`.
    """
    import pickle

    from jax.experimental import serialize_executable

    try:
        payload, in_tree, out_tree = serialize_executable.serialize(compiled)
        n_devices = len(compiled.runtime_executable().local_devices())
    except Exception:
        return None  # backend without executable serialization
    Path(path).write_bytes(
        pickle.dumps(
            {
                "payload": payload,
                "in_tree": in_tree,
                "out_tree": out_tree,
                "n_devices": n_devices,
            }
        )
    )
    return path


def load_serialized(path: str, devices=None):
    """Reload an `export_serialized` artifact as a callable compiled
    executable (same jaxlib + compatible device topology required).

    TRUST REQUIREMENT: the artifact is a pickle (the tree-defs inside
    a serialized executable are not plain JSON), and unpickling executes
    arbitrary code from the file — load ONLY artifacts from a trusted
    producer, exactly the trust level of a model checkpoint. Do not point
    this at downloaded or user-supplied blobs.

    `devices` defaults to the first N of `jax.devices()`, N as recorded
    at export — without this, deserialize_and_load spreads the program
    over EVERY visible device and a single-device serving executable then
    rejects its own unsharded inputs on multi-device hosts."""
    import pickle

    from jax.experimental import serialize_executable

    blob = pickle.loads(Path(path).read_bytes())
    if devices is None:
        n = blob.get("n_devices", 1)
        devices = jax.devices()[:n]
        if len(devices) < n:
            raise ValueError(
                f"artifact was compiled for {n} devices; "
                f"only {len(devices)} visible"
            )
    return serialize_executable.deserialize_and_load(
        blob["payload"], blob["in_tree"], blob["out_tree"],
        execution_devices=devices,
    )


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
