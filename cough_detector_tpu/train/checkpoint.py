"""Checkpointing: Orbax on-disk state + reference .pt interchange.

Preserves the reference's load-bearing contract — *the checkpoint carries
the feature config, and serving reconstructs the exact front end from it*
(reference: src/train.py:183-199, src/inference.py:89-152). Layout:

  <dir>/<name>/state/     Orbax pytree: params, batch_stats, opt_state, step
  <dir>/<name>/meta.json  {"epoch", "metrics", "config"}   (flat config dict)

Dual-write best/latest mirrors the reference (src/train.py:494-508).
`import_torch_checkpoint` ingests a real reference .pt (torch gated);
`export_torch_checkpoint` writes one back so reference tooling can consume
TPU-trained weights.
"""

from __future__ import annotations

import json
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from ..config import Config
from ..models import convert as model_convert


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


# One background writer thread serializes all non-blocking saves in
# submission order (best_model then latest_model keep their relative
# order); the queue is drained once per epoch by the train loop and at
# train() exit, so at most ~2 epoch-end writes are ever in flight.
_writer_lock = threading.Lock()
_writer: Optional[ThreadPoolExecutor] = None
_pending: List[Future] = []


def _submit(fn) -> None:
    global _writer
    with _writer_lock:
        if _writer is None:
            _writer = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="cdt-ckpt"
            )
        _pending.append(_writer.submit(fn))


def drain_pending_saves() -> None:
    """Block until every queued non-blocking save has committed; re-raise
    the first failure. Called by the train loop once per epoch (the
    previous epoch's writes have had a whole epoch to land, so this is
    normally a no-op) and before train() returns, and by load_checkpoint
    so a same-process reader can never observe a half-written tree.

    Every drained future is waited on even after one fails — otherwise a
    failed best_model write would abandon the latest_model write still
    running on the writer thread (its outcome unobserved, its error
    swallowed) while the caller unwinds."""
    with _writer_lock:
        pending, _pending[:] = _pending[:], []
    first_exc = None
    for f in pending:
        try:
            f.result()
        except BaseException as e:
            if first_exc is None:
                first_exc = e
            else:
                # A second distinct disk failure must leave a trace, not
                # vanish: attach it to the exception the caller sees.
                # (add_note is 3.11+; append to __notes__ directly so the
                # declared >=3.10 floor keeps the original error.)
                notes = getattr(first_exc, "__notes__", None)
                if notes is None:
                    notes = first_exc.__notes__ = []
                notes.append(f"additional pending-save failure: {e!r}")
    if first_exc is not None:
        raise first_exc


def save_checkpoint(
    directory: str,
    name: str,
    state: Any,
    epoch: int,
    metrics: Dict[str, float],
    config: Config,
    extra: Optional[Dict[str, Any]] = None,
    write_meta: bool = True,
    block: bool = True,
) -> str:
    """Write one named checkpoint (e.g. "best_model", "latest_model").

    Multi-host: EVERY process must call this at the same program point
    with the same global state — Orbax coordinates the primary-host
    write and runs an internal cross-process barrier, so a rank-gated
    call would leave the ranks' collective streams misaligned (observed
    as a gloo size-mismatch abort in the 2-process cluster test). Rank 0
    alone writes meta.json (`write_meta`).

    `block=False` (single-process only — a background barrier would
    interleave with the training loop's own collectives): the device
    state is snapshotted to host HERE, synchronously (the caller may
    donate those buffers to the next epoch's step the moment this
    returns), and the disk commit + meta.json run on the writer thread —
    an epoch-scan trainer overlaps its checkpoint I/O with the next
    epoch's device program instead of stalling on it. meta.json is
    written by the same job AFTER the tree commits, preserving the sync
    path's crash-ordering (a meta.json never describes an uncommitted
    tree). Failures surface at the next drain_pending_saves().
    """
    base = Path(directory) / name
    base.mkdir(parents=True, exist_ok=True)

    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }

    meta = None
    if write_meta:
        meta = {
            "epoch": int(epoch),
            "metrics": {k: float(v) for k, v in metrics.items()},
            # Flat dict: reference .pt key compatibility. Full nested
            # config: OUR source of truth — carries StreamConfig,
            # compute_dtype, dropout and everything else the flat form
            # cannot express, so serving reconstructs the complete setup
            # from the checkpoint alone.
            "config": config.to_flat_dict(),
            "config_full": json.loads(config.to_json()),
        }
        if extra:
            # Loop-side state that isn't part of the optimizer pytree but
            # is needed for an exact resume (early-stopping counters).
            meta["extra"] = extra

    def commit(t) -> None:
        ckptr = _checkpointer()
        ckptr.save((base / "state").absolute(), t, force=True)
        ckptr.wait_until_finished()  # StandardCheckpointer commits async
        if meta is not None:
            (base / "meta.json").write_text(json.dumps(meta, indent=2))

    if block or jax.process_count() > 1:
        commit(tree)
    else:
        host_tree = jax.device_get(tree)
        _submit(lambda: commit(host_tree))
    return str(base)


def load_checkpoint(
    path: str, state_template: Optional[Any] = None
) -> Tuple[Dict[str, Any], int, Dict[str, float], Config]:
    """Restore (tree, epoch, metrics, config). With a state template the
    tree is restored with matching shardings/dtypes; otherwise raw."""
    drain_pending_saves()  # never read a tree a writer job is committing
    base = Path(path)
    meta = json.loads((base / "meta.json").read_text())

    ckptr = _checkpointer()
    if state_template is not None:
        template = {
            "params": state_template.params,
            "batch_stats": state_template.batch_stats,
            "opt_state": state_template.opt_state,
            "step": state_template.step,
        }
        tree = ckptr.restore((base / "state").absolute(), target=template)
    else:
        tree = ckptr.restore((base / "state").absolute())

    if "config_full" in meta:
        config = Config.from_json(json.dumps(meta["config_full"]))
    else:  # older checkpoints carry only the reference-compatible flat dict
        config = Config.from_flat_dict(meta["config"])
    return tree, meta["epoch"], meta["metrics"], config


def restore_into_state(state: Any, tree: Dict[str, Any]) -> Any:
    return state.replace(
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        step=tree["step"],
    )


# ---------------------------------------------------------------------------
# Reference .pt interchange
# ---------------------------------------------------------------------------


def import_torch_checkpoint(path: str):
    """Read a reference checkpoint
    ({epoch, model_state_dict, optimizer_state_dict, metrics, config},
    reference: src/train.py:192-199) → (variables, config, epoch, metrics).
    """
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "Importing .pt checkpoints requires torch on the host."
        ) from e

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    flat = ckpt.get("config", {})
    config = Config.from_flat_dict(flat)
    variables = model_convert.torch_state_dict_to_variables(
        ckpt["model_state_dict"], config.model.model_type
    )
    return variables, config, ckpt.get("epoch", 0), ckpt.get("metrics", {})


def export_torch_checkpoint(
    path: str,
    variables: Dict[str, Any],
    config: Config,
    epoch: int = 0,
    metrics: Optional[Dict[str, float]] = None,
) -> None:
    """Write TPU-trained weights in the reference's .pt layout so
    `run_detection.py --model` and friends can consume them."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "Exporting .pt checkpoints requires torch on the host."
        ) from e

    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    sd = model_convert.variables_to_torch_state_dict(
        host_vars, config.model.model_type
    )
    torch.save(
        {
            "epoch": int(epoch),
            "model_state_dict": {k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
            "optimizer_state_dict": {},
            "metrics": metrics or {},
            "config": config.to_flat_dict(),
        },
        path,
    )
