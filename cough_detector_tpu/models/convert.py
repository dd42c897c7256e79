"""Reference-checkpoint ingestion: torch state dict → Flax variables.

The reference persists `{epoch, model_state_dict, optimizer_state_dict,
metrics, config}` via torch.save (reference: src/train.py:183-199) and
serving rebuilds model + preprocessor from it
(reference: src/inference.py:119-163). This module maps those state dicts —
for all three architectures — onto our Flax parameter/batch-stats pytrees so
reference-trained weights can be served on TPU and logits-parity can be
tested against a pinned PyTorch run.

Weight layout translation:
  conv   (O, I, kH, kW) → (kH, kW, I, O)
  linear (O, I)         → (I, O)
  batchnorm weight/bias → scale/bias params; running stats → batch_stats.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

# torch-module-prefix → flax-module-path tables, one per architecture.
# Torch prefixes follow the reference's nn.Sequential indices
# (reference: src/model.py:92-103,161-196,227-247).

_RESIDUAL_CONVS = {
    "conv1.0": "stem_conv",
    "res_blocks.0.conv1": "res0/conv1",
    "res_blocks.0.conv2": "res0/conv2",
    "res_blocks.0.skip.0": "res0/skip_conv",
    "res_blocks.1.conv1": "res1/conv1",
    "res_blocks.1.conv2": "res1/conv2",
    "res_blocks.1.skip.0": "res1/skip_conv",
}
_RESIDUAL_BNS = {
    "conv1.1": "stem_bn",
    "res_blocks.0.bn1": "res0/bn1",
    "res_blocks.0.bn2": "res0/bn2",
    "res_blocks.0.skip.1": "res0/skip_bn",
    "res_blocks.1.bn1": "res1/bn1",
    "res_blocks.1.bn2": "res1/bn2",
    "res_blocks.1.skip.1": "res1/skip_bn",
}
_RESIDUAL_LINEARS = {"fc.2": "fc"}

_STANDARD_CONVS = {f"conv_layers.{i}.conv": f"block{i}/conv" for i in range(4)}
_STANDARD_BNS = {f"conv_layers.{i}.bn": f"block{i}/bn" for i in range(4)}
_STANDARD_LINEARS = {"fc.0": "fc1", "fc.3": "fc2"}

_SMALL_CONVS = {
    "features.0": "stem_conv",
    "features.4": "sep1/dw",
    "features.5": "sep1/pw",
    "features.9": "sep2/dw",
    "features.10": "sep2/pw",
    "features.14": "sep3/dw",
    "features.15": "sep3/pw",
}
_SMALL_BNS = {
    "features.1": "stem_bn",
    "features.6": "sep1/bn",
    "features.11": "sep2/bn",
    "features.16": "sep3/bn",
}
_SMALL_LINEARS = {"classifier.1": "fc1", "classifier.4": "fc2"}

_TABLES = {
    "residual": (_RESIDUAL_CONVS, _RESIDUAL_BNS, _RESIDUAL_LINEARS),
    "standard": (_STANDARD_CONVS, _STANDARD_BNS, _STANDARD_LINEARS),
    "small": (_SMALL_CONVS, _SMALL_BNS, _SMALL_LINEARS),
}


def _set(tree: Dict[str, Any], path: str, leaf: str, value: np.ndarray):
    node = tree
    for part in path.split("/"):
        node = node.setdefault(part, {})
    node[leaf] = value


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    # Copy: torch's .numpy() aliases the tensor's storage, and reference
    # checkpoints get mutated in place by BN during any further torch use.
    return np.array(x, dtype=np.float32, copy=True)


def torch_state_dict_to_variables(
    state_dict: Mapping[str, Any], model_type: str
) -> Dict[str, Any]:
    """Map a reference model_state_dict onto {"params", "batch_stats"}.

    Accepts torch tensors or numpy arrays as values. Raises KeyError on any
    missing expected weight — a mis-shaped checkpoint must fail loudly, per
    the reference's own silent-failure postmortem
    (reference: IMPROVEMENT_PLAN.md:13-29).
    """
    if model_type not in _TABLES:
        raise ValueError(f"Unknown model type: {model_type}")
    convs, bns, linears = _TABLES[model_type]

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for tkey, fpath in convs.items():
        w = _np(state_dict[f"{tkey}.weight"]).transpose(2, 3, 1, 0)
        _set(params, fpath, "kernel", w)
        _set(params, fpath, "bias", _np(state_dict[f"{tkey}.bias"]))

    for tkey, fpath in bns.items():
        _set(params, fpath, "scale", _np(state_dict[f"{tkey}.weight"]))
        _set(params, fpath, "bias", _np(state_dict[f"{tkey}.bias"]))
        _set(stats, fpath, "mean", _np(state_dict[f"{tkey}.running_mean"]))
        _set(stats, fpath, "var", _np(state_dict[f"{tkey}.running_var"]))

    for tkey, fpath in linears.items():
        w = _np(state_dict[f"{tkey}.weight"]).T
        _set(params, fpath, "kernel", w)
        _set(params, fpath, "bias", _np(state_dict[f"{tkey}.bias"]))

    return {"params": params, "batch_stats": stats}


def variables_to_torch_state_dict(
    variables: Mapping[str, Any], model_type: str
) -> Dict[str, np.ndarray]:
    """Inverse mapping, for exporting TPU-trained weights back to the
    reference's .pt layout."""
    convs, bns, linears = _TABLES[model_type]

    def _get(tree, path: str, leaf: str) -> np.ndarray:
        node = tree
        for part in path.split("/"):
            node = node[part]
        return np.asarray(node[leaf])

    out: Dict[str, np.ndarray] = {}
    params, stats = variables["params"], variables["batch_stats"]
    for tkey, fpath in convs.items():
        out[f"{tkey}.weight"] = _get(params, fpath, "kernel").transpose(3, 2, 0, 1)
        out[f"{tkey}.bias"] = _get(params, fpath, "bias")
    for tkey, fpath in bns.items():
        out[f"{tkey}.weight"] = _get(params, fpath, "scale")
        out[f"{tkey}.bias"] = _get(params, fpath, "bias")
        out[f"{tkey}.running_mean"] = _get(stats, fpath, "mean")
        out[f"{tkey}.running_var"] = _get(stats, fpath, "var")
    for tkey, fpath in linears.items():
        out[f"{tkey}.weight"] = _get(params, fpath, "kernel").T
        out[f"{tkey}.bias"] = _get(params, fpath, "bias")
    return out
