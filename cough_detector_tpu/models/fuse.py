"""Inference-time conv+BatchNorm folding.

For eval-mode serving every Conv→BN pair collapses into a single conv with
rescaled weights:  W' = W·k,  b' = (b − μ)·k + β,  k = γ/√(σ²+ε).
This removes all BN work from the serving graph (the XLA equivalent of the
fused conv-BN-ReLU the north star asks for) with bit-identical structure to
what the training graph computes in eval mode (up to one f32 rounding).

Folding operates on the variables pytree; the folded model is the same
architecture with identity BNs (scale=1, bias=0, mean=0, var=1-ε adjusted),
so no second module definition is needed.
"""

from __future__ import annotations

import copy
from typing import Any, Dict

import numpy as np

_EPS = 1e-5

# conv-path → bn-path pairs per architecture (module names from
# models/classifiers.py).
_PAIRS = {
    "residual": [
        ("stem_conv", "stem_bn"),
        ("res0/conv1", "res0/bn1"),
        ("res0/conv2", "res0/bn2"),
        ("res0/skip_conv", "res0/skip_bn"),
        ("res1/conv1", "res1/bn1"),
        ("res1/conv2", "res1/bn2"),
        ("res1/skip_conv", "res1/skip_bn"),
    ],
    "standard": [(f"block{i}/conv", f"block{i}/bn") for i in range(4)],
    "small": [
        ("stem_conv", "stem_bn"),
        ("sep1/pw", "sep1/bn"),
        ("sep2/pw", "sep2/bn"),
        ("sep3/pw", "sep3/bn"),
    ],
}


def _get(tree: Dict[str, Any], path: str) -> Dict[str, Any]:
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def fold_batchnorm(variables: Dict[str, Any], model_type: str) -> Dict[str, Any]:
    """Return a new variables pytree with BN folded into the preceding conv
    and every folded BN turned into an identity."""
    if model_type not in _PAIRS:
        raise ValueError(f"Unknown model type: {model_type}")

    out = copy.deepcopy(
        {
            "params": jax_tree_to_numpy(variables["params"]),
            "batch_stats": jax_tree_to_numpy(variables["batch_stats"]),
        }
    )
    params, stats = out["params"], out["batch_stats"]

    for conv_path, bn_path in _PAIRS[model_type]:
        conv = _get(params, conv_path)
        bn_p = _get(params, bn_path)
        bn_s = _get(stats, bn_path)

        k = bn_p["scale"] / np.sqrt(bn_s["var"] + _EPS)
        conv["kernel"] = (conv["kernel"] * k).astype(np.float32)
        conv["bias"] = (
            (conv["bias"] - bn_s["mean"]) * k + bn_p["bias"]
        ).astype(np.float32)

        bn_p["scale"] = np.ones_like(bn_p["scale"])
        bn_p["bias"] = np.zeros_like(bn_p["bias"])
        bn_s["mean"] = np.zeros_like(bn_s["mean"])
        # var such that 1/sqrt(var+eps) == 1 exactly.
        bn_s["var"] = np.full_like(bn_s["var"], 1.0 - _EPS)

    return out


def jax_tree_to_numpy(tree: Any) -> Any:
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
