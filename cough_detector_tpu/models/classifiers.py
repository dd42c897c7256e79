"""The three cough-classifier architectures, in Flax.

Capability-parity rebuild of the reference model family
(reference: src/model.py:43-316): "standard" (plain CNN), "small"
(depthwise-separable, realtime), "residual" (the shipped production model,
reference: train_with_data.py:52). All are shape-agnostic past the stem
thanks to global average pooling, exactly like the reference
(reference: src/model.py:95,187,242).

Inputs are feature images (B, n_features, time) — a channel axis is added
internally (NHWC). `predict` mirrors the reference's softmax+argmax helper
(reference: src/model.py:127-140).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    BatchNorm,
    ConvBlock,
    ResidualBlock,
    SeparableBlock,
    global_avg_pool,
    mxu_precision,
)

Dtype = Any


def _as_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) → (B, H, W, 1); (B, 1, H, W) NCHW also accepted."""
    if x.ndim == 3:
        return x[..., None]
    if x.ndim == 4 and x.shape[1] == 1:
        return jnp.transpose(x, (0, 2, 3, 1))
    if x.ndim == 4 and x.shape[-1] == 1:
        return x
    raise ValueError(f"Expected (B,H,W) or single-channel 4-D input, got {x.shape}")


class CoughDetector(nn.Module):
    """Plain CNN: 4 ConvBlocks → GAP → FC(→128) → ReLU → Dropout → FC(→2).

    Reference: src/model.py:43-140. 421,954 parameters.
    """

    num_classes: int = 2
    channels: Sequence[int] = (32, 64, 128, 256)
    fc_hidden: int = 128
    dropout: float = 0.5
    dtype: Dtype = jnp.float32
    precision_mode: str = "high"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        x = _as_nhwc(x).astype(self.dtype)
        for i, ch in enumerate(self.channels):
            x = ConvBlock(
                ch, dtype=self.dtype, prec_mode=self.precision_mode,
                name=f"block{i}",
            )(x, train, mask)
        x = global_avg_pool(x)
        # The head is the parity-dominant site (mxu_precision docstring)
        # and a negligible share of the FLOPs: always HIGH.
        x = nn.Dense(
            self.fc_hidden, dtype=self.dtype,
            precision=mxu_precision(self.dtype, sensitive=True), name="fc1",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(
            self.num_classes, dtype=self.dtype,
            precision=mxu_precision(self.dtype, sensitive=True), name="fc2",
        )(x)
        return x.astype(jnp.float32)


class CoughDetectorSmall(nn.Module):
    """Lightweight depthwise-separable CNN for realtime inference.

    Reference: src/model.py:143-207. 21,122 parameters.
    """

    num_classes: int = 2
    dtype: Dtype = jnp.float32
    precision_mode: str = "high"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        pm = self.precision_mode
        x = _as_nhwc(x).astype(self.dtype)
        x = nn.Conv(
            16, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            precision=mxu_precision(self.dtype, pm), name="stem_conv",
        )(x)
        x = BatchNorm(dtype=self.dtype, name="stem_bn")(x, train, mask)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = SeparableBlock(32, pool=True, dtype=self.dtype, prec_mode=pm, name="sep1")(x, train, mask)
        x = SeparableBlock(64, pool=True, dtype=self.dtype, prec_mode=pm, name="sep2")(x, train, mask)
        x = SeparableBlock(128, pool=False, dtype=self.dtype, prec_mode=pm, name="sep3")(x, train, mask)

        x = global_avg_pool(x)
        x = nn.Dense(
            64, dtype=self.dtype,
            precision=mxu_precision(self.dtype, sensitive=True), name="fc1",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        x = nn.Dense(
            self.num_classes, dtype=self.dtype,
            precision=mxu_precision(self.dtype, sensitive=True), name="fc2",
        )(x)
        return x.astype(jnp.float32)


class CoughDetectorResidual(nn.Module):
    """ResNet-style model — the shipped production architecture.

    Conv7x7(s2, p3) → BN → ReLU → MaxPool(2) → ResBlock(→64, s2) →
    ResBlock(→128, s2) → GAP → Dropout → FC(→2).
    Reference: src/model.py:210-265. 290,370 parameters.
    """

    num_classes: int = 2
    channels: Sequence[int] = (32, 64, 128)
    dropout: float = 0.5
    dtype: Dtype = jnp.float32
    precision_mode: str = "high"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        x = _as_nhwc(x).astype(self.dtype)
        x = nn.Conv(
            self.channels[0],
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            dtype=self.dtype,
            precision=mxu_precision(self.dtype, self.precision_mode),
            name="stem_conv",
        )(x)
        x = BatchNorm(dtype=self.dtype, name="stem_bn")(x, train, mask)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))

        for i, ch in enumerate(self.channels[1:]):
            x = ResidualBlock(
                ch, stride=2, dtype=self.dtype,
                prec_mode=self.precision_mode, name=f"res{i}",
            )(x, train, mask)

        x = global_avg_pool(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        # Final dense: the single largest parity contributor (5.5e-3 at
        # DEFAULT) at negligible cost — always HIGH.
        x = nn.Dense(
            self.num_classes, dtype=self.dtype,
            precision=mxu_precision(self.dtype, sensitive=True), name="fc",
        )(x)
        return x.astype(jnp.float32)


_MODELS = {
    "standard": CoughDetector,
    "small": CoughDetectorSmall,
    "residual": CoughDetectorResidual,
}


def create_model(model_type: str = "standard", **kwargs) -> nn.Module:
    """Factory over {"standard", "small", "residual"}
    (reference: src/model.py:296-316). Extraneous reference kwargs (n_mels,
    in_channels) are accepted and ignored — the architectures are
    shape-agnostic."""
    kwargs.pop("n_mels", None)
    kwargs.pop("in_channels", None)
    if model_type not in _MODELS:
        raise ValueError(
            f"Unknown model type: {model_type}. Choose from {list(_MODELS)}"
        )
    return _MODELS[model_type](**kwargs)


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def model_from_config(model_config, precision_mode: str = "high") -> nn.Module:
    """Construct the classifier from a ModelConfig, honoring EVERY field
    it declares — num_classes, dropout (standard/residual; the small
    model's dropout is HARDCODED at 0.3 exactly like the reference's
    `nn.Dropout(0.3)`, so ModelConfig.dropout is deliberately ignored for
    it — reference src/model.py:194), and compute_dtype.
    `create_model(type)` alone silently ignores them, which would let a
    checkpoint's config_full record a configuration the weights were
    never trained under."""
    dtype = _DTYPES.get(model_config.compute_dtype)
    if dtype is None:
        raise ValueError(
            f"compute_dtype must be one of {sorted(_DTYPES)}, "
            f"got {model_config.compute_dtype!r}"
        )
    kwargs = {
        "num_classes": model_config.num_classes,
        "dtype": dtype,
        "precision_mode": precision_mode,
    }
    if model_config.model_type in ("standard", "residual"):
        kwargs["dropout"] = model_config.dropout
    return create_model(model_config.model_type, **kwargs)


def init_model(
    model: nn.Module, rng: jax.Array, feature_shape: Tuple[int, int]
) -> dict:
    """Initialize variables for a (H, W) feature geometry. Returns the full
    variable dict {params, batch_stats}."""
    dummy = jnp.zeros((1, *feature_shape), jnp.float32)
    return model.init(rng, dummy, train=False)


def count_parameters(params) -> int:
    """Trainable-parameter count (reference: src/model.py:319-321)."""
    leaves = jax.tree_util.tree_leaves(params)
    return int(sum(p.size for p in leaves))


def predict(
    model: nn.Module, variables: dict, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(preds, probs) — softmax over logits, argmax class
    (reference: src/model.py:127-140)."""
    logits = model.apply(variables, x, train=False)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.argmax(probs, axis=-1), probs
