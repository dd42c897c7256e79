"""Shared Flax building blocks for the classifier family.

Layout is NHWC — the TPU-native convolution layout — with the feature image
entering as (B, n_features, time, 1); the reference's NCHW tensors
(reference: src/model.py:105-125) map onto this with channels last.

`BatchNorm` here reproduces *torch* BatchNorm2d semantics exactly rather than
flax.linen.BatchNorm's: torch updates the running variance with the unbiased
batch variance while normalizing with the biased one, and uses
momentum 0.1 / eps 1e-5. This is the main train-time fidelity trap flagged in
SURVEY.md §7 (hard part b).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def mxu_precision(
    dtype, mode: str = "high", sensitive: bool = False
) -> jax.lax.Precision:
    """Conv/dense MXU precision for a compute dtype and precision mode.

    Measured on v5e (batch 2048/16384, residual model, vs torch logits):
      DEFAULT (1 bf16 pass):  4.9e-3 parity — FAILS the ≤1e-3 budget
      HIGH    (3 passes):     3.4e-5 parity, ~2x faster than HIGHEST
      HIGHEST (6 passes):     2.4e-7 parity
    mode="high" (the default everywhere) runs every matmul at HIGH.

    mode="serve" is an OPT-IN mixed scheme measured on v5e (r2,
    docs/PARITY.md has the full tables): bulk convs at DEFAULT with the
    `sensitive` sites (final dense, skip projections — the dominant error
    contributors at negligible FLOPs) pinned HIGH. It runs the classifier
    ~1.5x faster at a stable ~2-5e-4 *absolute* logits error — but the
    parity budget is *relative*, and randomized checkpoints can have
    max|logit| ~0.06, inflating that to 6.6e-3 (seed-77 measurement).
    It is therefore NOT the default: use it only for serving trained
    checkpoints whose logit scale is O(1), where the relative error is
    ~2e-4. bfloat16 compute always uses the native single pass.
    """
    if jnp.dtype(dtype) != jnp.float32:
        return jax.lax.Precision.DEFAULT
    if sensitive or mode != "serve":
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.DEFAULT


class BatchNorm(nn.Module):
    """BatchNorm2d with torch semantics (momentum=0.1, eps=1e-5,
    unbiased running-var update, biased normalization).

    `mask` ((B,) float/bool, optional) excludes padded batch rows from the
    train-time statistics: batches padded for mesh divisibility would
    otherwise fold synthetic rows into the running mean/var (and into the
    normalization of the real rows), silently biasing every later eval.
    With the mask, the batch statistics — and therefore the loss and the
    gradients of every real row — are EXACTLY those of the unpadded batch,
    so a padded DP step reproduces the single-device trajectory bit for
    bit. Both branches compute the unbiased correction n/(n-1) in f32 so
    an all-ones mask is bit-identical to mask=None."""

    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )

        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            # Two-pass E[(x-mean)^2], exactly like torch's BatchNorm2d:
            # the one-pass E[x^2]-E[x]^2 form cancels catastrophically
            # for near-constant channels with a large mean (f32 roundoff
            # ~mean^2*eps dwarfs a tiny true variance and can go
            # NEGATIVE, turning rsqrt(var+eps) into NaN).
            if mask is None:
                n_static = 1
                for ax in reduce_axes:
                    n_static *= x.shape[ax]
                n = jnp.asarray(n_static, jnp.float32)
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
            else:
                per_row = 1
                for ax in reduce_axes[1:]:
                    per_row *= x.shape[ax]
                mb = mask.astype(jnp.float32).reshape(
                    (-1,) + (1,) * (x.ndim - 1)
                )
                n = jnp.sum(mb) * per_row
                # Guard the fully-padded batch (sum(mask)=0): without it
                # the 0/0 mean/var would silently poison running stats
                # with NaN. Callers normally guarantee >=1 real row; a
                # degenerate batch computes mean=0/var=0 locally and its
                # running-stats update is gated to a no-op below.
                n_safe = jnp.maximum(n, 1.0)
                mean = jnp.sum(xf * mb, axis=reduce_axes) / n_safe
                var = (
                    jnp.sum(jnp.square(xf - mean) * mb, axis=reduce_axes)
                    / n_safe
                )
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                new_mean = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                new_var = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
                if mask is not None:
                    # A fully-padded batch must be a true no-op on the
                    # running stats (not a decay toward mean=0/var=0) —
                    # the padded-step trajectory-invariance contract.
                    live = n > 0.0
                    new_mean = jnp.where(live, new_mean, ra_mean.value)
                    new_var = jnp.where(live, new_var, ra_var.value)
                ra_mean.value = new_mean
                ra_var.value = new_var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        out = (x.astype(jnp.float32) - mean) * inv + bias
        return out.astype(self.dtype)


class ConvBlock(nn.Module):
    """Conv3x3 → BN → ReLU → MaxPool(2) → channel Dropout(0.1).

    Reference: src/model.py:11-40.
    """

    features: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    prec_mode: str = "high"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            dtype=self.dtype,
            precision=mxu_precision(self.dtype, self.prec_mode),
            name="conv",
        )(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, train, mask)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # Dropout2d: whole-channel dropout, broadcast over the spatial dims.
        x = nn.Dropout(
            self.dropout, broadcast_dims=(1, 2), deterministic=not train
        )(x)
        return x


class SeparableBlock(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 → BN → ReLU → optional MaxPool.

    The depthwise-separable unit of the lightweight model
    (reference: src/model.py:168-187).
    """

    features: int
    pool: bool = True
    dtype: Dtype = jnp.float32
    prec_mode: str = "high"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            feature_group_count=in_ch,
            dtype=self.dtype,
            precision=mxu_precision(self.dtype, self.prec_mode),
            name="dw",
        )(x)
        x = nn.Conv(
            self.features,
            (1, 1),
            dtype=self.dtype,
            precision=mxu_precision(self.dtype, self.prec_mode),
            name="pw",
        )(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, train, mask)
        x = nn.relu(x)
        if self.pool:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class ResidualBlock(nn.Module):
    """conv3x3(s) + BN + ReLU → conv3x3 + BN; 1x1(s) + BN projection skip
    when shape changes; add; ReLU.

    Reference: src/model.py:268-293.
    """

    features: int
    stride: int = 2
    dtype: Dtype = jnp.float32
    prec_mode: str = "high"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        in_ch = x.shape[-1]
        needs_proj = in_ch != self.features or self.stride != 1

        if needs_proj:
            # The projection feeds the residual sum almost straight into
            # the head — measured as the most parity-sensitive conv site
            # (mxu_precision docstring) — so it stays HIGH in serve mode.
            identity = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.stride, self.stride),
                dtype=self.dtype,
                precision=mxu_precision(self.dtype, sensitive=True),
                name="skip_conv",
            )(x)
            identity = BatchNorm(dtype=self.dtype, name="skip_bn")(
                identity, train, mask
            )
        else:
            identity = x

        out = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            dtype=self.dtype,
            precision=mxu_precision(self.dtype, self.prec_mode),
            name="conv1",
        )(x)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, train, mask)
        out = nn.relu(out)
        out = nn.Conv(
            self.features,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            dtype=self.dtype,
            precision=mxu_precision(self.dtype, self.prec_mode),
            name="conv2",
        )(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, train, mask)
        return nn.relu(out + identity)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d((1,1)) + flatten: (B, H, W, C) → (B, C)."""
    return jnp.mean(x, axis=(1, 2))
