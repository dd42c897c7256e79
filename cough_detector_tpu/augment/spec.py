"""Spectrogram-domain augmentation: SpecAugment and MixUp, batched on device.

The reference wraps torchaudio FrequencyMasking/TimeMasking per clip
(reference: src/augmentation.py:271-331); here masks are broadcasted-iota
comparisons over the whole batch, drawn per sample from jax.random, matching
torchaudio's mask_along_axis semantics: width ~ U[0, param), start ~
U[0, dim - width), masked region set to 0. The whole-op probability p gates
each sample independently.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _mask_axis(
    feats: jnp.ndarray,
    key: jax.Array,
    param: int,
    axis: int,
    apply: jnp.ndarray,
) -> jnp.ndarray:
    """Zero one random band along `axis` (1=freq, 2=time) per sample."""
    b = feats.shape[0]
    dim = feats.shape[axis]
    k_w, k_s = jax.random.split(key)
    width = jax.random.uniform(k_w, (b,)) * param
    start = jax.random.uniform(k_s, (b,)) * (dim - width)
    width = width.astype(jnp.int32)
    start = start.astype(jnp.int32)

    pos = jnp.arange(dim)
    shape = [1, 1, 1]
    shape[axis] = dim
    pos = pos.reshape(shape)
    start_b = start.reshape(-1, 1, 1)
    width_b = width.reshape(-1, 1, 1)
    masked = (pos >= start_b) & (pos < start_b + width_b)
    masked = masked & apply.reshape(-1, 1, 1)
    return jnp.where(masked, 0.0, feats)


def spec_augment(
    feats: jnp.ndarray,
    key: jax.Array,
    freq_mask_param: int = 8,
    time_mask_param: int = 15,
    n_freq_masks: int = 2,
    n_time_masks: int = 2,
    p: float = 0.3,
) -> jnp.ndarray:
    """(B, F, T) SpecAugment with the reference's training parameters
    (reference: src/train.py:324-330)."""
    b = feats.shape[0]
    k_gate, key = jax.random.split(key)
    apply = jax.random.uniform(k_gate, (b,)) <= p

    for _ in range(n_freq_masks):
        key, k = jax.random.split(key)
        feats = _mask_axis(feats, k, freq_mask_param, axis=1, apply=apply)
    for _ in range(n_time_masks):
        key, k = jax.random.split(key)
        feats = _mask_axis(feats, k, time_mask_param, axis=2, apply=apply)
    return feats


def mixup(
    x: jnp.ndarray,
    y_onehot: jnp.ndarray,
    key: jax.Array,
    alpha: float = 0.2,
    mask: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch MixUp: convex combination of each sample with a random partner,
    λ ~ Beta(α, α) (reference: src/augmentation.py:334-369 — defined there
    but never wired into training; opt-in via TrainConfig.use_mixup).

    `mask` (float/bool (B,), 1 = real row): when a row's drawn PARTNER is a
    padded row, λ is forced to 1 so real samples never mix with padding
    garbage (padded rows themselves carry zero loss weight, so whatever
    they become is irrelevant)."""
    b = x.shape[0]
    k_lam, k_perm = jax.random.split(key)
    lam = jax.random.beta(k_lam, alpha, alpha, (b,))
    perm = jax.random.permutation(k_perm, b)
    if mask is not None:
        lam = jnp.where(mask[perm] > 0, lam, 1.0)
    lam_x = lam.reshape((b,) + (1,) * (x.ndim - 1))
    lam_y = lam.reshape((b,) + (1,) * (y_onehot.ndim - 1))
    x_mixed = lam_x * x + (1 - lam_x) * x[perm]
    y_mixed = lam_y * y_onehot + (1 - lam_y) * y_onehot[perm]
    return x_mixed, y_mixed
