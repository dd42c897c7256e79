"""Batched waveform-domain augmentation on device.

The reference applies each augmentation per-sample on CPU with Python
`random` inside DataLoader workers (reference: src/augmentation.py:19-268).
Here the whole chain is a pure function of (waveforms[B,S], key): every clip
draws independent decisions/parameters via jax.random, everything is
branch-free (jnp.where gating), and the chain fuses into the training step's
jit program.

Semantics matched per-op:
  time_shift     — ±20% pad-and-trim shift, prob p (reference: 77-105)
  speed_perturb  — deliberately a no-op, as in the reference (107-117)
  volume         — gain U[0.7, 1.3], prob p (194-213)
  gaussian noise — SNR U[10, 30] dB, prob p (165-192)
  file noise     — random bank clip at SNR U[5, 20] dB, prob p (119-163)
Chain order: shift → speed(noop) → volume → gaussian → file noise (249-268).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp


def _gate(key: jax.Array, p: float, batch: int) -> jnp.ndarray:
    """Per-sample apply/skip decision: apply iff U[0,1) <= p.

    (The reference skips when random() > p, i.e. applies with prob p.)
    """
    return jax.random.uniform(key, (batch,)) <= p


def time_shift(
    waves: jnp.ndarray, key: jax.Array, p: float, shift_limit: float = 0.2
) -> jnp.ndarray:
    """Shift by n ∈ ±shift_limit·S samples, zero-filling the vacated end.

    Matches the reference's pad-then-trim (NOT circular) shift
    (reference: src/augmentation.py:95-104).

    Implementation: zero-pad each row by the shift limit and take one
    vmapped `dynamic_slice` per row. Measured inside the full train step on
    v5e (512x16000): element-index gather (take_along_axis) +85 ms, one-hot
    grouped conv +71 ms, this slice form +0.6 ms — XLA lowers the batched
    contiguous slice efficiently where the other two hit slow paths.
    """
    b, s = waves.shape
    k_gate, k_amt = jax.random.split(key)
    apply = _gate(k_gate, p, b)
    amt = jnp.round(
        jax.random.uniform(k_amt, (b,), minval=-shift_limit, maxval=shift_limit) * s
    ).astype(jnp.int32)
    amt = jnp.where(apply, amt, 0)

    limit = int(np.ceil(shift_limit * s))
    padded = jnp.pad(waves, ((0, 0), (limit, limit)))
    starts = limit - amt  # out[b, n] = x[b, n - amt]
    return jax.vmap(
        lambda row, start: jax.lax.dynamic_slice_in_dim(row, start, s)
    )(padded, starts)


def volume_perturbation(
    waves: jnp.ndarray,
    key: jax.Array,
    p: float,
    gain_range: Tuple[float, float] = (0.7, 1.3),
) -> jnp.ndarray:
    b = waves.shape[0]
    k_gate, k_gain = jax.random.split(key)
    apply = _gate(k_gate, p, b)
    gain = jax.random.uniform(
        k_gain, (b,), minval=gain_range[0], maxval=gain_range[1]
    )
    gain = jnp.where(apply, gain, 1.0)
    return waves * gain[:, None]


def add_gaussian_noise(
    waves: jnp.ndarray,
    key: jax.Array,
    p: float,
    snr_range: Tuple[float, float] = (10.0, 30.0),
) -> jnp.ndarray:
    b, s = waves.shape
    k_gate, k_snr, k_noise = jax.random.split(key, 3)
    apply = _gate(k_gate, p, b)
    snr_db = jax.random.uniform(
        k_snr, (b,), minval=snr_range[0], maxval=snr_range[1]
    )
    noise = jax.random.normal(k_noise, (b, s))
    sig_pow = jnp.mean(waves**2, axis=1)
    noise_pow = jnp.mean(noise**2, axis=1)
    snr_lin = 10.0 ** (snr_db / 10.0)
    scale = jnp.sqrt(sig_pow / (snr_lin * noise_pow))
    scale = jnp.where(apply, scale, 0.0)
    return waves + scale[:, None] * noise


def add_file_noise(
    waves: jnp.ndarray,
    key: jax.Array,
    p: float,
    noise_bank: jnp.ndarray,
    snr_range: Tuple[float, float] = (5.0, 20.0),
) -> jnp.ndarray:
    """Mix a random clip from a pre-loaded (N, S) noise bank at random SNR.

    The reference loads ≤100 noise files at init
    (reference: src/augmentation.py:56-75); here the bank is a fixed-shape
    device array so selection is a gather.
    """
    b, s = waves.shape
    n = noise_bank.shape[0]
    k_gate, k_pick, k_snr, k_start = jax.random.split(key, 4)
    apply = _gate(k_gate, p, b)
    pick = jax.random.randint(k_pick, (b,), 0, n)
    noise = noise_bank[pick]  # (B, S_bank)

    # Random crop to S (bank clips are stored at >= S samples). Batched
    # contiguous dynamic_slice — same rationale as time_shift: the
    # element-index gather lowers to a slow path on TPU.
    max_start = max(noise_bank.shape[1] - s, 0)
    start = jax.random.randint(k_start, (b,), 0, max_start + 1)
    noise = jax.vmap(
        lambda row, st: jax.lax.dynamic_slice_in_dim(row, st, s)
    )(noise, start)

    snr_db = jax.random.uniform(
        k_snr, (b,), minval=snr_range[0], maxval=snr_range[1]
    )
    sig_pow = jnp.mean(waves**2, axis=1)
    noise_pow = jnp.mean(noise**2, axis=1)
    snr_lin = 10.0 ** (snr_db / 10.0)
    scale = jnp.sqrt(sig_pow / (snr_lin * jnp.maximum(noise_pow, 1e-12)))
    scale = jnp.where(apply & (noise_pow > 0), scale, 0.0)
    return waves + scale[:, None] * noise


def speed_perturbation(
    waves: jnp.ndarray,
    key: jax.Array,
    p: float,
    factors: Tuple[float, ...] = (0.9, 0.95, 1.05, 1.1),
    sample_rate: int = 16000,
) -> jnp.ndarray:
    """Opt-in speed perturbation (the reference disables its own version
    because of CPU memory issues, src/augmentation.py:107-117; this one is
    batched and bounded).

    Each clip picks one of a static set of speed factors (or identity, with
    prob 1-p). The batch is resampled once per factor (cheap strided convs)
    and per-clip selection is a where — fixed shapes, no data-dependent
    control flow. Faster playback (factor > 1) shortens the clip; output is
    center pad/trimmed back to the original length.
    """
    from ..ops.frontend import pad_or_trim
    from ..ops.resample import resample

    b, s = waves.shape
    k_gate, k_pick = jax.random.split(key)
    apply = _gate(k_gate, p, b)
    pick = jax.random.randint(k_pick, (b,), 0, len(factors))

    out = waves
    for i, f in enumerate(factors):
        # The true time base, not a hardcoded 16 kHz: a wrong rate here
        # mis-scales every speed factor and computes the resampler's
        # anti-alias filters for the wrong Nyquist.
        virtual_sr = int(round(sample_rate / f))
        stretched = pad_or_trim(resample(waves, sample_rate, virtual_sr), s)
        out = jnp.where((apply & (pick == i))[:, None], stretched, out)
    return out


def augment_waveforms(
    waves: jnp.ndarray,
    key: jax.Array,
    p: float = 0.3,
    noise_bank: Optional[jnp.ndarray] = None,
    use_speed_perturbation: bool = False,
    use_time_shift: bool = True,
    sample_rate: int = 16000,
) -> jnp.ndarray:
    """The full reference chain (reference: src/augmentation.py:249-268).

    Speed perturbation defaults OFF to match the reference's deliberate
    no-op (reference: src/augmentation.py:107-117); pass
    use_speed_perturbation=True for the working batched implementation.
    use_time_shift=False skips the shift here for pipelines that apply it
    at crop time against the full-length clip (reference-faithful training;
    see data.datasets.BatchLoader time_shift_limit).
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    if use_time_shift:
        waves = time_shift(waves, k1, p)
    if use_speed_perturbation:
        waves = speed_perturbation(waves, k5, p, sample_rate=sample_rate)
    waves = volume_perturbation(waves, k2, p)
    waves = add_gaussian_noise(waves, k3, p)
    if noise_bank is not None and noise_bank.shape[0] > 0:
        waves = add_file_noise(waves, k4, p, noise_bank)
    return waves


def pitch_shift_semitones(
    waves: jnp.ndarray, semitones: int, sample_rate: int = 16000
) -> jnp.ndarray:
    """Resample-based pitch shift: rate-change by 2^(st/12) then pad/trim
    back to the original length (changes duration into pitch).

    The reference's pitch shift silently no-ops without sox
    (reference: src/augmentation.py:215-247) and is excluded from its
    augment() chain; provided here for capability parity.
    """
    from ..ops import pad_or_trim
    from ..ops.resample import resample

    if semitones == 0:
        return waves
    factor = 2.0 ** (semitones / 12.0)
    # Playing back at `factor` speed raises pitch by `semitones`.
    virtual_sr = int(round(sample_rate / factor))
    shifted = resample(waves, sample_rate, virtual_sr)
    return pad_or_trim(shifted, waves.shape[-1])
