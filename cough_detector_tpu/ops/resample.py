"""Polyphase windowed-sinc resampling in JAX.

TPU-native replacement for the torchaudio Resample transform the reference
caches per source rate (reference: src/preprocessing.py:146-153,168-183).
The kernel bank is built once per (orig_sr, new_sr) pair on the host in
float64 (torchaudio "sinc_interp_hann" semantics: lowpass_filter_width=6,
rolloff=0.99, Hann^2 window); the application is a strided 1-D convolution,
which XLA lowers to MXU matmuls.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_LOWPASS_FILTER_WIDTH = 6
_ROLLOFF = 0.99


@functools.lru_cache(maxsize=32)
def _sinc_kernel(orig_freq: int, new_freq: int):
    """(kernels, width): polyphase bank shaped (new_freq, 1, K), numpy f32."""
    assert orig_freq > 0 and new_freq > 0
    base_freq = min(orig_freq, new_freq) * _ROLLOFF
    width = math.ceil(_LOWPASS_FILTER_WIDTH * orig_freq / base_freq)

    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t *= base_freq
    t = np.clip(t, -_LOWPASS_FILTER_WIDTH, _LOWPASS_FILTER_WIDTH)

    window = np.cos(t * np.pi / _LOWPASS_FILTER_WIDTH / 2) ** 2
    t *= np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel *= window * (base_freq / orig_freq)
    return kernel[:, None, :].astype(np.float32), width


def resample(
    waveform: jnp.ndarray, orig_sr: int, new_sr: int
) -> jnp.ndarray:
    """Resample (B, S) waveforms from orig_sr to new_sr.

    Output length is ceil(new_sr * S / orig_sr) after gcd reduction, matching
    the torchaudio resampler the reference relies on.
    """
    if orig_sr == new_sr:
        return waveform
    gcd = math.gcd(int(orig_sr), int(new_sr))
    orig, new = int(orig_sr) // gcd, int(new_sr) // gcd

    kernels, width = _sinc_kernel(orig, new)
    length = waveform.shape[-1]
    target_length = -(-new * length // orig)  # ceil

    x = jnp.pad(waveform, [(0, 0), (width, width + orig)])[:, None, :]
    out = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(kernels),
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, new, frames)
    out = jnp.transpose(out, (0, 2, 1)).reshape(waveform.shape[0], -1)
    return out[:, :target_length]


def make_resample_fn(orig_sr: int, new_sr: int):
    """Jitted resampler for a fixed rate pair (mirrors the reference's
    per-rate resampler cache, src/preprocessing.py:144-153)."""
    return jax.jit(functools.partial(resample, orig_sr=orig_sr, new_sr=new_sr))
