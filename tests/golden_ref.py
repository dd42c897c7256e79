"""Independent golden reference for front-end numerics.

This module re-implements the exact torchaudio transform semantics the
reference pipeline is built on (reference: src/preprocessing.py:94-141),
using *core torch* (torch.stft, conv1d, avg_pool2d) and scipy — torchaudio
itself is not installed in this image. It deliberately shares no code with
cough_detector_tpu: the JAX front end computes the DFT as matmuls against
numpy-built constants, while this golden path goes through torch's FFT, so a
numerical agreement between the two is meaningful evidence of correctness
against the true torchaudio output (≤1e-3 budget, BASELINE.md).

Semantics covered:
  * Spectrogram / MelSpectrogram: center=True, reflect pad, periodic Hann
    padded to n_fft, power 2, HTK mel scale, unnormalized triangles.
  * AmplitudeToDB(stype="power"): 10*log10(clamp(x, 1e-10)), ref=1.0,
    optional top_db clamp at the per-tensor max.
  * MFCC(log_mels=False): dB (no top_db) then DCT-II ortho.
  * Resample("sinc_interp_hann", width=6, rolloff=0.99).
"""

from __future__ import annotations

import math

import numpy as np
import scipy.fft
import torch


def stft_power(
    wave: torch.Tensor,
    n_fft: int = 512,
    hop_length: int = 160,
    win_length: int = 400,
    power: float = 2.0,
) -> torch.Tensor:
    """(S,) or (1, S) → (freqs, frames) power spectrogram via torch.stft."""
    wave = wave.reshape(-1).to(torch.float32)
    window = torch.hann_window(win_length, dtype=torch.float32)
    spec = torch.stft(
        wave,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        window=window,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return spec.abs() ** power


def mel_fbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float,
    f_max: float,
) -> torch.Tensor:
    """(n_freqs, n_mels) HTK-scale unnormalized triangular filterbank."""
    all_freqs = torch.linspace(0, sample_rate // 2, n_freqs, dtype=torch.float64)

    def hz2mel(f):
        return 2595.0 * math.log10(1.0 + f / 700.0)

    m_min, m_max = hz2mel(f_min), hz2mel(f_max)
    m_pts = torch.linspace(m_min, m_max, n_mels + 2, dtype=torch.float64)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)

    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = torch.clamp(torch.min(down_slopes, up_slopes), min=0.0)
    return fb.to(torch.float32)


def mel_spectrogram(
    wave: torch.Tensor,
    sample_rate: int = 16000,
    n_fft: int = 512,
    hop_length: int = 160,
    win_length: int = 400,
    n_mels: int = 64,
    f_min: float = 100.0,
    f_max: float = 4000.0,
) -> torch.Tensor:
    """(S,) → (n_mels, frames)."""
    spec = stft_power(wave, n_fft, hop_length, win_length)
    fb = mel_fbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max)
    return fb.t() @ spec


def amplitude_to_db(
    x: torch.Tensor, top_db: float | None = None
) -> torch.Tensor:
    db = 10.0 * torch.log10(torch.clamp(x, min=1e-10))
    if top_db is not None:
        db = torch.clamp(db, min=db.max().item() - top_db)
    return db


def mfcc(
    wave: torch.Tensor,
    sample_rate: int = 16000,
    n_fft: int = 512,
    hop_length: int = 160,
    win_length: int = 400,
    n_mels: int = 64,
    f_min: float = 100.0,
    f_max: float = 4000.0,
    n_mfcc: int = 13,
) -> torch.Tensor:
    """(S,) → (n_mfcc, frames): dB mel → DCT-II ortho (scipy), raw (no z-norm)."""
    mel = mel_spectrogram(
        wave, sample_rate, n_fft, hop_length, win_length, n_mels, f_min, f_max
    )
    log_mel = amplitude_to_db(mel, top_db=None)
    out = scipy.fft.dct(log_mel.numpy(), type=2, axis=0, norm="ortho")[:n_mfcc]
    return torch.from_numpy(np.ascontiguousarray(out))


def zscore_global(x: torch.Tensor) -> torch.Tensor:
    """Per-tensor (x - mean) / (std + 1e-8), unbiased std — the reference's
    MFCC/contrast normalization (reference: src/preprocessing.py:301,428)."""
    return (x - x.mean()) / (x.std() + 1e-8)


def compute_deltas(features: torch.Tensor) -> torch.Tensor:
    """(F, T) replicate-pad central difference over time."""
    padded = torch.nn.functional.pad(
        features.unsqueeze(0), (1, 1), mode="replicate"
    ).squeeze(0)
    return (padded[:, 2:] - padded[:, :-2]) / 2


def pcen(mel: torch.Tensor, alpha=0.98, delta=2.0, r=0.5, eps=1e-6) -> torch.Tensor:
    """(n_mels, T) PCEN with the reference's avg-pool smoother."""
    x = mel.unsqueeze(0).unsqueeze(0)  # (1, 1, n_mels, T)
    smooth = torch.nn.functional.avg_pool2d(
        x, kernel_size=(1, 10), stride=(1, 1), padding=(0, 5)
    ).squeeze(0).squeeze(0)[:, : mel.shape[1]]
    out = (mel / (eps + smooth).pow(alpha) + delta).pow(r) - delta**r
    return out


def pcen_minmax(mel: torch.Tensor) -> torch.Tensor:
    out = pcen(mel)
    return (out - out.min()) / (out.max() - out.min() + 1e-8)


def log_mel_norm(mel: torch.Tensor, top_db: float = 80.0) -> torch.Tensor:
    db = amplitude_to_db(mel, top_db=top_db)
    return torch.clamp((db + top_db) / top_db, 0.0, 1.0)


def spectral_contrast(
    wave: torch.Tensor,
    sample_rate: int = 16000,
    n_fft: int = 512,
    hop_length: int = 160,
    win_length: int = 400,
    n_bands: int = 6,
) -> torch.Tensor:
    """(S,) → (n_bands+1, T): the reference's hand-rolled contrast + centroid
    (reference: src/preprocessing.py:242-303)."""
    spec = stft_power(wave, n_fft, hop_length, win_length)  # (freq, T)
    n_freq, n_time = spec.shape

    band_edges = torch.logspace(0, math.log10(n_freq), n_bands + 2).int()
    band_edges = torch.clamp(band_edges, 0, n_freq)

    contrast = torch.zeros(n_bands + 1, n_time)
    for i in range(n_bands):
        low = band_edges[i].item()
        high = band_edges[i + 1].item()
        if high <= low:
            high = low + 1
        if high > n_freq:
            high = n_freq
        band = spec[low:high, :]
        if band.shape[0] > 0:
            sorted_band, _ = torch.sort(band, dim=0)
            n_bins = sorted_band.shape[0]
            # The reference's max(1, ...) makes the peak slice empty for the
            # first (single-bin) band → NaN mean → NaN everywhere after the
            # z-norm (reference: src/preprocessing.py:286-289). Both golden
            # and rebuild clamp to n_bins-1 (single-bin bands contribute 0).
            top_idx = min(max(1, int(n_bins * 0.8)), n_bins - 1) if n_bins > 1 else 0
            bot_idx = max(1, int(n_bins * 0.2))
            peaks = sorted_band[top_idx:, :].mean(dim=0)
            valleys = sorted_band[:bot_idx, :].mean(dim=0)
            contrast[i, :] = torch.log1p(peaks) - torch.log1p(valleys)

    # SpectralCentroid: win_length defaults to n_fft, magnitude (power=1).
    mag = stft_power(wave, n_fft, hop_length, n_fft, power=1.0)
    freqs = torch.linspace(0, sample_rate // 2, n_freq).unsqueeze(1)
    mag_sum = mag.sum(dim=0)
    # Silence guard matching the rebuild (torchaudio gives 0/0=NaN here and
    # the z-norm would poison the whole map — see docs/PARITY.md).
    centroid = torch.where(
        mag_sum > 0, (mag * freqs).sum(dim=0) / mag_sum.clamp(min=1e-30),
        torch.zeros_like(mag_sum),
    )
    centroid = centroid / (sample_rate / 2)
    contrast[-1, : centroid.shape[0]] = centroid

    return zscore_global(contrast)


def pre_emphasis(wave: torch.Tensor, coef: float = 0.97) -> torch.Tensor:
    w = wave.reshape(1, -1)
    out = torch.cat([w[:, :1], w[:, 1:] - coef * w[:, :-1]], dim=1)
    return out.reshape(-1)


def peak_normalize(wave: torch.Tensor) -> torch.Tensor:
    m = wave.abs().max()
    return wave / m if m > 0 else wave


def pad_or_trim(wave: torch.Tensor, length: int) -> torch.Tensor:
    cur = wave.shape[-1]
    if cur == length:
        return wave
    if cur > length:
        start = (cur - length) // 2
        return wave[..., start : start + length]
    pad = length - cur
    left = pad // 2
    return torch.nn.functional.pad(wave, (left, pad - left))


def resample(wave: torch.Tensor, orig_freq: int, new_freq: int) -> torch.Tensor:
    """torchaudio sinc_interp_hann resampler via core torch conv1d."""
    if orig_freq == new_freq:
        return wave
    gcd = math.gcd(orig_freq, new_freq)
    orig_freq //= gcd
    new_freq //= gcd

    lowpass_filter_width = 6
    rolloff = 0.99
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)

    idx = torch.arange(-width, width + orig_freq, dtype=torch.float64)[None] / orig_freq
    t = torch.arange(0, -new_freq, -1, dtype=torch.float64)[:, None] / new_freq + idx
    t *= base_freq
    t = t.clamp_(-lowpass_filter_width, lowpass_filter_width)

    window = torch.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    t *= math.pi
    kernel = torch.where(t == 0, torch.tensor(1.0, dtype=torch.float64), t.sin() / t)
    kernel.mul_(window)
    kernel *= base_freq / orig_freq
    kernels = kernel.to(torch.float32).unsqueeze(1)

    w = wave.reshape(1, -1)
    length = w.shape[-1]
    w = torch.nn.functional.pad(w, (width, width + orig_freq))
    out = torch.nn.functional.conv1d(w.unsqueeze(0), kernels, stride=orig_freq)
    out = out.transpose(1, 2).reshape(1, -1)
    target_length = int(math.ceil(new_freq * length / orig_freq))
    return out[0, :target_length]


def extract_features(
    wave: torch.Tensor,
    use_mfcc: bool = True,
    use_pcen: bool = False,
    use_pre_emphasis: bool = False,
    pre_emphasis_coef: float = 0.97,
    use_delta_delta: bool = False,
    use_spectral_contrast: bool = False,
    **kw,
) -> torch.Tensor:
    """(S,) → (n_features, T): the reference's full stacked front end
    (src/preprocessing.py:432-489)."""
    emph = pre_emphasis(wave, pre_emphasis_coef) if use_pre_emphasis else wave

    # Split kwargs per callee so geometry overrides (n_mfcc vs mel-only
    # params) can ride one **kw without TypeErrors.
    mel_kw = {
        k: v
        for k, v in kw.items()
        if k in ("sample_rate", "n_fft", "hop_length", "win_length",
                 "n_mels", "f_min", "f_max")
    }
    mel = mel_spectrogram(emph, **mel_kw)
    mel = pcen_minmax(mel) if use_pcen else log_mel_norm(mel)
    parts = [mel]

    if use_mfcc:
        mf = zscore_global(mfcc(emph, **dict(mel_kw, **(
            {"n_mfcc": kw["n_mfcc"]} if "n_mfcc" in kw else {}
        ))))
        d1 = compute_deltas(mf)
        parts += [mf, d1]
        if use_delta_delta:
            parts.append(compute_deltas(d1))

    if use_spectral_contrast:
        sc_kw = {
            k: v
            for k, v in kw.items()
            if k in ("sample_rate", "n_fft", "hop_length", "win_length")
        }
        parts.append(spectral_contrast(wave, **sc_kw))

    min_t = min(p.shape[1] for p in parts)
    return torch.cat([p[:, :min_t] for p in parts], dim=0)
