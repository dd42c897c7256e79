"""Batched JAX audio feature front end.

Capability-parity rebuild of the reference preprocessor
(reference: src/preprocessing.py:13-550), inverted TPU-first:

* the reference runs per-clip, CPU, object-oriented, one torchaudio transform
  at a time; here every stage is a pure function of a *batch* of waveforms
  `(B, n_samples)` and the whole chain jit-compiles into a handful of fused
  XLA ops;
* the STFT is expressed as two windowed DFT GEMMs plus the mel projection
  GEMM — n_fft=512 matmuls are MXU-native (cf. MelT, PAPERS.md) — instead of
  a scalar FFT;
* per-clip reductions (peak normalize, dB top_db clamp, MFCC z-norm,
  PCEN/contrast normalization) vectorize over the batch axis.

Numerics match the torchaudio conventions the reference depends on to the
≤1e-3 budget (BASELINE.md): HTK mel scale, unnormalized filters, reflect-pad
centered STFT with a periodic Hann window, power-dB with amin=1e-10,
orthonormal DCT-II, unbiased-std z-normalization.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FeatureConfig
from . import filters

# Full-fp32 MXU passes for all front-end GEMMs: the default bf16 passes cost
# ~2.5e-3 relative error on the power spectrogram, blowing the ≤1e-3 parity
# budget (BASELINE.md); these GEMMs are tiny (~56 MFLOP/clip) so the 3-6x
# pass-count overhead is negligible against the throughput target.
_PREC = jax.lax.Precision.HIGHEST

# ---------------------------------------------------------------------------
# Waveform-domain stages
# ---------------------------------------------------------------------------


def to_mono(waveform: jnp.ndarray) -> jnp.ndarray:
    """(B, C, S) → (B, S) by channel mean; (B, S) passes through.

    Reference: src/preprocessing.py:185-197.
    """
    if waveform.ndim == 3:
        return jnp.mean(waveform, axis=1)
    return waveform


def peak_normalize(waveform: jnp.ndarray) -> jnp.ndarray:
    """Per-clip peak normalization to [-1, 1]; silent clips pass unchanged.

    Reference: src/preprocessing.py:199-212.
    """
    peak = jnp.max(jnp.abs(waveform), axis=-1, keepdims=True)
    return jnp.where(peak > 0, waveform / jnp.where(peak > 0, peak, 1.0), waveform)


def pre_emphasis(waveform: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """y[n] = x[n] - coef*x[n-1], first sample kept.

    Reference: src/preprocessing.py:214-240.
    """
    shifted = jnp.pad(waveform[..., :-1], [(0, 0)] * (waveform.ndim - 1) + [(1, 0)])
    out = waveform - coef * shifted
    return out.at[..., 0].set(waveform[..., 0])


def pad_or_trim(waveform: jnp.ndarray, length: int) -> jnp.ndarray:
    """Center-trim or center zero-pad the last axis to `length` (static).

    Reference: src/preprocessing.py:358-385.
    """
    cur = waveform.shape[-1]
    if cur == length:
        return waveform
    if cur > length:
        start = (cur - length) // 2
        return jax.lax.slice_in_dim(waveform, start, start + length, axis=-1)
    pad = length - cur
    left = pad // 2
    cfgs = [(0, 0)] * (waveform.ndim - 1) + [(left, pad - left)]
    return jnp.pad(waveform, cfgs)


# ---------------------------------------------------------------------------
# Spectral stages
# ---------------------------------------------------------------------------


def frame_signal(
    waveform: jnp.ndarray, n_fft: int, hop_length: int, center: bool = True
) -> jnp.ndarray:
    """(B, S) → (B, n_frames, n_fft) frames, reflect-padded when centered.

    torch.stft(center=True, pad_mode="reflect") semantics
    (reference: src/preprocessing.py:104-105).
    """
    if center:
        half = n_fft // 2
        waveform = jnp.pad(waveform, [(0, 0), (half, half)], mode="reflect")
    n_frames = (waveform.shape[-1] - n_fft) // hop_length + 1
    # Block decomposition: reshape to hop-sized blocks, then frame t is
    # ceil(n_fft/hop)+1 consecutive block slices concatenated — a handful
    # of wide contiguous ops, fast to compile. Measured r2 on v5e at
    # (8192, 101, 512): standalone-equal to the previous (n_frames, n_fft)
    # fancy-index gather (13.8 vs 14.5 ms — XLA lowered that static gather
    # acceptably), but this form can't regress into the per-row-gather
    # trap (CLAUDE.md), and the per-frame 101-way stack alternative
    # compiles pathologically slowly. Inside the Pallas kernel the
    # equivalent is direct VMEM slicing.
    k, r = divmod(n_fft, hop_length)
    n_blocks = n_frames + k + (1 if r else 0)
    pad = n_blocks * hop_length - waveform.shape[-1]
    if pad > 0:
        waveform = jnp.pad(waveform, [(0, 0), (0, pad)])
    blocks = waveform.reshape(waveform.shape[0], n_blocks, hop_length)
    parts = [blocks[:, t : t + n_frames] for t in range(k)]
    if r:
        parts.append(blocks[:, k : k + n_frames, :r])
    return jnp.concatenate(parts, axis=2)


def power_spectrogram(
    waveform: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    power: float = 2.0,
    method: str = "fft",
) -> jnp.ndarray:
    """Windowed power spectrogram: (B, S) → (B, frames, freqs).

    Matches torchaudio.transforms.Spectrogram(power=2, center=True,
    pad_mode="reflect") (reference: src/preprocessing.py:94-106,131-136).

    method="fft"  — windowed frames through XLA's FFT HLO. Tracks torch's FFT
                    to ~6e-7, keeping the full stacked-feature deviation well
                    inside the ≤1e-3 budget even after the dB/log stages
                    amplify error on near-zero bins.
    method="gemm" — DFT as two windowed matmuls (MXU-native, the formulation
                    the fused Pallas kernel uses; cf. MelT, PAPERS.md).
                    ~1e-4 spectrogram error: fine for serving, measured
                    against the budget in the Pallas parity tests.
    """
    frames = frame_signal(waveform, n_fft, hop_length)
    if method == "fft":
        win = jnp.asarray(
            filters.padded_window(win_length, n_fft).astype(np.float32)
        )
        fft = jnp.fft.rfft(frames * win, axis=-1)
        sq = jnp.real(fft) ** 2 + jnp.imag(fft) ** 2
    elif method == "gemm":
        c, s = filters.dft_matrices(n_fft, win_length)
        re = jnp.matmul(frames, jnp.asarray(c), preferred_element_type=jnp.float32, precision=_PREC)
        im = jnp.matmul(frames, jnp.asarray(s), preferred_element_type=jnp.float32, precision=_PREC)
        sq = re * re + im * im
    else:
        raise ValueError(f"Unknown STFT method: {method!r}")
    if power == 2.0:
        return sq
    if power == 1.0:
        return jnp.sqrt(sq)
    return jnp.power(sq, power / 2.0)


def mel_spectrogram(waveform: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """(B, S) → (B, frames, n_mels) power mel spectrogram.

    Reference: src/preprocessing.py:94-106. Note the time-major layout —
    frequency is the contraction axis of the GEMM; callers transpose to the
    reference's (n_mels, time) only at the stacked output.
    """
    spec = power_spectrogram(waveform, cfg.n_fft, cfg.hop_length, cfg.win_length)
    fb = jnp.asarray(
        filters.mel_filterbank(
            cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate, cfg.f_min, cfg.f_max
        )
    )
    return jnp.matmul(spec, fb, preferred_element_type=jnp.float32, precision=_PREC)


_AMIN = 1e-10
_LOG10 = float(np.log(10.0))


def power_to_db(x: jnp.ndarray, top_db: Optional[float] = None) -> jnp.ndarray:
    """10*log10(max(x, 1e-10)), optionally clamped to per-clip max - top_db.

    torchaudio AmplitudeToDB(stype="power") semantics with ref=1.0
    (reference: src/preprocessing.py:109-112). The top_db clamp uses the
    per-clip maximum, vectorized across the batch (leading) axis.
    """
    db = 10.0 / _LOG10 * jnp.log(jnp.maximum(x, _AMIN))
    if top_db is not None:
        axes = tuple(range(1, x.ndim))
        clip_max = jnp.max(db, axis=axes, keepdims=True)
        db = jnp.maximum(db, clip_max - top_db)
    return db


def log_mel_norm(mel: jnp.ndarray, top_db: float = 80.0) -> jnp.ndarray:
    """dB + (db+80)/80 with [0,1] clamp (reference: src/preprocessing.py:405-410)."""
    db = power_to_db(mel, top_db=top_db)
    return jnp.clip((db + top_db) / top_db, 0.0, 1.0)


def pcen(
    mel: jnp.ndarray,
    alpha: float = 0.98,
    delta: float = 2.0,
    r: float = 0.5,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Per-channel energy normalization, then per-clip min-max to [0, 1].

    Mirrors the reference's moving-average smoother: avg_pool(1×10), stride 1,
    pad 5 with zeros counted in the denominator, trimmed to the input length
    (reference: src/preprocessing.py:305-340,400-404). `mel` is (B, T, n_mels).
    """
    t = mel.shape[1]
    padded = jnp.pad(mel, [(0, 0), (5, 5), (0, 0)])
    # Moving sum as ten statically-shifted adds. NOT a cumsum difference:
    # f32 cumsum over the clip reaches ~1e7 for loud mel energies and the
    # windowed difference cancels catastrophically (measured 0.88 deviation
    # vs the torch golden on a sine sweep; the min-max then spreads it over
    # the whole map). Same scheme as the fused kernel's PCEN.
    smooth = padded[:, 0:t, :]
    for d in range(1, 10):
        smooth = smooth + padded[:, d : d + t, :]
    smooth = smooth / 10.0
    out = jnp.power(mel / jnp.power(eps + smooth, alpha) + delta, r) - delta**r
    lo = jnp.min(out, axis=(1, 2), keepdims=True)
    hi = jnp.max(out, axis=(1, 2), keepdims=True)
    return (out - lo) / (hi - lo + 1e-8)


def mfcc(waveform: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """(B, S) → (B, frames, n_mfcc), globally z-normalized per clip.

    torchaudio T.MFCC(log_mels=False): dB (no top_db) of the power mel, then
    orthonormal DCT-II; followed by the reference's per-clip
    (x - mean) / (std + 1e-8) with unbiased std
    (reference: src/preprocessing.py:115-127,414-430).
    """
    mel = mel_spectrogram(waveform, cfg)
    log_mel = power_to_db(mel, top_db=None)
    dct = jnp.asarray(filters.dct_matrix(cfg.n_mfcc, cfg.n_mels))
    out = jnp.matmul(log_mel, dct, preferred_element_type=jnp.float32, precision=_PREC)
    mean = jnp.mean(out, axis=(1, 2), keepdims=True)
    n = out.shape[1] * out.shape[2]
    var = jnp.sum((out - mean) ** 2, axis=(1, 2), keepdims=True) / (n - 1)
    return (out - mean) / (jnp.sqrt(var) + 1e-8)


def compute_deltas(features: jnp.ndarray) -> jnp.ndarray:
    """Replicate-pad central difference over the time axis (axis 1).

    (x[t+1] - x[t-1]) / 2 (reference: src/preprocessing.py:342-356).
    `features` is (B, T, F).
    """
    padded = jnp.pad(features, [(0, 0), (1, 1), (0, 0)], mode="edge")
    return (padded[:, 2:, :] - padded[:, :-2, :]) / 2.0


def _tail_sums_rank(band: jnp.ndarray, n_top: int, n_bot: int):
    """Exact top-`n_top` / bottom-`n_bot` sums along the last axis via a
    stable descending rank — no sort, no PartialReduce.

    For the contrast bands only the tail *means* are needed, never the
    sorted values, so selection reduces to a rank threshold: element a's
    rank is |{b : x_b > x_a}| + |{b < a : x_b == x_a}| (a permutation of
    0..W-1 — the index tiebreak makes it stable, so tail sums are
    bit-identical to summing a stable sort's slices). One O(W²)
    broadcast-compare-reduce serves BOTH tails.

    Measured on v5e (r5, docs/PARITY.md): ~9% SLOWER than the
    approx_k selection pair for the shipped ≤64-bin bands (the
    (W, W) minor-dim compare wastes half the vector lanes at W=64),
    so this is the non-default formulation — kept because it is
    PartialReduce-free (portable to backends where approx_k lowers
    badly) and exactness-tested against a float64 sort oracle.
    """
    w = band.shape[-1]
    idx = np.arange(w, dtype=np.int32)
    tie = jnp.asarray(idx[None, :] < idx[:, None])  # [a, b]: b before a
    a = band[..., :, None]  # (..., W, 1) — element whose rank we compute
    b = band[..., None, :]  # (..., 1, W) — everything it competes against
    rank = jnp.sum(
        ((b > a) | ((b == a) & tie)).astype(jnp.int32), axis=-1
    )  # (..., W)
    top = jnp.sum(jnp.where(rank < n_top, band, 0.0), axis=-1)
    bot = jnp.sum(jnp.where(rank >= w - n_bot, band, 0.0), axis=-1)
    return top, bot


def spectral_contrast(
    waveform: jnp.ndarray, cfg: FeatureConfig, method: str = "fft",
    tails: str = "auto",
) -> jnp.ndarray:
    """(B, S) → (B, T, n_bands+1): per-band peak-valley contrast + centroid.

    `method` picks the STFT formulation: "fft" (parity reference) or "gemm"
    (MXU-native, used by the fused-kernel hybrid path on TPU).
    `tails` picks the tail-mean formulation: "select"
    (lax.approx_{max,min}_k at recall 1.0 — the default everywhere) or
    "rank" (stable-rank masked sums — O(W²) compare-reduce, no
    PartialReduce). Both are exact selections; they differ only in f32
    summation order. Measured head-to-head on v5e r5 (docs/PARITY.md):
    select wins by ~9% on the full contrast stage (42.8 vs 46.7 ms per
    8k batch), so "auto" resolves to select; rank stays as a tested
    fallback for backends where PartialReduce lowers poorly.

    Ports the reference's hand-rolled contrast
    (reference: src/preprocessing.py:242-303): 6 log-spaced bands of the
    power spectrogram, mean(top 20% sorted bins) − mean(bottom 20%) in log1p,
    plus a Nyquist-normalized spectral centroid row, all z-normalized per clip
    with unbiased std. Band edges are static, so band slices/sorts compile to
    fixed-shape ops.
    """
    n_freqs = cfg.n_fft // 2 + 1
    if method == "gemm":
        # The contrast bands and the centroid need two full-spectrum STFTs
        # that differ ONLY in window (win_length Hann vs n_fft Hann) — the
        # frames are identical. Fuse all four DFT projections into one
        # matmul over one frames tensor: one pass of M, ~25% less lane
        # padding (4x257 columns pad jointly, not per-matrix), and HIGH
        # precision (3 passes, not HIGHEST's 6) — safe here because the
        # contrast stages are log1p/means, with none of the near-zero dB
        # amplification that forces X6 in the mel path (docs/PARITY.md;
        # measured on chip: hybrid all-flags parity holds).
        frames = frame_signal(waveform, cfg.n_fft, cfg.hop_length)
        c4, s4 = filters.dft_matrices(cfg.n_fft, cfg.win_length)
        c5, s5 = filters.dft_matrices(cfg.n_fft, cfg.n_fft)
        big = jnp.asarray(np.concatenate([c4, s4, c5, s5], axis=1))
        out = jnp.matmul(
            frames, big, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGH,
        )
        re4, im4, re5, im5 = jnp.split(out, 4, axis=2)
        spec = re4 * re4 + im4 * im4
        mag = jnp.sqrt(re5 * re5 + im5 * im5)
    else:
        spec = power_spectrogram(
            waveform, cfg.n_fft, cfg.hop_length, cfg.win_length,
            method=method,
        )
        mag = power_spectrogram(
            waveform, cfg.n_fft, cfg.hop_length, cfg.n_fft, power=1.0,
            method=method,
        )
    t = spec.shape[1]
    n_bands = cfg.n_contrast_bands
    if tails == "auto":
        tails = "select"

    # torch.logspace(0, log10(n_freqs), n_bands+2).int() — trunc toward zero.
    edges = np.logspace(0.0, np.log10(n_freqs), n_bands + 2)
    edges = np.clip(edges.astype(np.int64), 0, n_freqs)

    rows = []
    for i in range(n_bands):
        low = int(edges[i])
        high = int(edges[i + 1])
        if high <= low:
            high = low + 1
        high = min(high, n_freqs)
        band = spec[:, :, low:high]
        n_bins = band.shape[2]
        # Deliberate divergence from the reference: its top_idx=max(1, ...)
        # yields an *empty* peak slice for the first (single-bin) band, so
        # torch's mean() returns NaN and the z-norm poisons the whole feature
        # map whenever spectral contrast is enabled
        # (reference: src/preprocessing.py:286-289 — latent bug, the shipped
        # config has contrast OFF). Clamping to n_bins-1 makes a single-bin
        # band contribute zero contrast instead.
        top_idx = min(max(1, int(n_bins * 0.8)), n_bins - 1) if n_bins > 1 else 0
        bot_idx = max(1, int(n_bins * 0.2))
        n_top = n_bins - top_idx
        # Tail means via exact partial reduction instead of a full sort:
        # lax.approx_{max,min}_k at recall_target=1.0 is LOSSLESS (the TPU
        # PartialReduce is configured to return the true top-k; verified
        # exact on ties/sorted/reverse-sorted adversarial inputs) and the
        # pair runs ~2x faster than one jnp.sort on the 141-bin band —
        # XLA's TPU sort costs 33 ms per (8192,101,141) where the two
        # selections cost 17 ms (docs/PARITY.md r3 notes). The mean is
        # order-insensitive, so f32 deviation vs the sorted-slice
        # formulation is summation noise (~4e-7), far inside the 1e-3
        # budget. Degenerate tails skip selection entirely: a single-bin
        # band's contrast is identically 0 (peak == valley — the clamped
        # form of the reference's NaN bug, see above), and a 1-element
        # tail is a plain max/min reduce.
        if n_bins == 1:
            rows.append(jnp.zeros(spec.shape[:2], spec.dtype))
            continue
        if tails == "rank" and (n_top > 1 or bot_idx > 1):
            tops, bots = _tail_sums_rank(band, n_top, bot_idx)
            peaks = tops / n_top
            valleys = bots / bot_idx
        else:
            if n_top == 1:
                peaks = jnp.max(band, axis=2)
            else:
                peaks = jnp.mean(
                    jax.lax.approx_max_k(band, n_top, recall_target=1.0)[0],
                    axis=2,
                )
            if bot_idx == 1:
                valleys = jnp.min(band, axis=2)
            else:
                valleys = jnp.mean(
                    jax.lax.approx_min_k(band, bot_idx, recall_target=1.0)[0],
                    axis=2,
                )
        rows.append(jnp.log1p(peaks) - jnp.log1p(valleys))

    # Spectral centroid over a full-n_fft-window magnitude spectrogram
    # (`mag` above) — torchaudio SpectralCentroid defaults
    # win_length=n_fft, power=1 (reference: src/preprocessing.py:137-141).
    freqs = jnp.asarray(
        np.linspace(0, cfg.sample_rate // 2, n_freqs, dtype=np.float32)
    )
    # Guard digitally-silent frames: torchaudio's centroid is 0/0 = NaN
    # there, and the per-clip z-norm would poison every contrast row (same
    # failure mode as the reference's single-bin-band bug above). Define the
    # centroid of silence as 0.
    mag_sum = jnp.sum(mag, axis=2)
    centroid = jnp.where(
        mag_sum > 0, jnp.sum(mag * freqs, axis=2) / jnp.where(mag_sum > 0, mag_sum, 1.0), 0.0
    )
    rows.append(centroid / (cfg.sample_rate / 2.0))

    contrast = jnp.stack(rows, axis=2)[:, :t, :]  # (B, T, n_bands+1)
    mean = jnp.mean(contrast, axis=(1, 2), keepdims=True)
    n = contrast.shape[1] * contrast.shape[2]
    var = jnp.sum((contrast - mean) ** 2, axis=(1, 2), keepdims=True) / (n - 1)
    return (contrast - mean) / (jnp.sqrt(var) + 1e-8)


# ---------------------------------------------------------------------------
# Full stacked front end
# ---------------------------------------------------------------------------


def extract_features(waveform: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """(B, segment_samples) → (B, num_features, num_frames) feature image.

    The reference's extract_features (src/preprocessing.py:432-489): mel (+dB
    or PCEN) from the (optionally pre-emphasized) signal, MFCC (+deltas,
    +delta-deltas) likewise, spectral contrast from the original signal, all
    stacked along the frequency axis. Shipped config yields (B, 90, 101).
    """
    emph = (
        pre_emphasis(waveform, cfg.pre_emphasis_coef)
        if cfg.use_pre_emphasis
        else waveform
    )

    mel = mel_spectrogram(emph, cfg)  # (B, T, n_mels)
    mel = pcen(mel) if cfg.use_pcen else log_mel_norm(mel)
    parts = [mel]

    if cfg.use_mfcc:
        mf = mfcc(emph, cfg)
        d1 = compute_deltas(mf)
        parts += [mf, d1]
        if cfg.use_delta_delta:
            parts.append(compute_deltas(d1))

    if cfg.use_spectral_contrast:
        parts.append(spectral_contrast(waveform, cfg))

    stacked = jnp.concatenate(parts, axis=2)  # (B, T, num_features)
    return jnp.transpose(stacked, (0, 2, 1))  # (B, num_features, T)


def process(waveform: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """normalize → center pad/trim → extract_features, batched.

    The device-side tail of the reference's full pipeline
    (src/preprocessing.py:491-517); resampling and mono conversion happen
    upstream (ops.resample / to_mono) because they change shapes.
    """
    waveform = peak_normalize(waveform)
    waveform = pad_or_trim(waveform, cfg.segment_samples)
    return extract_features(waveform, cfg)


def extract_features_fast(waveform: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Fastest available front end: the fused Pallas kernel on TPU backends
    (5.2e-4 parity, ~3x the jnp chain on v5e), the jnp path elsewhere or for
    configs with optional branches enabled.

    The gate is an exact backend match — the kernel lowers through Mosaic
    with pltpu VMEM spaces, so routing any OTHER accelerator (gpu/rocm)
    into it would crash at lowering instead of falling back. The axon
    dev-tunnel backend reports "tpu" here (probed on hardware)."""
    if jax.default_backend() == "tpu":
        from .pallas.frontend_kernel import extract_features_fused

        return extract_features_fused(waveform, cfg)
    return extract_features(waveform, cfg)


@functools.lru_cache(maxsize=8)
def make_feature_fn(cfg: FeatureConfig, donate: bool = False):
    """A jitted (B, segment_samples) → (B, H, T) feature extractor."""
    fn = functools.partial(extract_features, cfg=cfg)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


@functools.lru_cache(maxsize=8)
def make_process_fn(cfg: FeatureConfig):
    """A jitted normalize→pad/trim→features pipeline for raw 16 kHz batches."""
    return jax.jit(functools.partial(process, cfg=cfg))
