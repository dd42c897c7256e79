"""Fused Pallas TPU kernel: raw waveform batch → stacked feature image.

One `pallas_call` computes, per 8-clip tile, the full shipped front end
(reference: src/preprocessing.py:432-489 with the production flags,
src/train.py:264-287): framing → windowed 512-pt DFT as two GEMMs →
power → mel GEMM → dB(top_db=80)+[0,1] → log-mel → DCT-II GEMM → per-clip
z-norm → delta features — without ever materializing the (B, 101, 512)
frame tensor in HBM (the XLA-path's dominant memory cost).

Design notes (pallas_guide.md):
  * All FLOPs are MXU matmuls via manual bf16 splitting — X6 for the
    DFT and DCT, X3 for the all-positive mel projection (see the per-site
    comments) — the DFT-as-GEMM formulation (cf. MelT, PAPERS.md) at
    n_fft=512 maps straight onto the 128x128 systolic array.
  * Frames are laid out time-major ((t*8+b) rows) so each of the 101 frame
    copies is one contiguous (8, 512) VMEM write.
  * Per-clip reductions (dB clamp max, MFCC mean/var) reduce over the
    (time, freq) axes of a (101, 8, X) view.
  * The kernel emits (B, T=101, F=90); the host-side wrapper transposes to
    the reference's (B, 90, 101) layout, which XLA fuses into consumers.
    Measured r2 on v5e (batch 8192): the fused transpose is free — e2e with
    a natural-(B,T,F) kernel + HW-swapped conv weights is 31.2 ms vs
    31.4 ms shipped (noise), while emitting (B,F,T) *inside* the kernel
    costs +2 ms/batch (Mosaic major-minor relayout). Keep this layout.

Output parity: ≤1e-3 relative against the torch golden (tested), same
budget as the jnp reference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...config import FeatureConfig
from .. import filters

# Clips per kernel program (sublane-aligned: Mosaic requires the block's
# second-to-last dim be a multiple of 8). 16 measures ~2% faster than 8 on
# v5e with the band-limited DFT (601k vs 588k clips/s) and still fits VMEM.
B_TILE = 16

# DFT matmul precision. Measured on v5e against the torch golden
# (batch 2048, full feature stack):
#   naive DFT + Precision.HIGHEST        1.7e-3 parity  (FAILS budget)
#   four-step DFT + Precision.HIGHEST    6.9e-4 parity, 22.6 ms (4x FLOPs)
#   naive DFT + bf16 X6 splitting        5.3e-4 parity, fastest
# The X6 scheme decomposes each f32 operand into three bf16 terms and
# accumulates the six significant cross-products in f32 — tighter than
# HIGHEST's pass schedule here, at half the four-step's matmul count. It is
# implemented manually below (six native bf16 MXU passes) so it works
# identically under Mosaic and in interpret mode.

_AMIN = 1e-10
_LOG10E_X10 = float(10.0 / np.log(10.0))


def _split3(x):
    """f32 → three bf16 terms whose sum reconstructs ~all 24 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _bdot(x, y):
    return jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_x6_presplit(a_terms, b_terms):
    """Six bf16 MXU passes (BF16_BF16_F32_X6) from pre-split operands.

    Splitting is hoisted out so one waveform-frame split feeds both the cos
    and sin GEMMs (measured r2: re-splitting per call cost ~2 ms/16k batch),
    and the constant DFT matrices are split once at trace time.
    """
    a1, a2, a3 = a_terms
    b1, b2, b3 = b_terms
    # Low-order terms first for a friendlier accumulation order.
    out = _bdot(a3, b1) + _bdot(a2, b2) + _bdot(a1, b3)
    out = out + (_bdot(a2, b1) + _bdot(a1, b2))
    return out + _bdot(a1, b1)


def _dot_x6(a, b):
    """f32xf32 matmul via six bf16 MXU passes (BF16_BF16_F32_X6 scheme)."""
    return _dot_x6_presplit(_split3(a), _split3(b))


def _dot_x3(a, b):
    """f32xf32 matmul via three bf16 MXU passes (Precision.HIGH semantics —
    Mosaic only lowers DEFAULT/HIGHEST, so spell it out)."""
    a1, a2, _ = _split3(a)
    b1, b2, _ = _split3(b)
    return (_bdot(a2, b1) + _bdot(a1, b2)) + _bdot(a1, b1)


def _np_split3(x: np.ndarray):
    """Host-side twin of _split3 for constant operands (numpy + ml_dtypes)."""
    import ml_dtypes

    hi = x.astype(ml_dtypes.bfloat16)
    r1 = x - hi.astype(np.float32)
    mid = r1.astype(ml_dtypes.bfloat16)
    lo = (r1 - mid.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, mid, lo


def _kernel(
    wave_ref,   # (B_TILE, padded_len) f32, reflect-padded waveform
    c1_ref, c2_ref, c3_ref,  # (n_fft, n_used) bf16 X6 terms of windowed cos
    s1_ref, s2_ref, s3_ref,  # (n_fft, n_used) bf16 X6 terms of windowed -sin
    fb_ref,     # (n_used_bins, n_mels) mel filterbank
    dct_ref,    # (n_mels, n_mfcc) DCT-II ortho
    out_ref,    # (B_TILE, n_frames, n_features) f32
    frames_ref,  # scratch (n_frames*B_TILE, n_fft)
    *,
    n_frames: int,
    n_fft: int,
    hop: int,
    n_mels: int,
    n_mfcc: int,
    top_db: float,
    delta_delta: bool,
    use_pcen: bool,
):
    # 1. Frame: time-major rows, one contiguous (B_TILE, n_fft) copy per t.
    for t in range(n_frames):
        frames_ref[t * B_TILE : (t + 1) * B_TILE, :] = wave_ref[
            :, t * hop : t * hop + n_fft
        ]

    # 2. Windowed rDFT as two X6 GEMMs (one shared frame split); power; mel.
    frames = _split3(frames_ref[:])
    re = _dot_x6_presplit(frames, (c1_ref[:], c2_ref[:], c3_ref[:]))
    im = _dot_x6_presplit(frames, (s1_ref[:], s2_ref[:], s3_ref[:]))
    power = re * re + im * im  # (T*B, n_freqs)
    # The mel GEMM runs at X3 (HIGH semantics): it is an all-positive sum
    # (Σ|terms| = |result|), so its ~2^-16 relative error is ~1e-7 in
    # normalized feature units after the log stages — no DFT-style
    # cancellation. Measured r2 on chip: parity bit-identical to HIGHEST
    # (7.5e-4 on the probe batch either way) at fewer MXU passes.
    mel = _dot_x3(power, fb_ref[:])

    # 4. Log-mel (shared by the dB branch and the MFCC branch).
    log_mel = _LOG10E_X10 * jnp.log(jnp.maximum(mel, _AMIN))
    lm3 = log_mel.reshape(n_frames, B_TILE, n_mels)
    mel3 = mel.reshape(n_frames, B_TILE, n_mels)

    if use_pcen:
        # PCEN (reference: src/preprocessing.py:305-340): avg_pool(1×10)
        # stride 1 pad 5 (zeros counted) smoother — ten statically-shifted
        # adds over a zero-extended time axis — then the compressive
        # formula and a per-clip min-max to [0, 1].
        zeros5 = jnp.zeros((5, B_TILE, n_mels), jnp.float32)
        padded = jnp.concatenate([zeros5, mel3, zeros5], axis=0)
        smooth = padded[0:n_frames]
        for d in range(1, 10):
            smooth = smooth + padded[d : d + n_frames]
        smooth = smooth / 10.0
        alpha, delta, r, eps = 0.98, 2.0, 0.5, 1e-6
        pcen = (
            mel3 / jnp.power(eps + smooth, alpha) + delta
        ) ** r - delta**r
        lo = jnp.min(pcen, axis=(0, 2), keepdims=True)
        hi = jnp.max(pcen, axis=(0, 2), keepdims=True)
        mel_norm = (pcen - lo) / (hi - lo + 1e-8)
    else:
        # dB branch: clamp at per-clip max - top_db, then (db+80)/80 in [0,1].
        clip_max = jnp.max(lm3, axis=(0, 2), keepdims=True)  # (1, B, 1)
        db = jnp.maximum(lm3, clip_max - top_db)
        mel_norm = jnp.clip((db + top_db) / top_db, 0.0, 1.0)

    # 5. MFCC branch: DCT GEMM then per-clip unbiased z-norm. Stays X6: the
    # DCT is an oscillatory sum over ~|100| dB values (Σ|terms| >> |result|),
    # where X3's error is relative to Σ|terms|, not the result. X3 measured
    # parity-neutral on the r2 probe batch, but the ~1 ms it saves per 16k
    # batch isn't worth spending the thin budget headroom (7.5e-4 of 1e-3).
    mfcc = _dot_x6(log_mel, dct_ref[:]).reshape(n_frames, B_TILE, n_mfcc)
    n = n_frames * n_mfcc
    mean = jnp.mean(mfcc, axis=(0, 2), keepdims=True)
    var = jnp.sum((mfcc - mean) ** 2, axis=(0, 2), keepdims=True) / (n - 1)
    mfcc_z = (mfcc - mean) / (jnp.sqrt(var) + 1e-8)

    # 6. Deltas: replicate-pad central difference along time (axis 0).
    def _delta(x):
        up = jnp.concatenate([x[1:], x[-1:]], axis=0)
        down = jnp.concatenate([x[:1], x[:-1]], axis=0)
        return (up - down) / 2.0

    deltas = _delta(mfcc_z)
    parts = [mel_norm, mfcc_z, deltas]
    if delta_delta:
        parts.append(_delta(deltas))

    # 7. Stack to (B, T, F) and write.
    stacked = jnp.concatenate(parts, axis=2)
    out_ref[:] = jnp.transpose(stacked, (1, 0, 2))


def _supported(cfg: FeatureConfig) -> bool:
    # Pre-emphasis applies outside the kernel (elementwise, fuses into the
    # reflect pad); delta-delta is an extra in-kernel diff; PCEN's smoother
    # is ten statically-shifted adds. Spectral contrast (per-band sorts on
    # the full spectrum) runs hybrid: the kernel computes every other
    # branch, the jnp contrast rows concatenate after (see
    # extract_features_fused).
    return cfg.use_mfcc and not cfg.use_spectral_contrast


@functools.partial(jax.jit, static_argnums=(1, 2))
def _run(waves: jnp.ndarray, cfg: FeatureConfig, interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = waves.shape[0]
    # The grid floor-divides the batch; a non-multiple would silently
    # return uninitialized rows past the last tile. Callers pad
    # (extract_features_fused) — enforce the contract here. ValueError,
    # not assert: under `python -O` an assert is stripped and the
    # uninitialized-rows failure it guards against would come back.
    if b % B_TILE != 0:
        raise ValueError(
            f"batch {b} must be a multiple of B_TILE={B_TILE}"
        )
    n_frames, n_fft, hop = cfg.num_frames, cfg.n_fft, cfg.hop_length
    n_freqs = n_fft // 2 + 1
    n_feat = cfg.num_features

    if cfg.use_pre_emphasis:
        from .. import frontend as _frontend

        waves = _frontend.pre_emphasis(waves, cfg.pre_emphasis_coef)

    half = n_fft // 2
    padded = jnp.pad(waves, [(0, 0), (half, half)], mode="reflect")
    padded_len = padded.shape[1]

    c, s = filters.dft_matrices(n_fft, cfg.win_length)
    fb = filters.mel_filterbank(
        n_freqs, cfg.n_mels, cfg.sample_rate, cfg.f_min, cfg.f_max
    )
    dct = filters.dct_matrix(cfg.n_mfcc, cfg.n_mels)

    # Band-limit the DFT to the filterbank's support: with the shipped
    # f_max=4 kHz the mel filters end at bin 128 of 257, so bins past the
    # last nonzero filterbank row contribute exactly zero to every feature.
    # Dropping them halves the DFT FLOPs and removes MXU lane padding
    # (128 lanes = one full tile vs 257→384).
    last_nonzero = int(np.max(np.nonzero(np.any(fb != 0, axis=1))[0])) + 1
    n_used = min(n_freqs, ((last_nonzero + 127) // 128) * 128)
    c, s, fb = c[:, :n_used], s[:, :n_used], fb[:n_used]

    kernel = functools.partial(
        _kernel,
        n_frames=n_frames,
        n_fft=n_fft,
        hop=hop,
        n_mels=cfg.n_mels,
        n_mfcc=cfg.n_mfcc,
        top_db=80.0,
        delta_delta=cfg.use_delta_delta,
        use_pcen=cfg.use_pcen,
    )
    n_tiles = b // B_TILE
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    c_terms = _np_split3(np.asarray(c, np.float32))
    s_terms = _np_split3(np.asarray(s, np.float32))
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (B_TILE, padded_len), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            *(const_spec((n_fft, n_used)) for _ in range(6)),
            const_spec((n_used, cfg.n_mels)),
            const_spec((cfg.n_mels, cfg.n_mfcc)),
        ],
        out_specs=pl.BlockSpec(
            (B_TILE, n_frames, n_feat), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_frames, n_feat), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_frames * B_TILE, n_fft), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_frames * n_fft * 2 * n_used * 6,
            bytes_accessed=b * (padded_len + n_frames * n_feat) * 4,
            transcendentals=b * n_frames * cfg.n_mels,
        ),
    )(
        padded,
        *(jnp.asarray(t) for t in c_terms),
        *(jnp.asarray(t) for t in s_terms),
        jnp.asarray(fb),
        jnp.asarray(dct),
    )
    return jnp.transpose(out, (0, 2, 1))  # (B, F, T) reference layout


def extract_features_fused(
    waves: jnp.ndarray,
    cfg: FeatureConfig = FeatureConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, segment_samples) → (B, num_features, num_frames) via the fused
    kernel. Batch is padded up to a multiple of B_TILE (16) internally.
    Configs the
    kernel doesn't cover (PCEN, spectral contrast, no-MFCC) and waveforms
    whose length differs from cfg.segment_samples (the kernel's frame count
    is baked to the segment geometry) fall back to the jnp path, so output
    always matches frontend.extract_features."""
    if (
        cfg.use_spectral_contrast
        and cfg.use_mfcc
        and waves.shape[-1] == cfg.segment_samples
    ):
        # Hybrid: mel/MFCC/deltas through the fused kernel, contrast rows
        # (per-band sorts — no MXU formulation) via the jnp path from the
        # un-emphasized waveform (reference stacks them last,
        # src/preprocessing.py:472-487). ~3x faster than the full jnp chain
        # for all-flags configs.
        import dataclasses

        from .. import frontend

        base = dataclasses.replace(cfg, use_spectral_contrast=False)
        std = extract_features_fused(waves, base, interpret)
        # GEMM STFT for the contrast rows too: log1p of sorted-band means
        # doesn't amplify the ~1e-4 spectrogram error the way log10 on
        # near-zero mel bins does (measured within budget on chip).
        con = frontend.spectral_contrast(waves, cfg, method="gemm")
        return jnp.concatenate(
            [std, jnp.transpose(con, (0, 2, 1))], axis=1
        )

    if not _supported(cfg) or waves.shape[-1] != cfg.segment_samples:
        from .. import frontend

        return frontend.extract_features(waves, cfg)

    b = waves.shape[0]
    pad = (-b) % B_TILE
    if pad:
        waves = jnp.pad(waves, [(0, pad), (0, 0)])
    out = _run(waves, cfg, interpret)
    return out[:b] if pad else out
