"""Deterministic synthetic audio generators.

Capability port of the reference's synthetic data path
(reference: setup_data.py:95-164, prepare_data.py:118-172): cough-like bursts
(sharp attack + exponential decay over broadband noise with chest-resonance
sines) and non-cough sounds (silence / white noise / mains hum / clicks).

Unlike the reference — which draws from the global numpy RNG — every
generator here takes an explicit seed, so the same clip doubles as a golden
test fixture and a reproducible dataset sample.
"""

from __future__ import annotations

import numpy as np

SAMPLE_RATE = 16000

# Negative-sample menu: the union of the reference's setup_data.py
# silence/white/hum/clicks kinds (setup_data.py:95-164) and
# prepare_data.py's pink-noise + ambient multi-sine kinds
# (prepare_data.py:138-162). synthetic_non_cough draws its kind from
# this tuple with the seed's FIRST rng call — tests replay that draw
# to know which kind a given seed produces.
NON_COUGH_KINDS = (
    "silence", "white_noise", "hum", "clicks", "pink_noise", "ambient"
)


def synthetic_cough(
    seed: int,
    duration_s: float = 2.0,
    sample_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """A cough-like burst: 20 ms linear attack, exponential decay envelope
    over broadband noise mixed with 80-150 Hz and 200-400 Hz resonances."""
    rng = np.random.default_rng(seed)
    n = int(sample_rate * duration_s)
    t = np.linspace(0, duration_s, n)

    burst_dur = rng.uniform(0.3, min(0.8, duration_s * 0.6))
    start_lo = min(0.3, duration_s * 0.1)
    start_hi = max(start_lo + 0.01, min(1.0, duration_s - burst_dur - 0.05))
    burst_start = rng.uniform(start_lo, start_hi)

    envelope = np.zeros(n)
    start_idx = int(burst_start * sample_rate)
    burst_samples = int(burst_dur * sample_rate)
    attack = np.linspace(0, 1, int(0.02 * sample_rate))
    decay = np.exp(-np.linspace(0, 5, burst_samples - len(attack)))
    env = np.concatenate([attack, decay])
    end = min(start_idx + len(env), n)
    envelope[start_idx:end] = env[: end - start_idx]

    noise = rng.standard_normal(n)
    low = np.sin(2 * np.pi * rng.uniform(80, 150) * t)
    mid = np.sin(2 * np.pi * rng.uniform(200, 400) * t)

    audio = envelope * (0.7 * noise + 0.2 * low + 0.1 * mid)
    audio = audio / (np.abs(audio).max() + 1e-8) * 0.8
    audio += rng.standard_normal(n) * 0.01
    return audio.astype(np.float32)


def synthetic_non_cough(
    seed: int,
    duration_s: float = 2.0,
    sample_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Deterministic synthetic negative, kind chosen by seed.

    Covers the union of both reference menus: setup_data.py's
    silence/white/hum/clicks (setup_data.py:95-164) plus prepare_data.py's
    pink-noise (cumulative-sum 1/f approximation) and ambient multi-sine
    mixes (reference: prepare_data.py:138-162).
    """
    rng = np.random.default_rng(seed)
    n = int(sample_rate * duration_s)
    t = np.linspace(0, duration_s, n)

    kind = rng.choice(list(NON_COUGH_KINDS))
    if kind == "silence":
        audio = rng.standard_normal(n) * 0.005
    elif kind == "white_noise":
        audio = rng.standard_normal(n) * rng.uniform(0.02, 0.1)
    elif kind == "hum":
        freq = rng.choice([50, 60, 100, 120])
        audio = np.sin(2 * np.pi * freq * t) * 0.1
        audio += rng.standard_normal(n) * 0.02
    elif kind == "clicks":
        audio = rng.standard_normal(n) * 0.01
        for _ in range(rng.integers(1, 5)):
            pos = rng.integers(0, n - 100)
            audio[pos : pos + 50] = rng.uniform(-0.3, 0.3)
    elif kind == "pink_noise":
        pink = np.cumsum(rng.standard_normal(n))
        pink = pink / (np.abs(pink).max() + 1e-8)
        audio = pink * rng.uniform(0.01, 0.1)
    else:  # ambient: 1-3 low sines over a noise floor
        freqs = rng.choice([60, 120, 240, 500, 1000], size=rng.integers(1, 4),
                           replace=False)
        audio = np.zeros(n)
        for f in freqs:
            audio += np.sin(2 * np.pi * f * t) * rng.uniform(0.01, 0.03)
        audio += rng.standard_normal(n) * 0.005

    audio = audio / (np.abs(audio).max() + 1e-8) * 0.5
    return audio.astype(np.float32)


def sine_sweep(
    seed: int = 0,
    duration_s: float = 1.0,
    f0: float = 100.0,
    f1: float = 7000.0,
    sample_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Deterministic log chirp — a classic DSP golden-test signal."""
    n = int(sample_rate * duration_s)
    t = np.linspace(0, duration_s, n)
    k = (f1 / f0) ** (1 / duration_s)
    phase = 2 * np.pi * f0 * (k**t - 1) / np.log(k)
    amp = 0.9 if seed == 0 else np.random.default_rng(seed).uniform(0.3, 0.9)
    return (amp * np.sin(phase)).astype(np.float32)


def impulse(
    position: int = 8000,
    duration_s: float = 1.0,
    sample_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    n = int(sample_rate * duration_s)
    out = np.zeros(n, dtype=np.float32)
    out[position] = 1.0
    return out


def fixture_batch(
    n_clips: int = 8,
    duration_s: float = 1.0,
    sample_rate: int = SAMPLE_RATE,
    seed: int = 0,
) -> np.ndarray:
    """(n_clips, samples) batch mixing coughs, non-coughs, sweeps, impulses."""
    clips = []
    for i in range(n_clips):
        kind = i % 4
        if kind == 0:
            clips.append(synthetic_cough(seed + i, duration_s, sample_rate))
        elif kind == 1:
            clips.append(synthetic_non_cough(seed + i, duration_s, sample_rate))
        elif kind == 2:
            clips.append(sine_sweep(seed + i, duration_s, sample_rate=sample_rate))
        else:
            clips.append(
                impulse(
                    position=(seed + i * 997) % (int(sample_rate * duration_s)),
                    duration_s=duration_s,
                    sample_rate=sample_rate,
                )
            )
    return np.stack(clips)
