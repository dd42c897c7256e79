"""Batched offline scoring of long recordings.

The TPU-native answer to "long sequences" for this domain (SURVEY.md §5):
instead of streaming a long file through the ring buffer, frame the whole
waveform into its (n_windows, window) sliding-window batch in one shot and
score every window in parallel — data-parallel over windows, shardable over
chips on the mesh. Smoothing/threshold/debounce then run as a cheap scan
over the per-window probabilities, reproducing the streaming detector's
event semantics exactly.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import model_from_config
from ..ops import frontend
from ..parallel import batch_sharding, make_mesh


class OfflineDetection(NamedTuple):
    time_seconds: float
    confidence: float


def frame_windows(
    wave: jnp.ndarray, window_samples: int, hop_samples: int
) -> jnp.ndarray:
    """(S,) → (n_windows, window_samples) sliding-window batch.

    Batched contiguous dynamic_slice, NOT an element-index gather: the
    (n, window) fancy-index form hits the TPU's slow gather path (70-85 ms
    at (512, 16000)-scale vs ~0.6 ms for slices — CLAUDE.md invariant),
    and an hour-long recording frames ~14k windows here."""
    n = (wave.shape[-1] - window_samples) // hop_samples + 1
    if n <= 0:
        return jnp.zeros((0, window_samples), wave.dtype)
    starts = jnp.arange(n, dtype=jnp.int32) * hop_samples
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(wave, (s,), (window_samples,))
    )(starts)


def smooth_and_debounce(
    probs: np.ndarray,
    hop_samples: int,
    window_samples: int,
    sample_rate: int,
    threshold: float,
    smoothing_window: int,
    debounce_seconds: float,
) -> List[OfflineDetection]:
    """Streaming-equivalent event extraction over batched window scores
    (reference semantics: src/inference.py:216-239). Debouncing uses integer
    sample indices — identical to the ring buffer's arithmetic."""
    from collections import deque

    history: deque = deque(maxlen=smoothing_window)
    debounce = int(round(debounce_seconds * sample_rate))
    last_fire = -(1 << 60)
    out: List[OfflineDetection] = []
    for k, p in enumerate(probs):
        history.append(float(p))
        smoothed = float(np.mean(history))
        t_samples = k * hop_samples + window_samples
        if smoothed >= threshold and t_samples - last_fire >= debounce:
            last_fire = t_samples
            # Exact float64 division, like StreamingDetector's
            # collect_events: routing t_samples through float32 rounds
            # it to the f32 lattice past 2^24 samples (~17.5 min at
            # 16 kHz), diverging from the streaming engine's times on
            # exactly the hour-long recordings this module targets.
            out.append(
                OfflineDetection(t_samples / sample_rate, smoothed)
            )
    return out


def score_recording(
    wave: np.ndarray,
    variables: dict,
    config: Config,
    *,
    hop_duration: float = 0.25,
    threshold: float = 0.5,
    smoothing_window: int = 3,
    debounce_seconds: float = 0.5,
    batch_size: int = 1024,
    mesh=None,
) -> List[OfflineDetection]:
    """Score one long mono 16 kHz recording; returns debounced detections
    identical to streaming it chunk-by-chunk.

    With more than one device (or an explicit `mesh`) the window batch
    shards over the mesh — windows are independent, so a long recording
    scores N-chips-wide with no collectives. mesh=False forces
    single-device."""
    fcfg = config.features
    window = fcfg.segment_samples
    hop = int(fcfg.sample_rate * hop_duration)
    model = model_from_config(config.model)

    if mesh is None and len(jax.devices()) > 1:
        mesh = make_mesh()
    if mesh is False:
        mesh = None
    sharding = batch_sharding(mesh) if mesh is not None else None
    if mesh is not None:
        # The padded batch must be divisible by the device count, which
        # padding *up to batch_size* alone doesn't guarantee — round the
        # batch size itself up to a device multiple.
        n_dev = mesh.devices.size
        batch_size = -(-batch_size // n_dev) * n_dev

    @jax.jit
    def score(windows):
        waves = frontend.peak_normalize(windows)
        feats = frontend.extract_features_fast(waves, fcfg)
        logits = model.apply(variables, feats, train=False)
        return jax.nn.softmax(logits, axis=-1)[:, 1]

    windows = frame_windows(jnp.asarray(wave, jnp.float32), window, hop)
    n = windows.shape[0]
    probs = np.empty(n, np.float32)
    for start in range(0, n, batch_size):
        chunk = windows[start : start + batch_size]
        real = chunk.shape[0]
        pad = batch_size - real
        # One compiled shape across batches; under a mesh the pad also
        # keeps the batch divisible by the device count.
        if pad and (mesh is not None or n > batch_size):
            chunk = jnp.pad(chunk, ((0, pad), (0, 0)))
        if sharding is not None:
            chunk = jax.device_put(chunk, sharding)
        probs[start : start + real] = np.asarray(score(chunk))[:real]

    return smooth_and_debounce(
        probs,
        hop_samples=hop,
        window_samples=window,
        sample_rate=fcfg.sample_rate,
        threshold=threshold,
        smoothing_window=smoothing_window,
        debounce_seconds=debounce_seconds,
    )
