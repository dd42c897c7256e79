"""Jit-compiled sliding-window ring buffer for streaming audio.

The reference grows an unbounded Python-side buffer and loops
`while len >= window: emit window; advance hop`
(reference: src/preprocessing.py:582-612). That is re-architected as a
fixed-shape device-resident state machine so the entire streaming step —
buffer update, window extraction, normalization, feature extraction,
classification, smoothing, thresholding, debouncing — compiles into ONE jit
program per chunk, batched over S concurrent streams (BASELINE config 5:
256 streams/chip; the stream axis shards across chips via the mesh).

Key invariants (matching the reference loop exactly):
  * fill < window after every step, so capacity window+chunk-1 suffices;
  * a chunk of C samples completes at most K = (window-1+C-window)//hop + 1
    windows — all K candidate windows are computed unconditionally (static
    shapes) and masked by validity;
  * window k starts at offset k*hop in the pending buffer; the buffer then
    shifts left by n_valid*hop.

Timestamps are *stream time* (samples consumed / sample_rate), making
detection deterministic and testable — unlike the reference's wall-clock
datetime.now() (reference: src/inference.py:226).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import FeatureConfig, StreamConfig


class StreamState(NamedTuple):
    """Device-resident state for S concurrent streams (lockstep chunks)."""

    buffer: jnp.ndarray        # (S, capacity) pending samples
    fill: jnp.ndarray          # () scalar: valid samples per stream
    windows_emitted: jnp.ndarray  # () scalar: total windows so far
    history: jnp.ndarray       # (S, smoothing_window) recent confidences
    history_len: jnp.ndarray   # (S,) valid history entries per lane (<= win)
    last_fire_window: jnp.ndarray  # (S,) int32 window index of last detection
    threshold: jnp.ndarray     # (S,) f32 per-lane confidence threshold


def init_state(
    num_streams: int,
    chunk_size: int,
    window_samples: int,
    smoothing_window: int,
    confidence_threshold: float = 0.7,
) -> StreamState:
    capacity = window_samples + chunk_size
    return StreamState(
        buffer=jnp.zeros((num_streams, capacity), jnp.float32),
        fill=jnp.zeros((), jnp.int32),
        windows_emitted=jnp.zeros((), jnp.int32),
        history=jnp.zeros((num_streams, smoothing_window), jnp.float32),
        history_len=jnp.zeros((num_streams,), jnp.int32),
        last_fire_window=jnp.full((num_streams,), -(1 << 24), jnp.int32),
        threshold=jnp.full(
            (num_streams,), confidence_threshold, jnp.float32
        ),
    )


def max_windows_per_chunk(chunk_size: int, hop_samples: int) -> int:
    return (chunk_size - 1) // hop_samples + 1


def stream_step(
    state: StreamState,
    chunk: jnp.ndarray,
    score_fn: Callable[[jnp.ndarray], jnp.ndarray],
    *,
    window_samples: int,
    hop_samples: int,
    sample_rate: int,
    debounce_seconds: float,
) -> Tuple[StreamState, dict]:
    """One streaming tick for all S streams.

    chunk: (S, C) raw audio. score_fn: (B, window) → (B,) cough probability
    (normalize→features→model→softmax, supplied by the detector).

    Returns (new_state, events) where events carries per-candidate-window
    arrays: probs (S, K), smoothed (S, K), fired (S, K) bool,
    valid (K,) bool, timestamps (K,) stream-time seconds.

    chunk may be int16 PCM (i = clip(round(x*32768), -32768, 32767)):
    it is dequantized to f32 here, INSIDE the jit program, so the
    host→device transfer moves half the bytes — at 1,024 streams the f32
    tick uploads 6.5 MB every 100 ms (~65 MB/s), which saturates the dev
    tunnel's measured ~60 MB/s and stalls event fetches behind it. Mic
    capture hardware emits 16-bit PCM anyway, so the int16 tick is the
    production-faithful ingest format, not an approximation.

    chunk may also be uint8 μ-law codes (serve.quantize_mulaw: mid-tread
    G.711-style companding, code = round(sign(x)·ln(1+255|x|)/ln(256)
    · 127) + 128) — the quarter-bandwidth tick for links where even the
    int16 upload saturates. Decoded here in-jit: x = sign(y)·(256^|y|
    − 1)/255 with y = (code−128)/127.
    """
    if chunk.dtype == jnp.int16:
        chunk = chunk.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    elif chunk.dtype == jnp.uint8:
        y = (chunk.astype(jnp.float32) - 128.0) * jnp.float32(1.0 / 127.0)
        chunk = jnp.sign(y) * (
            jnp.exp2(jnp.abs(y) * jnp.float32(8.0)) - 1.0
        ) * jnp.float32(1.0 / 255.0)
    s, c = chunk.shape
    k_max = max_windows_per_chunk(c, hop_samples)

    # 1. Append the chunk at the current fill offset.
    buffer = jax.lax.dynamic_update_slice(
        state.buffer, chunk, (jnp.int32(0), state.fill)
    )
    fill = state.fill + c

    n_valid = jnp.maximum(
        0, jnp.where(fill >= window_samples,
                     (fill - window_samples) // hop_samples + 1, 0)
    ).astype(jnp.int32)
    n_valid = jnp.minimum(n_valid, k_max)

    # 2. Score all K candidate windows (static shapes; invalid ones masked).
    probs = []
    for k in range(k_max):
        win = jax.lax.dynamic_slice(
            buffer, (jnp.int32(0), jnp.int32(k * hop_samples)),
            (s, window_samples),
        )
        probs.append(score_fn(win))
    probs = jnp.stack(probs, axis=1)  # (S, K)
    valid = jnp.arange(k_max) < n_valid  # (K,)

    # 3. Smoothing: append each valid window's prob to the circular history
    #    and average over the populated entries — deque(maxlen).mean()
    #    semantics (reference: src/inference.py:219-223). history_len is
    #    PER LANE so a lane whose state was scrubbed on slot reuse
    #    (detector.reset_streams) restarts with an empty deque — its first
    #    windows average only its own confidences, never injected zeros,
    #    exactly like a fresh single stream.
    smooth_win = state.history.shape[1]
    history, history_len = state.history, state.history_len
    smoothed_list = []
    for k in range(k_max):
        new_hist = jnp.concatenate(
            [history[:, 1:], probs[:, k : k + 1]], axis=1
        )
        new_len = jnp.minimum(history_len + 1, smooth_win)  # (S,)
        history = jnp.where(valid[k], new_hist, history)
        history_len = jnp.where(valid[k], new_len, history_len)
        idx = jnp.arange(smooth_win)
        mask = idx[None, :] >= (smooth_win - history_len)[:, None]  # (S, W)
        denom = jnp.maximum(history_len, 1)
        smoothed = jnp.sum(history * mask, axis=1) / denom
        smoothed_list.append(smoothed)
    smoothed = jnp.stack(smoothed_list, axis=1)  # (S, K)

    # 4. Threshold + debounce in stream time
    #    (reference: src/inference.py:225-239). The threshold is PER LANE
    #    (state.threshold, set at init and re-settable per slot on reuse —
    #    multi-tenant serving grants each stream its own sensitivity
    #    without a second XLA program). All time arithmetic is in
    #    integer WINDOW INDICES: f32 seconds round such that an exact
    #    debounce-interval boundary (e.g. 0.5 s at a 0.25 s hop) flakily
    #    compares as 0.49999976 < 0.5 and drops detections, and int32
    #    *sample* indices overflow after ~37 h at 16 kHz. Window k fires at
    #    sample w_k*hop + window, so the debounce condition
    #    (w_k - w_last)*hop >= debounce_samples is exactly
    #    w_k - w_last >= ceil(debounce_samples / hop); int32 window indices
    #    are safe for 2^31 windows (~17 years at a 0.25 s hop).
    base_windows = state.windows_emitted
    win_idx = base_windows + jnp.arange(k_max)  # (K,) int32
    timestamps = (
        win_idx.astype(jnp.float32) * hop_samples + window_samples
    ) / sample_rate  # display only; hosts derive exact times from win_idx
    debounce_windows = jnp.int32(
        -(-int(round(debounce_seconds * sample_rate)) // hop_samples)
    )

    last_fire = state.last_fire_window  # (S,) int32 window index
    fired_list = []
    for k in range(k_max):
        can_fire = (
            valid[k]
            & (smoothed[:, k] >= state.threshold)
            & (win_idx[k] - last_fire >= debounce_windows)
        )
        last_fire = jnp.where(can_fire, win_idx[k], last_fire)
        fired_list.append(can_fire)
    fired = jnp.stack(fired_list, axis=1)  # (S, K)

    # 5. Advance the buffer by the consumed hops.
    consumed = n_valid * hop_samples
    shifted = jax.lax.dynamic_slice(
        jnp.pad(buffer, ((0, 0), (0, k_max * hop_samples))),
        (jnp.int32(0), consumed),
        (s, buffer.shape[1]),
    )
    new_state = StreamState(
        buffer=shifted,
        fill=fill - consumed,
        windows_emitted=base_windows + n_valid,
        history=history,
        history_len=history_len,
        last_fire_window=last_fire,
        threshold=state.threshold,
    )
    # Single packed f32 event tensor, (3 + 2S, K): one host fetch decodes
    # a whole tick. Over the dev tunnel each fetch costs a ~27 ms round
    # trip, so fetching fired/valid/smoothed/win_idx separately (4 trips)
    # would alone overrun a 100 ms real-time tick — the serving daemon's
    # delivery thread reads ONLY this. win_idx rides as two 15-bit f32
    # halves (exact: f32 holds integers < 2^24; a raw int32 cast would
    # corrupt after ~2^24 windows ≈ 48 days at a 0.25 s hop).
    packed = jnp.concatenate(
        [
            jnp.stack(
                [
                    valid.astype(jnp.float32),
                    (win_idx >> 15).astype(jnp.float32),
                    (win_idx & 0x7FFF).astype(jnp.float32),
                ],
                axis=0,
            ),
            smoothed,
            fired.astype(jnp.float32),
        ],
        axis=0,
    )
    events = {
        "probs": probs,
        "smoothed": smoothed,
        "fired": fired,
        "valid": valid,
        "timestamps": timestamps,
        "window_index": win_idx,
        "packed": packed,
    }
    return new_state, events


def make_stream_step(
    score_fn: Callable[[jnp.ndarray], jnp.ndarray],
    feature_config: FeatureConfig,
    stream_config: StreamConfig,
    chunk_size: int,
):
    """Jitted streaming tick bound to fixed geometry."""
    window = int(feature_config.sample_rate * stream_config.window_duration)
    hop = int(feature_config.sample_rate * stream_config.hop_duration)
    fn = functools.partial(
        stream_step,
        score_fn=score_fn,
        window_samples=window,
        hop_samples=hop,
        sample_rate=feature_config.sample_rate,
        debounce_seconds=stream_config.debounce_seconds,
    )
    return jax.jit(fn, donate_argnums=(0,))
