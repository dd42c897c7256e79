"""Reference-API preprocessing facade.

Class-for-class, method-for-method port surface of the reference
preprocessor (reference: src/preprocessing.py:13-632) over the batched
functional ops: a reference user's `AudioPreprocessor(...).process_file(p)`
works unchanged, returning the same (1, n_features, T) geometry. Internally
every call is the jitted batched pipeline; for throughput-critical code use
ops.make_feature_fn / ops.extract_features_fast directly on batches.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .config import FeatureConfig
from .data import audio_io
from .ops import frontend
from .ops.resample import resample as _resample


class AudioPreprocessor:
    """Offline feature extractor (reference: src/preprocessing.py:13-550).

    Constructor signature matches the reference; `device` is accepted for
    compatibility and ignored (JAX owns placement). NOTE: unlike the
    reference — whose constructor defaults enable every optional feature,
    disagreeing with its own shipped training config — defaults here can be
    chosen explicitly; passing nothing gives the reference constructor
    defaults for drop-in behavior.
    """

    def __init__(
        self,
        sample_rate: int = 16000,
        n_mels: int = 64,
        n_fft: int = 512,
        hop_length: int = 160,
        win_length: int = 400,
        f_min: float = 100.0,
        f_max: float = 4000.0,
        segment_duration: float = 1.0,
        n_mfcc: int = 13,
        use_mfcc: bool = True,
        use_pcen: bool = True,
        use_pre_emphasis: bool = True,
        pre_emphasis_coef: float = 0.97,
        use_delta_delta: bool = True,
        use_spectral_contrast: bool = True,
        n_contrast_bands: int = 6,
        device: str = "cpu",
    ):
        del device
        self.config = FeatureConfig(
            sample_rate=sample_rate,
            n_mels=n_mels,
            n_fft=n_fft,
            hop_length=hop_length,
            win_length=win_length,
            f_min=f_min,
            f_max=f_max,
            segment_duration=segment_duration,
            n_mfcc=n_mfcc,
            use_mfcc=use_mfcc,
            use_pcen=use_pcen,
            use_pre_emphasis=use_pre_emphasis,
            pre_emphasis_coef=pre_emphasis_coef,
            use_delta_delta=use_delta_delta,
            use_spectral_contrast=use_spectral_contrast,
            n_contrast_bands=n_contrast_bands,
        )

    # expose the reference's attribute surface
    def __getattr__(self, name):
        cfg = object.__getattribute__(self, "config")
        if hasattr(cfg, name):
            return getattr(cfg, name)
        raise AttributeError(name)

    @property
    def segment_samples(self) -> int:
        return self.config.segment_samples

    # -- waveform stages (reference: src/preprocessing.py:155-385) --------

    def load_audio(self, path: str) -> Tuple[np.ndarray, int]:
        return audio_io.decode_audio(path)

    def resample(self, waveform: np.ndarray, orig_sr: int) -> np.ndarray:
        waveform = np.atleast_2d(np.asarray(waveform, np.float32))
        if orig_sr == self.config.sample_rate:
            return waveform
        return np.asarray(_resample(waveform, orig_sr, self.config.sample_rate))

    def to_mono(self, waveform: np.ndarray) -> np.ndarray:
        waveform = np.atleast_2d(np.asarray(waveform, np.float32))
        return waveform.mean(axis=0, keepdims=True)

    def normalize(self, waveform: np.ndarray) -> np.ndarray:
        return np.asarray(
            frontend.peak_normalize(np.atleast_2d(waveform.astype(np.float32)))
        )

    def pad_or_trim(
        self, waveform: np.ndarray, length: Optional[int] = None
    ) -> np.ndarray:
        length = length or self.config.segment_samples
        return np.asarray(
            frontend.pad_or_trim(
                np.atleast_2d(waveform.astype(np.float32)), length
            )
        )

    def apply_pre_emphasis(self, waveform: np.ndarray) -> np.ndarray:
        if not self.config.use_pre_emphasis:
            return np.atleast_2d(waveform)
        return np.asarray(
            frontend.pre_emphasis(
                np.atleast_2d(waveform.astype(np.float32)),
                self.config.pre_emphasis_coef,
            )
        )

    # -- feature stages (reference: src/preprocessing.py:387-489) ---------

    def extract_mel_spectrogram(self, waveform: np.ndarray) -> np.ndarray:
        w = np.atleast_2d(np.asarray(waveform, np.float32))
        mel = frontend.mel_spectrogram(w, self.config)
        mel = (
            frontend.pcen(mel)
            if self.config.use_pcen
            else frontend.log_mel_norm(mel)
        )
        return np.asarray(jnp.transpose(mel, (0, 2, 1)))

    def extract_mfcc(self, waveform: np.ndarray) -> np.ndarray:
        w = np.atleast_2d(np.asarray(waveform, np.float32))
        return np.asarray(
            jnp.transpose(frontend.mfcc(w, self.config), (0, 2, 1))
        )

    def compute_deltas(self, features: np.ndarray) -> np.ndarray:
        f = np.asarray(features, np.float32)  # (C, F, T)
        out = frontend.compute_deltas(jnp.transpose(f, (0, 2, 1)))
        return np.asarray(jnp.transpose(out, (0, 2, 1)))

    def extract_features(self, waveform: np.ndarray) -> np.ndarray:
        """(1, samples) → (1, n_features, T)."""
        w = np.atleast_2d(np.asarray(waveform, np.float32))
        return np.asarray(frontend.extract_features(w, self.config))

    def process(self, waveform: np.ndarray, orig_sr: int) -> np.ndarray:
        """resample → mono → normalize → pad/trim → features
        (reference: src/preprocessing.py:491-517)."""
        w = self.resample(np.atleast_2d(waveform), orig_sr)
        w = self.to_mono(w)
        return np.asarray(frontend.process(w, self.config))

    def process_file(self, path: str) -> np.ndarray:
        waveform, sr = self.load_audio(path)
        return self.process(waveform, sr)

    def get_expected_time_frames(self) -> int:
        return self.config.num_frames

    def get_num_features(self) -> int:
        return self.config.num_features


class RealtimePreprocessor(AudioPreprocessor):
    """Streaming facade (reference: src/preprocessing.py:553-616): append
    chunks, emit one feature tensor per completed window. Host-side buffer
    with the same while-loop semantics; for production multi-stream serving
    use stream.StreamingDetector, which runs the whole tick on device."""

    def __init__(
        self,
        window_duration: float = 1.0,
        hop_duration: float = 0.5,
        **kwargs,
    ):
        kwargs["segment_duration"] = window_duration
        super().__init__(**kwargs)
        self.window_duration = window_duration
        self.hop_duration = hop_duration
        self.window_samples = int(self.config.sample_rate * window_duration)
        self.hop_samples = int(self.config.sample_rate * hop_duration)
        self.buffer = np.zeros((1, 0), np.float32)

    def add_audio(self, audio_chunk: np.ndarray) -> List[np.ndarray]:
        chunk = np.atleast_2d(np.asarray(audio_chunk, np.float32))
        self.buffer = np.concatenate([self.buffer, chunk], axis=1)

        # Batch every completed window into ONE device call — same outputs
        # as the reference's per-window loop, minus the per-window dispatch.
        windows = []
        while self.buffer.shape[1] >= self.window_samples:
            windows.append(self.buffer[:, : self.window_samples])
            self.buffer = self.buffer[:, self.hop_samples :]
        if not windows:
            return []
        batch = np.concatenate(windows, axis=0)
        feats = frontend.extract_features(
            frontend.peak_normalize(batch), self.config
        )
        return [np.asarray(feats[i : i + 1]) for i in range(len(windows))]

    def reset(self) -> None:
        self.buffer = np.zeros((1, 0), np.float32)


def create_preprocessor(realtime: bool = False, **kwargs) -> AudioPreprocessor:
    """Factory (reference: src/preprocessing.py:619-632)."""
    if realtime:
        return RealtimePreprocessor(**kwargs)
    return AudioPreprocessor(**kwargs)
