"""Reference-API facade tests: a reference user's code works unchanged."""

import numpy as np
import pytest
import torch

import golden_ref as gold
from cough_detector_tpu.augmentation import (
    AudioAugmentor,
    MixUp,
    SpecAugment,
    create_augmentation_pipeline,
)
from cough_detector_tpu.data import audio_io, synth
from cough_detector_tpu.preprocessing import (
    AudioPreprocessor,
    RealtimePreprocessor,
    create_preprocessor,
)

# The shipped training feature flags (reference: src/train.py:264-287).
TRAIN_FLAGS = dict(
    use_mfcc=True, use_pcen=False, use_pre_emphasis=False,
    use_delta_delta=False, use_spectral_contrast=False,
)


class TestAudioPreprocessor:
    def test_constructor_defaults_are_reference_defaults(self):
        pre = AudioPreprocessor()
        # Reference constructor enables everything → 110 features
        # (reference: src/preprocessing.py:29,43-49).
        assert pre.get_num_features() == 110
        assert pre.get_expected_time_frames() == 101

    def test_process_file_matches_golden(self, tmp_path):
        wave = synth.synthetic_cough(3, duration_s=2.0, sample_rate=22050)
        p = tmp_path / "c.wav"
        audio_io.write_wav(p, wave, 22050)

        pre = AudioPreprocessor(**TRAIN_FLAGS)
        feats = pre.process_file(str(p))
        assert feats.shape == (1, 90, 101)

        w = gold.resample(torch.from_numpy(wave), 22050, 16000)
        w = gold.peak_normalize(w)
        w = gold.pad_or_trim(w, 16000)
        want = gold.extract_features(w).numpy()
        err = np.abs(feats[0] - want).max() / np.abs(want).max()
        assert err < 1e-3

    def test_stage_methods(self):
        pre = AudioPreprocessor(**TRAIN_FLAGS)
        w = synth.synthetic_cough(0, 1.0)[None]
        assert pre.normalize(w * 0.2).max() <= 1.0 + 1e-6
        assert pre.pad_or_trim(w[:, :8000]).shape == (1, 16000)
        assert pre.extract_mel_spectrogram(w).shape == (1, 64, 101)
        assert pre.extract_mfcc(w).shape == (1, 13, 101)
        assert pre.to_mono(np.vstack([w, w])).shape == (1, 16000)

    def test_factory(self):
        assert isinstance(create_preprocessor(realtime=True), RealtimePreprocessor)
        assert not isinstance(create_preprocessor(), RealtimePreprocessor)


class TestRealtimePreprocessor:
    def test_add_audio_window_emission(self):
        pre = RealtimePreprocessor(
            window_duration=1.0, hop_duration=0.25, **TRAIN_FLAGS
        )
        chunk = synth.synthetic_cough(1, 2.0)
        outs = []
        for i in range(0, 32000, 1600):
            outs.extend(pre.add_audio(chunk[i : i + 1600]))
        # 2 s with 1 s window / 0.25 s hop → 5 windows
        assert len(outs) == 5
        assert all(o.shape == (1, 90, 101) for o in outs)

    def test_matches_offline_windows(self):
        pre = RealtimePreprocessor(
            window_duration=1.0, hop_duration=0.25, **TRAIN_FLAGS
        )
        signal = synth.synthetic_cough(2, 2.0)
        outs = []
        for i in range(0, 32000, 1600):
            outs.extend(pre.add_audio(signal[i : i + 1600]))
        off = AudioPreprocessor(**TRAIN_FLAGS)
        for k, got in enumerate(outs):
            window = signal[k * 4000 : k * 4000 + 16000]
            want = off.extract_features(off.normalize(window[None]))
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_reset(self):
        pre = RealtimePreprocessor(**TRAIN_FLAGS)
        pre.add_audio(np.zeros(8000, np.float32))
        pre.reset()
        assert pre.buffer.shape == (1, 0)


class TestAugmentorFacades:
    def test_augment_chain_shape_and_determinism(self):
        w = synth.synthetic_cough(0, 1.0)[None]
        a1 = AudioAugmentor(p_augment=0.5, seed=7)
        a2 = AudioAugmentor(p_augment=0.5, seed=7)
        out1, out2 = a1.augment(w), a2.augment(w)
        assert out1.shape == w.shape
        np.testing.assert_array_equal(out1, out2)

    def test_noise_dir_bank(self, tmp_path):
        for i in range(3):
            audio_io.write_wav(
                tmp_path / f"n{i}.wav",
                synth.synthetic_non_cough(i, 1.5), 16000,
            )
        aug = AudioAugmentor(noise_dir=str(tmp_path), p_augment=1.0)
        assert len(aug.noise_samples) == 3
        w = synth.synthetic_cough(0, 1.0)[None]
        assert not np.allclose(aug.add_noise(w), w)

    def test_speed_perturbation_is_noop(self):
        aug = AudioAugmentor(p_augment=1.0)
        w = synth.synthetic_cough(0, 1.0)[None]
        np.testing.assert_array_equal(aug.speed_perturbation(w), w)

    def test_spec_augment_single_sample(self):
        sa = SpecAugment(freq_mask_param=8, time_mask_param=15, p=1.0)
        spec = np.ones((1, 90, 101), np.float32)
        out = sa(spec)
        assert out.shape == spec.shape
        assert (out == 0).any()

    def test_mixup(self):
        mu = MixUp(alpha=0.2, seed=0)
        x, y = mu(np.ones(4), np.array([1.0, 0]), np.zeros(4), np.array([0, 1.0]))
        assert 0 <= x[0] <= 1 and abs(y.sum() - 1) < 1e-6

    def test_pipeline_factory(self):
        aug, sa = create_augmentation_pipeline(p_augment=0.3)
        assert isinstance(aug, AudioAugmentor) and isinstance(sa, SpecAugment)
        _, none_sa = create_augmentation_pipeline(use_spec_augment=False)
        assert none_sa is None
