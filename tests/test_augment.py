"""Augmentation tests: statistical semantics of each batched op."""

import jax
import jax.numpy as jnp
import numpy as np

from cough_detector_tpu.augment import (
    add_gaussian_noise,
    add_file_noise,
    augment_waveforms,
    mixup,
    pitch_shift_semitones,
    spec_augment,
    time_shift,
    volume_perturbation,
)

KEY = jax.random.PRNGKey(0)


def _waves(b=16, s=16000, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, s)).astype(np.float32)
    )


class TestTimeShift:
    def test_p_zero_identity(self):
        w = _waves()
        out = time_shift(w, KEY, p=0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(w))

    def test_shift_preserves_interior_and_zero_fills(self):
        w = _waves(4, 1000)
        out = np.asarray(time_shift(w, KEY, p=1.0, shift_limit=0.2))
        w = np.asarray(w)
        for i in range(4):
            # Find the shift by matching the first source sample.
            nz = out[i] != 0
            assert nz.any()
            # Content must be a contiguous block of the source.
            # Recover shift via cross-correlation peak.
            shifts = []
            for cand in range(-200, 201):
                if cand >= 0:
                    seg_o, seg_w = out[i, cand:], w[i, : 1000 - cand]
                else:
                    seg_o, seg_w = out[i, :cand], w[i, -cand:]
                if np.allclose(seg_o, seg_w, atol=1e-6):
                    shifts.append(cand)
            assert shifts, f"clip {i}: no consistent shift found"
            assert abs(shifts[0]) <= 200

    def test_bounded_by_limit(self):
        w = _waves(64, 500)
        out = np.asarray(time_shift(w, KEY, p=1.0, shift_limit=0.1))
        # Zero-filled tail/head can be at most 10% of the length (50).
        zeros = (out == 0).sum(axis=1)
        assert zeros.max() <= 51


class TestVolume:
    def test_gain_range(self):
        w = _waves(512, 100)
        out = np.asarray(volume_perturbation(w, KEY, p=1.0))
        ratio = out[:, 0] / np.asarray(w)[:, 0]
        assert ratio.min() >= 0.7 - 1e-5 and ratio.max() <= 1.3 + 1e-5

    def test_p_zero_identity(self):
        w = _waves()
        out = volume_perturbation(w, KEY, p=0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(w))


class TestGaussianNoise:
    def test_snr_in_range(self):
        w = jnp.asarray(
            np.sin(np.linspace(0, 100, 16000)).astype(np.float32)
        )[None, :].repeat(64, axis=0)
        out = np.asarray(add_gaussian_noise(w, KEY, p=1.0, snr_range=(10, 30)))
        noise = out - np.asarray(w)
        snr = 10 * np.log10(
            np.mean(np.asarray(w) ** 2, axis=1) / np.mean(noise**2, axis=1)
        )
        assert snr.min() > 9.0 and snr.max() < 31.0


class TestFileNoise:
    def test_mixes_bank_clip(self):
        w = _waves(8, 1000, seed=1)
        bank = _waves(3, 1200, seed=2)
        out = add_file_noise(w, KEY, p=1.0, noise_bank=bank)
        assert not np.allclose(np.asarray(out), np.asarray(w))

    def test_empty_gate(self):
        w = _waves(8, 1000)
        bank = _waves(3, 1200)
        out = add_file_noise(w, KEY, p=0.0, noise_bank=bank)
        np.testing.assert_allclose(np.asarray(out), np.asarray(w), atol=1e-7)


class TestChain:
    def test_jit_and_shapes(self):
        w = _waves(8)
        fn = jax.jit(lambda w, k: augment_waveforms(w, k, p=0.3))
        out = fn(w, KEY)
        assert out.shape == w.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_deterministic_per_key(self):
        w = _waves(8)
        a = augment_waveforms(w, KEY, p=0.5)
        b = augment_waveforms(w, KEY, p=0.5)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSpecAugment:
    def test_masks_are_zeros_within_bounds(self):
        feats = jnp.ones((16, 90, 101))
        out = np.asarray(spec_augment(feats, KEY, p=1.0))
        # Masked elements are exactly zero; unmasked untouched.
        assert ((out == 0) | (out == 1)).all()
        # Each sample: freq mask width <= 2*8, time <= 2*15 (2 masks each).
        zero_freq_rows = (out == 0).all(axis=2).sum(axis=1)
        zero_time_cols = (out == 0).all(axis=1).sum(axis=1)
        assert zero_freq_rows.max() <= 16
        assert zero_time_cols.max() <= 30

    def test_p_zero_identity(self):
        feats = jnp.ones((4, 90, 101))
        out = spec_augment(feats, KEY, p=0.0)
        np.testing.assert_array_equal(np.asarray(out), np.ones((4, 90, 101)))


class TestMixUp:
    def test_convexity(self):
        x = _waves(32, 100)
        y = jax.nn.one_hot(jnp.arange(32) % 2, 2)
        xm, ym = mixup(x, y, KEY, alpha=0.2)
        assert xm.shape == x.shape and ym.shape == y.shape
        np.testing.assert_allclose(np.asarray(ym).sum(-1), 1.0, atol=1e-6)
        # mixup blends x with a row-permutation of itself, so every
        # output value is a convex combination of values of x.
        lo = np.asarray(x).min()
        assert np.asarray(xm).min() >= lo - 1e-5


class TestPitchShift:
    def test_shifts_dominant_frequency(self):
        sr = 16000
        t = np.arange(sr) / sr
        tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
        up = np.asarray(pitch_shift_semitones(jnp.asarray(tone), 2, sr))[0]
        spec = np.abs(np.fft.rfft(up * np.hanning(len(up))))
        peak_hz = np.argmax(spec) * sr / len(up)
        expect = 440 * 2 ** (2 / 12)
        assert abs(peak_hz - expect) < 15, peak_hz

    def test_zero_is_identity(self):
        w = _waves(2)
        out = pitch_shift_semitones(w, 0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(w))


class TestSpeedPerturbation:
    def test_changes_dominant_frequency(self):
        from cough_detector_tpu.augment.waveform import speed_perturbation

        sr = 16000
        t = np.arange(sr) / sr
        tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        w = jnp.asarray(np.tile(tone, (16, 1)))
        out = np.asarray(speed_perturbation(w, KEY, p=1.0))
        peaks = []
        for i in range(16):
            spec = np.abs(np.fft.rfft(out[i] * np.hanning(sr)))
            peaks.append(np.argmax(spec) * sr / sr)
        # Every clip lands near 440*f for one of the factors.
        for pk in peaks:
            ratios = pk / 440.0
            assert min(abs(ratios - f) for f in (0.9, 0.95, 1.05, 1.1)) < 0.02

    def test_p_zero_identity(self):
        from cough_detector_tpu.augment.waveform import speed_perturbation

        w = _waves(4)
        out = speed_perturbation(w, KEY, p=0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(w))

    def test_chain_flag(self):
        w = _waves(4)
        a = augment_waveforms(w, KEY, p=0.0, use_speed_perturbation=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(w))
