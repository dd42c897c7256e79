"""Golden-parity tests: JAX front end vs the independent torch/scipy golden.

Each DSP stage is validated separately (SURVEY.md §4 test strategy), then the
full stacked pipeline. Tolerance: the ≤1e-3 relative budget from BASELINE.md,
tightened where float32 allows.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

import golden_ref as gold
from cough_detector_tpu.config import FeatureConfig
from cough_detector_tpu.ops import frontend, filters
from cough_detector_tpu.ops.resample import resample, make_resample_fn
import cough_detector_tpu.ops.resample as _rsmod

CFG = FeatureConfig()


def _rel_err(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    denom = max(np.abs(b).max(), 1e-8)
    return float(np.abs(a - b).max() / denom)


class TestFilters:
    def test_mel_fbank_matches_golden(self):
        ours = filters.mel_filterbank(257, 64, 16000, 100.0, 4000.0)
        theirs = gold.mel_fbank(257, 64, 16000, 100.0, 4000.0).numpy()
        assert _rel_err(ours, theirs) < 1e-6

    def test_dct_matches_scipy(self):
        import scipy.fft

        ours = filters.dct_matrix(13, 64).astype(np.float64)
        eye = np.eye(64)
        theirs = scipy.fft.dct(eye, type=2, axis=0, norm="ortho")[:13].T
        assert _rel_err(ours, theirs) < 1e-6

    def test_hann_matches_torch(self):
        ours = filters.hann_window(400)
        theirs = torch.hann_window(400, dtype=torch.float64).numpy()
        assert _rel_err(ours, theirs) < 1e-12


class TestSpectrogram:
    @pytest.mark.parametrize("clip", range(4))
    def test_power_spectrogram(self, wave_batch, clip):
        w = wave_batch[clip : clip + 1]
        ours = frontend.power_spectrogram(w, 512, 160, 400)[0]  # (T, F)
        theirs = gold.stft_power(torch.from_numpy(w[0])).numpy().T
        assert ours.shape == theirs.shape == (101, 257)
        assert _rel_err(ours, theirs) < 1e-4

    def test_mel_spectrogram(self, wave_batch):
        ours = frontend.mel_spectrogram(wave_batch, CFG)  # (B, T, n_mels)
        for i in range(wave_batch.shape[0]):
            theirs = gold.mel_spectrogram(torch.from_numpy(wave_batch[i])).numpy().T
            assert _rel_err(ours[i], theirs) < 1e-4

    def test_log_mel_norm(self, wave_batch):
        mel = frontend.mel_spectrogram(wave_batch, CFG)
        ours = frontend.log_mel_norm(mel)
        for i in range(wave_batch.shape[0]):
            gm = gold.mel_spectrogram(torch.from_numpy(wave_batch[i]))
            theirs = gold.log_mel_norm(gm).numpy().T
            assert _rel_err(ours[i], theirs) < 1e-3


class TestMFCC:
    def test_mfcc_z_normalized(self, wave_batch):
        ours = frontend.mfcc(wave_batch, CFG)  # (B, T, 13)
        for i in range(wave_batch.shape[0]):
            raw = gold.mfcc(torch.from_numpy(wave_batch[i]))
            theirs = gold.zscore_global(raw).numpy().T
            assert _rel_err(ours[i], theirs) < 1e-3

    def test_deltas(self, cough_wave):
        w = cough_wave[None]
        mf = frontend.mfcc(w, CFG)
        ours = frontend.compute_deltas(mf)[0]  # (T, 13)
        raw = gold.zscore_global(gold.mfcc(torch.from_numpy(cough_wave)))
        theirs = gold.compute_deltas(raw).numpy().T
        assert _rel_err(ours, theirs) < 1e-3


class TestOptionalBranches:
    def test_pcen(self, cough_wave):
        w = cough_wave[None]
        mel = frontend.mel_spectrogram(w, CFG)
        ours = frontend.pcen(mel)[0]  # (T, n_mels)
        gm = gold.mel_spectrogram(torch.from_numpy(cough_wave))
        theirs = gold.pcen_minmax(gm).numpy().T
        assert _rel_err(ours, theirs) < 1e-3

    def test_pre_emphasis(self, cough_wave):
        ours = frontend.pre_emphasis(cough_wave[None])[0]
        theirs = gold.pre_emphasis(torch.from_numpy(cough_wave)).numpy()
        assert _rel_err(ours, theirs) < 1e-6

    def test_spectral_contrast(self, cough_wave):
        ours = frontend.spectral_contrast(cough_wave[None], CFG)[0]  # (T, 7)
        theirs = gold.spectral_contrast(torch.from_numpy(cough_wave)).numpy().T
        assert _rel_err(ours, theirs) < 1e-3

    def test_spectral_contrast_rank_tails_match_select(self, cough_wave):
        # The TPU-default stable-rank tail formulation and the r3
        # approx_k selection are both exact; they may differ only in f32
        # summation order inside the tail means.
        sel = frontend.spectral_contrast(cough_wave[None], CFG, tails="select")
        rnk = frontend.spectral_contrast(cough_wave[None], CFG, tails="rank")
        np.testing.assert_allclose(
            np.asarray(rnk), np.asarray(sel), rtol=1e-5, atol=1e-6
        )

    @pytest.mark.parametrize(
        "kind", ["random", "ties", "sorted", "reverse", "constant", "zeros"]
    )
    def test_tail_sums_rank_exact(self, kind):
        # Adversarial selection inputs vs a float64 sort oracle: the rank
        # threshold must select exactly the k largest / smallest values,
        # including under heavy ties (index tiebreak keeps ranks a
        # permutation, so exactly k elements land in each tail).
        rng = np.random.default_rng(7)
        w = 29
        x = rng.random((4, 11, w)).astype(np.float32)
        if kind == "ties":
            x = np.round(x * 4.0) / 4.0
        elif kind == "sorted":
            x = np.sort(x, axis=-1)
        elif kind == "reverse":
            x = np.sort(x, axis=-1)[..., ::-1].copy()
        elif kind == "constant":
            x = np.full_like(x, 0.625)
        elif kind == "zeros":
            x = np.zeros_like(x)
        for n_top, n_bot in [(1, 1), (2, 5), (6, 6), (28, 3)]:
            top, bot = frontend._tail_sums_rank(jnp.asarray(x), n_top, n_bot)
            xs = np.sort(x.astype(np.float64), axis=-1)
            np.testing.assert_allclose(
                np.asarray(top), xs[..., w - n_top:].sum(-1), rtol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(bot), xs[..., :n_bot].sum(-1), rtol=1e-6
            )


class TestWaveformStages:
    def test_peak_normalize(self, wave_batch):
        scaled = wave_batch * 0.37
        ours = frontend.peak_normalize(scaled)
        assert np.allclose(
            np.max(np.abs(np.asarray(ours)), axis=-1), 1.0, atol=1e-6
        )

    def test_peak_normalize_silent_noop(self):
        silent = np.zeros((2, 100), np.float32)
        out = frontend.peak_normalize(silent)
        assert np.all(np.asarray(out) == 0)

    @pytest.mark.parametrize("length", [8000, 16000, 24000])
    def test_pad_or_trim(self, length):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((2, length)).astype(np.float32)
        ours = frontend.pad_or_trim(w, 16000)
        theirs = gold.pad_or_trim(torch.from_numpy(w), 16000).numpy()
        assert ours.shape == (2, 16000)
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-7)


class TestFullPipeline:
    def test_shipped_config_geometry(self, wave_batch):
        feats = frontend.extract_features(wave_batch, CFG)
        assert feats.shape == (8, 90, 101)

    def test_shipped_config_parity(self, wave_batch):
        ours = frontend.extract_features(wave_batch, CFG)
        for i in range(wave_batch.shape[0]):
            theirs = gold.extract_features(
                torch.from_numpy(wave_batch[i]),
                use_mfcc=True,
            ).numpy()
            assert _rel_err(ours[i], theirs) < 1e-3, f"clip {i}"

    def test_all_flags_on_geometry_and_parity(self, cough_wave):
        cfg = FeatureConfig(
            use_pcen=True,
            use_pre_emphasis=True,
            use_delta_delta=True,
            use_spectral_contrast=True,
        )
        assert cfg.num_features == 110
        ours = frontend.extract_features(cough_wave[None], cfg)
        assert ours.shape == (1, 110, 101)
        theirs = gold.extract_features(
            torch.from_numpy(cough_wave),
            use_mfcc=True,
            use_pcen=True,
            use_pre_emphasis=True,
            use_delta_delta=True,
            use_spectral_contrast=True,
        ).numpy()
        assert _rel_err(ours[0], theirs) < 1e-3

    def test_process_end_to_end(self, wave_batch):
        loud = wave_batch * 0.25
        ours = frontend.process(loud, CFG)
        for i in range(wave_batch.shape[0]):
            w = gold.peak_normalize(torch.from_numpy(loud[i]))
            w = gold.pad_or_trim(w, 16000)
            theirs = gold.extract_features(w).numpy()
            assert _rel_err(ours[i], theirs) < 1e-3

    def test_jit_matches_eager(self, wave_batch):
        fn = frontend.make_feature_fn(CFG)
        jit_out = np.asarray(fn(wave_batch))
        eager = np.asarray(frontend.extract_features(wave_batch, CFG))
        np.testing.assert_allclose(jit_out, eager, rtol=1e-5, atol=1e-6)


class TestFrameSignal:
    """The block-decomposed framing must reproduce torch.stft's center/
    reflect frame extraction exactly for every window/hop relationship
    (hop | n_fft, hop ∤ n_fft, hop == n_fft, hop > half)."""

    @pytest.mark.parametrize(
        "n_samples,n_fft,hop",
        [(16000, 512, 160), (16000, 512, 512), (8000, 400, 100),
         (5000, 256, 200), (16000, 512, 256)],
    )
    def test_exact_vs_naive_slicing(self, n_samples, n_fft, hop):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(3, n_samples)).astype(np.float32)
        got = np.asarray(frontend.frame_signal(w, n_fft, hop))
        half = n_fft // 2
        wp = np.pad(w, [(0, 0), (half, half)], mode="reflect")
        n_frames = (wp.shape[-1] - n_fft) // hop + 1
        ref = np.stack(
            [wp[:, t * hop : t * hop + n_fft] for t in range(n_frames)],
            axis=1,
        )
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)


class TestResample:
    @pytest.mark.parametrize(
        "orig_sr", [8000, 11025, 22050, 32000, 44100, 48000]
    )
    def test_matches_golden(self, orig_sr):
        rng = np.random.default_rng(3)
        w = rng.standard_normal((1, orig_sr)).astype(np.float32)  # 1 s
        ours = np.asarray(resample(w, orig_sr, 16000))[0]
        theirs = gold.resample(torch.from_numpy(w[0]), orig_sr, 16000).numpy()
        assert ours.shape == theirs.shape
        assert _rel_err(ours, theirs) < 1e-3

    def test_identity(self):
        w = np.ones((1, 100), np.float32)
        out = resample(w, 16000, 16000)
        np.testing.assert_array_equal(np.asarray(out), w)

    def test_preserves_sine(self):
        # A 440 Hz tone resampled 48k → 16k must stay a 440 Hz tone.
        t48 = np.arange(48000) / 48000
        w = np.sin(2 * np.pi * 440 * t48).astype(np.float32)[None]
        out = np.asarray(resample(w, 48000, 16000))[0]
        t16 = np.arange(out.shape[0]) / 16000
        expect = np.sin(2 * np.pi * 440 * t16).astype(np.float32)
        # Ignore filter-width edges.
        assert _rel_err(out[100:-100], expect[100:-100]) < 5e-3
