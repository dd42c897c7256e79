"""Fused Pallas front-end kernel tests (interpret mode on the CPU mesh;
compiled-mode parity is validated on hardware by the verify recipe)."""

import numpy as np
import pytest
import torch

import golden_ref as gold
from cough_detector_tpu.config import FeatureConfig
from cough_detector_tpu.data import synth
from cough_detector_tpu.ops import frontend
from cough_detector_tpu.ops.pallas.frontend_kernel import (
    B_TILE,
    extract_features_fused,
)

CFG = FeatureConfig()


class TestFusedKernel:
    def test_parity_vs_golden(self, wave_batch):
        fused = np.asarray(
            extract_features_fused(wave_batch, CFG, interpret=True)
        )
        for i in range(wave_batch.shape[0]):
            theirs = gold.extract_features(
                torch.from_numpy(wave_batch[i])
            ).numpy()
            err = np.abs(fused[i] - theirs).max() / np.abs(theirs).max()
            assert err < 1e-3, f"clip {i}: {err}"

    def test_parity_vs_jnp_path(self, wave_batch):
        fused = np.asarray(
            extract_features_fused(wave_batch, CFG, interpret=True)
        )
        ref = np.asarray(frontend.extract_features(wave_batch, CFG))
        err = np.abs(fused - ref).max() / np.abs(ref).max()
        assert err < 1e-3

    @pytest.mark.parametrize("b", [1, 5, 8, 9])
    def test_batch_padding(self, b):
        w = synth.fixture_batch(max(b, B_TILE + 1), 1.0, seed=2)[:b]
        out = np.asarray(extract_features_fused(w, CFG, interpret=True))
        assert out.shape == (b, 90, 101)
        full = np.asarray(
            extract_features_fused(
                synth.fixture_batch(max(b, B_TILE + 1), 1.0, seed=2),
                CFG, interpret=True,
            )
        )
        np.testing.assert_allclose(out, full[:b], atol=1e-6)

    def test_unsupported_config_falls_back(self):
        # No-MFCC configs have no kernel (nor hybrid) coverage: the wrapper
        # must return the jnp path's output exactly.
        cfg = FeatureConfig(use_mfcc=False)
        w = synth.fixture_batch(2, 1.0, seed=0)
        out = np.asarray(extract_features_fused(w, cfg, interpret=True))
        ref = np.asarray(frontend.extract_features(w, cfg))
        assert out.shape == (2, 64, 101)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_four_step_matrices_reconstruct_dft(self):
        """M1·tw·M2 factorization must equal the plain windowed rDFT."""
        from cough_detector_tpu.ops import filters

        m1c, m1s, twc, tws, m2c, m2s = filters.four_step_dft_matrices(
            512, 400, dtype=np.dtype(np.float64)
        )
        rng = np.random.default_rng(0)
        x = rng.standard_normal((4, 512)).astype(np.float64)
        br, bi = x @ m1c, x @ m1s
        cr = br * twc - bi * tws
        ci = br * tws + bi * twc
        re = cr @ m2c - ci @ m2s
        im = cr @ m2s + ci @ m2c

        w = filters.padded_window(400, 512)
        truth = np.fft.rfft(x * w, axis=-1)
        np.testing.assert_allclose(re, truth.real, atol=1e-9)
        np.testing.assert_allclose(im, truth.imag, atol=1e-9)


class TestAlternateConfigs:
    @pytest.mark.parametrize(
        "kw",
        [
            dict(n_mels=32, n_mfcc=8),
            dict(segment_duration=0.5),
            dict(f_max=8000.0),   # full-band filterbank (no band-limit cut)
            dict(n_fft=256, win_length=200, hop_length=80),
        ],
    )
    def test_parity_vs_jnp(self, kw):
        cfg = FeatureConfig(**kw)
        w = synth.fixture_batch(8, cfg.segment_duration, seed=4)
        fused = np.asarray(extract_features_fused(w, cfg, interpret=True))
        ref = np.asarray(frontend.extract_features(w, cfg))
        assert fused.shape == ref.shape
        err = np.abs(fused - ref).max() / max(np.abs(ref).max(), 1e-8)
        assert err < 1e-3, err
        # Golden anchor: the jnp-vs-fused comparison alone can't catch a
        # filters.py bug BOTH paths inherit at non-default geometry, so
        # pin one clip against the independent torch/scipy reference too
        # (CLAUDE.md style rule: never our-impl-vs-our-impl only).
        theirs = gold.extract_features(
            torch.from_numpy(np.asarray(w[0])),
            sample_rate=cfg.sample_rate, n_fft=cfg.n_fft,
            hop_length=cfg.hop_length, win_length=cfg.win_length,
            n_mels=cfg.n_mels, n_mfcc=cfg.n_mfcc,
            f_min=cfg.f_min, f_max=cfg.f_max,
        ).numpy()
        gerr = (
            np.abs(fused[0] - theirs).max()
            / max(np.abs(theirs).max(), 1e-8)
        )
        assert gerr < 1e-3, gerr


class TestExtendedFlags:
    def test_pre_emphasis_and_delta_delta(self):
        cfg = FeatureConfig(use_pre_emphasis=True, use_delta_delta=True)
        assert cfg.num_features == 64 + 13 * 3
        w = synth.fixture_batch(8, 1.0, seed=5)
        fused = np.asarray(extract_features_fused(w, cfg, interpret=True))
        ref = np.asarray(frontend.extract_features(w, cfg))
        assert fused.shape == ref.shape == (8, 103, 101)
        err = np.abs(fused - ref).max() / np.abs(ref).max()
        assert err < 1e-3, err

    def test_vs_golden_with_flags(self, cough_wave):
        cfg = FeatureConfig(use_pre_emphasis=True, use_delta_delta=True)
        fused = np.asarray(
            extract_features_fused(cough_wave[None], cfg, interpret=True)
        )[0]
        theirs = gold.extract_features(
            torch.from_numpy(cough_wave),
            use_pre_emphasis=True, use_delta_delta=True,
        ).numpy()
        err = np.abs(fused - theirs).max() / np.abs(theirs).max()
        assert err < 1e-3, err


class TestPCENInKernel:
    def test_pcen_parity_vs_jnp(self):
        # Realistic (non-degenerate) clips: PCEN's per-clip min-max on a
        # digitally-silent or single-impulse clip normalizes pure float
        # noise, where no two float32 implementations can agree (the
        # reference has the same behavior).
        cfg = FeatureConfig(use_pcen=True)
        waves = np.stack(
            [synth.synthetic_cough(i, 1.0) for i in range(4)]
            + [synth.synthetic_non_cough(i, 1.0) for i in range(4)]
        )
        fused = np.asarray(extract_features_fused(waves, cfg, interpret=True))
        ref = np.asarray(frontend.extract_features(waves, cfg))
        err = np.abs(fused - ref).max() / np.abs(ref).max()
        assert err < 1e-3, err

    def test_pcen_vs_golden(self, cough_wave):
        cfg = FeatureConfig(use_pcen=True, use_pre_emphasis=True,
                            use_delta_delta=True)
        fused = np.asarray(
            extract_features_fused(cough_wave[None], cfg, interpret=True)
        )[0]
        theirs = gold.extract_features(
            torch.from_numpy(cough_wave),
            use_pcen=True, use_pre_emphasis=True, use_delta_delta=True,
        ).numpy()
        err = np.abs(fused - theirs).max() / np.abs(theirs).max()
        assert err < 1e-3, err


class TestHybridContrast:
    """All-flags configs run hybrid: kernel for mel/MFCC/deltas, jnp for the
    contrast rows — extract_features_fast covers every config without a
    full-path fallback."""

    def test_all_flags_matches_jnp_path(self):
        cfg = FeatureConfig(
            use_pcen=True, use_pre_emphasis=True, use_delta_delta=True,
            use_spectral_contrast=True,
        )
        assert cfg.num_features == 110
        w = synth.fixture_batch(8, 1.0, seed=6)
        fused = np.asarray(extract_features_fused(w, cfg, interpret=True))
        ref = np.asarray(frontend.extract_features(w, cfg))
        assert fused.shape == ref.shape == (8, 110, 101)
        err = np.abs(fused - ref).max() / np.abs(ref).max()
        assert err < 1e-3, err

    def test_contrast_only_config_matches_golden(self, cough_wave):
        cfg = FeatureConfig(use_spectral_contrast=True)
        fused = np.asarray(
            extract_features_fused(cough_wave[None], cfg, interpret=True)
        )[0]
        theirs = gold.extract_features(
            torch.from_numpy(cough_wave), use_spectral_contrast=True,
        ).numpy()
        assert fused.shape == theirs.shape
        err = np.abs(fused - theirs).max() / np.abs(theirs).max()
        assert err < 1e-3, err
