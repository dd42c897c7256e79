"""Native (C++) loader tests: builds with g++, matches the Python path."""

import numpy as np
import pytest

from cough_detector_tpu.config import FeatureConfig
from cough_detector_tpu.data import audio_io, native_loader, synth
from cough_detector_tpu.data.datasets import BatchLoader, CoughDataset

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    (d / "cough").mkdir()
    (d / "non_cough").mkdir()
    specs = []
    for i in range(6):
        sr = [16000, 22050, 44100][i % 3]
        dur = [0.5, 1.0, 2.0][i % 3]
        cls = "cough" if i % 2 == 0 else "non_cough"
        gen = synth.synthetic_cough if cls == "cough" else synth.synthetic_non_cough
        wave = gen(seed=i, duration_s=dur, sample_rate=sr)
        path = d / cls / f"{i}.wav"
        audio_io.write_wav(path, wave, sr)
        specs.append(str(path))
    return d, specs


class TestNativeLoader:
    def test_load_clip_matches_python(self, wav_dir):
        _, paths = wav_dir
        for p in paths:
            ours = native_loader.load_clip(p, 16000)
            theirs = audio_io.load_mono_16k(p, 16000)
            assert ours.shape == theirs.shape
            np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_load_batch_matches_python(self, wav_dir):
        _, paths = wav_dir
        waves, n_ok, errors = native_loader.load_batch(paths, 16000, 16000)
        assert n_ok == len(paths) and errors == ""
        for row, p in zip(waves, paths):
            mono = audio_io.load_mono_16k(p, 16000)
            n = mono.shape[0]
            if n > 16000:
                start = (n - 16000) // 2
                want = mono[start : start + 16000]
            else:
                pad = 16000 - n
                want = np.pad(mono, (pad // 2, pad - pad // 2))
            np.testing.assert_allclose(row, want, atol=2e-5)

    def test_odd_pad_centers_like_reference(self, tmp_path):
        """Clips shorter than the segment by an ODD amount must get
        floor(pad/2) zeros on the LEFT (reference pad semantics, same as
        ops.frontend.pad_or_trim) — in BOTH loader tiers. Guards the
        center_fit/_crop_window window-origin rounding."""
        import torch

        import golden_ref as gold
        from cough_detector_tpu.data.datasets import _crop_window

        rng = np.random.default_rng(7)
        paths = []
        lengths = [15999, 8001, 15985]
        for i, n in enumerate(lengths):
            w = rng.standard_normal(n).astype(np.float32) * 0.5
            p = tmp_path / f"odd{i}.wav"
            audio_io.write_wav(p, w, 16000)
            paths.append(str(p))
        waves, n_ok, errors = native_loader.load_batch(paths, 16000, 16000)
        assert n_ok == len(paths) and errors == ""
        for row, p in zip(waves, paths):
            mono = audio_io.load_mono_16k(p, 16000)
            want = gold.pad_or_trim(torch.from_numpy(mono), 16000).numpy()
            np.testing.assert_array_equal(row, want, err_msg=p)
            np.testing.assert_array_equal(
                _crop_window(mono, 16000), want, err_msg=p
            )

    def test_truncated_wav_quarantined(self, tmp_path):
        """The C++ decoder must reject an overrunning chunk size exactly
        like audio_io.read_wav does (truncated-download twin contract),
        not silently decode the short payload."""
        good = tmp_path / "good.wav"
        audio_io.write_wav(good, synth.synthetic_cough(1, 1.0), 16000)
        trunc = tmp_path / "trunc.wav"
        raw = good.read_bytes()
        trunc.write_bytes(raw[: len(raw) - 500])
        waves, n_ok, errors = native_loader.load_batch(
            [str(trunc), str(good)], 16000, 16000
        )
        assert n_ok == 1
        assert "truncated" in errors.lower() and "trunc.wav" in errors
        assert np.all(waves[0] == 0) and not np.all(waves[1] == 0)

    def test_bad_file_quarantined(self, tmp_path):
        bad = tmp_path / "bad.wav"
        bad.write_bytes(b"not audio")
        good = tmp_path / "good.wav"
        audio_io.write_wav(good, synth.synthetic_cough(0, 1.0), 16000)
        waves, n_ok, errors = native_loader.load_batch(
            [str(bad), str(good)], 16000, 16000
        )
        assert n_ok == 1
        assert "bad.wav" in errors
        assert np.all(waves[0] == 0) and not np.all(waves[1] == 0)

    def test_batchloader_native_backend(self, wav_dir):
        d, _ = wav_dir
        ds = CoughDataset(str(d))
        native = BatchLoader(ds, 3, FeatureConfig(), backend="native")
        python = BatchLoader(ds, 3, FeatureConfig(), backend="python")
        for (wn, ln), (wp, lp) in zip(native, python):
            np.testing.assert_array_equal(ln, lp)
            np.testing.assert_allclose(wn, wp, atol=2e-5)

    def test_native_backend_fail_hard(self, tmp_path):
        (tmp_path / "cough").mkdir()
        (tmp_path / "non_cough").mkdir()
        (tmp_path / "cough" / "bad.wav").write_bytes(b"garbage")
        ds = CoughDataset(str(tmp_path))
        loader = BatchLoader(ds, 1, FeatureConfig(), backend="native")
        with pytest.raises(audio_io.AudioDecodeError):
            list(loader)


class TestNativeShift:
    def test_shifted_crop_matches_python(self, wav_dir):
        from cough_detector_tpu.data.datasets import _crop_window

        _, paths = wav_dir
        fracs = np.linspace(-0.2, 0.2, len(paths))
        waves, n_ok, errors = native_loader.load_batch(
            paths, 16000, 16000, shift_fracs=fracs
        )
        assert n_ok == len(paths), errors
        for row, p, frac in zip(waves, paths, fracs):
            clip = audio_io.load_mono_16k(p, 16000)
            shift = int(round(frac * clip.shape[0]))
            want = _crop_window(clip, 16000, shift)
            np.testing.assert_allclose(row, want, atol=2e-5)

    def test_loader_native_with_shift_matches_python(self, wav_dir):
        d, _ = wav_dir
        ds = CoughDataset(str(d))
        kw = dict(time_shift_limit=0.2, time_shift_prob=1.0, seed=9)
        native = BatchLoader(ds, 3, FeatureConfig(), backend="native", **kw)
        python = BatchLoader(ds, 3, FeatureConfig(), backend="python", **kw)
        for (wn, ln), (wp, lp) in zip(native, python):
            np.testing.assert_array_equal(ln, lp)
            np.testing.assert_allclose(wn, wp, atol=2e-5)
