"""Data layer tests: WAV round-trip, host resample parity, dataset scan,
weights, splits, loader semantics."""

import numpy as np
import pytest
import torch

import golden_ref as gold
from cough_detector_tpu.config import FeatureConfig
from cough_detector_tpu.data import audio_io, synth
from cough_detector_tpu.data.datasets import (
    BatchLoader,
    CombinedDataset,
    CoughDataset,
    ESC50Dataset,
    prepare_dataset_split,
)


class TestConfusableGenerators:
    """The r4 behavioral-proxy vocabulary (r3 VERDICT #5): voiced speech,
    laugh bursts, throat clears — deterministic fixtures like every other
    synth generator."""

    @pytest.mark.parametrize("fn_name", [
        "synthetic_speech", "synthetic_laugh", "synthetic_throat_clear",
    ])
    def test_deterministic_and_bounded(self, fn_name):
        fn = getattr(synth, fn_name)
        a, b = fn(7, 2.0), fn(7, 2.0)
        np.testing.assert_array_equal(a, b)
        assert a.dtype == np.float32 and a.shape == (32000,)
        assert np.isfinite(a).all() and 0.1 < np.abs(a).max() <= 1.0
        assert not np.array_equal(fn(7, 2.0), fn(8, 2.0))

    def test_seed_sweep_tail_clipped_syllables(self):
        """Regression: a syllable landing on the end of the clip can be
        shorter (>64 samples) than the 15 ms attack/plosive windows; both
        must clamp instead of crashing (found by the r4 on-chip
        behavioral matrix — the envelope at one seed, the rarer
        plosive-onset branch at another)."""
        for dur, n in ((1.2, 19200), (2.0, 32000), (3.0, 48000)):
            for seed in range(10_000, 10_200):
                out = synth.synthetic_speech(seed, dur)
                assert out.shape == (n,) and np.isfinite(out).all()

    def test_spectral_signatures(self):
        """Coarse spectral sanity: throat clears live in the low
        laryngeal band; voiced speech carries real harmonic structure
        (strong autocorrelation peak in the 90-320 Hz pitch range) that
        the old AM-noise babble had none of."""
        def centroid(x):
            spec = np.abs(np.fft.rfft(x))
            freqs = np.fft.rfftfreq(x.size, 1 / 16000)
            return float((spec * freqs).sum() / spec.sum())

        assert centroid(synth.synthetic_throat_clear(1, 2.0)) < 1500
        speech = synth.synthetic_speech(1, 2.0)
        ac = np.correlate(speech, speech, mode="full")[speech.size - 1:]
        lo, hi = 16000 // 320, 16000 // 90  # pitch-period lag window
        assert ac[lo:hi].max() > 0.25 * ac[0]


class TestHardNegativeCorpus:
    """generate_synthetic_dataset(hard_negative_frac=...) — the
    training-side twin of the behavioral confusables scenario
    (reference IMPROVEMENT_PLAN.md:81-85,142-144)."""

    def test_chooser_deterministic_and_covers_kinds(self):
        a, b = (synth.synthetic_hard_negative(3, 2.0),
                synth.synthetic_hard_negative(3, 2.0))
        np.testing.assert_array_equal(a, b)
        # The kind draw is replayable (same contract as NON_COUGH_KINDS)
        # and all three kinds appear over a modest seed range.
        kinds = {
            str(np.random.default_rng([s, 54]).choice(
                list(synth.HARD_NEGATIVE_KINDS)))
            for s in range(40)
        }
        assert kinds == set(synth.HARD_NEGATIVE_KINDS)

    def test_fraction_split_and_determinism(self, tmp_path):
        from cough_detector_tpu.data import acquire

        acquire.generate_synthetic_dataset(
            str(tmp_path), n_coughs=2, n_non_coughs=10, seed=5,
            hard_negative_frac=0.3,
        )
        neg = tmp_path / "non_cough"
        hard = sorted(p.name for p in neg.glob("synthetic_hard_*.wav"))
        other = sorted(p.name for p in neg.glob("synthetic_other_*.wav"))
        assert len(hard) == 3 and len(other) == 7
        # File i's contents depend only on (seed, i): the hard tail file
        # is the chooser's output for that index, through 16-bit PCM.
        back, sr = audio_io.read_wav(neg / "synthetic_hard_009.wav")
        want = synth.synthetic_hard_negative(5 + 1000 + 9, 2.0)
        assert sr == 16000
        np.testing.assert_allclose(back[0], want, atol=2.0 / 32768)

    def test_zero_frac_is_reference_exact(self, tmp_path):
        from cough_detector_tpu.data import acquire

        acquire.generate_synthetic_dataset(
            str(tmp_path), n_coughs=1, n_non_coughs=4, seed=5,
        )
        neg = tmp_path / "non_cough"
        assert not list(neg.glob("synthetic_hard_*.wav"))
        assert len(list(neg.glob("synthetic_other_*.wav"))) == 4

    def test_kind_weights_skew_and_degenerate(self):
        """kind_weights (r5 curation lever): a one-hot weight pins the
        kind — the output IS that generator's clip for the same seed —
        and bad weight dicts fail loudly."""
        for s in range(6):
            got = synth.synthetic_hard_negative(
                s, 2.0, kind_weights={"laugh": 1.0}
            )
            np.testing.assert_array_equal(got, synth.synthetic_laugh(s, 2.0))
        # Skewed weights shift the empirical mix toward the heavy kind.
        import collections
        counts = collections.Counter()
        w = {"laugh": 0.8, "speech": 0.1, "throat_clear": 0.1}
        wl = [w[k] for k in synth.HARD_NEGATIVE_KINDS]
        for s in range(60):
            rng = np.random.default_rng([s, 54])
            counts[str(rng.choice(
                list(synth.HARD_NEGATIVE_KINDS),
                p=np.array(wl) / sum(wl),
            ))] += 1
        assert counts["laugh"] > counts["speech"]
        assert counts["laugh"] > counts["throat_clear"]
        with pytest.raises(ValueError, match="unknown hard-negative"):
            synth.synthetic_hard_negative(0, 2.0, kind_weights={"sneeze": 1})
        with pytest.raises(ValueError, match="positive sum"):
            synth.synthetic_hard_negative(0, 2.0, kind_weights={"laugh": 0.0})

    def test_kind_weights_none_replays_r4_stream(self):
        """Default (None) must keep the EXACT uniform rng draw path so
        existing corpora regenerate bit-identically."""
        for s in (0, 7, 23):
            want_kind = str(np.random.default_rng([s, 54]).choice(
                list(synth.HARD_NEGATIVE_KINDS)))
            fn = {"speech": synth.synthetic_speech,
                  "laugh": synth.synthetic_laugh,
                  "throat_clear": synth.synthetic_throat_clear}[want_kind]
            np.testing.assert_array_equal(
                synth.synthetic_hard_negative(s, 2.0), fn(s, 2.0)
            )

    def test_weights_thread_through_dataset(self, tmp_path):
        from cough_detector_tpu.data import acquire

        acquire.generate_synthetic_dataset(
            str(tmp_path), n_coughs=1, n_non_coughs=6, seed=5,
            hard_negative_frac=0.5,
            hard_negative_weights={"throat_clear": 1.0},
        )
        neg = tmp_path / "non_cough"
        hard = sorted(neg.glob("synthetic_hard_*.wav"))
        assert len(hard) == 3
        back, _ = audio_io.read_wav(hard[0])
        idx = int(hard[0].stem.split("_")[-1])
        want = synth.synthetic_throat_clear(5 + 1000 + idx, 2.0)
        np.testing.assert_allclose(back[0], want, atol=2.0 / 32768)


class TestWav:
    @pytest.mark.parametrize("channels", [1, 2])
    def test_round_trip_16bit(self, tmp_path, channels):
        rng = np.random.default_rng(0)
        wave = rng.uniform(-0.9, 0.9, (channels, 4000)).astype(np.float32)
        p = tmp_path / "x.wav"
        audio_io.write_wav(p, wave, 22050)
        back, sr = audio_io.read_wav(p)
        assert sr == 22050 and back.shape == wave.shape
        # Half-LSB rounding only: write and read share the 32768 scale.
        np.testing.assert_allclose(back, wave, atol=0.51 / 32768)

    def test_truncated_data_chunk_fails_loudly(self, tmp_path):
        """A data chunk whose declared size overruns the file is a
        truncated download — decode must raise, never silently return a
        short clip (r4 review; module fail-LOUDLY rule)."""
        wave = np.linspace(-0.5, 0.5, 4000).astype(np.float32)
        p = tmp_path / "t.wav"
        audio_io.write_wav(p, wave, 16000)
        raw = p.read_bytes()
        p.write_bytes(raw[: len(raw) - 1000])  # chop the tail off
        with pytest.raises(audio_io.AudioDecodeError, match="[Tt]runcated"):
            audio_io.read_wav(p)

    def test_float_wav_bad_depth_rejected(self, tmp_path):
        """fmt=3 (IEEE float) with bits not in {32, 64} has no valid
        layout — reinterpreting the payload would yield garbage
        amplitudes; it must raise instead (r4 review)."""
        import struct

        pcm = np.zeros(100, np.int16).tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 32000, 2, 16)
        hdr += b"data" + struct.pack("<I", len(pcm))
        p = tmp_path / "f16.wav"
        p.write_bytes(hdr + pcm)
        with pytest.raises(audio_io.AudioDecodeError, match="float depth"):
            audio_io.read_wav(p)

    def test_write_read_round_trip_bit_exact(self, tmp_path):
        """write_wav shares read_wav's 32768 scale, so int16-grid values
        survive a decode→write→decode round trip bit-exactly (the old
        32767 write scale perturbed every |k| >= 16385 by one LSB)."""
        codes = np.array([0, 1, -1, 16385, -16385, 32767, -32768], np.int64)
        wave = (codes / 32768.0).astype(np.float32)[None, :]
        p = tmp_path / "rt.wav"
        audio_io.write_wav(p, wave, 16000)
        back, _ = audio_io.read_wav(p)
        np.testing.assert_array_equal(back, wave)

    def test_float32_wav(self, tmp_path):
        # Hand-build an IEEE-float WAV and read it back.
        import struct

        wave = np.linspace(-1, 1, 1000).astype(np.float32)
        pcm = wave.tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32)
        hdr += b"data" + struct.pack("<I", len(pcm))
        p = tmp_path / "f.wav"
        p.write_bytes(hdr + pcm)
        back, sr = audio_io.read_wav(p)
        np.testing.assert_allclose(back[0], wave, atol=1e-7)

    def test_not_a_wav_fails_loudly(self, tmp_path):
        p = tmp_path / "bad.wav"
        p.write_bytes(b"garbage data here")
        with pytest.raises(audio_io.AudioDecodeError):
            audio_io.read_wav(p)

    def test_compressed_without_ffmpeg_fails_loudly(self, tmp_path):
        p = tmp_path / "x.webm"
        p.write_bytes(b"\x1a\x45\xdf\xa3")
        if not audio_io.ffmpeg_available():
            with pytest.raises(audio_io.AudioDecodeError, match="ffmpeg"):
                audio_io.decode_audio(p)


class TestHostResample:
    @pytest.mark.parametrize("orig_sr", [22050, 44100, 48000])
    def test_matches_golden(self, orig_sr):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((1, orig_sr // 2)).astype(np.float32)
        ours = audio_io.resample_np(w, orig_sr, 16000)[0]
        theirs = gold.resample(torch.from_numpy(w[0]), orig_sr, 16000).numpy()
        assert ours.shape == theirs.shape
        err = np.abs(ours - theirs).max() / max(np.abs(theirs).max(), 1e-8)
        assert err < 1e-3


@pytest.fixture()
def data_dir(tmp_path):
    for label, n in [("cough", 6), ("non_cough", 18)]:
        d = tmp_path / label
        d.mkdir()
        for i in range(n):
            gen = synth.synthetic_cough if label == "cough" else synth.synthetic_non_cough
            audio_io.write_wav(d / f"{i}.wav", gen(seed=i, duration_s=0.5), 16000)
    (tmp_path / "cough" / "notes.txt").write_text("ignored")
    return str(tmp_path)


class TestCoughDataset:
    def test_scan_and_labels(self, data_dir):
        ds = CoughDataset(data_dir)
        assert len(ds) == 24
        assert ds.class_counts == {0: 18, 1: 6}
        labels = {label for _, label in ds.samples}
        assert labels == {0, 1}

    def test_sample_weights_inverse_frequency(self, data_dir):
        ds = CoughDataset(data_dir)
        # total/(n_classes*count): cough 24/(2*6)=2, non_cough 24/(2*18)=2/3
        w = {label: None for _, label in ds.samples}
        for (path, label), weight in zip(ds.samples, ds.sample_weights):
            w[label] = weight
        assert w[1] == pytest.approx(2.0)
        assert w[0] == pytest.approx(24 / 36)

    def test_missing_class_dir_warns_not_crashes(self, tmp_path, capsys):
        (tmp_path / "cough").mkdir()
        ds = CoughDataset(str(tmp_path))
        assert "Warning" in capsys.readouterr().out
        assert len(ds) == 0


class TestSplit:
    def test_stratified_split(self, data_dir):
        tr, va = prepare_dataset_split(data_dir, val_split=0.25)
        assert len(tr) == 18 and len(va) == 6
        # Stratification keeps the 1:3 ratio in both splits.
        assert sum(l for _, l in va.samples) == pytest.approx(len(va) / 4, abs=1)
        # Deterministic (seed 42).
        tr2, va2 = prepare_dataset_split(data_dir, val_split=0.25)
        assert tr.samples == tr2.samples


class TestESC50:
    @pytest.fixture()
    def esc50_dir(self, tmp_path):
        import pandas as pd

        audio = tmp_path / "audio"
        meta = tmp_path / "meta"
        audio.mkdir(); meta.mkdir()
        rows = []
        # 2 coughs (target 24), 2 curated negatives, 2 other-class clips
        specs = [(24, 1), (24, 2), (22, 3), (38, 4), (0, 5), (10, 1)]
        for i, (target, fold) in enumerate(specs):
            name = f"clip_{i}.wav"
            audio_io.write_wav(
                audio / name, synth.synthetic_non_cough(i, 0.3), 16000
            )
            rows.append({"filename": name, "fold": fold, "target": target})
        pd.DataFrame(rows).to_csv(meta / "esc50.csv", index=False)
        return str(tmp_path)

    def test_all_negatives(self, esc50_dir):
        ds = ESC50Dataset(esc50_dir, include_all_negatives=True)
        assert len(ds) == 6
        assert ds.class_counts == {0: 4, 1: 2}

    def test_curated_negatives(self, esc50_dir):
        ds = ESC50Dataset(esc50_dir, include_all_negatives=False)
        assert ds.class_counts == {0: 2, 1: 2}

    def test_fold_split(self, esc50_dir):
        tr = ESC50Dataset(esc50_dir, is_training=True, fold=1)
        va = ESC50Dataset(esc50_dir, is_training=False, fold=1)
        assert len(tr) + len(va) == 6
        assert len(va) == 2  # fold-1 rows

    def test_missing_meta_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ESC50Dataset(str(tmp_path))


class TestBatchLoader:
    def test_shapes_and_weighted_balance(self, data_dir):
        ds = CoughDataset(data_dir)
        loader = BatchLoader(
            ds, batch_size=8, feature_config=FeatureConfig(),
            weighted=True, drop_last=True, num_workers=2, seed=0,
        )
        assert len(loader) == 3
        labels_all = []
        for waves, labels in loader:
            assert waves.shape == (8, 16000) and waves.dtype == np.float32
            labels_all.extend(labels.tolist())
        # Weighted with replacement: coughs should be ~50%, not 25%.
        frac = np.mean(np.asarray(labels_all) == 1)
        assert 0.25 < frac < 0.8

    def test_sequential_eval_loader(self, data_dir):
        ds = CoughDataset(data_dir)
        loader = BatchLoader(ds, batch_size=10, num_workers=2)
        batches = list(loader)
        assert len(batches) == 3  # 24 -> 10+10+4, no drop_last
        assert batches[-1][0].shape[0] == 4

    def test_decode_error_propagates(self, tmp_path):
        d = tmp_path / "cough"; d.mkdir()
        (tmp_path / "non_cough").mkdir()
        (d / "broken.wav").write_bytes(b"not a wav at all")
        ds = CoughDataset(str(tmp_path))
        loader = BatchLoader(ds, batch_size=1, num_workers=1)
        with pytest.raises(audio_io.AudioDecodeError):
            list(loader)

    def test_combined_dataset(self, data_dir):
        a, b = CoughDataset(data_dir), CoughDataset(data_dir)
        combo = CombinedDataset([a, b])
        assert len(combo) == 48
        assert combo.class_counts == {0: 36, 1: 12}

    def test_process_slices_reassemble_to_global_batches(self, data_dir):
        """Multi-host input sharding (set_process_slice): two 'ranks' each
        building half of every batch must reassemble bit-exactly into the
        global loader's batches — same epoch order, same crop-shift RNG
        stream — while splitting the host row-build work between them.
        Covers the tail batch (no drop_last, pad_to > n) too."""
        ds = CoughDataset(data_dir)

        def make(lo=None, hi=None, pad_to=12):
            loader = BatchLoader(
                ds, batch_size=10, num_workers=2, seed=3, weighted=True,
                time_shift_limit=0.2, time_shift_prob=0.5,
            )
            loader.set_epoch(4)
            if lo is not None:
                loader.set_process_slice(lo, hi, pad_to)
            return loader

        global_batches = list(make())
        r0 = list(make(0, 6))
        r1 = list(make(6, 12))
        assert len(global_batches) == len(r0) == len(r1) == 3
        for (gw, gl), (w0, l0, n0), (w1, l1, n1) in zip(
            global_batches, r0, r1
        ):
            n = gw.shape[0]
            assert n0 == n1 == n
            waves = np.concatenate([w0, w1])[:n]
            labels = np.concatenate([l0, l1])[:n]
            np.testing.assert_array_equal(waves, gw)
            np.testing.assert_array_equal(labels, gl)
        built = make(0, 6)
        list(built)
        # Rank 0 holds rows [0, 6): full batches contribute 6 real rows,
        # the 4-row tail batch contributes 4 → 6+6+4; the global loader
        # builds all 10+10+4.
        assert built.rows_built == 16
        g = make()
        list(g)
        assert g.rows_built == 24


class TestReviewFixes:
    def test_crop_window_matches_shift_then_trim(self):
        """_crop_window(shift) must equal reference shift-then-center-trim."""
        from cough_detector_tpu.data.datasets import _crop_window

        rng = np.random.default_rng(0)
        for L, shift in [(80000, 16000), (80000, -9000), (20000, 3000),
                         (8000, 1000), (8000, -1600)]:
            wave = rng.standard_normal(L).astype(np.float32)
            # reference: shift the full clip (zero fill), then center trim/pad
            shifted = np.zeros(L, np.float32)
            if shift >= 0:
                shifted[shift:] = wave[: L - shift]
            else:
                shifted[:shift] = wave[-shift:]
            want = gold.pad_or_trim(torch.from_numpy(shifted), 16000).numpy()
            got = _crop_window(wave, 16000, shift)
            np.testing.assert_allclose(got, want, atol=1e-7, err_msg=f"L={L},a={shift}")

    def test_crop_window_odd_pad_matches_reference(self):
        """Clips shorter than the segment by an ODD amount: the reference
        pad branch puts floor(pad/2) zeros on the LEFT (same as
        ops.frontend.pad_or_trim). A floor-division window origin placed
        every odd-pad clip one sample right of the reference — caught by
        sweeping EVERY short length, not just even pads."""
        from cough_detector_tpu.data.datasets import _crop_window

        rng = np.random.default_rng(1)
        seg = 16000
        for n in list(range(1, 24)) + [15985, 15999, 15998, 8001, 12345]:
            wave = rng.standard_normal(n).astype(np.float32)
            want = gold.pad_or_trim(torch.from_numpy(wave), seg).numpy()
            got = _crop_window(wave, seg)
            np.testing.assert_array_equal(got, want, err_msg=f"n={n}")
        # Shifted short clips still obey shift-then-center-pad semantics.
        for n, shift in [(15999, 40), (8001, -25), (15985, 7)]:
            wave = rng.standard_normal(n).astype(np.float32)
            shifted = np.zeros(n, np.float32)
            if shift >= 0:
                shifted[shift:] = wave[: n - shift]
            else:
                shifted[:shift] = wave[-shift:]
            want = gold.pad_or_trim(torch.from_numpy(shifted), seg).numpy()
            got = _crop_window(wave, seg, shift)
            np.testing.assert_array_equal(got, want, err_msg=f"n={n},a={shift}")

    def test_loader_crop_shift_augmentation(self, data_dir):
        ds = CoughDataset(data_dir)
        plain = BatchLoader(ds, 4, FeatureConfig(), num_workers=2, seed=1)
        shifted = BatchLoader(
            ds, 4, FeatureConfig(), num_workers=2, seed=1,
            time_shift_limit=0.2, time_shift_prob=1.0,
        )
        (wp, _), (ws, _) = next(iter(plain)), next(iter(shifted))
        assert wp.shape == ws.shape == (4, 16000)
        assert not np.allclose(wp, ws)

    def test_cache_is_bounded(self, data_dir):
        ds = CoughDataset(data_dir)
        loader = BatchLoader(
            ds, 4, FeatureConfig(), num_workers=2,
            cache_bytes=2 * 8000 * 4,  # room for ~2 half-second clips
            backend="python",
        )
        list(loader)
        assert loader._cache_used <= 2 * 8000 * 4

    def test_abandoned_iterator_releases_producer(self, data_dir):
        import threading

        ds = CoughDataset(data_dir)
        loader = BatchLoader(ds, 2, FeatureConfig(), num_workers=2, prefetch=1)
        before = threading.active_count()
        it = iter(loader)
        next(it)
        it.close()  # consumer abandons mid-epoch
        import time

        time.sleep(1.0)
        assert threading.active_count() <= before + 1

    def test_fused_fallback_on_long_waves(self):
        from cough_detector_tpu.ops import frontend
        from cough_detector_tpu.ops.pallas.frontend_kernel import (
            extract_features_fused,
        )

        cfg = FeatureConfig()
        w = synth.fixture_batch(2, 2.0, seed=0)  # 32000 samples
        fused = np.asarray(extract_features_fused(w, cfg, interpret=True))
        ref = np.asarray(frontend.extract_features(w, cfg))
        assert fused.shape == ref.shape  # (2, 90, 201), no silent truncation
        np.testing.assert_allclose(fused, ref, atol=1e-6)

    def test_contrast_centroid_silence_guard(self):
        from cough_detector_tpu.ops import frontend

        cfg = FeatureConfig(use_spectral_contrast=True)
        # Short burst center-padded: edge frames are digitally silent.
        w = np.zeros((1, 16000), np.float32)
        w[0, 7000:9400] = (
            np.random.default_rng(0).standard_normal(2400).astype(np.float32)
        )
        feats = np.asarray(frontend.extract_features(w, cfg))
        assert np.isfinite(feats).all()


class TestWavFuzz:
    def test_random_bytes_never_crash_differently(self):
        """Arbitrary garbage must raise AudioDecodeError (or decode), never
        segfault/IndexError — the loud-failure contract."""
        rng = np.random.default_rng(0)
        import tempfile, os

        for i in range(50):
            n = int(rng.integers(0, 2000))
            blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            if i % 3 == 0:  # make some look like RIFF headers
                blob = b"RIFF" + blob
            if i % 5 == 0:
                blob = b"RIFF\x00\x00\x00\x00WAVE" + blob
            fd, path = tempfile.mkstemp(suffix=".wav")
            os.write(fd, blob)
            os.close(fd)
            try:
                audio_io.read_wav(path)
            except audio_io.AudioDecodeError:
                pass
            finally:
                os.unlink(path)

    def test_truncated_real_wav(self, tmp_path):
        p = tmp_path / "t.wav"
        audio_io.write_wav(p, synth.synthetic_cough(0, 1.0), 16000)
        raw = p.read_bytes()
        for cut in (10, 40, 44, 100, len(raw) - 7):
            q = tmp_path / f"cut{cut}.wav"
            q.write_bytes(raw[:cut])
            try:
                wave, sr = audio_io.read_wav(q)
                assert wave.dtype == np.float32  # partial decode acceptable
            except audio_io.AudioDecodeError:
                pass


class TestCraftedWavs:
    def _wav(self, fmt_body: bytes, data: bytes = b"\x00\x00") -> bytes:
        import struct

        out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(data)) + b"WAVE"
        out += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        out += b"data" + struct.pack("<I", len(data)) + data
        return out

    def test_truncated_fmt_chunk(self, tmp_path):
        p = tmp_path / "shortfmt.wav"
        p.write_bytes(self._wav(b"\x01\x00"))  # 2-byte fmt body
        with pytest.raises(audio_io.AudioDecodeError, match="fmt"):
            audio_io.read_wav(p)

    def test_zero_channels(self, tmp_path):
        import struct

        p = tmp_path / "zeroch.wav"
        fmt = struct.pack("<HHIIHH", 1, 0, 16000, 32000, 2, 16)
        p.write_bytes(self._wav(fmt))
        with pytest.raises(audio_io.AudioDecodeError, match="channels"):
            audio_io.read_wav(p)

    def test_zero_sample_rate(self, tmp_path):
        import struct

        p = tmp_path / "zerosr.wav"
        fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
        p.write_bytes(self._wav(fmt))
        with pytest.raises(audio_io.AudioDecodeError):
            audio_io.read_wav(p)

    def test_native_loader_rejects_crafted(self, tmp_path):
        import struct

        from cough_detector_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("no toolchain")
        cases = {
            "shortfmt.wav": self._wav(b"\x01\x00"),
            "zerosr.wav": self._wav(struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)),
            "zeroch.wav": self._wav(struct.pack("<HHIIHH", 1, 0, 16000, 0, 2, 16)),
        }
        paths = []
        for name, blob in cases.items():
            p = tmp_path / name
            p.write_bytes(blob)
            paths.append(str(p))
        # Must quarantine (n_ok=0), never SIGFPE/overflow the process.
        waves, n_ok, errors = native_loader.load_batch(paths, 16000, 16000)
        assert n_ok == 0
        assert np.all(waves == 0)


class TestIngestNegativeSelections:
    """The reference ships THREE hard-negative selections, one per ingest
    pipeline; each must pick exactly the reference's classes
    (reference: setup_data.py:63, prepare_data.py:84-94,
    setup_coughvid.py:322-340; VERDICT r1 §next-4)."""

    @pytest.fixture()
    def full_esc50(self, tmp_path):
        """One clip per ESC-50 class (targets 0..49)."""
        import pandas as pd

        audio = tmp_path / "esc" / "audio"
        meta = tmp_path / "esc" / "meta"
        audio.mkdir(parents=True); meta.mkdir()
        rows = []
        for target in range(50):
            name = f"1-{target}-A-{target}.wav"
            audio_io.write_wav(
                audio / name, synth.synthetic_non_cough(target, 0.2), 16000
            )
            rows.append({"filename": name, "fold": 1, "target": target})
        pd.DataFrame(rows).to_csv(meta / "esc50.csv", index=False)
        return str(tmp_path / "esc")

    @pytest.mark.parametrize(
        "negatives, expected_classes",
        [
            (None, {20, 21, 22, 23, 25, 26, 38}),  # setup_data default
            (
                "PREPARE_DATA_NEGATIVES",
                {20, 21, 22, 23, 25, 26, 38, 39, 36},
            ),
            (
                "COUGHVID_MERGE_NEGATIVES",
                {20, 21, 22, 23, 25, 26, 27, 28, 29, 30, 31, 32, 34, 38,
                 0, 35, 36},
            ),
        ],
    )
    def test_selection_matches_reference(
        self, full_esc50, tmp_path, negatives, expected_classes
    ):
        from cough_detector_tpu.data import acquire

        neg = getattr(acquire, negatives) if isinstance(negatives, str) else negatives
        out = tmp_path / f"out_{len(expected_classes)}"
        n_cough, n_neg = acquire.reorganize_esc50(
            full_esc50, str(out), negatives=neg
        )
        assert n_cough == 1  # exactly the class-24 clip
        assert n_neg == len(expected_classes)
        # Filenames carry the target class: verify the exact class set.
        got = {
            int(f.stem.split("-")[-1])
            for f in (out / "non_cough").glob("*.wav")
        }
        assert got == expected_classes

    def test_download_esc50_rejects_partial_extraction(
        self, tmp_path, monkeypatch
    ):
        """An interrupted extraction (dir exists but no metadata / short
        audio dir) must NOT count as downloaded on the next run (r4
        review): the incomplete tree triggers a re-download, a complete
        one short-circuits without touching the network."""
        from cough_detector_tpu.data import acquire

        partial = tmp_path / "ESC-50-master"
        (partial / "audio").mkdir(parents=True)
        (partial / "audio" / "1-100032-A-0.wav").touch()  # far short of 2000

        calls = []

        def fake_download(url, dest):
            calls.append(url)
            raise RuntimeError("network sentinel")

        monkeypatch.setattr(
            acquire.urllib.request, "urlretrieve", fake_download
        )
        with pytest.raises(RuntimeError, match="network sentinel"):
            acquire.download_esc50(str(tmp_path))
        assert len(calls) == 1  # the partial dir forced a re-download

        # Now make it structurally complete: metadata + 2000 audio files.
        (partial / "meta").mkdir()
        (partial / "meta" / "esc50.csv").touch()
        for i in range(2000):
            (partial / "audio" / f"clip_{i:04d}.wav").touch()
        got = acquire.download_esc50(str(tmp_path))
        assert got == str(partial)
        assert len(calls) == 1  # no second network attempt

    def test_coughvid_selection_rules_match_reference(self):
        """select_coughvid pins the reference's row rules
        (setup_coughvid.py:180-195): >0.8 → cough, <0.2 → non-cough,
        status SUBSTRING 'healthy' with conf <0.5 → non-cough, NaN
        confidence scores 0.0 and takes neither confidence branch."""
        import pandas as pd

        from cough_detector_tpu.data.acquire import select_coughvid

        meta = pd.DataFrame({
            "uuid": [f"u{i}" for i in range(8)],
            "cough_detected": [0.9, 0.85, 0.1, 0.45, 0.45,
                               np.nan, np.nan, 0.9],
            "status": ["healthy", None, "sick", "healthy_fr", "covid",
                       "healthy", "symptomatic", "COVID-19"],
        })
        # Pad with enough high-confidence coughs to stay off the fallback.
        pad = pd.DataFrame({
            "uuid": [f"p{i}" for i in range(100)],
            "cough_detected": [0.95] * 100,
            "status": ["covid"] * 100,
        })
        meta = pd.concat([meta, pad], ignore_index=True)
        coughs, non = select_coughvid(meta, max_coughs=3000)
        cough_ids = set(coughs["uuid"])
        non_ids = set(non["uuid"])
        # u0: 0.9 + healthy → cough wins (reference's if/elif order);
        # u3: 'healthy_fr' substring-matches → non-cough (exact-match
        #     would miss it); u4: covid at 0.45 → neither;
        # u5: NaN + healthy → non-cough; u6: NaN alone → neither
        #     (NaN must NOT count as <0.2).
        assert {"u0", "u1", "u7"} <= cough_ids
        assert {"u2", "u3", "u5"} <= non_ids
        assert "u4" not in cough_ids | non_ids
        assert "u6" not in cough_ids | non_ids

    def test_coughvid_noncough_cap_is_random_subset(self):
        """Non-coughs above the 1.5× cap are SHUFFLE-then-capped
        (setup_coughvid.py:233-235), not a metadata-order .head() —
        and seeded, so two runs agree."""
        import pandas as pd

        from cough_detector_tpu.data.acquire import select_coughvid

        meta = pd.DataFrame({
            "uuid": [f"c{i}" for i in range(120)] +
                    [f"n{i}" for i in range(400)],
            "cough_detected": [0.9] * 120 + [0.1] * 400,
            "status": ["covid"] * 520,
        })
        coughs, non = select_coughvid(meta, max_coughs=3000)
        assert len(coughs) == 120
        assert len(non) == 180  # 1.5 × 120
        picked = list(non["uuid"])
        assert picked != [f"n{i}" for i in range(180)]  # not .head()
        _, non2 = select_coughvid(meta, max_coughs=3000)
        assert picked == list(non2["uuid"])  # seeded → reproducible

    def test_coughvid_fallback_triggers_on_cough_count_alone(self):
        """The 80/20 fallback fires iff high-confidence coughs < 100
        (setup_coughvid.py:207) — scarce non-coughs alone must NOT
        trigger it, and the fallback's cough cap keeps the shuffled
        order (all fallback rows share confidence 0.5)."""
        import pandas as pd

        from cough_detector_tpu.data.acquire import select_coughvid

        # 150 coughs, 10 non-coughs: reference does NOT fall back (the
        # old `or len(non_coughs) < 50` trigger was wrong).
        meta = pd.DataFrame({
            "uuid": [f"c{i}" for i in range(150)] +
                    [f"n{i}" for i in range(10)],
            "cough_detected": [0.9] * 150 + [0.1] * 10,
            "status": ["covid"] * 160,
        })
        coughs, non = select_coughvid(meta, max_coughs=3000)
        assert len(coughs) == 150 and len(non) == 10

        # 50 coughs: falls back to a seeded-shuffled 80/20 split.
        meta2 = pd.DataFrame({
            "uuid": [f"x{i}" for i in range(500)],
            "cough_detected": [0.9] * 50 + [0.5] * 450,
            "status": ["covid"] * 500,
        })
        coughs2, non2 = select_coughvid(meta2, max_coughs=3000)
        assert len(coughs2) == 400 and len(non2) == 100  # 80/20 of 500
        assert set(coughs2["uuid"]) | set(non2["uuid"]) == set(meta2["uuid"])
        # Capped fallback takes the head of the SHUFFLED order.
        coughs3, _ = select_coughvid(meta2, max_coughs=120)
        assert list(coughs3["uuid"]) == list(coughs2["uuid"])[:120]

    def test_coughvid_ingest_selects_over_present_files_only(
        self, tmp_path
    ):
        """prepare_coughvid must classify/cap/fallback over rows whose
        audio EXISTS — the reference walks the audio files and looks
        metadata up by uuid (setup_coughvid.py:155), so with a partial
        download the <100-cough fallback fires on materializable
        samples, not phantom metadata rows."""
        import pandas as pd

        from cough_detector_tpu.data import acquire

        src = tmp_path / "cv"
        src.mkdir()
        rows = (
            [{"uuid": f"c{i}", "cough_detected": 0.9, "status": "covid"}
             for i in range(120)]
            + [{"uuid": f"n{i}", "cough_detected": 0.1, "status": "covid"}
               for i in range(30)]
        )
        pd.DataFrame(rows).to_csv(
            src / "metadata_compiled.csv", index=False
        )
        # Only 40 of the 120 cough rows (and all 30 non-coughs) exist.
        for i in range(40):
            audio_io.write_wav(
                src / f"c{i}.wav", synth.synthetic_cough(i, 1.0), 16000
            )
        for i in range(30):
            audio_io.write_wav(
                src / f"n{i}.wav", synth.synthetic_non_cough(i, 0.5), 16000
            )
        stats = acquire.prepare_coughvid(str(src), str(tmp_path / "out"))
        # 70 present rows; 40 high-confidence coughs < 100 → fallback
        # 80/20 over the 70 PRESENT rows: 56 coughs / 14 non-coughs.
        assert stats["missing"] == 80
        assert stats["cough"] == 56
        assert stats["non_cough"] == 14
        assert stats["failed"] == 0

    def test_coughvid_fallback_pool_includes_metadataless_files(
        self, tmp_path
    ):
        """The reference's <100-cough fallback shuffles ALL audio files
        on disk — including files with NO metadata row
        (setup_coughvid.py:209-210 splits `audio_files`, not df rows).
        Dropping metadata-less files would change the training-set
        composition, the axis the reference postmortem said mattered
        most."""
        import pandas as pd

        from cough_detector_tpu.data import acquire

        src = tmp_path / "cv"
        src.mkdir()
        # 10 metadata rows (all low-confidence → fallback fires), plus
        # 10 files with no metadata row at all.
        pd.DataFrame(
            [{"uuid": f"m{i}", "cough_detected": 0.5, "status": "covid"}
             for i in range(10)]
        ).to_csv(src / "metadata_compiled.csv", index=False)
        for i in range(10):
            audio_io.write_wav(
                src / f"m{i}.wav", synth.synthetic_cough(i, 0.5), 16000
            )
        for i in range(10):
            audio_io.write_wav(
                src / f"orphan{i}.wav",
                synth.synthetic_non_cough(100 + i, 0.5), 16000,
            )
        out = tmp_path / "out"
        stats = acquire.prepare_coughvid(str(src), str(out))
        # Fallback pool = all 20 files: 80/20 → 16 coughs / 4 non-coughs,
        # and orphan files MUST appear in the output.
        assert stats["cough"] == 16 and stats["non_cough"] == 4
        converted = {
            p.name
            for d in ("cough", "non_cough")
            for p in (out / d).glob("coughvid_*.wav")
        }
        assert any("orphan" in n for n in converted)
        assert stats["missing"] == 0

    def test_synthetic_negative_menu_covers_reference_kinds(self):
        """prepare_data's pink-noise and ambient multi-sine negatives
        (reference: prepare_data.py:138-162) must be reachable kinds.

        The menu is single-sourced from synth.NON_COUGH_KINDS (the
        implementation draws from the same tuple with the seed's first
        rng call), pinned here against the reference union. Replayed
        kind labels are anchored to real behavior: for seeds that land
        on tonal kinds the output's dominant frequency must be one of
        that kind's menu frequencies — a desynchronized replay (synth
        drawing before the kind choice) fails this with high
        probability."""
        assert set(synth.NON_COUGH_KINDS) == {
            "silence", "white_noise", "hum", "clicks", "pink_noise", "ambient"
        }
        hum_freqs = (50, 60, 100, 120)
        ambient_freqs = (60, 120, 240, 500, 1000)
        kinds = set()
        dur = 0.3
        for seed in range(200):
            kind = str(np.random.default_rng(seed).choice(
                list(synth.NON_COUGH_KINDS)
            ))
            kinds.add(kind)
            w = synth.synthetic_non_cough(seed, dur)
            assert np.isfinite(w).all() and w.dtype == np.float32
            assert np.abs(w).max() <= 0.5 + 1e-6
            if kind in ("hum", "ambient"):
                spec = np.abs(np.fft.rfft(w.astype(np.float64)))
                peak_hz = np.argmax(spec) * synth.SAMPLE_RATE / w.size
                menu = hum_freqs if kind == "hum" else ambient_freqs
                assert min(abs(peak_hz - f) for f in menu) < 5.0, (
                    seed, kind, peak_hz
                )
        assert kinds == set(synth.NON_COUGH_KINDS)
