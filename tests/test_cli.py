"""CLI smoke tests: prepare → featurize → train → detect, all offline."""

import json

import jax
import numpy as np
import pytest

from cough_detector_tpu.data import audio_io, synth


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clidata")
    from cough_detector_tpu.cli import prepare_data

    prepare_data.main([
        "--output-dir", str(d), "--skip-download",
        "--synthetic-coughs", "6", "--synthetic-non-coughs", "8",
    ])
    return d


class TestPrepareData:
    def test_creates_class_dirs(self, data_dir):
        assert len(list((data_dir / "cough").glob("*.wav"))) == 6
        assert len(list((data_dir / "non_cough").glob("*.wav"))) == 8

    def test_deterministic(self, data_dir, tmp_path):
        from cough_detector_tpu.cli import prepare_data

        prepare_data.main([
            "--output-dir", str(tmp_path), "--skip-download",
            "--synthetic-coughs", "2", "--synthetic-non-coughs", "2",
        ])
        a = (data_dir / "cough" / "synthetic_cough_000.wav").read_bytes()
        b = (tmp_path / "cough" / "synthetic_cough_000.wav").read_bytes()
        assert a == b


class TestFeaturize:
    def test_outputs_npz(self, data_dir, tmp_path, capsys):
        from cough_detector_tpu.cli import featurize

        out = tmp_path / "feats.npz"
        featurize.main([
            "--data-dir", str(data_dir), "--output", str(out),
            "--batch-size", "8", "--num-workers", "2",
        ])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["clips"] == 14
        # Ingest-at-scale runs sharded over every visible device; 14 clips
        # pad to 16 on the 8-device mesh and trim back on output.
        assert rec["devices"] == len(jax.devices())
        z = np.load(out, allow_pickle=True)
        assert z["features"].shape == (14, 90, 101)
        assert set(z["labels"]) == {0, 1}

    def test_empty_dir_exits(self, tmp_path):
        from cough_detector_tpu.cli import featurize

        with pytest.raises(SystemExit):
            featurize.main([
                "--data-dir", str(tmp_path), "--output", "/tmp/x.npz",
            ])


@pytest.fixture(scope="module")
def shared_ckpt_dir(data_dir, tmp_path_factory):
    """ONE 1-epoch 'small' training shared by every CLI test that just
    needs a trained checkpoint (train/detect/evaluate/extract-segments).
    Each redundant identical training costs ~a minute on this
    single-core host; tests that exercise training ITSELF live in
    test_train.py, not here."""
    from cough_detector_tpu.cli import train as tcli

    out = tmp_path_factory.mktemp("shared_ckpt")
    tcli.main([
        "--data-dir", str(data_dir), "--output-dir", str(out),
        "--model-type", "small", "--epochs", "1", "--batch-size", "4",
        "--no-esc50", "--num-workers", "2",
    ])
    return out


class TestTrainDetect:
    @pytest.fixture(scope="class")
    def ckpt_dir(self, shared_ckpt_dir):
        return shared_ckpt_dir

    def test_train_writes_artifacts(self, ckpt_dir):
        assert (ckpt_dir / "config.json").exists()
        assert (ckpt_dir / "metrics.jsonl").exists()
        assert (ckpt_dir / "latest_model" / "meta.json").exists()

    def test_detect_wav_mode(self, ckpt_dir, tmp_path, capsys):
        from cough_detector_tpu.cli import detect

        wav = tmp_path / "clip.wav"
        audio_io.write_wav(wav, synth.synthetic_cough(5, 2.0), 16000)
        detect.main([
            "--model", str(ckpt_dir / "latest_model"), "--wav", str(wav),
            "--threshold", "0.0", "--smoothing", "1",
        ])
        out = capsys.readouterr().out
        assert "t=1.00s" in out

    def test_detect_multi_wav_streams_mode(self, ckpt_dir, tmp_path, capsys):
        """Several --wav files score concurrently as lanes of one
        batched StreamingDetector tick; events attribute to the right
        file and a shorter file's zero-padding tail stays silent."""
        from cough_detector_tpu.cli import detect

        long_wav = tmp_path / "long.wav"
        audio_io.write_wav(long_wav, synth.synthetic_cough(5, 2.0), 16000)
        short_wav = tmp_path / "short.wav"
        # 1.0 s: exactly one window, then padding-only windows.
        audio_io.write_wav(short_wav, synth.synthetic_cough(6, 1.0), 16000)
        detect.main([
            "--model", str(ckpt_dir / "latest_model"),
            "--wav", str(long_wav), str(short_wav),
            "--streams", "2",
            "--threshold", "0.0", "--smoothing", "1", "--debounce", "0.0",
        ])
        out = capsys.readouterr().out
        lines = [l for l in out.splitlines() if "cough at" in l]
        by_file = {}
        for l in lines:
            by_file.setdefault(l.split(":")[0], []).append(l)
        assert str(long_wav) in by_file and str(short_wav) in by_file
        # The short file is padded to the long one's span; windows
        # starting past its end score only zeros and must be suppressed
        # (threshold 0 means they WOULD fire if not filtered).
        assert len(by_file[str(short_wav)]) < len(by_file[str(long_wav)])

    def test_detect_requires_model(self):
        from cough_detector_tpu.cli import detect

        with pytest.raises(SystemExit):
            detect.main(["--threshold", "0.5"])

    def test_list_devices_no_backend(self, capsys):
        from cough_detector_tpu.cli import detect

        detect.main(["--list-devices"])
        assert "audio input devices" in capsys.readouterr().out


class TestEvaluate:
    def test_dataset_mode(self, data_dir, shared_ckpt_dir, tmp_path, capsys):
        from cough_detector_tpu.cli import evaluate

        out = shared_ckpt_dir
        capsys.readouterr()
        evaluate.main([
            "--model", str(out / "latest_model"),
            "--data-dir", str(data_dir), "--batch-size", "8",
        ])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["tp"] + rec["fp"] + rec["fn"] + rec["tn"] == 14
        assert 0 <= rec["accuracy"] <= 100

        # Batch-size invariance: the mask-padded tail path must report the
        # same metrics regardless of how the 14 clips split into batches.
        evaluate.main([
            "--model", str(out / "latest_model"),
            "--data-dir", str(data_dir), "--batch-size", "5",
        ])
        rec5 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        for k in ("tp", "fp", "fn", "tn", "accuracy"):
            assert rec5[k] == rec[k], k
        # loss is mean-of-batch-means (the reference's convention,
        # metrics.py), so it is split-dependent by design; a padded row
        # leaking into the loss would shift it far beyond this bound.
        np.testing.assert_allclose(rec5["loss"], rec["loss"], rtol=5e-2)

        # Mesh invariance: the default eval above ran sharded over the
        # 8-device CPU mesh; --single-device must report EXACTLY the same
        # metrics (mask-padded shards, psum-reduced counts).
        evaluate.main([
            "--model", str(out / "latest_model"),
            "--data-dir", str(data_dir), "--batch-size", "8",
            "--single-device",
        ])
        rec1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        for k in ("tp", "fp", "fn", "tn", "accuracy"):
            assert rec1[k] == rec[k], k
        np.testing.assert_allclose(rec1["loss"], rec["loss"], rtol=1e-5)

        # Shard-directory input: evaluating a cdt-pack'd copy of the same
        # corpus scores the same clips (int16 quantization is far inside
        # the decision margins of a trained model).
        from cough_detector_tpu.cli import pack

        shards = tmp_path / "eval_shards"
        pack.main([
            "--data-dir", str(data_dir), "--output", str(shards),
            "--no-split", "--num-workers", "2",
        ])
        capsys.readouterr()
        evaluate.main([
            "--model", str(out / "latest_model"),
            "--data-dir", str(shards), "--batch-size", "8",
        ])
        recs = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        for k in ("tp", "fp", "fn", "tn"):
            assert recs[k] == rec[k], k

    def test_match_detections_is_event_honest(self):
        """A double-fire on one cough plus a miss on another must NOT
        score 100 % (the old len(detections)/n arithmetic did)."""
        from cough_detector_tpu.cli.evaluate import match_detections

        starts = [0.0, 5.0, 10.0]
        # two fires on cough 0, one on cough 2, none on cough 1, one
        # spurious fire far from any event.
        times = [1.0, 1.5, 11.0, 20.5]
        matched, spurious = match_detections(times, starts, span=3.0)
        assert matched == {0, 2}
        assert spurious == 1
        assert len(matched) / len(starts) == pytest.approx(2 / 3)

    def test_scenarios_disjoint_from_training_seeds(self):
        """r4 review: with the default workflow (corpus seed 0, eval
        --seed 0) the detection scenario used to embed LITERAL training
        clips (both drew synthetic_cough(seed + i)). Scenario seeds are
        now salted into a disjoint space — the cough planted at t=0 must
        not be training clip 0, and no scenario clip may replay any of
        the first 100 training-negative seeds."""
        import numpy as np

        from cough_detector_tpu.cli.evaluate import _scenario_signals
        from cough_detector_tpu.data import synth

        _, speech, (coughs, starts), confusables = _scenario_signals(
            0, 0.25
        )
        train_cough = synth.synthetic_cough(0, 2.0)
        window = coughs[: len(train_cough)]
        # The scenario adds a noise floor; a literal replay would still
        # correlate ~1.0 with the training clip.
        corr = float(
            np.dot(window, train_cough)
            / (np.linalg.norm(window) * np.linalg.norm(train_cough) + 1e-9)
        )
        assert corr < 0.9, "scenario cough replays training clip 0"

    def test_behavioral_mode(self, shared_ckpt_dir, capsys):
        from cough_detector_tpu.cli import evaluate

        out = shared_ckpt_dir
        capsys.readouterr()
        evaluate.main([
            "--model", str(out / "latest_model"), "--behavioral",
            "--minutes", "0.1", "--threshold", "0.99",
        ])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "fp_per_min_silence" in rec and "cough_detection_rate" in rec
        # r3 VERDICT #5: the cough-confusable scenario (laughs + throat
        # clears) is part of the protocol now.
        assert "fp_per_min_confusables" in rec

    def test_calibrate_mode(self, shared_ckpt_dir, capsys):
        """--calibrate sweeps thresholds over the behavioral scenarios.
        The in-CLI self-check (replayed threshold+debounce rule must
        reproduce the live engine's event counts at --threshold) runs
        before any sweep number is printed, so a passing run certifies
        replay fidelity too."""
        from cough_detector_tpu.cli import evaluate

        out = shared_ckpt_dir
        capsys.readouterr()
        evaluate.main([
            "--model", str(out / "latest_model"), "--calibrate",
            "--minutes", "0.1", "--threshold", "0.5",
        ])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert len(rec["sweep"]) == 19
        for row in rec["sweep"]:
            assert set(row) >= {
                "threshold", "fp_per_min_silence", "fp_per_min_speech",
                "fp_per_min_confusables", "cough_detection_rate",
                "passes", "passes_strict",
            }
            # Strict (confusable-rejecting) passing implies plain passing.
            assert not row["passes_strict"] or row["passes"]
        # Full monotonicity is NOT guaranteed by the threshold+debounce
        # rule — raising the threshold can skip an early fire and realign
        # the debounce grid so MORE later peaks become eligible. What IS
        # guaranteed: a zero FP rate is upward-closed in the threshold
        # (no window clears t ⇒ none clears t' > t ⇒ zero events).
        sils = [r["fp_per_min_silence"] for r in rec["sweep"]]
        seen_zero = False
        for v in sils:
            if seen_zero:
                assert v == 0.0
            seen_zero = seen_zero or v == 0.0
        if rec["passing_band"] is not None:
            lo, hi = rec["passing_band"]
            assert lo <= rec["recommended_threshold"] <= hi


class TestExtractSegments:
    """The curation tool the reference only sketched
    (IMPROVEMENT_PLAN.md:222-267): energy-burst extraction and uniform
    tiling of long recordings into training-length clips."""

    @pytest.fixture()
    def long_recordings(self, tmp_path):
        d = tmp_path / "long"
        d.mkdir()
        sr = 16000
        # 8 s of near-silence with two loud coughs at 2 s and 5.5 s.
        wave = (np.random.default_rng(0).standard_normal(8 * sr) * 1e-4)
        for pos in (2.0, 5.5):
            c = synth.synthetic_cough(7, duration_s=1.0)
            lo = int(pos * sr)
            wave[lo : lo + len(c)] += c
        audio_io.write_wav(d / "rec0.wav", wave.astype(np.float32), sr)
        return d

    def test_energy_mode_finds_bursts(self, long_recordings, tmp_path, capsys):
        from cough_detector_tpu.cli import extract_segments

        out = tmp_path / "segs"
        extract_segments.main([
            "--input-dir", str(long_recordings), "--output-dir", str(out),
            "--mode", "energy",
        ])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["recordings"] == 1
        assert rec["written"] == 2  # the two coughs, nothing from silence
        clips = sorted(out.glob("*.wav"))
        assert len(clips) == 2
        for c in clips:
            w, sr = audio_io.read_wav(str(c))
            assert sr == 16000 and w.shape[-1] == 16000

    def test_uniform_mode_tiles_everything(self, long_recordings, tmp_path, capsys):
        from cough_detector_tpu.cli import extract_segments

        out = tmp_path / "tiles"
        extract_segments.main([
            "--input-dir", str(long_recordings), "--output-dir", str(out),
            "--mode", "uniform",
        ])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["written"] == 8  # 8 s -> 8 one-second tiles

    def test_model_filtered_extraction(
        self, long_recordings, shared_ckpt_dir, tmp_path, capsys
    ):
        from cough_detector_tpu.cli import extract_segments

        ck = shared_ckpt_dir
        capsys.readouterr()
        out = tmp_path / "scored"
        extract_segments.main([
            "--input-dir", str(long_recordings), "--output-dir", str(out),
            "--mode", "energy", "--model", str(ck / "latest_model"),
            "--min-confidence", "0.0",
        ])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["scored"] is True
        assert rec["written"] == rec["candidates"] == 2


class TestRootLaunchers:
    """Every reference top-level script has a root launcher here
    (reference repo root; docs/COMPONENT_MAP.md §2.7)."""

    REFERENCE_SCRIPTS = [
        "run_detection.py", "train_quick.py", "train_with_data.py",
        "download_esc50.py", "prepare_data.py", "setup_data.py",
        "setup_coughvid.py", "run_all.sh", "setup.sh",
    ]

    def test_all_present(self):
        import pathlib

        root = pathlib.Path(__file__).resolve().parent.parent
        missing = [s for s in self.REFERENCE_SCRIPTS if not (root / s).exists()]
        assert not missing, missing

    def test_curation_launchers_reach_the_clis(self):
        import pathlib

        root = pathlib.Path(__file__).resolve().parent.parent
        assert "cli.prepare_data" in (root / "prepare_data.py").read_text()
        assert "cli.setup_coughvid" in (root / "setup_coughvid.py").read_text()
