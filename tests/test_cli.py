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


class TestTrainDetect:
    @pytest.fixture(scope="class")
    def ckpt_dir(self, data_dir, tmp_path_factory):
        from cough_detector_tpu.cli import train as tcli

        out = tmp_path_factory.mktemp("ckpt")
        tcli.main([
            "--data-dir", str(data_dir), "--output-dir", str(out),
            "--model-type", "small", "--epochs", "1", "--batch-size", "4",
            "--no-esc50", "--num-workers", "2",
        ])
        return out

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

    def test_detect_requires_model(self):
        from cough_detector_tpu.cli import detect

        with pytest.raises(SystemExit):
            detect.main(["--threshold", "0.5"])

    def test_list_devices_no_backend(self, capsys):
        from cough_detector_tpu.cli import detect

        detect.main(["--list-devices"])
        assert "audio input devices" in capsys.readouterr().out


class TestEvaluate:
    def test_dataset_mode(self, data_dir, tmp_path, capsys):
        from cough_detector_tpu.cli import evaluate, train as tcli

        out = tmp_path / "ck"
        tcli.main([
            "--data-dir", str(data_dir), "--output-dir", str(out),
            "--model-type", "small", "--epochs", "1", "--batch-size", "4",
            "--no-esc50", "--num-workers", "2",
        ])
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

    def test_behavioral_mode(self, data_dir, tmp_path, capsys):
        from cough_detector_tpu.cli import evaluate, train as tcli

        out = tmp_path / "ck2"
        tcli.main([
            "--data-dir", str(data_dir), "--output-dir", str(out),
            "--model-type", "small", "--epochs", "1", "--batch-size", "4",
            "--no-esc50", "--num-workers", "2",
        ])
        capsys.readouterr()
        evaluate.main([
            "--model", str(out / "latest_model"), "--behavioral",
            "--minutes", "0.1", "--threshold", "0.99",
        ])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "fp_per_min_silence" in rec and "cough_detection_rate" in rec
