"""Pre-decoded shard pipeline tests (data/shards.py + cdt-pack +
train --shards): pack/load round-trip vs the decode path, epoch-keyed
determinism equivalence with BatchLoader, pin-vs-auto-advance epoch
semantics, and end-to-end training incl. bit-exact resume from shards."""

import json
from pathlib import Path

import numpy as np
import pytest

from cough_detector_tpu.config import Config, FeatureConfig, TrainConfig
from cough_detector_tpu.data import synth
from cough_detector_tpu.data.audio_io import write_wav
from cough_detector_tpu.data.datasets import BatchLoader, CoughDataset
from cough_detector_tpu.data.shards import (
    INT16_SCALE,
    ShardLoader,
    dequantize,
    write_shards,
)

FCFG = FeatureConfig()


@pytest.fixture()
def data_dir(tmp_path):
    for label, gen, n in [
        ("cough", synth.synthetic_cough, 10),
        ("non_cough", synth.synthetic_non_cough, 10),
    ]:
        d = tmp_path / "data" / label
        d.mkdir(parents=True)
        for i in range(n):
            sr = 16000 if i % 2 == 0 else 22050
            wave = gen(seed=200 + i, duration_s=1.2, sample_rate=sr)
            write_wav(d / f"{label}_{i:02d}.wav", wave, sr)
    return str(tmp_path / "data")


@pytest.fixture()
def packed(data_dir, tmp_path):
    ds = CoughDataset(data_dir)
    out = tmp_path / "shards"
    manifest = write_shards(ds, str(out), FCFG, shard_size=7, num_workers=2)
    return ds, str(out), manifest


class TestPackGeometryFlags:
    def test_pack_cli_honors_config_and_overrides(self, data_dir, tmp_path):
        """cdt-pack must be able to pack for any feature geometry, not just
        the defaults: --config takes a train-style config.json (or a
        checkpoint dir) and --sample-rate/--segment-duration override it;
        the geometry lands in the manifest, where ShardLoader's loud
        cross-check ties the corpus to its config (r3 review)."""
        from cough_detector_tpu.cli import pack

        cfg = Config(features=FeatureConfig(sample_rate=8000,
                                            segment_duration=0.5))
        cfg_path = tmp_path / "config.json"
        cfg_path.write_text(cfg.to_json())

        out = tmp_path / "s8k"
        pack.main([
            "--data-dir", data_dir, "--output", str(out),
            "--no-split", "--num-workers", "2",
            "--config", str(cfg_path),
        ])
        manifest = json.loads((out / "manifest.json").read_text())
        assert manifest["sample_rate"] == 8000
        assert manifest["segment_samples"] == 4000
        # Loads under the matching config; rejected under the default one.
        loader = ShardLoader(str(out), 4, feature_config=cfg.features)
        assert loader.n_clips == 20
        with pytest.raises(ValueError, match="geometry"):
            ShardLoader(str(out), 4, feature_config=FCFG)

        out2 = tmp_path / "s11k"
        pack.main([
            "--data-dir", data_dir, "--output", str(out2),
            "--no-split", "--num-workers", "2",
            "--config", str(cfg_path), "--sample-rate", "11025",
        ])
        m2 = json.loads((out2 / "manifest.json").read_text())
        assert m2["sample_rate"] == 11025  # flag beats --config
        assert m2["segment_samples"] == int(11025 * 0.5)

    def test_pack_cli_rejects_dir_without_meta(self, data_dir, tmp_path):
        """--config pointing at a directory with no meta.json (a typo'd
        checkpoint path) must die with a clear message, not a raw
        IsADirectoryError (ADVICE r3)."""
        from cough_detector_tpu.cli import pack

        empty = tmp_path / "not_a_ckpt"
        empty.mkdir()
        with pytest.raises(SystemExit, match="meta.json"):
            pack.main([
                "--data-dir", data_dir, "--output", str(tmp_path / "out"),
                "--no-split", "--config", str(empty),
            ])

    def test_pack_cli_reads_checkpoint_dir(self, data_dir, tmp_path):
        """--config also accepts a checkpoint directory: the geometry comes
        from meta.json's config_full (the checkpoint's nested source of
        truth, train/checkpoint.py), so a corpus can be packed to match an
        already-trained model without hunting for its original config."""
        from cough_detector_tpu.cli import pack

        cfg = Config(features=FeatureConfig(sample_rate=8000,
                                            segment_duration=0.5))
        ckpt_dir = tmp_path / "best_model"
        ckpt_dir.mkdir()
        (ckpt_dir / "meta.json").write_text(json.dumps({
            "epoch": 3, "metrics": {},
            "config": cfg.to_flat_dict(),
            "config_full": json.loads(cfg.to_json()),
        }))

        out = tmp_path / "from_ckpt"
        pack.main([
            "--data-dir", data_dir, "--output", str(out),
            "--no-split", "--num-workers", "2",
            "--config", str(ckpt_dir),
        ])
        manifest = json.loads((out / "manifest.json").read_text())
        assert manifest["sample_rate"] == 8000
        assert manifest["segment_samples"] == 4000


class TestProcessSlices:
    def test_shard_loader_slices_reassemble(self, packed):
        """ShardLoader honors the same multi-host process-slice contract
        as BatchLoader (shared _EpochKeyedLoader): per-rank slices
        reassemble bit-exactly into the global batches, and the gather
        work splits between ranks."""
        _, shard_dir, _ = packed

        def make(lo=None, hi=None):
            sl = ShardLoader(shard_dir, 8, weighted=True, seed=5)
            sl.set_epoch(2)
            if lo is not None:
                sl.set_process_slice(lo, hi, 8)
            return sl

        global_batches = list(make())
        r0, r1 = list(make(0, 4)), list(make(4, 8))
        assert len(global_batches) == len(r0) == len(r1) == 3
        for (gw, gl), (w0, l0, n0), (w1, l1, n1) in zip(
            global_batches, r0, r1
        ):
            n = gw.shape[0]
            assert n0 == n1 == n
            np.testing.assert_array_equal(
                np.concatenate([w0, w1])[:n], gw
            )
            np.testing.assert_array_equal(
                np.concatenate([l0, l1])[:n], gl
            )


class TestPackRoundTrip:
    def test_shards_match_decode_path_within_half_lsb(self, packed):
        """Sequential ShardLoader batches must equal the decode-path
        BatchLoader batches to within half an int16 LSB — the resampled
        (22.05 kHz) fixtures leave the k/32768 lattice, so quantization
        is genuinely rounding for them."""
        ds, shard_dir, manifest = packed
        assert manifest["n_clips"] == len(ds) == 20
        assert len(manifest["shards"]) == 3  # 7 + 7 + 6
        direct = BatchLoader(ds, 8, FCFG, num_workers=2)
        sl = ShardLoader(shard_dir, 8)
        for (dw, dl), (sw, sli) in zip(direct, sl):
            assert sw.dtype == np.int16
            np.testing.assert_array_equal(dl, sli)
            np.testing.assert_allclose(
                dequantize(sw), dw, atol=0.5 / INT16_SCALE + 1e-7
            )

    def test_native_rate_sources_round_trip_bit_exactly(self, tmp_path):
        """16 kHz WAV sources need no resampling: their decoded samples
        are exactly k/32768, and the format-v2 quantizer uses the
        decoder's own scale, so pack→load is LOSSLESS (a 32767 scale —
        format v1 — perturbed every |k| >= 16385 by one LSB)."""
        d = tmp_path / "native_rate"
        for label, gen in [
            ("cough", synth.synthetic_cough),
            ("non_cough", synth.synthetic_non_cough),
        ]:
            sub = d / label
            sub.mkdir(parents=True)
            for i in range(4):
                write_wav(
                    sub / f"{i}.wav", gen(seed=i, duration_s=1.0), 16000
                )
        ds = CoughDataset(str(d))
        out = tmp_path / "shards16k"
        write_shards(ds, str(out), FCFG, shard_size=8, num_workers=2)
        direct = BatchLoader(ds, 8, FCFG, num_workers=2)
        sl = ShardLoader(str(out), 8)
        for (dw, dl), (sw, sli) in zip(direct, sl):
            np.testing.assert_array_equal(dl, sli)
            np.testing.assert_array_equal(dequantize(sw), dw)

    def test_class_counts_and_weights_match_dataset(self, packed):
        ds, shard_dir, _ = packed
        sl = ShardLoader(shard_dir, 8)
        assert sl.class_counts == ds.class_counts
        np.testing.assert_allclose(sl.sample_weights, ds.sample_weights)

    def test_version_guard(self, packed, tmp_path):
        _, shard_dir, _ = packed
        man = Path(shard_dir) / "manifest.json"
        bad = json.loads(man.read_text())
        bad["version"] = 99
        man.write_text(json.dumps(bad))
        with pytest.raises(ValueError, match="version"):
            ShardLoader(shard_dir, 8)

    def test_missing_manifest_is_loud(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="cdt-pack"):
            ShardLoader(str(tmp_path / "nowhere"), 8)

    def test_geometry_mismatch_is_loud(self, packed):
        """A corpus packed under a different sample rate / segment length
        must refuse to load when the consumer's feature config disagrees
        — silently computing features on the wrong time base is the
        worst possible failure (no numeric error anywhere)."""
        _, shard_dir, _ = packed
        ShardLoader(shard_dir, 8, feature_config=FCFG)  # matching: OK
        bad = FeatureConfig(sample_rate=22050)
        with pytest.raises(ValueError, match="geometry"):
            ShardLoader(shard_dir, 8, feature_config=bad)


class TestDeterminismContract:
    def test_weighted_order_identical_to_batchloader(self, packed):
        """Same seed, same epoch, same inverse-frequency weights → the
        shard path draws the SAME sample sequence as the decode path, so
        switching a training run to shards changes neither curriculum
        nor resume behavior."""
        ds, shard_dir, _ = packed
        direct = BatchLoader(
            ds, 8, FCFG, weighted=True, drop_last=True,
            num_workers=2, seed=5,
        )
        sl = ShardLoader(
            shard_dir, 8, weighted=True, drop_last=True, seed=5,
        )
        for epoch in (0, 3):
            direct.set_epoch(epoch)
            sl.set_epoch(epoch)
            d_labels = np.concatenate([l for _, l in direct])
            s_labels = np.concatenate([l for _, l in sl])
            np.testing.assert_array_equal(d_labels, s_labels)
            d_order = direct._epoch_order(direct._epoch_rng())
            s_order = sl._epoch_order(sl._epoch_rng())
            np.testing.assert_array_equal(d_order, s_order)

    @pytest.mark.parametrize("kind", ["shard", "batch"])
    def test_pinned_loader_never_auto_advances(self, packed, kind):
        """set_epoch pins: iterator close must not mutate the epoch
        (VERDICT r2 weak #7 — the two mechanisms no longer mix)."""
        ds, shard_dir, _ = packed
        loader = (
            ShardLoader(shard_dir, 4, shuffle=True, seed=1)
            if kind == "shard"
            else BatchLoader(ds, 4, FCFG, shuffle=True, seed=1,
                             num_workers=2)
        )
        loader.set_epoch(2)
        first = next(iter(loader))[1]
        assert loader._epoch == 2
        again = next(iter(loader))[1]  # replay, not advance
        np.testing.assert_array_equal(first, again)

    @pytest.mark.parametrize("kind", ["shard", "batch"])
    def test_unpinned_loader_advances_per_pass(self, packed, kind):
        ds, shard_dir, _ = packed
        loader = (
            ShardLoader(shard_dir, 20, shuffle=True, seed=1)
            if kind == "shard"
            else BatchLoader(ds, 20, FCFG, shuffle=True, seed=1,
                             num_workers=2)
        )
        a = np.concatenate([l for _, l in loader])
        assert loader._epoch == 1
        b = np.concatenate([l for _, l in loader])
        assert loader._epoch == 2
        assert not np.array_equal(a, b)  # 20 clips: collision ~ never


class TestTrainFromShards:
    def _pack(self, data_dir, tmp_path):
        from cough_detector_tpu.cli import pack

        out = tmp_path / "packed"
        pack.main([
            "--data-dir", data_dir, "--output", str(out),
            "--shard-size", "6", "--num-workers", "2",
        ])
        return str(out)

    def _cfg(self, epochs):
        return Config(
            model=Config().model.__class__(model_type="small"),
            train=TrainConfig(batch_size=8, epochs=epochs, patience=50),
        )

    def test_two_epochs_from_shards(self, data_dir, tmp_path, capsys):
        from cough_detector_tpu.train import train

        shards = self._pack(data_dir, tmp_path)
        report = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        assert report["train"]["clips"] == 16
        assert report["val"]["clips"] == 4
        out = tmp_path / "run"
        train(None, str(out), config=self._cfg(2), shards_dir=shards)
        lines = (out / "metrics.jsonl").read_text().strip().splitlines()
        assert len(lines) == 2
        rec = json.loads(lines[-1])
        assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["val_loss"])
        assert (out / "best_model" / "meta.json").exists()

    def test_device_corpus_epoch_scan_matches_streamed_path(
        self, data_dir, tmp_path
    ):
        """The one-scanned-program-per-epoch mode (device-resident int16
        corpus, train/steps.py epoch-scan) must reproduce the streamed
        shard path's metrics: same sample order, same augmentation key
        chain, same masked-loss math — only the dispatch granularity
        differs."""
        from cough_detector_tpu.train import train

        shards = self._pack(data_dir, tmp_path)
        out_scan = tmp_path / "scan"
        out_stream = tmp_path / "stream"
        train(None, str(out_scan), config=self._cfg(2), shards_dir=shards,
              device_corpus=True)
        train(None, str(out_stream), config=self._cfg(2),
              shards_dir=shards, device_corpus=False)
        recs = {}
        for name, out in (("scan", out_scan), ("stream", out_stream)):
            recs[name] = [
                json.loads(l)
                for l in (out / "metrics.jsonl").read_text().splitlines()
            ]
        skip = {"train_clips_per_sec", "val_clips_per_sec", "wall_s", "t"}
        assert len(recs["scan"]) == len(recs["stream"]) == 2
        for ra, rb in zip(recs["scan"], recs["stream"]):
            for k, va in ra.items():
                if k in skip:
                    continue
                np.testing.assert_allclose(
                    rb[k], va, rtol=1e-4, atol=1e-6,
                    err_msg=f"epoch {ra['epoch']} field {k}",
                )

    def test_mixup_scan_matches_streamed_path(self, data_dir, tmp_path):
        """With TrainConfig.use_mixup on, the epoch-scan and streamed
        paths share train_step's mixup key split — metrics must still
        agree across dispatch granularities (r5 lever, BASELINE matrix)."""
        import dataclasses

        from cough_detector_tpu.train import train

        shards = self._pack(data_dir, tmp_path)
        cfg = self._cfg(2)
        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train, use_mixup=True)
        )
        out_scan = tmp_path / "mscan"
        out_stream = tmp_path / "mstream"
        train(None, str(out_scan), config=cfg, shards_dir=shards,
              device_corpus=True)
        train(None, str(out_stream), config=cfg, shards_dir=shards,
              device_corpus=False)
        skip = {"train_clips_per_sec", "val_clips_per_sec", "wall_s", "t"}
        for la, lb in zip(
            (out_scan / "metrics.jsonl").read_text().splitlines(),
            (out_stream / "metrics.jsonl").read_text().splitlines(),
        ):
            ra, rb = json.loads(la), json.loads(lb)
            for k, va in ra.items():
                if k in skip:
                    continue
                np.testing.assert_allclose(
                    rb[k], va, rtol=1e-4, atol=1e-6,
                    err_msg=f"epoch {ra['epoch']} field {k}",
                )

    def test_sharded_device_corpus_matches_replicated(
        self, data_dir, tmp_path
    ):
        """Row-sharding the device-resident corpus across the mesh
        (corpus > per-device budget; parallel.corpus_sharding + the
        routed collective gather) must reproduce the replicated layout's
        metrics exactly — same batches, same order, only the storage
        layout and the gather collective differ. With the tiny budget
        here the corpus (640 KB) exceeds one device's budget (100 KB)
        but fits the 8-device mesh total, proving capacity scales with
        the mesh (r3 VERDICT weak #3 / next #4)."""
        from cough_detector_tpu.train import train

        shards = self._pack(data_dir, tmp_path)
        out_rep = tmp_path / "replicated"
        out_sh = tmp_path / "sharded"
        train(None, str(out_rep), config=self._cfg(2), shards_dir=shards,
              device_corpus=True)
        train(None, str(out_sh), config=self._cfg(2), shards_dir=shards,
              device_corpus=True, device_corpus_budget=100_000)
        recs = {}
        for name, out in (("rep", out_rep), ("sh", out_sh)):
            recs[name] = [
                json.loads(l)
                for l in (out / "metrics.jsonl").read_text().splitlines()
            ]
        skip = {"train_clips_per_sec", "val_clips_per_sec", "wall_s", "t"}
        assert len(recs["rep"]) == len(recs["sh"]) == 2
        for ra, rb in zip(recs["rep"], recs["sh"]):
            for k, va in ra.items():
                if k in skip:
                    continue
                np.testing.assert_allclose(
                    rb[k], va, rtol=1e-6, atol=0,
                    err_msg=f"epoch {ra['epoch']} field {k}",
                )

    def test_chunked_device_corpus_matches_resident(
        self, data_dir, tmp_path
    ):
        """A corpus streamed through double-buffered window uploads
        (device_corpus='chunked' — the beyond-mesh-HBM mode, r4 VERDICT
        weak #8) must reproduce the device-resident scan's metrics
        exactly: the window fn threads (state, key) across windows so
        the step numerics and epoch key chain are the resident
        program's, only the upload granularity differs. The tiny budget
        forces 1-step windows — 2 windows per epoch plus separate val
        windows, exercising the remap/capacity/carry machinery."""
        from cough_detector_tpu.train import train

        shards = self._pack(data_dir, tmp_path)
        out_res = tmp_path / "resident"
        out_ch = tmp_path / "chunked"
        train(None, str(out_res), config=self._cfg(2), shards_dir=shards,
              device_corpus=True)
        train(None, str(out_ch), config=self._cfg(2), shards_dir=shards,
              device_corpus="chunked", device_corpus_budget=100_000)
        recs = {}
        for name, out in (("res", out_res), ("ch", out_ch)):
            recs[name] = [
                json.loads(l)
                for l in (out / "metrics.jsonl").read_text().splitlines()
            ]
        skip = {"train_clips_per_sec", "val_clips_per_sec", "wall_s", "t"}
        assert len(recs["res"]) == len(recs["ch"]) == 2
        for ra, rb in zip(recs["res"], recs["ch"]):
            for k, va in ra.items():
                if k in skip:
                    continue
                np.testing.assert_allclose(
                    rb[k], va, rtol=1e-6, atol=0,
                    err_msg=f"epoch {ra['epoch']} field {k}",
                )

    def test_auto_mode_picks_chunked_beyond_mesh_budget(
        self, data_dir, tmp_path, capsys
    ):
        """device_corpus='auto' with a corpus exceeding the MESH-TOTAL
        budget must choose the chunked window path (not the ~84x-slower
        per-batch decode loop) and still produce finite metrics."""
        from cough_detector_tpu.train import train

        shards = self._pack(data_dir, tmp_path)
        out = tmp_path / "auto_chunk"
        # 16 train + 4 val clips * seg * 2B ≈ 640 KB >> 8 * 10 KB.
        train(None, str(out), config=self._cfg(1), shards_dir=shards,
              device_corpus="auto", device_corpus_budget=10_000)
        assert "Chunked device corpus" in capsys.readouterr().out
        rec = json.loads(
            (out / "metrics.jsonl").read_text().strip().splitlines()[-1]
        )
        assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["val_loss"])

    def test_resume_from_shards_replays_identical_stream(
        self, data_dir, tmp_path
    ):
        """The bit-exact resume contract holds on the shard path: 3
        straight epochs == 1 + resume + 2 (same TestDeterministicResume
        guarantee as the decode path)."""
        from cough_detector_tpu.train import train

        shards = self._pack(data_dir, tmp_path)
        out_a = tmp_path / "straight"
        train(None, str(out_a), config=self._cfg(3), shards_dir=shards)
        out_b = tmp_path / "resumed"
        train(None, str(out_b), config=self._cfg(1), shards_dir=shards)
        train(None, str(out_b), config=self._cfg(3), shards_dir=shards,
              resume=str(out_b / "latest_model"))

        recs = []
        for out in (out_a, out_b):
            recs.append([
                json.loads(l)
                for l in (out / "metrics.jsonl").read_text().splitlines()
            ])
        assert [r["epoch"] for r in recs[0]] == [0, 1, 2]
        assert [r["epoch"] for r in recs[1]] == [0, 1, 2]
        skip = {"train_clips_per_sec", "val_clips_per_sec", "wall_s", "t"}
        for ra, rb in zip(*recs):
            for k, va in ra.items():
                if k in skip:
                    continue
                np.testing.assert_allclose(
                    rb[k], va, rtol=1e-6, atol=1e-7,
                    err_msg=f"epoch {ra['epoch']} field {k}",
                )
