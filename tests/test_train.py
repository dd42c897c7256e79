"""Training subsystem tests: schedule parity vs torch, CE-loss parity,
class weights, early stopping, one-step optimization, checkpoint round-trip,
and a tiny end-to-end train() run on synthetic data."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cough_detector_tpu.config import Config, FeatureConfig, TrainConfig
from cough_detector_tpu.data import synth
from cough_detector_tpu.data.audio_io import write_wav
from cough_detector_tpu.models import create_model, init_model
from cough_detector_tpu.train import (
    EarlyStopping,
    checkpoint as ckpt,
    compute_class_weights,
    cosine_warm_restarts_lr,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    weighted_cross_entropy,
)


class TestSchedule:
    def test_matches_torch_warm_restarts(self):
        m = torch.nn.Linear(2, 2)
        opt = torch.optim.AdamW(m.parameters(), lr=5e-4)
        sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
            opt, T_0=10, T_mult=2, eta_min=1e-6
        )
        for epoch in range(150):
            want = opt.param_groups[0]["lr"]
            got = cosine_warm_restarts_lr(epoch, 5e-4)
            assert abs(got - want) < 1e-10, f"epoch {epoch}: {got} vs {want}"
            sched.step()


class TestLoss:
    def test_weighted_ce_matches_torch(self):
        rng = np.random.default_rng(0)
        logits = rng.standard_normal((16, 2)).astype(np.float32)
        labels = rng.integers(0, 2, 16).astype(np.int64)
        w = np.asarray([0.6, 3.1], np.float32)

        want = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w))(
            torch.from_numpy(logits), torch.from_numpy(labels)
        ).item()
        got = float(
            weighted_cross_entropy(
                jnp.asarray(logits), jnp.asarray(labels.astype(np.int32)),
                jnp.asarray(w),
            )
        )
        assert abs(got - want) < 1e-6

    def test_unweighted(self):
        logits = jnp.asarray([[10.0, -10.0]])
        labels = jnp.asarray([0])
        assert float(weighted_cross_entropy(logits, labels)) < 1e-6


class TestClassWeights:
    def test_balanced(self):
        w0, w1 = compute_class_weights({0: 100, 1: 100})
        assert w0 == w1 == 1.0

    def test_ratio_cap(self):
        w0, w1 = compute_class_weights({0: 10000, 1: 10})
        assert w1 / w0 == pytest.approx(20.0)


class TestEarlyStopping:
    def test_stops_after_patience(self):
        es = EarlyStopping(patience=3, min_delta=0.001)
        assert not es(1.0)
        assert not es(1.0)  # no improvement 1
        assert not es(0.9995)  # within min_delta: counts 2
        assert es(1.2)  # 3 -> stop

    def test_reset_on_improvement(self):
        es = EarlyStopping(patience=2)
        es(1.0); es(1.0)
        assert not es(0.5)
        assert not es(0.6)
        assert es(0.7)


def _tiny_setup(batch=8):
    cfg = Config(train=TrainConfig(batch_size=batch))
    model = create_model("small")
    variables = init_model(model, jax.random.PRNGKey(0), cfg.features.feature_shape)
    tx = make_optimizer(cfg.train, steps_per_epoch=2)
    state = create_train_state(model, variables, tx)
    waves = jnp.asarray(synth.fixture_batch(batch, 1.0, seed=0))
    labels = jnp.asarray(np.arange(batch) % 2, jnp.int32)
    cw = jnp.asarray([1.0, 1.0])
    return cfg, state, waves, labels, cw


class TestSteps:
    def test_train_step_reduces_loss(self):
        from cough_detector_tpu.ops import frontend

        cfg, state, waves, labels, cw = _tiny_setup()
        feats = frontend.extract_features(waves, cfg.features)
        step = make_train_step(donate=False)
        losses = []
        for i in range(12):
            state, m = step(state, feats, labels, jax.random.PRNGKey(i), cw)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 12

    def test_eval_step_confusion_counts(self):
        from cough_detector_tpu.ops import frontend

        cfg, state, waves, labels, cw = _tiny_setup()
        feats = frontend.extract_features(waves, cfg.features)
        ev = make_eval_step()
        m = ev(state, feats, labels, cw)
        total = int(m["tp"]) + int(m["fp"]) + int(m["fn"]) + int(m["tn"])
        assert total == 8
        assert int(m["correct"]) == int(m["tp"]) + int(m["tn"])

    def test_on_device_featurization_path(self):
        cfg, state, waves, labels, cw = _tiny_setup()
        from cough_detector_tpu.ops import frontend

        step = make_train_step(
            feature_fn=lambda w: frontend.extract_features(w, cfg.features),
            donate=False,
        )
        state2, m = step(state, waves, labels, jax.random.PRNGKey(0), cw)
        assert np.isfinite(float(m["loss"]))

    def test_soft_onehot_ce_equals_hard(self):
        """The soft-label CE (MixUp path) must reduce EXACTLY to the
        hard-label weighted CE when the soft labels are one-hot — one
        loss definition, two entry forms."""
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.standard_normal((16, 2)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 2, 16), jnp.int32)
        w = jnp.asarray([0.6, 3.1])
        mask = jnp.asarray((np.arange(16) < 13), jnp.float32)
        onehot = jax.nn.one_hot(labels, 2)
        hard = weighted_cross_entropy(logits, labels, w, mask)
        soft = weighted_cross_entropy(
            logits, labels, w, mask, soft_labels=onehot
        )
        assert abs(float(hard) - float(soft)) < 1e-6

    def test_mixup_mask_protects_real_rows(self):
        """A real row whose drawn partner is padded must come through
        UNMIXED (λ forced to 1): padding garbage can never leak into a
        real sample's features or soft label."""
        from cough_detector_tpu.augment.spec import mixup

        b = 16
        key = jax.random.PRNGKey(3)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((b, 4, 5)),
                        jnp.float32)
        y = jax.nn.one_hot(jnp.arange(b) % 2, 2)
        mask = jnp.asarray((np.arange(b) < 10), jnp.float32)
        xm, ym = mixup(x, y, key, 0.2, mask=mask)
        # Recompute the permutation mixup drew to find padded partners.
        _, k_perm = jax.random.split(key)
        perm = np.asarray(jax.random.permutation(k_perm, b))
        padded_partner = np.asarray(mask)[perm] == 0
        assert padded_partner.any(), "fixture must hit a padded partner"
        np.testing.assert_allclose(
            np.asarray(xm)[padded_partner], np.asarray(x)[padded_partner],
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ym)[padded_partner], np.asarray(y)[padded_partner],
            rtol=1e-6,
        )

    def test_mixup_train_step_runs_and_differs(self):
        """mixup_alpha (TrainConfig.use_mixup) actually changes the
        optimization step; the default path is structurally untouched."""
        from cough_detector_tpu.ops import frontend

        cfg, state, waves, labels, cw = _tiny_setup()
        feats = frontend.extract_features(waves, cfg.features)
        plain = make_train_step(donate=False)
        mixed = make_train_step(donate=False, mixup_alpha=0.2)
        s1, m1 = plain(state, feats, labels, jax.random.PRNGKey(0), cw)
        s2, m2 = mixed(state, feats, labels, jax.random.PRNGKey(0), cw)
        assert np.isfinite(float(m2["loss"]))
        assert float(m1["loss"]) != float(m2["loss"])
        # Mixed loss still optimizes: a few steps reduce it.
        losses = []
        st = state
        for i in range(12):
            st, m = mixed(st, feats, labels, jax.random.PRNGKey(i), cw)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]

    def test_padded_step_is_trajectory_invariant(self):
        """Padding a batch for mesh divisibility must not perturb training:
        with the row mask threaded into BatchNorm (models/layers.py), the
        loss, gradients AND running batch statistics of a padded step are
        exactly the unpadded batch's. Regression for the r3 review finding
        that padded zero rows contaminated BN running stats.

        dropout=0 (residual model): dropout draws its mask over the full
        (padded) batch shape, so the 8-row and 6-row programs would see
        different per-row noise — BN is the padding-sensitive piece under
        test, and it must be exact with the noise sources silenced."""
        from cough_detector_tpu.ops import frontend

        cfg = Config(train=TrainConfig(batch_size=8))
        model = create_model("residual", dropout=0.0)
        variables = init_model(
            model, jax.random.PRNGKey(0), cfg.features.feature_shape
        )
        tx = make_optimizer(cfg.train, steps_per_epoch=2)
        state = create_train_state(model, variables, tx)
        waves = jnp.asarray(synth.fixture_batch(8, 1.0, seed=0))
        labels = jnp.asarray(np.arange(8) % 2, jnp.int32)
        cw = jnp.asarray([1.0, 1.0])
        feats = np.asarray(frontend.extract_features(waves, cfg.features))
        n = 6  # real rows; pad 2
        step = make_train_step(donate=False)

        ref_state, ref_m = step(
            state, jnp.asarray(feats[:n]), labels[:n],
            jax.random.PRNGKey(0), cw,
        )

        pad_feats = feats.copy()
        pad_feats[n:] = 0.0
        pad_labels = np.asarray(labels).copy()
        pad_labels[n:] = 0
        mask = np.zeros(8, np.float32)
        mask[:n] = 1.0
        pad_state, pad_m = step(
            state, jnp.asarray(pad_feats), jnp.asarray(pad_labels),
            jax.random.PRNGKey(0), cw, mask=jnp.asarray(mask),
        )

        np.testing.assert_allclose(
            float(pad_m["loss"]), float(ref_m["loss"]), rtol=1e-6
        )
        assert int(pad_m["count"]) == n
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_state.batch_stats),
            jax.tree_util.tree_leaves(pad_state.batch_stats),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7,
                err_msg="batch_stats",
            )

        # Gradients (not post-AdamW params: a first Adam step is ~sign(g),
        # so reduction-order ulps on near-zero grads flip update signs).
        def grads_of(f, lab, msk):
            def loss_fn(params):
                logits, _ = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    f, train=True, mask=msk, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)},
                )
                return weighted_cross_entropy(logits, lab, cw, msk)

            return jax.grad(loss_fn)(state.params)

        g_ref = grads_of(jnp.asarray(feats[:n]), labels[:n], None)
        g_pad = grads_of(
            jnp.asarray(pad_feats), jnp.asarray(pad_labels),
            jnp.asarray(mask),
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pad)
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-7,
                err_msg="grads",
            )

        # Discriminating control: WITHOUT the mask the zero rows fold into
        # the BN statistics and the running stats diverge materially —
        # i.e. the assertion above is actually testing the mask.
        bad_state, _ = step(
            state, jnp.asarray(pad_feats), jnp.asarray(pad_labels),
            jax.random.PRNGKey(0), cw,
        )
        ref_leaves = jax.tree_util.tree_leaves(ref_state.batch_stats)
        bad_leaves = jax.tree_util.tree_leaves(bad_state.batch_stats)
        worst = max(
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(ref_leaves, bad_leaves)
        )
        assert worst > 1e-3, "control failed: unmasked pads had no effect"


class TestCheckpoint:
    def test_round_trip(self, tmp_path):
        cfg, state, waves, labels, cw = _tiny_setup()
        path = ckpt.save_checkpoint(
            str(tmp_path), "best_model", state, epoch=3,
            metrics={"f1": 0.5, "loss": 1.0}, config=cfg,
        )
        tree, epoch, metrics, cfg2 = ckpt.load_checkpoint(path, state)
        assert epoch == 3 and metrics["f1"] == 0.5
        assert cfg2.features == cfg.features
        restored = ckpt.restore_into_state(state, tree)
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_non_blocking_save_commits_identical_checkpoint(self, tmp_path):
        """block=False routes the commit through the background writer
        (the epoch-scan loop overlaps checkpoint I/O with the next
        epoch's device program): after drain_pending_saves() the tree,
        meta and config must be indistinguishable from a blocking save —
        including ordering, since best_model + latest_model share one
        writer queue."""
        cfg, state, waves, labels, cw = _tiny_setup()
        p_async = ckpt.save_checkpoint(
            str(tmp_path / "a"), "latest_model", state, epoch=5,
            metrics={"f1": 0.7, "loss": 0.3}, config=cfg,
            extra={"early_stop": {"best_loss": 0.3, "counter": 1}},
            block=False,
        )
        ckpt.drain_pending_saves()
        p_sync = ckpt.save_checkpoint(
            str(tmp_path / "b"), "latest_model", state, epoch=5,
            metrics={"f1": 0.7, "loss": 0.3}, config=cfg,
            extra={"early_stop": {"best_loss": 0.3, "counter": 1}},
        )
        tree_a, ep_a, m_a, cfg_a = ckpt.load_checkpoint(p_async, state)
        tree_b, ep_b, m_b, cfg_b = ckpt.load_checkpoint(p_sync, state)
        assert ep_a == ep_b == 5 and m_a == m_b and cfg_a == cfg_b
        import json as jsonlib
        meta_a = jsonlib.loads((tmp_path / "a/latest_model/meta.json").read_text())
        meta_b = jsonlib.loads((tmp_path / "b/latest_model/meta.json").read_text())
        assert meta_a == meta_b  # extra (early-stop counters) included
        for a, b in zip(
            jax.tree_util.tree_leaves(tree_a), jax.tree_util.tree_leaves(tree_b)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_full_nested_config_survives(self, tmp_path):
        """The Orbax meta carries the FULL nested Config: StreamConfig and
        ModelConfig.compute_dtype/dropout — fields the reference-compatible
        flat dict cannot express — must survive save→load (VERDICT r1 §7)."""
        import dataclasses

        from cough_detector_tpu.config import StreamConfig

        cfg, state, *_ = _tiny_setup()
        cfg = Config(
            features=cfg.features,
            model=dataclasses.replace(
                cfg.model, compute_dtype="bfloat16", dropout=0.25
            ),
            train=cfg.train,
            stream=StreamConfig(
                hop_duration=0.125, confidence_threshold=0.9,
                smoothing_window=5, debounce_seconds=0.75, num_streams=64,
            ),
        )
        path = ckpt.save_checkpoint(
            str(tmp_path), "best_model", state, epoch=1,
            metrics={"f1": 0.4}, config=cfg,
        )
        _, _, _, cfg2 = ckpt.load_checkpoint(path, state)
        assert cfg2 == cfg  # every section, field for field
        assert cfg2.stream.num_streams == 64
        assert cfg2.model.compute_dtype == "bfloat16"

    def test_torch_interchange(self, tmp_path):
        """TPU-trained weights → .pt → back: the serving interchange
        (reference: src/train.py:183-212)."""
        cfg, state, *_ = _tiny_setup()
        cfg = Config.from_flat_dict({**cfg.to_flat_dict(), "model_type": "small"})
        pt = tmp_path / "model.pt"
        ckpt.export_torch_checkpoint(
            str(pt), state.variables, cfg, epoch=7, metrics={"f1": 0.9}
        )
        variables, cfg2, epoch, metrics = ckpt.import_torch_checkpoint(str(pt))
        assert epoch == 7 and metrics["f1"] == 0.9
        assert cfg2.model.model_type == "small"
        for a, b in zip(
            jax.tree_util.tree_leaves(variables["params"]),
            jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, state.params)),
        ):
            np.testing.assert_allclose(np.asarray(a), b, atol=1e-7)


@pytest.fixture()
def synthetic_data_dir(tmp_path):
    """A tiny cough/non_cough directory of synthetic wavs at mixed rates."""
    for label, gen, n in [
        ("cough", synth.synthetic_cough, 12),
        ("non_cough", synth.synthetic_non_cough, 12),
    ]:
        d = tmp_path / "data" / label
        d.mkdir(parents=True)
        for i in range(n):
            sr = 16000 if i % 2 == 0 else 22050
            wave = gen(seed=100 + i, duration_s=1.2, sample_rate=sr)
            write_wav(d / f"{label}_{i:02d}.wav", wave, sr)
    return str(tmp_path / "data")


class TestEndToEnd:
    def test_train_two_epochs(self, synthetic_data_dir, tmp_path):
        from cough_detector_tpu.train import train

        cfg = Config(train=TrainConfig(batch_size=4, epochs=2, patience=10))
        cfg = Config(
            features=cfg.features,
            model=cfg.model.__class__(model_type="small"),
            train=cfg.train,
            stream=cfg.stream,
        )
        out = tmp_path / "run"
        best = train(
            synthetic_data_dir, str(out), config=cfg, num_workers=2,
        )
        assert (out / "config.json").exists()
        assert (out / "metrics.jsonl").exists()
        assert (out / "latest_model" / "meta.json").exists()
        lines = (out / "metrics.jsonl").read_text().strip().splitlines()
        assert len(lines) == 2
        rec = json.loads(lines[-1])
        assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["val_loss"])

    def test_resume(self, synthetic_data_dir, tmp_path):
        from cough_detector_tpu.train import train

        cfg = Config(train=TrainConfig(batch_size=4, epochs=1, patience=10))
        cfg = Config(
            features=cfg.features,
            model=cfg.model.__class__(model_type="small"),
            train=cfg.train, stream=cfg.stream,
        )
        out = tmp_path / "run"
        train(synthetic_data_dir, str(out), config=cfg, num_workers=2)
        # Resume for one more epoch from latest.
        cfg2 = Config(
            features=cfg.features, model=cfg.model, stream=cfg.stream,
            train=TrainConfig(batch_size=4, epochs=2, patience=10),
        )
        train(
            synthetic_data_dir, str(out), config=cfg2, num_workers=2,
            resume=str(out / "latest_model"),
        )
        lines = (out / "metrics.jsonl").read_text().strip().splitlines()
        epochs = [json.loads(l)["epoch"] for l in lines]
        assert epochs == [0, 1]
        # Early-stop memory travels in latest_model so a resumed run keeps
        # the patience countdown (the reference restarts it from zero).
        meta = json.loads((out / "latest_model" / "meta.json").read_text())
        es = meta["extra"]["early_stop"]
        assert isinstance(es["counter"], int) and es["best_loss"] is not None


class TestESC50TrainingBranch:
    def test_train_with_esc50_and_custom(self, synthetic_data_dir, tmp_path):
        """Exercises the reference's combined-dataset assembly: custom dir
        split + ESC-50 fold-5 validation (reference: src/train.py:332-392)."""
        import pandas as pd

        from cough_detector_tpu.train import train

        esc50 = tmp_path / "esc50"
        (esc50 / "audio").mkdir(parents=True)
        (esc50 / "meta").mkdir()
        rows = []
        for i in range(10):
            target = 24 if i % 3 == 0 else 22
            fold = 5 if i % 2 == 0 else 1
            name = f"e{i}.wav"
            gen = synth.synthetic_cough if target == 24 else synth.synthetic_non_cough
            write_wav(esc50 / "audio" / name, gen(seed=i, duration_s=1.0), 16000)
            rows.append({"filename": name, "fold": fold, "target": target})
        pd.DataFrame(rows).to_csv(esc50 / "meta" / "esc50.csv", index=False)

        cfg = Config(
            model=Config().model.__class__(model_type="small"),
            train=TrainConfig(batch_size=4, epochs=1, patience=5),
        )
        out = tmp_path / "run"
        train(
            synthetic_data_dir, str(out), config=cfg, num_workers=2,
            use_esc50=True, esc50_dir=str(esc50),
        )
        assert (out / "metrics.jsonl").exists()
        rec = json.loads((out / "metrics.jsonl").read_text().splitlines()[-1])
        assert np.isfinite(rec["val_loss"])


class TestExplicitDeviceCorpusRefusal:
    """device_corpus=True is a performance contract (one scanned program
    per epoch); an unsatisfiable request must raise, never degrade into
    the ~84x-slower streamed path silently (r3 review)."""

    def test_true_without_shards_dir_raises(self, tmp_path):
        from cough_detector_tpu.train import train

        with pytest.raises(ValueError, match="shards_dir"):
            train(None, str(tmp_path / "out"), device_corpus=True)

    def test_true_with_indivisible_batch_raises(self, tmp_path):
        from cough_detector_tpu.train import train

        cfg = Config(train=TrainConfig(batch_size=3))  # 3 % 8 != 0
        with pytest.raises(ValueError, match="divisible"):
            train(
                None, str(tmp_path / "out"), config=cfg,
                shards_dir=str(tmp_path / "nonexistent"),
                device_corpus=True,
            )


class TestDrainSurfacesEveryFailure:
    def test_drain_waits_on_all_futures_and_reraises_first(self):
        """A failed save must not abandon later queued writes: drain waits
        on every drained future (so none is left running or with a
        swallowed error) and re-raises the FIRST failure (r3 review)."""
        import threading

        done = threading.Event()

        def fail_first():
            raise RuntimeError("disk full (first)")

        def fail_second():
            raise RuntimeError("disk full (second)")

        ckpt._submit(fail_first)
        ckpt._submit(fail_second)
        ckpt._submit(done.set)
        with pytest.raises(RuntimeError, match="first") as excinfo:
            ckpt.drain_pending_saves()
        assert done.is_set(), "drain returned before later futures finished"
        # The second failure must leave a trace on the raised exception
        # (ADVICE r3: later disk errors were observed but discarded).
        notes = getattr(excinfo.value, "__notes__", [])
        assert any("second" in n for n in notes), notes
        ckpt.drain_pending_saves()  # queue fully drained: no residual raise


class TestDataParallelProduction:
    """VERDICT r1 §next-2: DP must be the production path — train() itself
    builds the mesh, shards batches, replicates state (SURVEY.md §2.9)."""

    def test_dp_trajectory_matches_single_device(
        self, synthetic_data_dir, tmp_path
    ):
        from cough_detector_tpu.train import train

        def run(out, mesh):
            cfg = Config(
                model=Config().model.__class__(model_type="small"),
                train=TrainConfig(batch_size=8, epochs=2, patience=50),
            )
            train(
                synthetic_data_dir, str(out), config=cfg, num_workers=2,
                mesh=mesh,
            )
            return [
                json.loads(l)
                for l in (out / "metrics.jsonl").read_text().splitlines()
            ]

        single = run(tmp_path / "single", mesh=False)
        dp = run(tmp_path / "dp", mesh=None)  # auto: 8-device CPU mesh

        assert len(single) == len(dp) == 2
        for s, d in zip(single, dp):
            # Same data order + same augmentation keys: the only divergence
            # is float reduction order (per-shard partial sums + psum).
            for k in ("train_loss", "val_loss", "train_acc", "val_acc"):
                np.testing.assert_allclose(
                    d[k], s[k], rtol=5e-2, atol=1e-2, err_msg=k
                )

    def test_dp_padded_batches_count_only_real_rows(
        self, synthetic_data_dir, tmp_path
    ):
        """batch_size=4 on the 8-device mesh forces mask-padded batches;
        the metrics must count only genuine clips."""
        from cough_detector_tpu.train import train

        cfg = Config(
            model=Config().model.__class__(model_type="small"),
            train=TrainConfig(batch_size=4, epochs=1, patience=50),
        )
        out = tmp_path / "run"
        train(synthetic_data_dir, str(out), config=cfg, num_workers=2)
        rec = json.loads((out / "metrics.jsonl").read_text().splitlines()[-1])
        # val set = 20% of 24 clips -> 5; padded rows must not inflate
        # accuracy denominators (acc is a percentage over real rows only).
        assert 0.0 <= rec["val_acc"] <= 100.0
        assert rec["tp"] + rec["fp"] + rec["fn"] + rec["tn"] == 5


class TestDeterministicResume:
    def test_resume_replays_identical_stream(self, synthetic_data_dir, tmp_path):
        """VERDICT r1 §next-8: 4 straight epochs vs 2 + resume + 2 must
        produce identical metrics — sample order and augmentation noise are
        keyed by (seed, epoch), not by how many epochs ran before."""
        from cough_detector_tpu.train import train

        def cfg_for(epochs):
            return Config(
                model=Config().model.__class__(model_type="small"),
                train=TrainConfig(batch_size=8, epochs=epochs, patience=50),
            )

        out_a = tmp_path / "straight"
        train(synthetic_data_dir, str(out_a), config=cfg_for(4), num_workers=2)

        out_b = tmp_path / "resumed"
        train(synthetic_data_dir, str(out_b), config=cfg_for(2), num_workers=2)
        train(
            synthetic_data_dir, str(out_b), config=cfg_for(4), num_workers=2,
            resume=str(out_b / "latest_model"),
        )

        recs_a = [
            json.loads(l)
            for l in (out_a / "metrics.jsonl").read_text().splitlines()
        ]
        recs_b = [
            json.loads(l)
            for l in (out_b / "metrics.jsonl").read_text().splitlines()
        ]
        assert [r["epoch"] for r in recs_a] == [0, 1, 2, 3]
        assert [r["epoch"] for r in recs_b] == [0, 1, 2, 3]
        skip = {"train_clips_per_sec", "val_clips_per_sec", "wall_s", "t"}
        for ra, rb in zip(recs_a, recs_b):
            for k, va in ra.items():
                if k in skip:
                    continue
                np.testing.assert_allclose(
                    rb[k], va, rtol=1e-6, atol=1e-7,
                    err_msg=f"epoch {ra['epoch']} field {k}",
                )
