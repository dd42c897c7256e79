"""Multi-chip sharding tests on the virtual 8-device CPU mesh: DP training
step, sharded featurization, and stream-axis-sharded serving. This is the
JAX-idiomatic fake backend for pjit validation (SURVEY.md §4 #5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cough_detector_tpu.config import Config, FeatureConfig, default_config
from cough_detector_tpu.data import synth
from cough_detector_tpu.models import create_model, init_model
from cough_detector_tpu.ops import frontend
from cough_detector_tpu.parallel import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)
from cough_detector_tpu.train import steps

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV, "conftest must force 8 CPU devices"
    return make_mesh(jax.devices()[:N_DEV])


class TestMeshBasics:
    def test_shard_batch_lays_out_on_all_devices(self, mesh):
        x = np.zeros((16, 100), np.float32)
        sharded = shard_batch(x, mesh)
        assert len(sharded.sharding.device_set) == N_DEV

    def test_pad_to_multiple(self):
        x = np.ones((13, 4))
        padded, n = pad_to_multiple(x, 8)
        assert padded.shape == (16, 4) and n == 13
        assert np.all(padded[13:] == 0)


class TestShardedFeaturization:
    def test_matches_single_device(self, mesh):
        cfg = FeatureConfig()
        w = synth.fixture_batch(16, 1.0, seed=0)
        single = np.asarray(frontend.extract_features(w, cfg))

        fn = jax.jit(lambda x: frontend.extract_features(x, cfg))
        sharded_in = shard_batch(jnp.asarray(w), mesh)
        multi = np.asarray(fn(sharded_in))
        np.testing.assert_allclose(multi, single, rtol=1e-5, atol=1e-6)


class TestDPTrainStep:
    def test_dp_step_matches_single_device(self, mesh):
        """The SAME jitted train step on 1 device and on the 8-device mesh
        must produce identical params — XLA's inserted psum is exact for
        this batch layout."""
        cfg = default_config("small")
        model = create_model("small")
        variables = init_model(model, jax.random.PRNGKey(0), cfg.features.feature_shape)
        tx = steps.make_optimizer(cfg.train, steps_per_epoch=1)

        feature_fn = lambda w: frontend.extract_features(w, cfg.features)
        step = steps.make_train_step(feature_fn=feature_fn, donate=False)

        batch = 16
        waves = jnp.asarray(synth.fixture_batch(batch, 1.0, seed=1))
        labels = jnp.asarray(np.arange(batch) % 2, jnp.int32)
        cw = jnp.asarray([1.0, 1.0])
        rng = jax.random.PRNGKey(2)

        # Compare the global loss and raw gradients (post-Adam params can
        # legitimately differ by ±lr where a gradient component is ~0 and
        # reduction order flips its sign).
        def loss_and_grads(params, batch_stats, w, l):
            def loss_fn(p):
                # Eval-mode forward: per-sample independent, so the sharded
                # and single-device gradients differ only by summation
                # order (train-mode BN batch statistics would add
                # reduction-order noise orthogonal to what this test
                # checks — the gradient psum).
                logits = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    feature_fn(w), train=False,
                )
                return steps.weighted_cross_entropy(logits, l, cw)

            return jax.value_and_grad(loss_fn)(params)

        fn = jax.jit(loss_and_grads)
        l1, g1 = fn(variables["params"], variables["batch_stats"], waves, labels)

        w8, l8 = shard_batch((waves, labels), mesh)
        p8, b8 = replicate((variables["params"], variables["batch_stats"]), mesh)
        l8_, g8 = fn(p8, b8, w8, l8)

        assert float(l1) == pytest.approx(float(l8_), rel=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            )

        # And the full optimizer step must run under the mesh.
        s8 = replicate(steps.create_train_state(model, variables, tx), mesh)
        rng8, cw8 = replicate((rng, cw), mesh)
        s8, m8 = step(s8, w8, l8, rng8, cw8)
        assert np.isfinite(float(m8["loss"]))

    def test_grad_sync_is_global(self, mesh):
        """Per-device sub-batches with different data must yield the same
        (global-mean) update on every device — i.e., gradients really sync."""
        cfg = default_config("small")
        model = create_model("small")
        variables = init_model(model, jax.random.PRNGKey(0), cfg.features.feature_shape)
        tx = steps.make_optimizer(cfg.train, steps_per_epoch=1)
        step = steps.make_train_step(donate=False)

        feats = jnp.asarray(
            np.random.default_rng(0).standard_normal((16, 90, 101)).astype(np.float32)
        )
        labels = jnp.asarray(np.arange(16) % 2, jnp.int32)
        cw = jnp.asarray([1.0, 1.0])
        state = replicate(
            steps.create_train_state(model, variables, tx), mesh
        )
        f8, l8 = shard_batch((feats, labels), mesh)
        rng8, cw8 = replicate((jax.random.PRNGKey(1), cw), mesh)
        new_state, _ = step(state, f8, l8, rng8, cw8)
        # Params must be fully replicated (identical across devices) after
        # the update.
        leaf = jax.tree_util.tree_leaves(new_state.params)[0]
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


class TestStreamSharding:
    """BASELINE config 5 at scale: the serving stream axis shards over the
    mesh THROUGH the public StreamingDetector API (VERDICT r1 §next-3)."""

    @pytest.fixture(scope="class")
    def detector_setup(self):
        cfg = default_config("small")
        model = create_model("small")
        variables = init_model(
            model, jax.random.PRNGKey(0), cfg.features.feature_shape
        )
        return variables, cfg

    def _detections(self, det, n_streams, seconds=3):
        rng = np.random.default_rng(7)
        out = []
        for _ in range(seconds * 2):
            chunk = (rng.standard_normal((n_streams, 8000)) * 0.5).astype(
                np.float32
            )
            out.extend(det.process_chunk(chunk))
        return out

    def test_detector_mesh_matches_single_device(self, mesh, detector_setup):
        from cough_detector_tpu.stream import StreamingDetector

        variables, cfg = detector_setup
        n_streams = 16
        kw = dict(
            variables=variables, config=cfg, num_streams=n_streams,
            chunk_size=8000, confidence_threshold=0.0, smoothing_window=3,
            debounce_seconds=0.5,
        )
        det1 = StreamingDetector(mesh=False, **kw)
        det8 = StreamingDetector(mesh=mesh, **kw)

        # State really lives across all 8 devices, laid out on the stream axis.
        assert len(det8._state.buffer.sharding.device_set) == N_DEV
        assert len(det8._state.last_fire_window.sharding.device_set) == N_DEV

        d1 = self._detections(det1, n_streams)
        d8 = self._detections(det8, n_streams)
        assert len(d1) > 0, "threshold 0 must fire"
        assert len(d1) == len(d8)
        for a, b in zip(d1, d8):
            assert a.stream == b.stream
            assert a.time_seconds == b.time_seconds
            np.testing.assert_allclose(a.confidence, b.confidence, rtol=1e-5)

    def test_detector_auto_mesh_on_divisible_streams(self, detector_setup):
        """mesh=None auto-builds a stream mesh when num_streams divides the
        device count; indivisible counts fall back to single-device."""
        from cough_detector_tpu.stream import StreamingDetector

        variables, cfg = detector_setup
        kw = dict(variables=variables, config=cfg, chunk_size=4000)
        auto = StreamingDetector(num_streams=8, **kw)
        assert auto.mesh is not None
        assert len(auto._state.buffer.sharding.device_set) == len(jax.devices())
        odd = StreamingDetector(num_streams=3, **kw)
        assert odd.mesh is None

    def test_explicit_indivisible_mesh_raises(self, mesh, detector_setup):
        """An EXPLICIT mesh that cannot shard the stream axis must fail
        loudly — silently dropping to single-device would hand the
        caller 1/Nth of the capacity they asked for."""
        from cough_detector_tpu.stream import StreamingDetector

        variables, cfg = detector_setup
        with pytest.raises(ValueError, match="not divisible"):
            StreamingDetector(
                variables=variables, config=cfg, chunk_size=4000,
                num_streams=3, mesh=mesh,
            )


class TestOfflineSharding:
    def test_long_recording_shards_over_mesh(self, mesh):
        """Offline long-recording scoring shards its window batch over the
        mesh and reproduces the single-device detections exactly."""
        from cough_detector_tpu.stream.offline import score_recording

        cfg = default_config("small")
        model = create_model("small")
        variables = init_model(
            model, jax.random.PRNGKey(0), cfg.features.feature_shape
        )
        wave = np.concatenate(
            [synth.fixture_batch(1, 10.0, seed=9)[0]]
        ).astype(np.float32)

        kw = dict(
            variables=variables, config=cfg, threshold=0.0,
            smoothing_window=3, debounce_seconds=0.5, batch_size=16,
        )
        single = score_recording(wave, mesh=False, **kw)
        sharded = score_recording(wave, mesh=mesh, **kw)
        assert len(single) > 0
        assert len(single) == len(sharded)
        for a, b in zip(single, sharded):
            assert a.time_seconds == b.time_seconds
            np.testing.assert_allclose(a.confidence, b.confidence, rtol=1e-5)


class TestDistributedHook:
    def test_noop_without_pod_environment(self, monkeypatch):
        """Single host, no coordinator vars: the hook must not call
        jax.distributed.initialize and must return False."""
        from cough_detector_tpu.parallel import maybe_initialize_distributed

        for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                  "JAX_PROCESS_ID", "CLOUD_TPU_TASK_ID"):
            monkeypatch.delenv(k, raising=False)
        called = []
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda *a, **k: called.append(1)
        )
        assert maybe_initialize_distributed() is False
        assert not called

    def test_initializes_with_explicit_coordinator(self, monkeypatch):
        from cough_detector_tpu.parallel import maybe_initialize_distributed

        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:8476")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
        monkeypatch.setenv("JAX_PROCESS_ID", "0")
        called = []
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda *a, **k: called.append((a, k)),
        )
        assert maybe_initialize_distributed() is True
        # The env values must be passed EXPLICITLY: jax's cluster
        # auto-detection has no env-var cluster, so a bare initialize()
        # fails exactly when the caller spelled the cluster out by hand.
        # (The real, non-monkeypatched cluster is test_distributed.py.)
        _, kwargs = called[0]
        assert kwargs["coordinator_address"] == "10.0.0.1:8476"
        assert kwargs["num_processes"] == 4
        assert kwargs["process_id"] == 0
