"""Export/AOT-compile and observability tests."""

import jax
import numpy as np

from cough_detector_tpu.config import Config
from cough_detector_tpu.models import create_model, init_model
from cough_detector_tpu.models.export import (
    aot_compile,
    export_serialized,
    export_stablehlo,
    load_serialized,
    make_serving_fn,
)
from cough_detector_tpu.utils.observability import (
    JsonlLogger,
    LatencyTracker,
    Throughput,
)


def _setup():
    cfg = Config.from_flat_dict({"model_type": "small"})
    model = create_model("small")
    variables = init_model(model, jax.random.PRNGKey(0), cfg.features.feature_shape)
    return model, variables, cfg


class TestExport:
    def test_aot_compile_and_run(self):
        model, variables, cfg = _setup()
        serve = make_serving_fn(model, variables, cfg)
        compiled = aot_compile(serve, batch_size=4)
        waves = np.random.default_rng(0).standard_normal((4, 16000)).astype(np.float32)
        probs = np.asarray(compiled(waves))
        assert probs.shape == (4, 2)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)

    def test_serialized_executable_round_trip(self, tmp_path):
        """export_serialized must persist a LOADABLE executable (an r4
        review found the old implementation called a method jax.stages.
        Compiled does not have, so it always returned None)."""
        model, variables, cfg = _setup()
        serve = make_serving_fn(model, variables, cfg)
        compiled = aot_compile(serve, batch_size=2)
        out = export_serialized(compiled, str(tmp_path / "serve.jaxexec"))
        assert out is not None, "serialization must succeed on this backend"
        reloaded = load_serialized(out)
        waves = np.random.default_rng(0).standard_normal((2, 16000)).astype(
            np.float32
        )
        np.testing.assert_array_equal(
            np.asarray(reloaded(waves)), np.asarray(compiled(waves))
        )

    def test_stablehlo_export(self):
        model, variables, cfg = _setup()
        text = export_stablehlo(model, variables, cfg, batch_size=2)
        assert "stablehlo" in text or "func.func" in text
        assert "16000" in text  # input geometry baked in


class TestObservability:
    def test_jsonl_logger(self, tmp_path):
        import json

        log = JsonlLogger(str(tmp_path / "m.jsonl"))
        log.log(step=1, loss=0.5)
        log.log(step=2, loss=0.25)
        log.close()
        lines = (tmp_path / "m.jsonl").read_text().strip().splitlines()
        assert len(lines) == 2
        assert json.loads(lines[1])["loss"] == 0.25

    def test_throughput_discards_warmup(self):
        tp = Throughput(warmup=1)
        import time

        for _ in range(3):
            tp.start()
            time.sleep(0.01)
            tp.stop(items=100)
        assert 0 < tp.items_per_sec < 100 / 0.01 * 1.5

    def test_latency_percentiles(self):
        lt = LatencyTracker()
        for v in [0.1, 0.2, 0.3, 0.4, 1.0]:
            lt.record(v)
        p = lt.percentiles()
        assert p["n"] == 5 and p["p50"] == 0.3 and p["p99"] > 0.9

    def test_latency_tracker_is_bounded(self):
        """A long-lived server records forever; the tracker must keep a
        bounded window, not an unbounded list (r3 ADVICE/VERDICT: the
        serve module's bounded-everything discipline)."""
        lt = LatencyTracker(maxlen=16)
        for v in range(1000):
            lt.record(float(v))
        assert lt.percentiles()["n"] == 16
        assert lt.snapshot().min() == 984.0  # oldest evicted first


class TestBNFold:
    import pytest as _pytest

    @ _pytest.mark.parametrize("mt", ["standard", "small", "residual"])
    def test_folded_matches_eval(self, mt):
        import jax.numpy as jnp
        from cough_detector_tpu.models import create_model, init_model
        from cough_detector_tpu.models.fuse import fold_batchnorm

        model = create_model(mt)
        variables = init_model(model, jax.random.PRNGKey(3), (90, 101))
        # Randomize batch stats so folding is actually exercised.
        import jax as _jax

        leaves, treedef = _jax.tree_util.tree_flatten(variables["batch_stats"])
        rng = np.random.default_rng(0)
        leaves = [
            np.abs(rng.standard_normal(l.shape)).astype(np.float32) + 0.5
            for l in leaves
        ]
        variables = {
            "params": variables["params"],
            "batch_stats": _jax.tree_util.tree_unflatten(treedef, leaves),
        }

        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((3, 90, 101)).astype(np.float32)
        )
        want = np.asarray(model.apply(variables, x, train=False))
        folded = fold_batchnorm(variables, mt)
        got = np.asarray(model.apply(folded, x, train=False))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
