"""Model tests: param counts, shapes, logits parity vs torch, converter
round-trip, BN train-semantics, dropout determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_models
from cough_detector_tpu.models import (
    convert,
    count_parameters,
    create_model,
    init_model,
    predict,
)

PARAM_COUNTS = {"standard": 421_954, "small": 21_122, "residual": 290_370}
ALL_TYPES = list(PARAM_COUNTS)


def _init(model_type, shape=(90, 101)):
    model = create_model(model_type)
    variables = init_model(model, jax.random.PRNGKey(0), shape)
    return model, variables


class TestArchitecture:
    @pytest.mark.parametrize("mt", ALL_TYPES)
    def test_param_count(self, mt):
        _, variables = _init(mt)
        assert count_parameters(variables["params"]) == PARAM_COUNTS[mt]

    @pytest.mark.parametrize("mt", ALL_TYPES)
    def test_output_shape(self, mt):
        model, variables = _init(mt)
        x = jnp.zeros((4, 90, 101))
        out = model.apply(variables, x, train=False)
        assert out.shape == (4, 2)

    @pytest.mark.parametrize("mt", ALL_TYPES)
    def test_shape_agnostic(self, mt):
        # Global average pooling makes all three geometries-agnostic
        # (reference: src/model.py:95,187,242).
        model, variables = _init(mt, shape=(90, 101))
        out = model.apply(variables, jnp.zeros((2, 64, 101)), train=False)
        assert out.shape == (2, 2)

    def test_factory_rejects_unknown(self):
        with pytest.raises(ValueError, match="Unknown model type"):
            create_model("transformer")

    def test_factory_accepts_reference_kwargs(self):
        m = create_model("residual", n_mels=90, in_channels=1, num_classes=2)
        assert m.num_classes == 2

    def test_model_from_config_honors_every_field(self):
        """ModelConfig.num_classes/dropout/compute_dtype must actually
        reach the constructed model — a type-only factory call silently
        ignored them, so checkpoints' config_full could describe a
        configuration the weights were never trained under."""
        import dataclasses

        from cough_detector_tpu.config import ModelConfig
        from cough_detector_tpu.models import init_model, model_from_config

        mc = ModelConfig(
            model_type="residual", num_classes=3, dropout=0.25,
            compute_dtype="bfloat16",
        )
        m = model_from_config(mc)
        assert m.num_classes == 3
        assert m.dropout == 0.25
        assert m.dtype == jnp.bfloat16
        variables = init_model(m, jax.random.PRNGKey(0), (90, 101))
        out = m.apply(variables, jnp.ones((2, 90, 101)), train=False)
        assert out.shape == (2, 3)
        # The small model has no dropout layer (reference-faithful): the
        # field must not be forced onto it.
        small = model_from_config(
            dataclasses.replace(mc, model_type="small")
        )
        assert not hasattr(small, "dropout")
        with pytest.raises(ValueError, match="compute_dtype"):
            model_from_config(
                dataclasses.replace(mc, compute_dtype="float16")
            )

    def test_nchw_input_accepted(self):
        model, variables = _init("small")
        a = model.apply(variables, jnp.ones((2, 1, 90, 101)), train=False)
        b = model.apply(variables, jnp.ones((2, 90, 101)), train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    @pytest.mark.parametrize("mt", ALL_TYPES)
    def test_serve_precision_mode_same_params_and_logits(self, mt):
        """precision_mode only changes MXU pass counts (a TPU-only effect,
        measured in docs/PARITY.md): the param tree and CPU logits are
        identical to the default mode."""
        model, variables = _init(mt)
        serve = create_model(mt, precision_mode="serve")
        tree_hi = jax.tree_util.tree_structure(variables)
        tree_sv = jax.tree_util.tree_structure(
            init_model(serve, jax.random.PRNGKey(0), (90, 101))
        )
        assert tree_hi == tree_sv
        x = jnp.asarray(
            np.random.RandomState(5).rand(3, 90, 101).astype(np.float32)
        )
        a = model.apply(variables, x, train=False)
        b = serve.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestTorchParity:
    @pytest.mark.parametrize("mt", ALL_TYPES)
    def test_logits_parity_eval(self, mt):
        """Converted reference weights must reproduce torch logits ≤1e-3."""
        tm = torch_models.randomized(mt, seed=42)
        variables = convert.torch_state_dict_to_variables(tm.state_dict(), mt)
        model = create_model(mt)

        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 90, 101)).astype(np.float32)

        with torch.no_grad():
            want = tm(torch.from_numpy(x).unsqueeze(1)).numpy()
        got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-8)
        assert err < 1e-3, f"{mt}: rel err {err}"

    @pytest.mark.parametrize("mt", ALL_TYPES)
    def test_converter_round_trip(self, mt):
        tm = torch_models.randomized(mt, seed=3)
        sd = {k: v for k, v in tm.state_dict().items() if "num_batches" not in k}
        variables = convert.torch_state_dict_to_variables(sd, mt)
        back = convert.variables_to_torch_state_dict(variables, mt)
        assert set(back) == set(sd)
        for k in sd:
            np.testing.assert_allclose(
                back[k], sd[k].numpy(), atol=1e-7, err_msg=k
            )

    def test_converter_missing_key_fails_loudly(self):
        with pytest.raises(KeyError):
            convert.torch_state_dict_to_variables({}, "residual")


class TestTrainSemantics:
    def test_batchnorm_updates_running_stats_like_torch(self):
        """Train-mode BN: torch updates running stats with *unbiased* batch
        variance; one train step on identical weights+data must agree."""
        mt = "small"
        tm = torch_models.randomized(mt, seed=11)
        variables = convert.torch_state_dict_to_variables(tm.state_dict(), mt)
        model = create_model(mt)

        rng = np.random.default_rng(5)
        x = rng.standard_normal((8, 90, 101)).astype(np.float32)

        tm.train()
        with torch.no_grad():
            want_logits = tm(torch.from_numpy(x).unsqueeze(1)).numpy()
        want_mean = tm.features[1].running_mean.numpy()
        want_var = tm.features[1].running_var.numpy()

        got_logits, mutated = model.apply(
            variables,
            jnp.asarray(x),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        got_mean = np.asarray(mutated["batch_stats"]["stem_bn"]["mean"])
        got_var = np.asarray(mutated["batch_stats"]["stem_bn"]["var"])

        np.testing.assert_allclose(got_mean, want_mean, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got_var, want_var, rtol=1e-4, atol=1e-5)
        # train-mode forward itself (dropout active in both, but small's
        # dropout sits after the last Dense → only scales at p=0: here the
        # torch model in train mode applies dropout, so compare only BN stats
        # and shape.
        assert got_logits.shape == want_logits.shape

    def test_batchnorm_near_constant_channel_stays_finite(self):
        """Train-mode variance must be the two-pass E[(x-mean)^2] like
        torch: the one-pass E[x^2]-E[x]^2 form cancels catastrophically
        for a near-constant channel with a large mean (f32 roundoff
        ~mean^2*eps dwarfs the true variance and can go NEGATIVE, turning
        rsqrt(var+eps) into NaN and poisoning the whole model)."""
        from cough_detector_tpu.models.layers import BatchNorm

        bn = BatchNorm()
        rng = np.random.default_rng(0)
        # mean ~100, true std ~1e-2 (var 1e-4): the one-pass f32 form's
        # roundoff is ~mean^2 * eps_f32 ≈ 1.2e-3 — 10x the true variance.
        x = (100.0 + 1e-2 * rng.standard_normal((64, 8, 8, 4))).astype(
            np.float32
        )
        variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
        out, mutated = bn.apply(
            variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
        )
        out = np.asarray(out)
        assert np.isfinite(out).all()
        assert (np.asarray(mutated["batch_stats"]["var"]) >= 0).all()
        # The normalized output must match a float64 reference: a
        # cancelled variance mis-scales it by >~3x (or NaNs it outright).
        x64 = x.astype(np.float64)
        mean64 = x64.mean(axis=(0, 1, 2))
        var64 = x64.var(axis=(0, 1, 2))
        want = (x64 - mean64) / np.sqrt(var64 + 1e-5)
        np.testing.assert_allclose(out, want, atol=0.05)

    def test_batchnorm_all_padded_mask_is_noop(self):
        """A fully-padded batch (mask all zero) must not divide by n=0
        (ADVICE r3; layers.py n_safe guard) — and must leave the running
        stats EXACTLY unchanged rather than decaying them toward
        mean=0/var=0 (r4 review: the padded-step trajectory-invariance
        contract extends to the degenerate batch)."""
        from cough_detector_tpu.models.layers import BatchNorm

        bn = BatchNorm()
        x = jnp.ones((4, 8, 8, 2), jnp.float32)
        variables = bn.init(jax.random.PRNGKey(0), x, train=True)
        # Give the running stats non-initial values so a decay would show.
        variables = {
            "params": variables["params"],
            "batch_stats": {
                "mean": jnp.array([0.7, -0.3], jnp.float32),
                "var": jnp.array([2.5, 0.4], jnp.float32),
            },
        }
        out, mutated = bn.apply(
            variables,
            x,
            train=True,
            mask=jnp.zeros((4,), jnp.float32),
            mutable=["batch_stats"],
        )
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_array_equal(
            np.asarray(mutated["batch_stats"]["mean"]),
            np.array([0.7, -0.3], np.float32),
        )
        np.testing.assert_array_equal(
            np.asarray(mutated["batch_stats"]["var"]),
            np.array([2.5, 0.4], np.float32),
        )

    def test_dropout_deterministic_in_eval(self):
        model, variables = _init("standard")
        x = jnp.ones((2, 90, 101))
        a = model.apply(variables, x, train=False)
        b = model.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dropout_active_in_train(self):
        model, variables = _init("standard")
        x = jnp.ones((2, 90, 101))
        a, _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        b, _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestPredict:
    def test_predict_probs_sum_to_one(self):
        model, variables = _init("residual")
        x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 90, 101), ).astype(np.float32))
        preds, probs = predict(model, variables, x)
        assert preds.shape == (3,)
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)
