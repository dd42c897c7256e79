"""Training-path gradient parity: jax.grad through our Flax models must
match torch.autograd through the reference architectures, with identical
weights, inputs, and the class-weighted CE loss. This is the strongest
evidence that TPU training optimizes the same objective the reference does.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_models
from cough_detector_tpu.models import convert, create_model
from cough_detector_tpu.train.steps import weighted_cross_entropy


@pytest.mark.parametrize("mt", ["small", "residual"])
def test_eval_mode_gradients_match_torch(mt):
    tm = torch_models.randomized(mt, seed=21)
    tm.eval()  # eval mode isolates conv/linear grads from BN batch-stat noise
    variables = convert.torch_state_dict_to_variables(tm.state_dict(), mt)
    model = create_model(mt)

    rng = np.random.default_rng(4)
    x = rng.standard_normal((8, 90, 101)).astype(np.float32)
    y = (np.arange(8) % 2).astype(np.int64)
    w = np.asarray([0.8, 1.7], np.float32)

    # torch side
    xt = torch.from_numpy(x).unsqueeze(1)
    crit = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w))
    loss_t = crit(tm(xt), torch.from_numpy(y))
    loss_t.backward()
    torch_grads = {
        name: p.grad.detach().numpy() for name, p in tm.named_parameters()
    }

    # jax side
    def loss_fn(params):
        logits = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=False,
        )
        return weighted_cross_entropy(
            logits, jnp.asarray(y.astype(np.int32)), jnp.asarray(w)
        )

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-5)

    # Map jax grads back to torch names via the converter's inverse and
    # compare every tensor.
    grad_vars = {"params": grads, "batch_stats": variables["batch_stats"]}
    jax_grads = convert.variables_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, grad_vars), mt
    )
    checked = 0
    for name, tg in torch_grads.items():
        jg = jax_grads[name]
        scale = max(np.abs(tg).max(), 1e-8)
        err = np.abs(jg - tg).max() / scale
        assert err < 1e-3, f"{mt}:{name} grad rel err {err}"
        checked += 1
    assert checked >= 10
