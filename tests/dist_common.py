"""Shared deterministic DP problem for the real multi-process cluster test.

Both the 2-process children (tests/dist_child.py) and the single-process
reference run (tests/test_distributed.py) build EXACTLY this state and
batch, so their loss trajectories are directly comparable: same model
init, same optimizer, same global batch, same dropout key — only the
process topology differs.
"""

import numpy as np

import jax

from cough_detector_tpu.config import default_config
from cough_detector_tpu.models import create_model, init_model
from cough_detector_tpu.train import steps as train_steps

GLOBAL_BATCH = 16
N_STEPS = 3


def make_batch():
    rng = np.random.default_rng(42)
    feats = rng.standard_normal((GLOBAL_BATCH, 90, 101)).astype(np.float32)
    labels = (np.arange(GLOBAL_BATCH) % 2).astype(np.int32)
    return feats, labels


def build_state():
    cfg = default_config("small")
    model = create_model("small")
    variables = init_model(
        model, jax.random.PRNGKey(0), cfg.features.feature_shape
    )
    tx = train_steps.make_optimizer(cfg.train, steps_per_epoch=4)
    return train_steps.create_train_state(model, variables, tx)


def run_steps(state, feats, labels, class_weights, rng):
    """N_STEPS identical-batch train steps; returns the loss trajectory."""
    step_fn = train_steps.make_train_step(donate=False)
    losses = []
    for _ in range(N_STEPS):
        state, metrics = step_fn(state, feats, labels, rng, class_weights)
        losses.append(float(metrics["loss"]))
    return losses
