"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh — the JAX-idiomatic fake backend for
validating pjit/shard_map sharding without TPU hardware (SURVEY.md §4). Env
vars must be set before jax initializes, hence module top-level.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

# The image's sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS; the config knob below wins and pins tests to the virtual
# 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from cough_detector_tpu.data import synth  # noqa: E402


@pytest.fixture(scope="session")
def wave_batch() -> np.ndarray:
    """(8, 16000) deterministic mixed fixture batch at 16 kHz."""
    return synth.fixture_batch(n_clips=8, duration_s=1.0, seed=0)


@pytest.fixture(scope="session")
def cough_wave() -> np.ndarray:
    """(16000,) deterministic 1 s synthetic cough."""
    return synth.synthetic_cough(seed=7, duration_s=1.0)


@pytest.fixture(scope="session")
def sweep_wave() -> np.ndarray:
    """(16000,) deterministic log sine sweep 100 Hz → 7 kHz."""
    return synth.sine_sweep(seed=0, duration_s=1.0)
