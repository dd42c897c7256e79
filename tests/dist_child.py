"""Child process of the REAL 2-process DP cluster test.

Launched (twice) by tests/test_distributed.py with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID in the
environment and 4 virtual CPU devices per process. Joins the cluster via
the production hook `parallel.maybe_initialize_distributed()` — NOT a
monkeypatch — builds the global 8-device mesh spanning both processes,
and runs the shared DP train-step trajectory with its half of the global
batch. Cross-process gradient psums ride gloo collectives.

Prints one machine-readable line: DIST_LOSSES <json list>.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# Same CPU pin as tests/conftest.py: the image's sitecustomize
# force-registers the TPU backend; only this config knob wins.
jax.config.update("jax_platforms", "cpu")

from cough_detector_tpu.parallel import maybe_initialize_distributed

assert maybe_initialize_distributed() is True, "hook must join the cluster"
assert jax.process_count() == 2, jax.process_count()

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import dist_common

devs = jax.devices()
assert len(devs) == 8, f"global device count {len(devs)}"
assert len(jax.local_devices()) == 4

mesh = Mesh(np.asarray(devs), ("data",))
data_sh = NamedSharding(mesh, P("data"))
rep_sh = NamedSharding(mesh, P())


def put_replicated(v):
    return jax.make_array_from_process_local_data(rep_sh, np.asarray(v))


feats, labels = dist_common.make_batch()
pid = jax.process_index()
shard = slice(pid * 8, (pid + 1) * 8)  # 16-row global batch, 8 per process
x = jax.make_array_from_process_local_data(data_sh, feats[shard])
y = jax.make_array_from_process_local_data(data_sh, labels[shard])

state = jax.tree.map(put_replicated, dist_common.build_state())
class_weights = put_replicated(np.asarray([1.0, 1.0], np.float32))
rng = put_replicated(np.asarray(jax.random.PRNGKey(123)))

losses = dist_common.run_steps(state, x, y, class_weights, rng)
print("DIST_LOSSES " + json.dumps(losses), flush=True)
