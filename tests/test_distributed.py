"""REAL multi-process DP cluster test (SURVEY.md §2.9 "DCN for multi-host").

Forms an actual 2-process JAX cluster on this host — one coordinator, two
child interpreters, 4 virtual CPU devices each, gloo cross-process
collectives — through the production `parallel.maybe_initialize_distributed`
hook (tests/dist_child.py). This is the non-monkeypatched counterpart of
TestDistributedHook in test_sharding.py: the hook's
`jax.distributed.initialize(...)` line executes for real, the global
8-device mesh spans both processes, and the DP train step's gradient psum
crosses the process boundary.

The children's loss trajectory must match a single-process 8-device run of
the exact same problem (tests/dist_common.py) — data parallelism is a
layout choice, not a numerics choice.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

import dist_common
from cough_detector_tpu.parallel import make_mesh, replicate

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CHILD = os.path.join(_REPO, "tests", "dist_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)
class TestRealTwoProcessCluster:
    def test_dp_train_step_matches_single_process(self):
        port = _free_port()
        procs = []
        for pid in (0, 1):
            env = dict(os.environ)
            env.update({
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(pid),
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            })
            procs.append(subprocess.Popen(
                [sys.executable, _CHILD],
                env=env, cwd=_REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            ))
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=240)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("cluster child timed out")
            assert p.returncode == 0, f"child failed:\n{out}\n{err}"
            outs.append(out)

        child_losses = []
        for out in outs:
            lines = [l for l in out.splitlines()
                     if l.startswith("DIST_LOSSES ")]
            assert lines, f"no DIST_LOSSES line in:\n{out}"
            child_losses.append(json.loads(lines[0].split(" ", 1)[1]))
        # Both processes observe the same replicated loss, exactly.
        assert child_losses[0] == child_losses[1]
        assert len(child_losses[0]) == dist_common.N_STEPS

        # Single-process 8-device reference of the identical problem.
        mesh = make_mesh()
        feats, labels = dist_common.make_batch()
        data_sh = NamedSharding(mesh, P("data"))
        x = jax.device_put(feats, data_sh)
        y = jax.device_put(labels, data_sh)
        state = replicate(dist_common.build_state(), mesh)
        cw = replicate(np.asarray([1.0, 1.0], np.float32), mesh)
        rng = replicate(np.asarray(jax.random.PRNGKey(123)), mesh)
        want = dist_common.run_steps(state, x, y, cw, rng)

        # Same mesh size, same program; only the collective transport
        # differs (gloo ring vs in-process), so allow reduction-order
        # float noise and nothing more.
        np.testing.assert_allclose(child_losses[0], want, rtol=1e-5)

    def test_full_train_loop_across_processes(self, tmp_path, capsys):
        """The production train() itself — dataset split, deterministic
        loaders, DP batches, checkpoints — runs across a REAL 2-process
        cluster and reproduces the single-process 8-device metrics.

        Input sharding (r3 VERDICT #3): each rank builds ONLY the batch
        rows its devices hold (loader process slices assembled via
        jax.make_array_from_process_local_data), so the probe below must
        show the ranks' input-row counts SUMMING to the single-process
        total — per-host input work is 1/N — while metrics.jsonl still
        matches the single-process run epoch for epoch. Rank 0 alone
        writes metrics and checkpoints."""
        import json

        from cough_detector_tpu.config import (
            Config, ModelConfig, TrainConfig,
        )
        from cough_detector_tpu.data import synth
        from cough_detector_tpu.data.audio_io import write_wav
        from cough_detector_tpu.train import train

        data = tmp_path / "data"
        for label, gen, n in [
            ("cough", synth.synthetic_cough, 12),
            ("non_cough", synth.synthetic_non_cough, 12),
        ]:
            d = data / label
            d.mkdir(parents=True)
            for i in range(n):
                write_wav(d / f"{label}_{i:02d}.wav",
                          gen(seed=300 + i, duration_s=1.2), 16000)

        # Single-process 8-device reference run (this pytest process).
        cfg = Config(
            model=ModelConfig(model_type="small"),
            train=TrainConfig(batch_size=8, epochs=2, patience=50),
        )
        out_single = tmp_path / "single"
        train(str(data), str(out_single), config=cfg, num_workers=2)
        single_stdout = capsys.readouterr().out

        # 2-process cluster run of the SAME training.
        out_dist = tmp_path / "dist"
        port = _free_port()
        procs = []
        child = os.path.join(_REPO, "tests", "dist_child_train.py")
        for pid in (0, 1):
            env = dict(os.environ)
            env.update({
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(pid),
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            })
            procs.append(subprocess.Popen(
                [sys.executable, child, str(data), str(out_dist)],
                env=env, cwd=_REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            ))
        child_stdouts = []
        for p in procs:
            try:
                outp, err = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("train cluster child timed out")
            assert p.returncode == 0, f"child failed:\n{outp}\n{err}"
            assert "TRAIN_DONE" in outp
            child_stdouts.append(outp)

        # Input-sharding probe: each rank built only its share of the
        # rows; together they did exactly the single-process total.
        import re

        def rows_built(text):
            m = re.search(
                r"Input rows built \(rank \d+\): train (\d+), val (\d+)",
                text,
            )
            assert m, f"no input-rows line in:\n{text}"
            return int(m.group(1)), int(m.group(2))

        s_train, s_val = rows_built(single_stdout)
        d_rows = [rows_built(o) for o in child_stdouts]
        assert s_train > 0 and s_val > 0
        assert d_rows[0][0] + d_rows[1][0] == s_train
        # Train batches are full (drop_last) → the split is exactly half.
        assert d_rows[0][0] == d_rows[1][0] == s_train // 2
        assert d_rows[0][1] + d_rows[1][1] == s_val
        assert max(d_rows[0][1], d_rows[1][1]) < s_val  # genuinely split

        # Rank 0 alone wrote metrics + checkpoints.
        recs_s = [json.loads(l) for l in
                  (out_single / "metrics.jsonl").read_text().splitlines()]
        recs_d = [json.loads(l) for l in
                  (out_dist / "metrics.jsonl").read_text().splitlines()]
        assert (out_dist / "latest_model" / "meta.json").exists()
        assert len(recs_s) == len(recs_d) == 2
        skip = {"train_clips_per_sec", "val_clips_per_sec", "wall_s", "t"}
        for rs, rd in zip(recs_s, recs_d):
            for k, vs in rs.items():
                if k in skip:
                    continue
                # Identical batches and programs over the same 8-way
                # mesh; only gloo-vs-local reduction order differs.
                np.testing.assert_allclose(
                    rd[k], vs, rtol=1e-4, atol=1e-6,
                    err_msg=f"epoch {rs['epoch']} field {k}",
                )
