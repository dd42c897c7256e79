"""Driver-contract tests: entry() compiles single-chip; dryrun_multichip
runs the full DP training step on the virtual 8-device mesh."""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[0].shape[0], 2)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions_mesh():
    """Driver contract: in a fresh process with NO CPU pin (the sitecustomize
    force-registers the TPU backend, so jax sees <8 devices),
    dryrun_multichip(8) must self-provision a virtual 8-device CPU mesh and
    succeed — this is exactly the environment where round 1 failed."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # Strip any host-device-count flag the test harness may have set.
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    if flags:
        env["XLA_FLAGS"] = " ".join(flags)
    else:
        env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, %r)\n"
            "import jax\n"
            # Parent stays a 1-device CPU backend (NOT 8): from the
            # dryrun's point of view this is indistinguishable from the
            # driver's 1-TPU process, without paying TPU-tunnel init time.
            "jax.config.update('jax_platforms', 'cpu')\n"
            "assert len(jax.devices()) < 8\n"
            "import __graft_entry__\n"
            "__graft_entry__.dryrun_multichip(8)\n" % REPO,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
