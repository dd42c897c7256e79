"""Driver-contract tests: entry() compiles single-chip; dryrun_multichip
runs the full DP training step on the virtual 8-device mesh."""

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[0].shape[0], 2)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
