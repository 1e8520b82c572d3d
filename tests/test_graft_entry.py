"""The driver entry points must stay functional."""

import jax


def test_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out["buffers"]["c"].shape == (200, 200)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
