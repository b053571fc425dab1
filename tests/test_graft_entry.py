"""Driver contract: entry() compiles; dryrun_multichip runs on 8 CPU devices."""

import numpy as np

import jax


def test_entry_jits():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    eps, pen = out
    assert eps.shape[0] == args[1].shape[0]
    assert np.all(np.isfinite(np.asarray(eps)))


def test_dryrun_multichip(eight_devices):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
