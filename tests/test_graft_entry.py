"""Driver contract: entry() compiles single-device; dryrun_multichip runs on
the 8-device CPU mesh."""

import jax
import numpy as np


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    pos, neg = out
    assert pos.shape == neg.shape
    assert pos.dtype == np.uint8


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as g

    g.dryrun_multichip(2)
