"""Driver-contract tests: entry() compiles single-device; dryrun_multichip runs
the full TP+DP train step on the virtual 8-device mesh."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_entry_jittable():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    imgs, logits = jax.jit(fn)(*args)
    assert imgs.shape == (16, 32, 32, 3)
    assert logits.shape == (16,)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_odd():
    """Odd device counts fall back to pure DP."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(1)
