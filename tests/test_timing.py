"""utils.timing: both timers must return sane per-call times and force
completion through a value that depends on the result."""

import jax
import jax.numpy as jnp

from vitgan_tpu.utils.timing import sync_timeit, sync_timeit_scalar


def test_sync_timeit_returns_positive_mean():
    fn = jax.jit(lambda x: x * 2.0 + 1.0)
    x = jnp.ones((64, 64))
    t = sync_timeit(fn, x, iters=3)
    assert t > 0.0


def test_sync_timeit_scalar_matches_plain_on_small_results():
    fn = jax.jit(lambda x: jnp.tanh(x) @ x.T)
    x = jnp.ones((128, 128))
    t_scalar = sync_timeit_scalar(fn, x, iters=3)
    assert t_scalar > 0.0


def test_sync_timeit_scalar_handles_pytree_results():
    fn = jax.jit(lambda x: (x + 1.0, {"a": x * 2.0}))
    x = jnp.ones((8, 8))
    t = sync_timeit_scalar(fn, x, iters=2)
    assert t > 0.0
