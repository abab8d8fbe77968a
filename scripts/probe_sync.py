"""Probe: does jax.block_until_ready actually wait for completion on this platform?

Times the same scanned train-step workload three ways:
  A) time to block_until_ready(metrics) after N calls        (suspect)
  B) time to full host readback (np.asarray) of the same metrics (truth for metrics)
  C) time to host readback of a final-state param leaf        (truth for the whole step)

If A << B/C, block_until_ready lies on this platform and bench.py must
time to host materialization.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vitgan_tpu import config as C
from vitgan_tpu.ops.policy import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
from vitgan_tpu.models import build_gan
from vitgan_tpu.train import create_train_state
from vitgan_tpu.train.step import make_device_data_train_fn

batch, scan_steps, n_calls = 64, 64, 5
cfg = C.ExperimentConfig(family="v2", data=C.DataConfig(dataset="synthetic"))
cfg = C.replace(cfg, **{"v2.batch_size": batch})
gan = build_gan(cfg)
state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
step = make_device_data_train_fn(gan, cfg, scan_steps, donate=False)

host_rng = np.random.default_rng(0)
dataset = jax.device_put(host_rng.integers(0, 256, (4096, 32, 32, 3), dtype=np.uint8))
idx = jax.device_put(host_rng.integers(0, 4096, (n_calls + 1, scan_steps, batch)).astype(np.int32))

# Warmup/compile, and force full readback so warmup really finishes.
state, metrics = step(state, dataset, idx[0])
_ = np.asarray(metrics["d_loss"])
leaf = jax.tree_util.tree_leaves(state.g_params)[0]
_ = np.asarray(leaf).ravel()[0]
print("warmup done", flush=True)

t0 = time.perf_counter()
for c in range(n_calls):
    state, metrics = step(state, dataset, idx[c + 1])
t_dispatch = time.perf_counter() - t0
jax.block_until_ready(metrics["d_loss"])
t_block = time.perf_counter() - t0
_ = np.asarray(metrics["d_loss"])
t_read_metrics = time.perf_counter() - t0
leaf = jax.tree_util.tree_leaves(state.g_params)[0]
_ = np.asarray(leaf).ravel()[0]
t_read_state = time.perf_counter() - t0

imgs = batch * scan_steps * n_calls
print(f"dispatch only      : {t_dispatch*1e3:9.1f} ms")
print(f"block_until_ready  : {t_block*1e3:9.1f} ms  -> {imgs/t_block:,.0f} img/s")
print(f"readback metrics   : {t_read_metrics*1e3:9.1f} ms  -> {imgs/t_read_metrics:,.0f} img/s")
print(f"readback state leaf: {t_read_state*1e3:9.1f} ms  -> {imgs/t_read_state:,.0f} img/s")

# Second pass: now that one full readback happened ("sync mode" per round-1 notes),
# re-time with block_until_ready to see steady-state behavior.
t0 = time.perf_counter()
for c in range(n_calls):
    state, metrics = step(state, dataset, idx[c + 1])
jax.block_until_ready(metrics["d_loss"])
t_block2 = time.perf_counter() - t0
_ = np.asarray(metrics["d_loss"])
leaf = jax.tree_util.tree_leaves(state.g_params)[0]
_ = np.asarray(leaf).ravel()[0]
t_read2 = time.perf_counter() - t0
print(f"pass2 block        : {t_block2*1e3:9.1f} ms  -> {imgs/t_block2:,.0f} img/s")
print(f"pass2 full readback: {t_read2*1e3:9.1f} ms  -> {imgs/t_read2:,.0f} img/s")
