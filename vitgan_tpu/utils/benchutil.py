"""Shared benchmark harness pieces (used by bench.py and scripts/bench_*).

One implementation of the three things every bench needs — preset resolution,
the scanned-production-path measurement, and the XLA FLOP model — so a fix to
the timing/sync discipline lands everywhere at once (round 2 retracted a
whole table because exactly this logic had drifted between scripts).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def build_preset_cfg(name: str):
    """Resolve a bench preset name to an ExperimentConfig on synthetic data.

    Accepts the plain families (v1 | v2 | dcgan | cnn | mlp) and the scaling
    presets (deit64 | hires128 | hires256).
    """
    from vitgan_tpu import config as C

    from vitgan_tpu.models import _FAMILIES

    syn = C.DataConfig(dataset="synthetic")
    if name == "deit64":
        return C.replace(C.deit64_config(), data=syn)
    if name in ("hires128", "hires256"):
        return C.replace(C.highres_config(int(name[5:])), data=syn)
    if name not in _FAMILIES:
        raise KeyError(f"unknown bench preset {name!r}: "
                       f"{sorted(_FAMILIES)} + ['deit64', 'hires128', 'hires256']")
    return C.ExperimentConfig(family=name, data=syn)


def xla_step_gflops(cfg, gan, state) -> Optional[float]:
    """XLA cost-analysis FLOPs of ONE raw train step, in GFLOP (None if the
    backend does not expose cost analysis).  NOTE: XLA counts a lax.scan body
    once regardless of trip count, so scanned-call cost = this * scan_steps."""
    import jax
    import jax.numpy as jnp

    from vitgan_tpu.train.step import make_raw_train_step

    m = cfg.model
    try:
        raw = jax.jit(make_raw_train_step(gan, cfg))
        real0 = jnp.zeros((m.batch_size, m.image_size, m.image_size, m.channels),
                          jnp.float32)
        ca = raw.lower(state, real0).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca["flops"]) / 1e9
    except Exception:
        return None


def measure_scanned_train(cfg, scan_steps: int, iters: int,
                          dataset_images: int = 512) -> float:
    """Images/sec of the scanned production train path under the CURRENT
    process policy (callers apply_from_runtime/set_policy first).  Timed with
    sync_timeit (host readback of the 4-byte step counter).  Raises on
    device errors — callers that A/B OOM-prone arms catch and report null."""
    import jax

    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state
    from vitgan_tpu.train.step import make_device_data_train_fn
    from vitgan_tpu.utils.timing import sync_timeit

    m = cfg.model
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    host = np.random.default_rng(0)
    b, s, c = m.batch_size, m.image_size, m.channels
    n_data = max(dataset_images, 2 * b)
    dataset = jax.device_put(host.integers(0, 256, (n_data, s, s, c), dtype=np.uint8))
    idx = jax.device_put(host.integers(0, n_data, (scan_steps, b)).astype(np.int32))
    fn = make_device_data_train_fn(gan, cfg, scan_steps, donate=False)
    t = sync_timeit(fn, state, dataset, idx, iters=iters)
    return b * scan_steps / t


def warmup_compile(cfg, scan_steps: int, dataset_images: int = 512) -> float:
    """AOT-compile the scanned production train step WITHOUT running it.

    Lowering against abstract ShapeDtypeStructs populates the persistent XLA
    compilation cache ($SCRATCH/jax_cache), so a later ``train``/``bench`` of
    the same preset skips its minutes-long first compile.  Returns seconds
    spent compiling (near zero when already cached).
    """
    import time

    import jax

    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state
    from vitgan_tpu.train.step import make_device_data_train_fn

    m = cfg.model
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    b, s, c = m.batch_size, m.image_size, m.channels
    n_data = max(dataset_images, 2 * b)
    abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    dataset = jax.ShapeDtypeStruct((n_data, s, s, c), np.uint8)
    idx = jax.ShapeDtypeStruct((scan_steps, b), np.int32)
    fn = make_device_data_train_fn(gan, cfg, scan_steps, donate=False)
    t0 = time.perf_counter()
    fn.lower(abstract, dataset, idx).compile()
    return time.perf_counter() - t0
