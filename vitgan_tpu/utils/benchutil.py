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
    if name.startswith("highres"):  # accept cli train's spelling too
        name = "hires" + name[len("highres"):]
    if name == "deit64":
        return C.replace(C.deit64_config(), data=syn)
    if name == "hires256p4":
        return C.replace(C.highres256p4_config(), data=syn)
    if name in ("hires128", "hires256"):
        return C.replace(C.highres_config(int(name[5:])), data=syn)
    if name not in _FAMILIES:
        raise KeyError(f"unknown bench preset {name!r}: "
                       f"{sorted(_FAMILIES)} + ['deit64', 'hires128'/'highres128', "
                       f"'hires256'/'highres256', 'hires256p4'/'highres256p4']")
    return C.ExperimentConfig(family=name, data=syn)


def xla_step_gflops(cfg, gan, state) -> Optional[float]:
    """XLA cost-analysis FLOPs of ONE raw train step, in GFLOP (None if the
    backend does not expose cost analysis).  NOTE: XLA counts a lax.scan body
    once regardless of trip count, so scanned-call cost = this * scan_steps.

    Counted under ``use_pallas='never'`` — the FLOP model is a property of
    the math, not the schedule, and XLA's cost analysis reports 0 for the
    FLOPs inside a Pallas custom call (with the megablock routed, the whole
    encoder block would vanish from the count: deit64 read 5.5 GFLOP instead
    of 1,762)."""
    import jax
    import jax.numpy as jnp

    from vitgan_tpu.ops import policy
    from vitgan_tpu.train.step import make_raw_train_step

    m = cfg.model
    real0 = jnp.zeros((m.batch_size, m.image_size, m.image_size, m.channels),
                      jnp.float32)

    def count():
        raw = jax.jit(make_raw_train_step(gan, cfg))
        ca = raw.lower(state, real0).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca["flops"]) / 1e9

    saved = dict(policy._POLICY)
    try:
        policy._POLICY["mode"] = "never"
        return count()
    except Exception:
        pass
    finally:
        policy._POLICY.update(saved)
    # Fallback: the pure-XLA schedule may not compile at all (hires presets
    # OOM without the flash kernels' remat residuals).  Count the LIVE
    # schedule instead — a lower bound, since Pallas-call FLOPs read as 0.
    try:
        return count()
    except Exception:
        return None


def build_scanned_harness(cfg, scan_steps: int, dataset_images: int = 512,
                          n_calls: int = 1):
    """(fn, state, dataset, idx) for the scanned device-data train path —
    the ONE construction shared by timing (measure_scanned_train) and
    profiling (scripts/profile_step.py), so the profiled executable is the
    same XLA program the throughput tables measure.  ``idx`` has shape
    (n_calls, scan_steps, batch) so callers can run distinct calls."""
    import jax

    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state
    from vitgan_tpu.train.step import make_device_data_train_fn

    m = cfg.model
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    host = np.random.default_rng(0)
    b, s, c = m.batch_size, m.image_size, m.channels
    n_data = max(dataset_images, 2 * b)
    dataset = jax.device_put(host.integers(0, 256, (n_data, s, s, c), dtype=np.uint8))
    idx = jax.device_put(
        host.integers(0, n_data, (n_calls, scan_steps, b)).astype(np.int32))
    fn = make_device_data_train_fn(gan, cfg, scan_steps, donate=False)
    return fn, state, dataset, idx


def measure_scanned_train(cfg, scan_steps: int, iters: int,
                          dataset_images: int = 512) -> float:
    """Images/sec of the scanned production train path under the CURRENT
    process policy (callers apply_from_runtime/set_policy first).  Timed with
    sync_timeit (host readback of the 4-byte step counter).  Raises on
    device errors — callers that A/B OOM-prone arms catch and report null."""
    from vitgan_tpu.utils.timing import sync_timeit

    fn, state, dataset, idx = build_scanned_harness(cfg, scan_steps, dataset_images)
    t = sync_timeit(fn, state, dataset, idx[0], iters=iters)
    return cfg.model.batch_size * scan_steps / t


def warmup_compile(cfg, scan_steps: int = 0) -> float:
    """AOT-compile the TRAINER's device call for this exact config, without
    training.  Builds the same ``Trainer`` a ``cli train`` run would — same
    donation flag, same steps-per-call, same dataset shapes — and lowers its
    jitted train fn against abstract arguments, so the persistent-cache
    entry it writes is the one ``train`` will actually look up (a
    different-shaped/donation harness would be a different HLO module and a
    guaranteed cache miss).  ``scan_steps`` additionally pre-compiles the
    ``cli bench`` harness when nonzero.  Returns seconds spent compiling
    (near zero when already cached)."""
    import os
    import time

    import jax

    from vitgan_tpu.config import scratch_root
    from vitgan_tpu.train.trainer import Trainer

    # Warmup run dirs land under $SCRATCH/warmup, NOT $SCRATCH/output —
    # otherwise every warmup leaves a junk timestamped dir that latest_run()
    # (and 'generate from latest run') would resolve instead of a real run.
    trainer = Trainer(cfg, run_base=os.path.join(scratch_root(), "warmup"))
    abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                            trainer.state)
    b, s, c = cfg.model.batch_size, cfg.model.image_size, cfg.model.channels
    t0 = time.perf_counter()
    if trainer._device_dataset is not None:
        ds = jax.ShapeDtypeStruct(trainer._device_dataset.shape,
                                  trainer._device_dataset.dtype)
        idx = jax.ShapeDtypeStruct((trainer._device_steps_per_call, b), np.int32)
        trainer._device_train_fn.lower(abstract, ds, idx).compile()
    else:
        real = jax.ShapeDtypeStruct((b, s, s, c), np.float32)
        fn = trainer.multi_step if trainer.steps_per_call > 1 else trainer.train_step
        if trainer.steps_per_call > 1:
            real = jax.ShapeDtypeStruct((trainer.steps_per_call, b, s, s, c),
                                        np.float32)
        fn.lower(abstract, real).compile()
    if scan_steps:
        fn, state, dataset, idx = build_scanned_harness(cfg, scan_steps)
        abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                                state)
        fn.lower(abstract,
                 jax.ShapeDtypeStruct(dataset.shape, dataset.dtype),
                 jax.ShapeDtypeStruct(idx[0].shape, idx[0].dtype)).compile()
    return time.perf_counter() - t0
