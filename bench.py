"""Benchmark harness: images/sec/chip for the combined G+D train step at 32x32.

Runs the reference's v2 configuration (batch 64, embed 128, depth 6, heads 4,
patch 4 — ref:src/v2/utils.py:25-41) through our jitted alternating train step
on the available accelerator and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` is the ratio to the PyTorch-CPU reference implementation
measured by scripts/measure_torch_baseline.py (BASELINE_MEASURED.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vitgan_tpu import config as C  # noqa: E402
from vitgan_tpu.ops.policy import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache()
from vitgan_tpu.models import build_gan  # noqa: E402
from vitgan_tpu.train import create_train_state  # noqa: E402
from vitgan_tpu.train.step import make_device_data_train_fn  # noqa: E402


def main():
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    scan_steps = int(os.environ.get("BENCH_SCAN", "64"))
    n_calls = int(os.environ.get("BENCH_CALLS", "10"))
    cfg = C.ExperimentConfig(family="v2", data=C.DataConfig(dataset="synthetic"))
    cfg = C.replace(cfg, **{"v2.batch_size": batch})

    gan = build_gan(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(rng, gan, cfg)
    # Production path: device-resident uint8 dataset, scanned multi-step with
    # on-device batch assembly — identical sequential G/D updates, one device
    # call per scan_steps microbatches, only int32 indices cross the host
    # boundary (vitgan_tpu.train.step.make_device_data_train_fn).
    step = make_device_data_train_fn(gan, cfg, scan_steps, donate=False)

    host_rng = np.random.default_rng(0)
    dataset = jax.device_put(
        host_rng.integers(0, 256, (4096, 32, 32, 3), dtype=np.uint8)
    )
    idx = jax.device_put(
        host_rng.integers(0, 4096, (n_calls, scan_steps, batch)).astype(np.int32)
    )

    # Warmup / compile.
    state, metrics = step(state, dataset, idx[0])
    jax.block_until_ready(metrics["d_loss"])

    t0 = time.perf_counter()
    for c in range(n_calls):
        state, metrics = step(state, dataset, idx[c])
    jax.block_until_ready(metrics["d_loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(metrics["d_loss"])).all(), "non-finite D loss"
    assert np.isfinite(np.asarray(metrics["g_loss"])).all(), "non-finite G loss"

    n_chips = max(1, len(jax.devices()))
    ips_per_chip = batch * scan_steps * n_calls / dt / n_chips

    vs = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f).get("torch_cpu_images_per_sec")
        if base:
            vs = ips_per_chip / base

    print(json.dumps({
        "metric": "images/sec/chip, combined G+D train step, v2 ViT-GAN 32x32 batch %d" % batch,
        "value": round(ips_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
