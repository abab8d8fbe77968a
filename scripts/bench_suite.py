"""Honest re-measure of every family's train-step throughput on the real chip.

Prints one JSON line per config (timed to host readback, see
vitgan_tpu.utils.timing).  Usage:  python scripts/bench_suite.py [fast]
"""

import json
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
from vitgan_tpu.train.step import make_device_data_train_fn, make_train_step
from vitgan_tpu.utils.timing import sync_timeit


def bench_family(name, cfg, scan_steps=16, iters=5, single_iters=20):
    from vitgan_tpu.ops.policy import apply_from_runtime

    apply_from_runtime(cfg.runtime)
    m = cfg.model
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    host = np.random.default_rng(0)
    b, s, c = m.batch_size, m.image_size, m.channels

    # Scanned device-dataset path (the production loop).
    n_data = max(512, 2 * b)
    dataset = jax.device_put(host.integers(0, 256, (n_data, s, s, c), dtype=np.uint8))
    idx = jax.device_put(host.integers(0, n_data, (scan_steps, b)).astype(np.int32))
    fn = make_device_data_train_fn(gan, cfg, scan_steps, donate=False)
    t_scan = sync_timeit(fn, state, dataset, idx, iters=iters)
    ips_scan = b * scan_steps / t_scan

    # Single dispatched step (host batch), for the dispatch-overhead column.
    real = jnp.asarray(host.normal(0, 1, (b, s, s, c)).astype(np.float32))
    step1 = make_train_step(gan, cfg, donate=False)
    t_one = sync_timeit(step1, state, real, iters=single_iters)
    ips_one = b / t_one

    # FLOP model (XLA counts the scan body once; see utils/benchutil.py).
    from vitgan_tpu.utils.benchutil import xla_step_gflops

    gflops = xla_step_gflops(cfg, gan, state)

    rec = {
        "family": name, "batch": b, "image_size": s,
        "img_per_sec_scan": round(ips_scan, 1),
        "img_per_sec_single_dispatch": round(ips_one, 1),
        "step_ms_scan": round(t_scan / scan_steps * 1e3, 3),
        "step_gflops": round(gflops, 2) if gflops else None,
        "tflops_scan": round(gflops * ips_scan / m.batch_size / 1e3, 2) if gflops else None,
        "scan_steps": scan_steps,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    fast = len(sys.argv) > 1 and sys.argv[1] == "fast"
    syn = C.DataConfig(dataset="synthetic")
    out = []

    out.append(bench_family("v2", C.ExperimentConfig(family="v2", data=syn),
                            scan_steps=64, iters=8))
    out.append(bench_family("v1", C.ExperimentConfig(family="v1", data=syn),
                            scan_steps=16))
    out.append(bench_family("dcgan", C.ExperimentConfig(family="dcgan", data=syn),
                            scan_steps=16))
    out.append(bench_family("cnn", C.ExperimentConfig(family="cnn", data=syn),
                            scan_steps=16))
    out.append(bench_family("mlp", C.ExperimentConfig(family="mlp", data=syn),
                            scan_steps=16))
    if not fast:
        out.append(bench_family("deit64", C.deit64_config(), scan_steps=8, iters=3))
        out.append(bench_family("hires128", C.highres_config(128),
                                scan_steps=2, iters=2, single_iters=3))
        out.append(bench_family("hires256", C.highres_config(256),
                                scan_steps=2, iters=2, single_iters=3))

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "BENCH_SUITE.json"), "w") as f:
        json.dump({"measured": "host-readback sync timing", "results": out}, f, indent=2)


if __name__ == "__main__":
    main()
