"""Benchmark harness: images/sec/chip for the combined G+D train step at 32x32.

Runs the reference's v2 configuration (batch 64, embed 128, depth 6, heads 4,
patch 4 — ref:src/v2/utils.py:25-41) through our jitted alternating train step
on the available accelerator and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` is the ratio to the PyTorch-CPU reference implementation
measured by scripts/measure_torch_baseline.py (BASELINE_MEASURED.json).

Measurement discipline (round-2 fix): on the tunneled "axon" TPU platform,
``jax.block_until_ready`` can return BEFORE execution completes until a first
full host readback has happened — round 1's 1.35M img/s headline was that
artifact.  This harness therefore (a) forces a host readback after warmup,
(b) times to a host materialization of a value that depends on the final
train state (so nothing can finish "later"), (c) cross-checks
block_until_ready against the readback and reports divergence, and (d)
computes the XLA FLOP count of the step and refuses to print a number that
implies more than the chip's physical peak.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

# The image's .axon_site customization force-registers the TPU platform even
# when JAX_PLATFORMS=cpu is set (and a dead tunnel then hangs device init);
# honor the env var explicitly so CPU smoke runs stay off the tunnel.
if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception as e:
        print(f"warning: could not force the cpu platform ({e}); device init "
              "may touch the TPU tunnel", file=sys.stderr)

import numpy as np  # noqa: E402

from vitgan_tpu import config as C  # noqa: E402
from vitgan_tpu.ops.policy import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache()
from vitgan_tpu.models import build_gan  # noqa: E402
from vitgan_tpu.train import create_train_state  # noqa: E402
from vitgan_tpu.train.step import make_device_data_train_fn  # noqa: E402

# Physical single-chip ceilings (dense peak, TFLOP/s).  Any measurement whose
# implied FLOP rate exceeds the relevant peak is a timing bug, not a result.
_PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,   # v5e bf16
    "TPU v4": 275.0,
    "TPU v6": 918.0,        # v6e bf16
    "cpu": 1.0,
}


def _chip_peak_tflops() -> float:
    name = jax.devices()[0].device_kind
    for k, v in _PEAK_TFLOPS.items():
        if k.lower() in name.lower():
            return v
    return 1000.0  # unknown chip: only catches truly absurd numbers


def _readback_scalar(state) -> float:
    """Host-materialize a value that depends on the final G params — the
    ground-truth synchronization point."""
    from vitgan_tpu.utils.timing import _readback

    return _readback(state.g_params)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    scan_steps = int(os.environ.get("BENCH_SCAN", "64"))
    n_calls = int(os.environ.get("BENCH_CALLS", "10"))
    cfg = C.ExperimentConfig(family="v2", data=C.DataConfig(dataset="synthetic"))
    cfg = C.replace(cfg, **{"v2.batch_size": batch})
    # BENCH_SET="v2.dropout=0,runtime.megablock=on" — dotted config overrides
    # for A/B runs of the same harness (values parsed as JSON when possible).
    overrides = {}
    for kv in filter(None, (s.strip() for s in os.environ.get("BENCH_SET", "").split(","))):
        if "=" not in kv:
            sys.exit(f"BENCH_SET entry {kv!r} is not key=value")
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except ValueError:
            pass
        overrides[k.strip()] = v
    if overrides:
        cfg = C.replace(cfg, **overrides)
    from vitgan_tpu.ops.policy import apply_from_runtime

    apply_from_runtime(cfg.runtime)

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
        host_rng.integers(0, 4096, (n_calls + 1, scan_steps, batch)).astype(np.int32)
    )

    # FLOP model: XLA's own cost analysis (utils.benchutil; scan body counted
    # once, so per-call cost = flops(single step) * scan_steps).
    from vitgan_tpu.utils.benchutil import xla_step_gflops

    gflops = xla_step_gflops(cfg, gan, state)
    flops_per_step = gflops * 1e9 if gflops else None

    # Warmup/compile — then force a FULL host readback so (a) warmup has truly
    # finished and (b) the tunneled platform drops into synchronous dispatch.
    state, metrics = step(state, dataset, idx[0])
    _ = _readback_scalar(state)

    # Synchronization self-check: block_until_ready must agree with an actual
    # host readback to within 25%; if it doesn't, block_until_ready lies on
    # this platform and only readback-timed numbers may be reported.
    t0 = time.perf_counter()
    state, metrics = step(state, dataset, idx[0])
    jax.block_until_ready(metrics["d_loss"])
    t_block = time.perf_counter() - t0
    _ = _readback_scalar(state)
    t_read = time.perf_counter() - t0
    sync_ok = t_block >= 0.75 * t_read

    # Timed run: end at host materialization of the final state (ground truth).
    t0 = time.perf_counter()
    for c in range(n_calls):
        state, metrics = step(state, dataset, idx[c + 1])
    _ = _readback_scalar(state)
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(metrics["d_loss"])).all(), "non-finite D loss"
    assert np.isfinite(np.asarray(metrics["g_loss"])).all(), "non-finite G loss"

    n_chips = max(1, len(jax.devices()))
    ips_per_chip = batch * scan_steps * n_calls / dt / n_chips

    implied_tflops = None
    if flops_per_step:
        implied_tflops = flops_per_step * scan_steps * n_calls / dt / 1e12 / n_chips
        peak = _chip_peak_tflops()
        assert implied_tflops <= peak, (
            f"implied {implied_tflops:.1f} TFLOP/s exceeds the chip's "
            f"{peak:.0f} TFLOP/s peak — the timing is broken, refusing to report"
        )

    vs = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f).get("torch_cpu_images_per_sec")
        if base:
            vs = ips_per_chip / base

    from vitgan_tpu.utils.manifest import collect_env

    _env = collect_env()
    print(json.dumps({
        "metric": "images/sec/chip, combined G+D train step, v2 ViT-GAN 32x32 batch %d" % batch,
        "value": round(ips_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "timed_to": "host readback of final train state",
        "block_until_ready_agrees": bool(sync_ok),
        "implied_tflops_per_chip": round(implied_tflops, 2) if implied_tflops else None,
        "step_gflops": round(flops_per_step / 1e9, 2) if flops_per_step else None,
        # provenance: which code + stack produced this number
        "code_revision": _env.get("code_revision"),
        "jax_version": _env.get("jax_version"),
        "device_kind": _env.get("device_kind"),
    }))


if __name__ == "__main__":
    main()
