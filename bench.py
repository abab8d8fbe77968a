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
block_until_ready against the readback and HARD-FLAGS the sync regime in the
output (set BENCH_REQUIRE_SYNC=1 to abort on divergence instead), and (d)
computes the XLA FLOP count of the step and refuses to print a number that
implies more than the chip's physical peak.

Robustness (round-3 fix): the round-2 official record was a crash — the axon
tunnel was down and backend init died with a raw traceback.  Now backend init
is retried with exponential backoff (BENCH_INIT_RETRIES, default 5), the whole
measurement is retried once on transient runtime failure, and ANY terminal
failure still prints ONE parseable JSON line ({"error": ..., "stage": ...})
before exiting non-zero.
"""

import json
import os
import sys
import time
import traceback

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


def _init_devices_with_retry():
    """jax.devices() with bounded retry + backoff around backend init.

    The axon tunnel is flaky: "Unable to initialize backend 'axon'" killed the
    round-2 driver run outright.  JAX caches backend-init failures, so each
    retry resets the backend registry before re-touching the platform.
    """
    attempts = int(os.environ.get("BENCH_INIT_RETRIES", "5"))
    delay = float(os.environ.get("BENCH_INIT_BACKOFF", "3.0"))
    last = None
    for i in range(max(1, attempts)):
        try:
            return jax.devices()
        except Exception as e:  # backend init failed (tunnel down / flaky)
            last = e
            print(f"bench: backend init attempt {i + 1}/{attempts} failed: {e}",
                  file=sys.stderr)
            try:
                import jax._src.xla_bridge as _xb
                _xb._clear_backends()
            except Exception as ce:
                print(f"bench: backend reset failed ({ce}); retrying anyway",
                      file=sys.stderr)
            if i + 1 < attempts:
                time.sleep(delay)
                delay = min(delay * 2.0, 60.0)
    raise last


def _fail(stage: str, err: BaseException) -> None:
    """Terminal failure: ONE parseable JSON line on stdout, traceback on
    stderr, non-zero exit.  The driver's record then contains structure, not
    a stack trace (round-2 weak #1)."""
    traceback.print_exc(file=sys.stderr)
    print(json.dumps({
        "metric": None,
        "value": None,
        "unit": None,
        "vs_baseline": None,
        "error": f"{type(err).__name__}: {err}",
        "stage": stage,
    }))
    sys.exit(1)


def _readback_scalar(state) -> float:
    """Host-materialize a value that depends on the final G params — the
    ground-truth synchronization point."""
    from vitgan_tpu.utils.timing import _readback

    return _readback(state.g_params)


def run_bench():
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
    if not sync_ok:
        msg = (f"bench: SYNC DIVERGENCE — block_until_ready returned at "
               f"{t_block:.4f}s but the host readback took {t_read:.4f}s; "
               "block_until_ready lies on this platform, only the "
               "readback-timed number below is trustworthy")
        print(msg, file=sys.stderr)
        if os.environ.get("BENCH_REQUIRE_SYNC", "") == "1":
            raise RuntimeError(msg)

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
    baseline_threads = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            _base_rec = json.load(f)
        base = _base_rec.get("torch_cpu_images_per_sec")
        baseline_threads = _base_rec.get("threads")
        if base:
            vs = ips_per_chip / base

    from vitgan_tpu.utils.manifest import collect_env

    _env = collect_env()
    print(json.dumps({
        "metric": "images/sec/chip, combined G+D train step, v2 ViT-GAN 32x32 batch %d" % batch,
        "value": round(ips_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        # vs_baseline context (round-3 verdict weak #5): the denominator is a
        # single-thread torch-CPU run on this 1-core host — flattering by
        # construction.  The defensible numbers are mfu_pct (fraction of the
        # chip's dense bf16 peak) and FID at equal step budget (fid_budget).
        "baseline_threads": baseline_threads,
        "mfu_pct": (round(100.0 * implied_tflops / _chip_peak_tflops(), 2)
                    if implied_tflops else None),
        "fid_budget": "FID_COMPARISON.json (scripts/fid_budget_comparison.py; BENCHMARKS.md §FID at equal step budget)",
        "timed_to": "host readback of final train state",
        "block_until_ready_agrees": bool(sync_ok),
        "sync_regime": "synchronous" if sync_ok else
            "READBACK-ONLY (block_until_ready DIVERGED; reported number is readback-timed ground truth)",
        "implied_tflops_per_chip": round(implied_tflops, 2) if implied_tflops else None,
        "step_gflops": round(flops_per_step / 1e9, 2) if flops_per_step else None,
        # provenance: which code + stack produced this number
        "code_revision": _env.get("code_revision"),
        "jax_version": _env.get("jax_version"),
        "device_kind": _env.get("device_kind"),
    }))


def _start_watchdog():
    """A dead axon tunnel can HANG backend init inside C++ (not raise) — no
    retry loop can save that.  A daemon thread enforces a hard deadline: past
    it, print the structured JSON failure line and _exit so the driver's
    record is parseable instead of empty.  Disable with BENCH_WATCHDOG=0."""
    import threading

    deadline = float(os.environ.get("BENCH_WATCHDOG", "900"))
    if deadline <= 0:
        return

    def _expire():
        print(f"bench: watchdog expired after {deadline:.0f}s — backend init "
              "or measurement is hung (dead tunnel?)", file=sys.stderr)
        print(json.dumps({
            "metric": None, "value": None, "unit": None, "vs_baseline": None,
            "error": f"watchdog: no result within {deadline:.0f}s (hung backend init or measurement)",
            "stage": "watchdog",
        }), flush=True)
        os._exit(1)

    t = threading.Timer(deadline, _expire)
    t.daemon = True
    t.start()


def main():
    _start_watchdog()
    try:
        _init_devices_with_retry()
    except BaseException as e:  # noqa: BLE001 — structured terminal record
        if isinstance(e, (KeyboardInterrupt, SystemExit)):
            raise
        _fail("backend_init", e)
    try:
        run_bench()
    except BaseException as e:  # noqa: BLE001
        if isinstance(e, (KeyboardInterrupt, SystemExit)):
            raise
        # One retry for transient runtime failures (tunnel hiccup mid-run):
        # reset the backend registry and re-run the whole measurement.
        print(f"bench: measurement failed ({e}); resetting backend and "
              "retrying once", file=sys.stderr)
        try:
            import jax._src.xla_bridge as _xb
            _xb._clear_backends()
            _init_devices_with_retry()
            run_bench()
        except BaseException as e2:  # noqa: BLE001
            if isinstance(e2, (KeyboardInterrupt, SystemExit)):
                raise
            _fail("measure", e2)


if __name__ == "__main__":
    main()
