"""Op-level profile of a preset's scanned train step on the real chip.

Captures a ``jax.profiler`` trace of one scanned device call (after a compiled,
read-back warmup) and aggregates the XPlane device events by op name — the
on-chip time breakdown that tells us WHERE the step time goes (MXU matmuls vs
VPU elementwise vs copies), without needing a TensorBoard UI.

Usage: SCRATCH=... python scripts/profile_step.py [preset] [scan_steps] [top_n]
Writes the raw trace under $SCRATCH/profiles/<preset>/ and prints a JSON
summary to stdout.
"""

import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vitgan_tpu.ops.policy import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402


def capture(preset: str, scan_steps: int) -> str:
    """scan_steps >= 2: the scanned production call (the lax.scan while shows
    as ONE op in the trace).  scan_steps == 1: a flat single-step jit
    (make_train_step) so every fusion inside the step is individually
    attributed — use this to see WHERE the step time goes."""
    from vitgan_tpu.ops.policy import apply_from_runtime
    from vitgan_tpu.utils.benchutil import build_preset_cfg, build_scanned_harness
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state
    from vitgan_tpu.train.step import make_train_step
    from vitgan_tpu.utils.timing import _readback

    cfg = build_preset_cfg(preset)
    apply_from_runtime(cfg.runtime)

    label = preset
    if scan_steps == 1:
        gan = build_gan(cfg)
        state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
        b, s = cfg.model.batch_size, cfg.model.image_size
        host = np.random.default_rng(0)
        step = make_train_step(gan, cfg, donate=False)
        real = jax.device_put(host.uniform(-1, 1, (b, s, s, cfg.model.channels))
                              .astype(np.float32))
        run = lambda st: step(st, real)  # noqa: E731
        label = f"{preset}_raw"
    else:
        # The SAME construction measure_scanned_train times, so the trace is
        # of the exact XLA program behind the throughput tables.  Two idx
        # calls: [0] warms up, [1] is traced (distinct gather indices).
        dstep, state, dataset, idx = build_scanned_harness(
            cfg, scan_steps, dataset_images=2048, n_calls=2)
        calls = iter(range(idx.shape[0]))
        run = lambda st: dstep(st, dataset, idx[next(calls)])  # noqa: E731

    # Warmup: compile + force full readback (axon sync gotcha).
    state, _ = run(state)
    _readback(state.g_params)

    log_dir = os.path.join(os.environ.get("SCRATCH", "/tmp"), "profiles", label)
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    state, _ = run(state)
    _readback(state.g_params)
    jax.profiler.stop_trace()
    return log_dir


def summarize(log_dir: str, top_n: int) -> dict:
    """Aggregate device-plane XEvents by op name from the newest xplane.pb."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    except ImportError:  # plugin layout varies by TF version
        from tensorboard_plugin_profile.protobuf import xplane_pb2  # type: ignore

    paths = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {log_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    summary = {"trace": paths[-1], "planes": {}}
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        by_line = {}
        for line in plane.lines:
            agg = defaultdict(lambda: [0.0, 0])  # name -> [total_ps, count]
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name][0] += ev.duration_ps
                agg[name][1] += 1
            if not agg:
                continue
            total_ms = sum(v[0] for v in agg.values()) / 1e9
            top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]
            by_line[line.name or str(line.id)] = {
                "total_ms": round(total_ms, 3),
                "top_ops": [
                    {"name": name, "ms": round(ps / 1e9, 3), "count": count,
                     "pct": round(100.0 * ps / max(total_ms * 1e9, 1), 1)}
                    for name, (ps, count) in top
                ],
            }
        if by_line:
            summary["planes"][plane.name] = by_line
    return summary


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "v2"
    scan_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    log_dir = capture(preset, scan_steps)
    print(json.dumps(summarize(log_dir, top_n), indent=2))


if __name__ == "__main__":
    main()
