"""Round-4 megablock chip session (VERDICT r4 #4/#5): one unattended driver.

1. deit64 full-step A/B with the new input-dtype MACs (bf16 on chip): the
   round-3 saved-backward megablock ran every MXU op with f32 operands —
   quarter-rate on v5e.  Measures megablock off vs on, so the artifact
   captures both the kernel wins and the step-level effect.
2. hires128 full-step A/B at VITGAN_MEGABLOCK_VMEM_MB=96 (the saved pair
   fits at fwd group 2 / bwd group 1; at the default 48 MB the backward
   cannot fit and routing falls back).  Each hires case runs in a fresh
   subprocess so the env var is re-read at import.

Writes MEGABLOCK_r04.json.  Usage (chip): python scripts/bench_megablock_r04.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = "_child" in sys.argv


def child(case: str, megablock: str, vmem_mb: str) -> None:
    os.environ["VITGAN_MEGABLOCK_VMEM_MB"] = vmem_mb
    sys.path.insert(0, REPO)
    import jax
    import numpy as np

    from vitgan_tpu import config as C
    from vitgan_tpu.ops.policy import (apply_from_runtime,
                                       enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state
    from vitgan_tpu.train.step import make_device_data_train_fn
    from vitgan_tpu.utils.timing import sync_timeit

    base = C.deit64_config() if case == "deit64" else C.highres_config(128)
    scan_steps, iters = (8, 3) if case == "deit64" else (4, 3)
    cfg = C.replace(base, **{"runtime.megablock": megablock,
                             "runtime.megablock_bwd": "saved"})
    apply_from_runtime(cfg.runtime)
    m = cfg.model
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    host = np.random.default_rng(0)
    b, s, c = m.batch_size, m.image_size, m.channels
    n_data = max(512, 2 * b)
    dataset = jax.device_put(
        host.integers(0, 256, (n_data, s, s, c), dtype=np.uint8))
    idx = jax.device_put(
        host.integers(0, n_data, (scan_steps, b)).astype(np.int32))
    fn = make_device_data_train_fn(gan, cfg, scan_steps, donate=False)
    t = sync_timeit(fn, state, dataset, idx, iters=iters)
    print(json.dumps({"case": case, "megablock": megablock,
                      "vmem_mb": vmem_mb,
                      "img_per_sec": round(b * scan_steps / t, 1),
                      "step_ms": round(t / scan_steps * 1e3, 3)}), flush=True)


def run_child(case, megablock, vmem_mb):
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "_child",
         case, megablock, vmem_mb],
        cwd=REPO, capture_output=True, text=True, timeout=1800)
    line = None
    for ln in (r.stdout or "").splitlines():
        try:
            line = json.loads(ln)
        except ValueError:
            continue
    if line is None:
        tail = (r.stdout or "")[-400:] + (r.stderr or "")[-1000:]
        line = {"case": case, "megablock": megablock, "vmem_mb": vmem_mb,
                "error": f"rc={r.returncode}", "tail": tail}
    print(json.dumps(line), flush=True)
    return line


def main():
    if CHILD:
        child(sys.argv[2], sys.argv[3], sys.argv[4])
        return 0
    results = []
    # deit64: the round-3 headline shape, now with input-dtype MACs (64 MB
    # default limit — the bf16 operand copies measured 48.72 MB at group 8)
    for mb in ("off", "on"):
        results.append(run_child("deit64", mb, "64"))
    # hires128: off (flash path baseline), on@48 (expected fallback = same as
    # off modulo warn), on@96 (the capacity experiment)
    results.append(run_child("hires128", "off", "48"))
    results.append(run_child("hires128", "on", "96"))
    out = {"what": "round-4 megablock A/Bs: deit64 with input-dtype (bf16) "
                   "MACs; hires128 saved pair at a 96 MB scoped-VMEM limit",
           "results": results}

    def ips(case, mb):
        for r in results:
            if r["case"] == case and r["megablock"] == mb and "img_per_sec" in r:
                return r["img_per_sec"]
        return None

    if ips("deit64", "on") and ips("deit64", "off"):
        out["deit64_speedup_on_vs_off"] = round(
            ips("deit64", "on") / ips("deit64", "off"), 3)
    if ips("hires128", "on") and ips("hires128", "off"):
        out["hires128_speedup_on96_vs_off"] = round(
            ips("hires128", "on") / ips("hires128", "off"), 3)
    with open(os.path.join(REPO, "MEGABLOCK_r04.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "results"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
