"""hires256p4 production-step measurement + routing A/B (VERDICT r4 next #4).

The highres256p4 preset (config.highres256p4_config) is the first real
train-step config in the flash kernel's DMA-streaming regime: 256px at
patch 4 = 4096 tokens, K/V past VMEM residence (ops/attention.py).  Before
round 5 that regime was exercised only by the isolated on-chip kernel lane
(ONCHIP_r04.json, 32k tokens) — never inside a G+D step with remat,
optimizers, and the megablock routing decision live.

Measures, each case in a fresh subprocess (env-scoped VMEM budget, clean
policy state):
  - attention=flash, megablock=auto   — the shipped routing (auto caps the
    megablock at its 1056-token measured range, so flash owns 4096)
  - attention=flash, megablock=on     — force-route the fused block at 4096
    tokens under the 96 MB scoped budget (expected to refuse/fall back or
    lose; measured, not assumed — the routing decision must be backed by
    numbers)
  - use_pallas=never                  — pure-XLA attention baseline
Records img/s, step ms, and achieved TFLOP/s (XLA cost-model flops).

Writes HIRES256P4_r05.json and refreshes the hires256p4 row of
BENCH_SUITE.json.  Role in the reference: the §5.7/BASELINE-config-#5
"high-res attention stress" point (ref:src/v2/modules.py:165-183 hot loop
scaled to 4k tokens).  Usage (chip): python scripts/bench_hires256p4.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = "_child" in sys.argv


def child(megablock: str, use_pallas: str) -> None:
    os.environ["VITGAN_MEGABLOCK_VMEM_MB"] = "96"
    sys.path.insert(0, REPO)
    import warnings

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

    cfg = C.replace(C.highres256p4_config(),
                    **{"runtime.megablock": megablock,
                       "runtime.use_pallas": use_pallas,
                       "data.dataset": "synthetic"})
    apply_from_runtime(cfg.runtime)
    m = cfg.model
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    host = np.random.default_rng(0)
    b, s, c = m.batch_size, m.image_size, m.channels
    n_data = max(64, 2 * b)
    dataset = jax.device_put(
        host.integers(0, 256, (n_data, s, s, c), dtype=np.uint8))
    scan_steps, iters = 2, 2
    idx = jax.device_put(
        host.integers(0, n_data, (scan_steps, b)).astype(np.int32))
    fn = make_device_data_train_fn(gan, cfg, scan_steps, donate=False)
    fellback = []
    with warnings.catch_warnings(record=True) as wlog:
        warnings.simplefilter("always")
        t = sync_timeit(fn, state, dataset, idx, iters=iters)
        fellback = [str(w.message) for w in wlog if "megablock" in str(w.message)]

    from vitgan_tpu.utils.benchutil import xla_step_gflops

    gflops = xla_step_gflops(cfg, gan, state)
    ips = b * scan_steps / t
    print(json.dumps({
        "megablock": megablock, "use_pallas": use_pallas,
        "tokens": (s // m.patch_size) ** 2,
        "img_per_sec": round(ips, 1),
        "step_ms": round(t / scan_steps * 1e3, 3),
        "step_gflops": round(gflops, 2) if gflops else None,
        "tflops": round(gflops * ips / b / 1e3, 2) if gflops else None,
        "megablock_fallback_warnings": fellback,
    }), flush=True)


def run_child(megablock, use_pallas):
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "_child",
         megablock, use_pallas],
        cwd=REPO, capture_output=True, text=True, timeout=3000)
    line = None
    for ln in (r.stdout or "").splitlines():
        try:
            line = json.loads(ln)
        except ValueError:
            continue
    if line is None:
        tail = (r.stdout or "")[-400:] + (r.stderr or "")[-1200:]
        line = {"megablock": megablock, "use_pallas": use_pallas,
                "error": f"rc={r.returncode}", "tail": tail}
    print(json.dumps(line), flush=True)
    return line


def main():
    if CHILD:
        child(sys.argv[2], sys.argv[3])
        return
    # megablock='on' at 4096 tokens is a SHAPE-STATIC refusal (the saved
    # backward cannot fit scoped VMEM at N=4097/E=384/hidden=1536 — pinned by
    # tests/test_fused_block.py::test_megablock_refuses_4k_tokens), so the
    # chip time goes to the two real routes: shipped (flash) vs pure XLA.
    cases = [("auto", "auto"), ("off", "never")]
    results = [run_child(mb, up) for mb, up in cases]
    shipped = results[0]
    out = {
        "what": "hires256p4 (4096-token) production train step: first "
                "end-to-end exercise of the flash DMA-streaming regime, "
                "with the megablock routing decision measured at 4k tokens "
                "(VERDICT r4 next #4)",
        "vmem_mb": 96,
        "results": results,
        "routing_decision": {
            "shipped": "megablock auto (caps at 1056 measured tokens) -> "
                       "flash attention owns 4096",
            "img_per_sec_shipped": shipped.get("img_per_sec"),
        },
    }
    with open(os.path.join(REPO, "HIRES256P4_r05.json"), "w") as f:
        json.dump(out, f, indent=2)
    # BENCH_SUITE row for the preset (same harness as bench_suite.py).
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_suite import bench_family

        from vitgan_tpu import config as C

        rec = bench_family("hires256p4", C.replace(
            C.highres256p4_config(), data=C.DataConfig(dataset="synthetic")),
            scan_steps=2, iters=2, single_iters=3)
        path = os.path.join(REPO, "BENCH_SUITE.json")
        with open(path) as f:
            suite = json.load(f)
        rows = [r for r in suite["results"] if r["family"] != "hires256p4"]
        rows.append(rec)
        suite["results"] = rows
        with open(path, "w") as f:
            json.dump(suite, f, indent=2)
    except Exception as e:
        print(f"bench_suite row refresh failed: {e}", flush=True)
    print(json.dumps({"ok": True, "shipped_img_per_sec":
                      shipped.get("img_per_sec")}))


if __name__ == "__main__":
    main()
