"""A/B weight-only int8 quantization on the single-dispatch serving sampler.

Weight-only int8 (utils/quantize.py) cuts the generator's weight bytes 4x in
HBM and on the host->device upload; the dequantizing multiply is fused into
each consuming matmul inside the jitted sampler.  This measures, on the real
chip, per quantization mode:

- device-side sample time (sync_timeit_scalar: on-device uint8 -> scalar
  reduction, so the tunnel readback does not pollute the timing),
- end-to-end wire time for one uint8 batch (what a serve request pays),
- the uploaded weight bytes.

Prints one JSON line.  QUANT_SMOKE=1 runs a tiny CPU case (CI-sized check
that both paths execute; timings meaningless there).

Usage: python scripts/bench_quant.py [preset=v2] [batch=256] [iters=20]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = os.environ.get("QUANT_SMOKE") == "1"
if SMOKE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

from vitgan_tpu.ops.policy import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vitgan_tpu import config as C  # noqa: E402
from vitgan_tpu.models import build_gan  # noqa: E402
from vitgan_tpu.ops.policy import apply_from_runtime  # noqa: E402
from vitgan_tpu.train import create_train_state, make_serve_sample_fn  # noqa: E402
from vitgan_tpu.utils.benchutil import build_preset_cfg  # noqa: E402
from vitgan_tpu.utils.quantize import maybe_quantize, quantized_bytes  # noqa: E402
from vitgan_tpu.utils.timing import sync_timeit_scalar  # noqa: E402

if SMOKE:
    jax.config.update("jax_platforms", "cpu")


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "v2"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    if SMOKE:
        cfg, batch, iters = C.smoke_config("v2"), 8, 2
    else:
        cfg = build_preset_cfg(preset)
    apply_from_runtime(cfg.runtime)

    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    sample = make_serve_sample_fn(gan, cfg, batch)

    out = {"metric": f"{preset} serve sampler int8-vs-native (batch {batch})",
           "batch": batch, "smoke": SMOKE}
    ref_u8 = None
    for mode in (None, "int8"):
        tag = mode or "native"
        g_vars = jax.device_put(maybe_quantize(state.g_vars_ema, mode))
        out[f"weight_bytes_{tag}"] = quantized_bytes(g_vars)[0]
        u8 = np.asarray(sample(g_vars, 5, 0))  # warm + correctness probe
        if ref_u8 is None:
            ref_u8 = u8
        else:
            diff = np.abs(ref_u8.astype(np.int32) - u8.astype(np.int32))
            out["u8_drift_mean"] = round(float(diff.mean()), 3)
            out["u8_drift_p99"] = float(np.quantile(diff, 0.99))
        # Device-side: reduce the uint8 batch to one scalar on device so only
        # 4 bytes cross the tunnel per timed iteration.
        scalar = jax.jit(lambda g, s, c: jnp.sum(sample(g, s, c),
                                                 dtype=jnp.int32))
        dev_s = sync_timeit_scalar(lambda g: scalar(g, 5, 0), g_vars,
                                   iters=iters)
        # Wire: full uint8 batch readback EVERY iteration — what a /sample
        # request pays end-to-end (sync_timeit would read back only once).
        import time as _time

        wire_iters = max(3, iters // 4)
        np.asarray(sample(g_vars, 5, 0))
        t0 = _time.perf_counter()
        for _ in range(wire_iters):
            np.asarray(sample(g_vars, 5, 0))
        wire_s = (_time.perf_counter() - t0) / wire_iters
        out[f"device_ms_{tag}"] = round(dev_s * 1e3, 3)
        out[f"wire_ms_{tag}"] = round(wire_s * 1e3, 3)
        out[f"img_per_sec_device_{tag}"] = round(batch / dev_s, 1)
    if out.get("device_ms_int8"):
        out["device_speedup_int8"] = round(
            out["device_ms_native"] / out["device_ms_int8"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
