"""Minimal repro: XLA miscompiles conv -> strided-conv chains at H==1 mod 16.

On jax 0.9.0 (both the XLA CPU backend and TPU v5e), jitting

    conv1x1(x) |> conv3x3(stride=2, VALID)

at spatial input sizes 17x17 or 33x33 produces results that differ from a
direct NumPy convolution by O(1) (not rounding noise) — eager per-op
execution is correct, and sizes 8/9/16/32/35/64 are correct.  An
``optimization_barrier`` between the convs restores correctness; the
framework applies that workaround in vitgan_tpu/models/inception.py (the
only place our shapes hit the pattern — Mixed_7a runs at 17x17).

Run:  python scripts/repro_xla_conv_bug.py   (exits 1 while the bug exists)
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp


def np_conv(x, w, s):
    n, h, ww, c = x.shape
    kh, kw, ci, co = w.shape
    oh, ow = (h - kh) // s + 1, (ww - kw) // s + 1
    out = np.zeros((n, oh, ow, co), np.float32)
    for i in range(oh):
        for j in range(ow):
            out[:, i, j, :] = np.tensordot(
                x[:, i * s:i * s + kh, j * s:j * s + kw, :], w,
                axes=([1, 2, 3], [0, 1, 2]))
    return out


def main() -> int:
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (1, 17, 17, 8)).astype(np.float32)
    w1 = rng.normal(0, 0.3, (1, 1, 8, 8)).astype(np.float32)
    w2 = rng.normal(0, 0.3, (3, 3, 8, 8)).astype(np.float32)
    ref = np_conv(np_conv(x, w1, 1), w2, 2)

    def cnv(v, w, s):
        return jax.lax.conv_general_dilated(
            v, w, (s, s), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)

    fused = np.asarray(jax.jit(lambda v: cnv(cnv(v, w1, 1), w2, 2))(jnp.asarray(x)))
    guarded = np.asarray(jax.jit(
        lambda v: cnv(jax.lax.optimization_barrier(cnv(v, w1, 1)), w2, 2)
    )(jnp.asarray(x)))
    e_fused = float(np.abs(fused - ref).max())
    e_guard = float(np.abs(guarded - ref).max())
    print(f"platform={jax.devices()[0].platform} "
          f"fused_err={e_fused:.3e} barrier_err={e_guard:.3e}")
    assert e_guard < 1e-4, "barrier workaround no longer effective!"
    if e_fused > 1e-3:
        print("BUG PRESENT: fused conv chain is miscompiled (workaround active)")
        return 1
    print("bug fixed upstream — the optimization_barrier workaround can go")
    return 0


if __name__ == "__main__":
    sys.exit(main())
