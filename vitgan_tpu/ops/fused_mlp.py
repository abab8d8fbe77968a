"""Pallas TPU fused transformer-MLP block: LN -> fc1 -> act -> fc2 -> +residual.

The reference's per-block MLP half is four separate torch ops
(ref:src/v2/modules.py:178-183, ref:src/v1/transformer.py:40-45), each a round
trip through memory.  This kernel runs the whole residual-MLP half of a
transformer block in one VMEM pass per row tile: LayerNorm statistics, both
matmuls on the MXU, the activation on the VPU, and the residual add — the
(rows, hidden) intermediate never touches HBM.

Backward is a pure-JAX recompute VJP (exact gradients).  Like the attention
kernel this is routed by the same policy switch; at CIFAR widths XLA fusion is
already close to optimal, the win grows with embed width and sequence length.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from vitgan_tpu.ops.attention import _ceil_to  # shared alignment helper


def _erf_poly(x):
    """erf via the Abramowitz-Stegun 7.1.26 polynomial (|err| < 1.5e-7).

    Mosaic has no erf/erfc lowering, so the kernel computes it from exp —
    keeping the exact-GELU semantics of the XLA path within float32 noise.
    """
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _erf_poly_grad(x):
    """d/dx of _erf_poly — the derivative of the APPROXIMATION itself, not of
    true erf, so a backward built on it matches AD of the polynomial forward
    exactly.  _erf_poly is odd, hence its derivative is even: evaluate at |x|.
    """
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    dpoly = (((5 * a5 * t + 4 * a4) * t + 3 * a3) * t + 2 * a2) * t + a1
    # d/dx [1 - poly(t)e^{-x^2}] = e^{-x^2} (poly'(t)·p·t^2 + 2x·poly(t)), x>0
    return jnp.exp(-ax * ax) * (dpoly * p * t * t + 2.0 * ax * poly)


def _gelu_exactish(x):
    return 0.5 * x * (1.0 + _erf_poly(x * 0.7071067811865476))


_ACTS = {
    # erf-form GELU to match torch nn.GELU (erf computed in-kernel, see above)
    "gelu": _gelu_exactish,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


def _kernel(x_ref, ln_scale_ref, ln_bias_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
            *, activation: str, eps: float, residual: bool, d_real: int):
    # MAC dtype discipline (same as ops/attention.py): matmul OPERANDS stay in
    # the input dtype (bf16 on the production path — full-rate MXU), products
    # ACCUMULATE in f32 via preferred_element_type.  Forcing f32 operands ran
    # the MXU at its ~4x-slower f32 rate; the XLA path casts weights to the
    # activation dtype anyway (models/layers.py linear), so numerics match.
    mac_dt = x_ref.dtype
    x = x_ref[:].astype(jnp.float32)  # (rows, Dp)
    # LayerNorm over the real features only (padding excluded from statistics).
    dp = x.shape[-1]
    if d_real != dp:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        mask = (col < d_real).astype(jnp.float32)
        x = x * mask
        mean = jnp.sum(x, axis=-1, keepdims=True) / d_real
        centered = (x - mean) * mask
        var = jnp.sum(centered * centered, axis=-1, keepdims=True) / d_real
    else:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        centered = x - mean
        var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    y = centered * jax.lax.rsqrt(var + eps)
    y = y * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[:].astype(jnp.float32)
    if d_real != dp:
        y = y * mask
    h = jnp.dot(y.astype(mac_dt), w1_ref[:].astype(mac_dt),
                preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    h = _ACTS[activation](h)
    out = jnp.dot(h.astype(mac_dt), w2_ref[:].astype(mac_dt),
                  preferred_element_type=jnp.float32)
    out = out + b2_ref[:].astype(jnp.float32)
    if residual:
        out = out + x_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _forward(x, ln_scale, ln_bias, w1, b1, w2, b2, activation, eps, residual,
             block_rows, interpret):
    orig_shape = x.shape
    d = x.shape[-1]
    hidden = w1.shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    d_pad = _ceil_to(d, 128)
    h_pad = _ceil_to(hidden, 128)
    rows_pad = _ceil_to(rows, block_rows)
    x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, d_pad - d)))
    ln_s = jnp.pad(ln_scale, (0, d_pad - d)).reshape(1, d_pad)
    ln_b = jnp.pad(ln_bias, (0, d_pad - d)).reshape(1, d_pad)
    w1p = jnp.pad(w1, ((0, d_pad - d), (0, h_pad - hidden)))
    b1p = jnp.pad(b1, (0, h_pad - hidden)).reshape(1, h_pad)
    w2p = jnp.pad(w2, ((0, h_pad - hidden), (0, d_pad - d)))
    b2p = jnp.pad(b2, (0, d_pad - d)).reshape(1, d_pad)

    kernel = functools.partial(_kernel, activation=activation, eps=eps,
                               residual=residual, d_real=d)
    full = lambda *_: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows_pad, d_pad), x.dtype),
        grid=(rows_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, d_pad), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, h_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_pad, d_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d_pad), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, ln_s, ln_b, w1p, b1p, w2p, b2p)
    return out[:rows, :d].reshape(orig_shape)


def _reference(x, ln_scale, ln_bias, w1, b1, w2, b2, activation, eps, residual):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    h = _ACTS[activation](y @ w1.astype(jnp.float32) + b1)
    out = h @ w2.astype(jnp.float32) + b2
    if residual:
        out = out + xf
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, activation: str = "gelu",
                 eps: float = 1e-5, residual: bool = True, block_rows: int = 256,
                 interpret: bool = False):
    """out = [x +] fc2(act(fc1(LN(x)))).  x: (..., D)."""
    return _forward(x, ln_scale, ln_bias, w1, b1, w2, b2, activation, eps,
                    residual, block_rows, interpret)


def _fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, activation, eps, residual,
         block_rows, interpret):
    out = fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, activation, eps,
                       residual, block_rows, interpret)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _bwd(activation, eps, residual, block_rows, interpret, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, activation, eps, residual),
        x, ln_scale, ln_bias, w1, b1, w2, b2,
    )
    return vjp(g)


fused_ln_mlp.defvjp(_fwd, _bwd)


def dispatch_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, activation: str = "gelu",
                    residual: bool = True):
    """Policy-routed LN+MLP: the Pallas kernel on TPU for big row counts,
    XLA otherwise.  The row threshold comes from the process-wide policy
    (``set_policy(min_mlp_rows=...)``), the single source of truth shared
    with the attention kernel routing."""
    from vitgan_tpu.ops.policy import (_POLICY, on_tpu as _on_tpu,
                                       sequence_parallel_active)

    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    mode = _POLICY["mode"]
    min_rows = _POLICY["min_mlp_rows"]
    # Measured on v5e: at embed 128 / hidden 256 XLA's own fusion wins; the
    # kernel pays off once the hidden width is MXU-saturating (>=512).
    big_enough = rows >= min_rows and w1.shape[-1] >= 512
    use = mode == "always" or (mode == "auto" and _on_tpu() and big_enough)
    if sequence_parallel_active():
        use = False  # GSPMD cannot partition a pallas_call (see policy.py)
    if use:
        return fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, activation,
                            1e-5, residual, 256, not _on_tpu())
    return _reference(x, ln_scale, ln_bias, w1, b1, w2, b2, activation, 1e-5, residual)
