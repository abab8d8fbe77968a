"""Weight-only int8 quantization for the inference/serving path.

The reference has no quantization story — its only inference surface writes
one PNG grid from float32 weights (ref:src/v2/generation.py:26-60).  For a
long-lived TPU serving process the generator forward at serving batch sizes
is weight-fetch-bound as much as FLOP-bound, so this module provides
per-channel symmetric int8 weights for sampling:

- **HBM**: int8 weight bytes are 4x smaller than float32 (2x vs bfloat16);
  XLA keeps the int8 buffer resident and fuses the
  ``q.astype(compute) * scale`` dequantization into the consuming
  matmul/conv, so what crosses HBM per step is the int8 tensor.
- **Upload**: the one-time host->device parameter transfer shrinks 4x —
  material on tunneled/remote device links.
- **Quality**: scales are per-output-channel (one per slice of the leaf's
  last axis), the MXU still computes in the model's compute dtype, and the
  quantized-vs-native sampler parity is bounded by test
  (tests/test_quantize.py).

This is deliberately WEIGHT-ONLY (w8, activations untouched): it changes no
model code — ``quantize_tree`` rewrites the param pytree, ``dequantize_tree``
restores it at trace time inside the jitted sampler, and every consumer
(generator_apply, serving, eval) runs unmodified.  Activation quantization
(w8a8 int8 MXU) would need calibration and per-op wiring; weight-only is the
always-safe production default.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

# int8 symmetric range: +/-127 (we never emit -128 so negation is exact).
_QMAX = 127.0


@jax.tree_util.register_pytree_node_class
class QuantLeaf:
    """One quantized parameter: ``w ~= q.astype(dtype) * scale``.

    ``q`` is int8 with the original leaf's shape; ``scale`` is float32 with
    the leaf's last-axis length kept (broadcast shape ``(1, ..., 1, C)``), so
    dequantization is a single fused multiply.  The original dtype rides in
    the static aux data so a dequantized tree is dtype-identical to the
    source tree.
    """

    def __init__(self, q, scale, dtype: str):
        self.q = q
        self.scale = scale
        self.dtype = dtype

    def dequantize(self):
        return (self.q.astype(jnp.float32) * self.scale).astype(self.dtype)

    def tree_flatten(self):
        return (self.q, self.scale), self.dtype

    @classmethod
    def tree_unflatten(cls, dtype, children):
        q, scale = children
        return cls(q, scale, dtype)

    def __repr__(self):  # readable in tree dumps
        return f"QuantLeaf(shape={tuple(self.q.shape)}, dtype={self.dtype})"


def _is_quant(x) -> bool:
    return isinstance(x, QuantLeaf)


def quantize_leaf(w) -> QuantLeaf:
    """Per-output-channel symmetric int8 quantization of one array.

    The last axis is treated as the channel axis (true for every dense/conv/
    embedding leaf in this codebase: kernels are ``(..., in, out)``, stacked
    qkv is ``(3, H, E, Dh)``); each channel's scale is its max-abs over all
    other axes, so the worst-case per-element error is ``amax_c / 254``.
    All-zero channels get scale 1 (q is all zero there anyway).

    Runs in NumPy on the host: quantization is a one-time load-path step, and
    eager device ops would cost a dispatch round-trip per leaf on tunneled
    platforms.  Only the int8 result ever crosses to the device.
    """
    dtype = str(jnp.asarray(w).dtype) if not hasattr(w, "dtype") else str(w.dtype)
    wf = np.asarray(w, dtype=np.float32)
    axes = tuple(range(wf.ndim - 1))
    amax = np.max(np.abs(wf), axis=axes, keepdims=True)
    scale = np.where(amax > 0, amax / _QMAX, 1.0).astype(np.float32)
    q = np.clip(np.round(wf / scale), -_QMAX, _QMAX).astype(np.int8)
    return QuantLeaf(q, scale, dtype)


def quantize_tree(params: Any, min_elems: int = 1024) -> Any:
    """Rewrite a param pytree with int8 ``QuantLeaf``s where it pays.

    Only floating leaves of rank >= 2 with at least ``min_elems`` elements are
    quantized — biases, LayerNorm vectors, scalars, and tiny tensors stay
    exact (they are a rounding error of the byte budget and the riskiest for
    quality).  Integer leaves (PRNG keys, step counters) pass through.
    """

    def one(w):
        if _is_quant(w):
            return w
        arr = jnp.asarray(w) if not isinstance(w, (jnp.ndarray, np.ndarray)) else w
        if (arr.ndim >= 2 and arr.size >= min_elems
                and jnp.issubdtype(arr.dtype, jnp.floating)):
            return quantize_leaf(arr)
        return w

    return jax.tree_util.tree_map(one, params, is_leaf=_is_quant)


def dequantize_tree(params: Any) -> Any:
    """Inverse of :func:`quantize_tree` (identity on unquantized trees).

    Call this INSIDE jit: XLA then stores int8 in HBM and fuses the
    dequantizing multiply into each consumer, which is the whole point.
    """
    return jax.tree_util.tree_map(
        lambda x: x.dequantize() if _is_quant(x) else x, params, is_leaf=_is_quant)


def quantized_bytes(params: Any) -> tuple[int, int]:
    """(bytes as stored, bytes if float32) — the wire/HBM weight budget."""
    stored = 0
    dense = 0
    for leaf in jax.tree_util.tree_leaves(params, is_leaf=_is_quant):
        if _is_quant(leaf):
            stored += leaf.q.size + leaf.scale.size * 4
            dense += leaf.q.size * 4
        else:
            arr = jnp.asarray(leaf)
            stored += arr.size * arr.dtype.itemsize
            dense += arr.size * 4
    return stored, dense


def maybe_quantize(params: Any, mode: Optional[str], min_elems: int = 1024) -> Any:
    """CLI entry: ``mode`` None/'none' -> unchanged, 'int8' -> quantized."""
    if mode in (None, "none", ""):
        return params
    if mode != "int8":
        raise ValueError(f"unknown quantization mode {mode!r} (have: int8)")
    return quantize_tree(params, min_elems=min_elems)
