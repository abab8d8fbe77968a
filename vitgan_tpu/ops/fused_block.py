"""Pallas TPU megablock: one v2 encoder block forward in a single kernel.

The v2-32px op profile (BENCHMARKS.md) shows the train step as a long tail of
20-35us XLA fusions with no dominant op — the only remaining schedule-level
lever at that scale is fusing a WHOLE transformer block so its intermediates
(LN activations, qkv, attention scores, MLP hidden) never touch HBM.  This
kernel computes the complete pre-LN encoder block of models/vitgan_v2._encoder_apply
(ref:src/v2/modules.py:165-183 topology, dropout-free path):

    a   = MHSA(LN1(x))          # dot scores / sqrt(head_dim), softmax, proj
    x1  = x + a
    out = x1 + fc2(gelu(fc1(LN2(x1))))

per grid step for a group of samples: LN statistics and softmax on the VPU,
all five matmuls (qkv, per-head scores, per-head PV, output proj, fc1/fc2) on
the MXU, everything VMEM-resident.  Attention is computed per (sample, head)
— at 65-token sequences the score matrices are tiny, the fusion (not MXU
shape) is the point.  Numerics: float32 accumulation inside, erf-form GELU
(the same in-kernel polynomial as ops/fused_mlp), key-side masking for padded
tokens.

``encoder_block_fused`` wraps the kernel in a custom_vjp (exact XLA recompute
backward); ``encoder_block_fused_dropout`` adds in-kernel inverted dropout from
the TPU hardware PRNG (masks ride along as residuals so the recompute backward
is exact).  ``maybe_megablock`` routes blocks through them when
``runtime.megablock=on`` — dropout-free always; train-with-dropout on real TPU
only (pltpu.prng_seed has no interpret lowering).  Off by default; the A/B
verdict is pending on-chip measurement (scripts/bench_megablock.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vitgan_tpu.ops.attention import _ceil_to
from vitgan_tpu.ops.fused_mlp import _gelu_exactish


def _layernorm(x, scale, bias, d_real, eps):
    """Row LayerNorm over the first ``d_real`` features (padding masked)."""
    dp = x.shape[-1]
    if d_real != dp:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
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
    y = y * scale + bias
    if d_real != dp:
        y = y * mask
    return y


def _kernel(*refs, n_real: int, e_real: int, num_heads: int, head_dim: int,
            scale: float, eps: float, rate: float):
    if rate > 0.0:
        (seed_ref, x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wout_ref,
         bout_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         o_ref, m1_ref, m2_ref, attn_ref) = refs
        # hardware PRNG; decorrelate grid steps via the program index
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = 1.0 - rate
        threshold = min(int(rate * 2 ** 32), 2 ** 32 - 1)

        def dropmul(shape):
            """Multiply-mask: 0 with prob ``rate`` else 1/keep (inverted
            dropout).  Returned to the caller so the recompute backward
            applies the EXACT same masks."""
            bits = pltpu.prng_random_bits(shape)  # uint32
            return jnp.where(bits.astype(jnp.uint32) >= jnp.uint32(threshold),
                             jnp.float32(1.0 / keep), jnp.float32(0.0))
    else:
        (x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
         ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         o_ref, attn_ref) = refs
    gb, n_pad, e_pad = x_ref.shape
    rows = gb * n_pad
    x = x_ref[:].astype(jnp.float32).reshape(rows, e_pad)

    # --- attention half: qkv projection on the MXU, per-(sample, head) scores
    y = _layernorm(x, ln1s_ref[:].astype(jnp.float32), ln1b_ref[:].astype(jnp.float32),
                   e_real, eps)
    qkv = jnp.dot(y, wqkv_ref[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:].astype(jnp.float32)  # (rows, 3*H*Dh [padded])
    inv = 1.0 / math.sqrt(scale)
    # zero the scratch: its padded columns are never written by the head loop
    # and would otherwise inject uninitialized garbage into the projection
    attn_ref[:] = jnp.zeros_like(attn_ref)
    # key mask: padded tokens must not receive softmax mass
    key_col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    key_mask = key_col < n_real

    # Static Python unroll over the (compile-time) group and head counts:
    # Mosaic has no lowering for dynamic_slice on VALUES inside a fori_loop
    # (only refs take dynamic indexers), and every slice below is static.
    for b in range(gb):
        base = b * n_pad
        s_qkv = qkv[base:base + n_pad]
        for h in range(num_heads):
            q = s_qkv[:, h * head_dim:(h + 1) * head_dim]
            k = s_qkv[:, (num_heads + h) * head_dim:(num_heads + h + 1) * head_dim]
            v = s_qkv[:, (2 * num_heads + h) * head_dim:
                      (2 * num_heads + h + 1) * head_dim]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * inv
            s = jnp.where(key_mask, s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.dot(p, v, preferred_element_type=jnp.float32)
            attn_ref[base:base + n_pad, h * head_dim:(h + 1) * head_dim] = o

    proj = jnp.dot(attn_ref[:], wout_ref[:].astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    a = proj + bout_ref[:].astype(jnp.float32)
    if rate > 0.0:
        m1 = dropmul((rows, e_pad))
        m1_ref[:] = m1.reshape(gb, n_pad, e_pad).astype(m1_ref.dtype)
        a = a * m1
    x1 = x + a

    # --- MLP half
    y2 = _layernorm(x1, ln2s_ref[:].astype(jnp.float32), ln2b_ref[:].astype(jnp.float32),
                    e_real, eps)
    h1 = _gelu_exactish(
        jnp.dot(y2, w1_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
        + b1_ref[:].astype(jnp.float32))
    mlp = jnp.dot(h1, w2_ref[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32) + b2_ref[:].astype(jnp.float32)
    if rate > 0.0:
        m2 = dropmul((rows, e_pad))
        m2_ref[:] = m2.reshape(gb, n_pad, e_pad).astype(m2_ref.dtype)
        mlp = mlp * m2
    out = x1 + mlp
    o_ref[:] = out.reshape(gb, n_pad, e_pad).astype(o_ref.dtype)


def fused_encoder_block(x, params, *, num_heads: int, eps: float = 1e-5,
                        group: int = 8, interpret: bool = False,
                        rate: float = 0.0, seed=None):
    """x (B, N, E) -> one v2 encoder block forward.

    ``params`` is a models/vitgan_v2._encoder_init dict: ln1/ln2 {scale,bias},
    msha {qkv (3,H,E,Dh), qkv_b (3,H,Dh), out {w,b}}, fc1/fc2 {w,b}.

    With ``rate > 0`` (requires an int32 ``seed``), inverted-dropout masks for
    the attention and MLP branches are drawn from the TPU hardware PRNG
    in-kernel and RETURNED alongside the output as float32 multiply-masks
    (0 or 1/keep), so a recompute backward can apply the exact same masks:
    returns ``(out, m1, m2)`` instead of ``out``.  The RNG stream differs
    from the XLA path's jax.random masks (valid dropout, not bit-identical).
    """
    b, n, e = x.shape
    qkv_w = params["msha"]["qkv"]
    _, h, _, dh = qkv_w.shape
    if h != num_heads:
        raise ValueError(f"params carry {h} heads, num_heads={num_heads}")
    hidden = params["fc1"]["w"].shape[-1]

    n_pad = _ceil_to(n, 8)
    e_pad = _ceil_to(e, 128)
    hd_pad = _ceil_to(3 * h * dh, 128)
    hidden_pad = _ceil_to(hidden, 128)
    b_pad = _ceil_to(b, group)

    # weights to kernel layout: (E, 3*H*Dh) with [q_h0..q_hH, k_h0.., v_h0..]
    wqkv = qkv_w.transpose(2, 0, 1, 3).reshape(e, 3 * h * dh)
    bqkv = params["msha"].get("qkv_b")
    bqkv = (bqkv.reshape(3 * h * dh) if bqkv is not None
            else jnp.zeros((3 * h * dh,), x.dtype))
    wout, bout = params["msha"]["out"]["w"], params["msha"]["out"]["b"]

    xp = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n), (0, e_pad - e)))
    pads = {
        "ln1s": jnp.pad(params["ln1"]["scale"], (0, e_pad - e)).reshape(1, e_pad),
        "ln1b": jnp.pad(params["ln1"]["bias"], (0, e_pad - e)).reshape(1, e_pad),
        "wqkv": jnp.pad(wqkv, ((0, e_pad - e), (0, hd_pad - 3 * h * dh))),
        "bqkv": jnp.pad(bqkv, (0, hd_pad - 3 * h * dh)).reshape(1, hd_pad),
        "wout": jnp.pad(wout, ((0, _ceil_to(h * dh, 128) - h * dh), (0, e_pad - e))),
        "bout": jnp.pad(bout, (0, e_pad - e)).reshape(1, e_pad),
        "ln2s": jnp.pad(params["ln2"]["scale"], (0, e_pad - e)).reshape(1, e_pad),
        "ln2b": jnp.pad(params["ln2"]["bias"], (0, e_pad - e)).reshape(1, e_pad),
        "w1": jnp.pad(params["fc1"]["w"], ((0, e_pad - e), (0, hidden_pad - hidden))),
        "b1": jnp.pad(params["fc1"]["b"], (0, hidden_pad - hidden)).reshape(1, hidden_pad),
        "w2": jnp.pad(params["fc2"]["w"], ((0, hidden_pad - hidden), (0, e_pad - e))),
        "b2": jnp.pad(params["fc2"]["b"], (0, e_pad - e)).reshape(1, e_pad),
    }

    if rate > 0.0 and seed is None:
        raise ValueError("dropout rate > 0 requires an int32 seed")
    kernel = functools.partial(
        _kernel, n_real=n, e_real=e, num_heads=h, head_dim=dh,
        scale=float(dh), eps=eps, rate=float(rate))
    full = lambda g: (0, 0)  # noqa: E731
    tile = pl.BlockSpec((group, n_pad, e_pad), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [
        tile,
        pl.BlockSpec((1, e_pad), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, e_pad), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((e_pad, hd_pad), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hd_pad), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((_ceil_to(h * dh, 128), e_pad), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, e_pad), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, e_pad), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, e_pad), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((e_pad, hidden_pad), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden_pad), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden_pad, e_pad), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, e_pad), full, memory_space=pltpu.VMEM),
    ]
    args = [xp, pads["ln1s"], pads["ln1b"], pads["wqkv"], pads["bqkv"],
            pads["wout"], pads["bout"], pads["ln2s"], pads["ln2b"],
            pads["w1"], pads["b1"], pads["w2"], pads["b2"]]
    out_shape = jax.ShapeDtypeStruct((b_pad, n_pad, e_pad), x.dtype)
    out_specs = tile
    if rate > 0.0:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, jnp.asarray(seed, jnp.int32).reshape(1))
        mask_shape = jax.ShapeDtypeStruct((b_pad, n_pad, e_pad), jnp.float32)
        mask_tile = pl.BlockSpec((group, n_pad, e_pad), lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = (out_shape, mask_shape, mask_shape)
        out_specs = (tile, mask_tile, mask_tile)
    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(b_pad // group,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((group * n_pad, _ceil_to(h * dh, 128)), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    if rate > 0.0:
        out, m1, m2 = res
        return (out[:b, :n, :e], m1[:b, :n, :e], m2[:b, :n, :e])
    return res[:b, :n, :e]


# ---------------------------------------------------------------------------
# Differentiable wrapper + policy routing
# ---------------------------------------------------------------------------


def _block_reference(x, params, num_heads: int, eps: float):
    """Pure-XLA v2 block (dropout-free), the VJP recompute path — the same
    math and internal-f32 discipline as models/vitgan_v2._encoder_apply."""
    from vitgan_tpu.models import layers as L
    from vitgan_tpu.ops.fused_mlp import _reference as mlp_reference

    dh = params["msha"]["qkv"].shape[-1]
    a, _ = L.mhsa(params["msha"], {}, L.layer_norm(params["ln1"], x, eps),
                  score_mode="dot", scale=dh)
    x1 = x + a
    mlp = mlp_reference(x1, params["ln2"]["scale"], params["ln2"]["bias"],
                        params["fc1"]["w"], params["fc1"]["b"],
                        params["fc2"]["w"], params["fc2"]["b"],
                        "gelu", eps, False)
    return x1 + mlp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def encoder_block_fused(x, params, num_heads: int, eps: float = 1e-5,
                        group: int = 8, interpret: bool = False):
    """Differentiable megablock: Pallas forward, exact recompute backward."""
    return fused_encoder_block(x, params, num_heads=num_heads, eps=eps,
                               group=group, interpret=interpret)


def _fwd(x, params, num_heads, eps, group, interpret):
    out = encoder_block_fused(x, params, num_heads, eps, group, interpret)
    return out, (x, params)


def _bwd(num_heads, eps, group, interpret, res, g):
    x, params = res
    _, vjp = jax.vjp(lambda x, p: _block_reference(x, p, num_heads, eps), x, params)
    return vjp(g)


encoder_block_fused.defvjp(_fwd, _bwd)


def _block_reference_masked(x, params, m1, m2, num_heads: int, eps: float):
    """Pure-XLA v2 block applying PRE-DRAWN float32 multiply-masks — the VJP
    recompute path for the in-kernel-dropout forward (exact same masks)."""
    from vitgan_tpu.models import layers as L
    from vitgan_tpu.ops.fused_mlp import _reference as mlp_reference

    dh = params["msha"]["qkv"].shape[-1]
    a, _ = L.mhsa(params["msha"], {}, L.layer_norm(params["ln1"], x, eps),
                  score_mode="dot", scale=dh)
    x1 = x + (a.astype(jnp.float32) * m1).astype(x.dtype)
    mlp = mlp_reference(x1, params["ln2"]["scale"], params["ln2"]["bias"],
                        params["fc1"]["w"], params["fc1"]["b"],
                        params["fc2"]["w"], params["fc2"]["b"],
                        "gelu", eps, False)
    return x1 + (mlp.astype(jnp.float32) * m2).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def encoder_block_fused_dropout(x, params, seed, rate: float, num_heads: int,
                                eps: float = 1e-5, group: int = 8,
                                interpret: bool = False):
    """Differentiable megablock WITH in-kernel dropout (hardware PRNG).

    The backward applies the exact masks the forward drew (they ride along
    as residuals), so gradients are exact for the sampled dropout function.
    """
    out, _, _ = fused_encoder_block(x, params, num_heads=num_heads, eps=eps,
                                    group=group, interpret=interpret,
                                    rate=rate, seed=seed)
    return out


def _fwd_dropout(x, params, seed, rate, num_heads, eps, group, interpret):
    out, m1, m2 = fused_encoder_block(x, params, num_heads=num_heads, eps=eps,
                                      group=group, interpret=interpret,
                                      rate=rate, seed=seed)
    return out, (x, params, m1, m2, seed)


def _bwd_dropout(rate, num_heads, eps, group, interpret, res, g):
    import numpy as np

    x, params, m1, m2, seed = res
    _, vjp = jax.vjp(
        lambda x, p: _block_reference_masked(x, p, m1, m2, num_heads, eps),
        x, params)
    dx, dp = vjp(g)
    return dx, dp, np.zeros(seed.shape, jax.dtypes.float0)


encoder_block_fused_dropout.defvjp(_fwd_dropout, _bwd_dropout)


def maybe_megablock(params, x, cfg, rng, train):
    """Policy gate for models/vitgan_v2._encoder_apply: route the block through
    the fused kernel when enabled — the dropout-free kernel when dropout is
    inactive, the hardware-PRNG dropout kernel when training with dropout on a
    real TPU.  Returns None when the caller should use the standard path."""
    from vitgan_tpu.ops.policy import megablock_enabled, megablock_group, on_tpu

    if not megablock_enabled():
        return None
    if train and cfg.dropout > 0.0:
        if rng is None or not on_tpu():
            # standard path: it surfaces the missing-rng error loudly, and
            # the hardware-PRNG dropout kernel has no interpret-mode lowering
            # (pltpu.prng_seed is TPU-only) so CPU runs keep XLA dropout.
            return None
        # In-kernel dropout: same rate, hardware-PRNG stream (valid dropout,
        # not bit-identical to the XLA path's jax.random masks).
        seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)
        return encoder_block_fused_dropout(x, params, seed, float(cfg.dropout),
                                           cfg.num_heads, 1e-5,
                                           megablock_group(), not on_tpu())
    return encoder_block_fused(x, params, cfg.num_heads, 1e-5,
                               megablock_group(), not on_tpu())
