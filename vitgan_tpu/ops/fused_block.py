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
is exact).  The ``*_saved`` variants keep x1/z1/ao/LSE as forward outputs and
run a SINGLE-KERNEL backward with no forward recompute — the recompute
backward erased the fusion win (round-2 A/B), the saved backward restores it
(1.85x at the 257-token deit64 block, MEGABLOCK_r03.json).  ``maybe_megablock``
routes blocks through them per ``runtime.megablock``: 'on' everywhere it
lowers (train-with-dropout on real TPU only — pltpu.prng_seed has no interpret
lowering), 'auto' only in the measured-win regime (>=128 tokens, saved forward
fits scoped VMEM, real TPU), 'off' (default) never.  Harnesses:
scripts/bench_megablock.py (block level), scripts/bench_megablock_step.py
(full train step).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vitgan_tpu.ops.attention import _ceil_to
from vitgan_tpu.ops.fused_mlp import _erf_poly, _erf_poly_grad, _gelu_exactish

# Mosaic's default scoped-VMEM (kernel stack) budget is 16 MB; the
# saved-residual kernels are capacity-bound on it — the group clamps below
# were halving the deit64 backward down to group 1.  Every megablock
# pallas_call therefore raises the per-kernel limit to 48 MB, which leaves
# room for Mosaic's double-buffered I/O tiles inside the 128 MB physical
# VMEM of a v5e core.  _VMEM_BUDGET is what the clamp formulas check
# against (0.5 MB headroom, the same margin the 16 MB-era 15.5 MB check
# carried).
import os as _os

# 48 MB was calibrated for the all-f32 kernels; the input-dtype MAC change
# keeps bf16 copies of several f32 intermediates live (measured on v5e at
# deit64: 48.72 MB actual vs the 47.07 MB estimate — a trace-time failure in
# 'on' mode and, worse, a crash the auto gate's fit check did not predict).
# 96 MB admits the hires saved pair (fwd group 1 / bwd group 1, measured
# 1.30-1.34x end-to-end at 1032 tokens, MEGABLOCK_r04.json) while leaving
# 32 MB of the 128 MB physical VMEM for Mosaic's double-buffered I/O tiles
# (measured fine at the hires shape, the largest tile set any preset uses).
_VMEM_LIMIT_BYTES = int(_os.environ.get("VITGAN_MEGABLOCK_VMEM_MB", "96")) * 2**20
_VMEM_BUDGET = _VMEM_LIMIT_BYTES - 2**19


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
            scale: float, eps: float, rate: float, want_res: bool = False):
    pos = 0
    if rate > 0.0:
        seed_ref = refs[pos]; pos += 1
    (x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
     ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref) = refs[pos:pos + 13]
    pos += 13
    o_ref = refs[pos]; pos += 1
    if rate > 0.0:
        m1_ref, m2_ref = refs[pos:pos + 2]; pos += 2
    if want_res:
        # saved-residual backward (see _bwd_kernel): post-attention residual,
        # fc1 pre-activation, per-head attention output, per-head LSE
        x1_ref, z1_ref, ao_ref, lse_ref = refs[pos:pos + 4]; pos += 4
        attn_ref = None
    else:
        attn_ref = refs[pos]; pos += 1
    if rate > 0.0:
        # hardware PRNG; decorrelate grid steps via the program index
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = 1.0 - rate
        threshold = min(int(rate * 2 ** 32), 2 ** 32 - 1)

        def dropmul(shape):
            """Multiply-mask: 0 with prob ``rate`` else 1/keep (inverted
            dropout).  Returned to the caller so the backward (recompute or
            saved-residual) applies the EXACT same masks."""
            bits = pltpu.prng_random_bits(shape)  # uint32
            return jnp.where(bits.astype(jnp.uint32) >= jnp.uint32(threshold),
                             jnp.float32(1.0 / keep), jnp.float32(0.0))
    gb, n_pad, e_pad = x_ref.shape
    rows = gb * n_pad
    hd = num_heads * head_dim
    # MAC dtype discipline (same as ops/attention.py): matmul OPERANDS in the
    # input dtype (bf16 on the production path — full-rate MXU), f32
    # ACCUMULATION via preferred_element_type.  The previous all-f32 operands
    # capped every MXU op at the ~4x-slower f32 rate; VPU math (LN statistics,
    # softmax, GELU) stays f32.  The XLA path casts weights to the activation
    # dtype too (models/layers.py linear), so numerics match it.
    mac_dt = x_ref.dtype
    x = x_ref[:].astype(jnp.float32).reshape(rows, e_pad)

    # --- attention half: qkv projection on the MXU, per-(sample, head) scores
    y = _layernorm(x, ln1s_ref[:].astype(jnp.float32), ln1b_ref[:].astype(jnp.float32),
                   e_real, eps)
    qkv = jnp.dot(y.astype(mac_dt), wqkv_ref[:].astype(mac_dt),
                  preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:].astype(jnp.float32)  # (rows, 3*H*Dh [padded])
    inv = 1.0 / math.sqrt(scale)
    # zero the attention buffer: its padded columns are never written by the
    # head loop and would otherwise inject uninitialized garbage into the
    # projection (ao_ref doubles as the buffer on the saved-residual path)
    if want_res:
        ao_ref[:] = jnp.zeros_like(ao_ref)
    else:
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
            s = jax.lax.dot_general(q.astype(mac_dt), k.astype(mac_dt),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * inv
            s = jnp.where(key_mask, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=-1, keepdims=True)
            p = e / l
            o = jnp.dot(p.astype(mac_dt), v.astype(mac_dt),
                        preferred_element_type=jnp.float32)
            if want_res:
                ao_ref[b, :, h * head_dim:(h + 1) * head_dim] = o.astype(ao_ref.dtype)
                lse_ref[b, h:h + 1, :] = (m + jnp.log(l)).reshape(1, n_pad)
            else:
                attn_ref[base:base + n_pad, h * head_dim:(h + 1) * head_dim] = o

    att = (ao_ref[:].astype(jnp.float32).reshape(rows, ao_ref.shape[-1])
           if want_res else attn_ref[:])
    proj = jnp.dot(att.astype(mac_dt), wout_ref[:].astype(mac_dt),
                   preferred_element_type=jnp.float32)
    a = proj + bout_ref[:].astype(jnp.float32)
    if rate > 0.0:
        m1 = dropmul((rows, e_pad))
        m1_ref[:] = m1.reshape(gb, n_pad, e_pad).astype(m1_ref.dtype)
        a = a * m1
    x1 = x + a
    if want_res:
        x1_ref[:] = x1.reshape(gb, n_pad, e_pad).astype(x1_ref.dtype)

    # --- MLP half
    y2 = _layernorm(x1, ln2s_ref[:].astype(jnp.float32), ln2b_ref[:].astype(jnp.float32),
                    e_real, eps)
    z1 = (jnp.dot(y2.astype(mac_dt), w1_ref[:].astype(mac_dt),
                  preferred_element_type=jnp.float32)
          + b1_ref[:].astype(jnp.float32))
    if want_res:
        z1_ref[:] = z1.reshape(gb, n_pad, z1.shape[-1]).astype(z1_ref.dtype)
    h1 = _gelu_exactish(z1)
    mlp = jnp.dot(h1.astype(mac_dt), w2_ref[:].astype(mac_dt),
                  preferred_element_type=jnp.float32) + b2_ref[:].astype(jnp.float32)
    if rate > 0.0:
        m2 = dropmul((rows, e_pad))
        m2_ref[:] = m2.reshape(gb, n_pad, e_pad).astype(m2_ref.dtype)
        mlp = mlp * m2
    out = x1 + mlp
    o_ref[:] = out.reshape(gb, n_pad, e_pad).astype(o_ref.dtype)


def saved_fwd_group(group: int, n_pad: int, e_pad: int, hidden_pad: int,
                    hd_pad: int, dropout: bool = False) -> int:
    """Scoped-VMEM clamp for the saved-residual forward: it keeps x/y/qkv
    and the z1/h1 MLP intermediates live as f32 stack temporaries on top of
    the residual output tiles, so its footprint per grid step is ~2x the
    recompute forward's.  Measured on v5e at the deit64 shape (n_pad 264,
    e_pad 256, hidden 768): 13.06 KB/row at group 8 = 26.3 MB, over
    Mosaic's 16 MB scoped limit; with in-kernel dropout the PRNG bits plus
    the two f32 multiply-mask outputs add another ~7.3 KB/row (measured
    20.4 MB at group 4, n_pad 256).  On top of the linear per-row cost, one
    set of (n_pad, n_pad) f32 attention-score temporaries (s/e/p + the key
    mask) is live at a time (Mosaic reuses the buffers across the unrolled
    head loop — the deit64 measurement confirms no per-head scaling), which
    only matters at long sequences: ~1.1 MB at 264 tokens vs ~17 MB at
    hires' 1032.  Halves the group until the estimate fits the raised
    _VMEM_BUDGET.  Returns 0 when even group=1 cannot fit."""
    per_row = 4 * (3.5 * e_pad + 2 * hidden_pad + 1.5 * hd_pad)
    # input-dtype MACs keep bf16 copies of the LN outputs, h1 and the
    # attention buffer live next to their f32 sources (2 bytes each)
    per_row += 2 * (2 * e_pad + hidden_pad)
    if dropout:
        per_row += 4 * 8 * e_pad
    score = 16 * n_pad * n_pad  # 4 live (n_pad, n_pad) f32 buffers
    while group >= 1 and group * n_pad * per_row + score > _VMEM_BUDGET:
        group //= 2
    return group


def saved_bwd_group(group: int, n_pad: int, e_pad: int, hidden_pad: int,
                    hd_pad: int, dropout: bool = False) -> int:
    """Scoped-VMEM clamp for the saved-residual BACKWARD (see
    fused_encoder_block_bwd) — same contract as saved_fwd_group: halves the
    group until the estimate fits _VMEM_BUDGET, returns 0 when even group=1
    cannot fit (e.g. hires' 1032 tokens x hidden 1536: ~68 MB at group 1).
    The backward's stack holds x/go/x1/dx1-sized rows plus FOUR hidden-width
    f32 intermediates (z1, h1, dh1, dz1) and the dqkv scratch — ~3x the saved
    forward's per-row cost (calibrated at deit64, round 3)."""
    per_row = 4 * (5 * e_pad + 4 * hidden_pad + 2 * hd_pad)
    # input-dtype MACs: bf16 operand copies (see saved_fwd_group) — the
    # backward casts more operands (h1/dmlp/y2/dz1, ao/da, y1/dqkv)
    per_row += 2 * (2 * e_pad + 2 * hidden_pad + hd_pad)
    if dropout:
        # Calibrated on v5e at deit64 (n_pad 264, e_pad 256, hidden 768,
        # hd_pad 640): Mosaic's actual stack was 16.09 MB at group 2 =
        # 31.2 KB/row — the two resident f32 masks plus the de-masking
        # temporaries cost ~9.4 KB/row over the dropout-free backward.
        per_row += 4 * 10 * e_pad
    # one live set of (n_pad, n_pad) f32 score-space temporaries
    # (s/p/dp/ds + the two iota masks) — see saved_fwd_group
    score = 24 * n_pad * n_pad
    while group >= 1 and group * n_pad * per_row + score > _VMEM_BUDGET:
        group //= 2
    return group


def _pad_params(params, num_heads, x_dtype):
    """(h, dh, hidden, pads): every weight/bias tile-padded in kernel layout —
    wqkv as (E, 3*H*Dh) with column order [q_h0..q_hH, k_h0.., v_h0..]."""
    qkv_w = params["msha"]["qkv"]
    _, h, e, dh = qkv_w.shape
    if h != num_heads:
        raise ValueError(f"params carry {h} heads, num_heads={num_heads}")
    hidden = params["fc1"]["w"].shape[-1]
    e_pad = _ceil_to(e, 128)
    hd_pad = _ceil_to(3 * h * dh, 128)
    hidden_pad = _ceil_to(hidden, 128)

    wqkv = qkv_w.transpose(2, 0, 1, 3).reshape(e, 3 * h * dh)
    bqkv = params["msha"].get("qkv_b")
    bqkv = (bqkv.reshape(3 * h * dh) if bqkv is not None
            else jnp.zeros((3 * h * dh,), x_dtype))
    wout, bout = params["msha"]["out"]["w"], params["msha"]["out"]["b"]
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
    return h, dh, hidden, pads


_PAD_KEYS = ("ln1s", "ln1b", "wqkv", "bqkv", "wout", "bout",
             "ln2s", "ln2b", "w1", "b1", "w2", "b2")


def fused_encoder_block(x, params, *, num_heads: int, eps: float = 1e-5,
                        group: int = 8, interpret: bool = False,
                        rate: float = 0.0, seed=None,
                        want_residuals: bool = False):
    """x (B, N, E) -> one v2 encoder block forward.

    ``params`` is a models/vitgan_v2._encoder_init dict: ln1/ln2 {scale,bias},
    msha {qkv (3,H,E,Dh), qkv_b (3,H,Dh), out {w,b}}, fc1/fc2 {w,b}.

    With ``rate > 0`` (requires an int32 ``seed``), inverted-dropout masks for
    the attention and MLP branches are drawn from the TPU hardware PRNG
    in-kernel and RETURNED alongside the output as float32 multiply-masks
    (0 or 1/keep), so the backward applies the exact same masks:
    returns ``(out, m1, m2)`` instead of ``out``.  The RNG stream differs
    from the XLA path's jax.random masks (valid dropout, not bit-identical).

    With ``want_residuals=True`` the kernel additionally emits the PADDED
    intermediates the saved-residual backward needs — x1 (post-attention
    residual), z1 (fc1 pre-activation), ao (per-head attention output before
    the projection) and per-head LSE — appended to the return tuple, along
    with the padded input.  Masks (rate>0) come before residuals.
    """
    b, n, e = x.shape
    h, dh, hidden, pads = _pad_params(params, num_heads, x.dtype)

    n_pad = _ceil_to(n, 8)
    e_pad = _ceil_to(e, 128)
    hd_pad = _ceil_to(3 * h * dh, 128)
    hidden_pad = _ceil_to(hidden, 128)
    # Clamp the group on BOTH forward flavors: the plain (recompute-bwd)
    # kernel's stack is smaller than the saved one's, so the saved clamp is a
    # conservative bound for it — without it, megablock='on' with
    # megablock_bwd='recompute' at hires-scale shapes compiled a group-8
    # kernel straight into a Mosaic scoped-VMEM failure.
    group = saved_fwd_group(group, n_pad, e_pad, hidden_pad, hd_pad,
                            dropout=rate > 0.0)
    if group == 0:
        raise ValueError(
            f"megablock forward cannot fit scoped VMEM even at group=1 "
            f"(n_pad={n_pad}, e_pad={e_pad}, hidden_pad={hidden_pad}) — "
            f"use the standard (non-megablock) path for this shape")
    b_pad = _ceil_to(b, group)

    xp = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n), (0, e_pad - e)))

    if rate > 0.0 and seed is None:
        raise ValueError("dropout rate > 0 requires an int32 seed")
    kernel = functools.partial(
        _kernel, n_real=n, e_real=e, num_heads=h, head_dim=dh,
        scale=float(dh), eps=eps, rate=float(rate), want_res=want_residuals)
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
    hd_out_pad = _ceil_to(h * dh, 128)
    out_shapes = [jax.ShapeDtypeStruct((b_pad, n_pad, e_pad), x.dtype)]
    out_specs = [tile]
    mask_tile = pl.BlockSpec((group, n_pad, e_pad), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    if rate > 0.0:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, jnp.asarray(seed, jnp.int32).reshape(1))
        mask_shape = jax.ShapeDtypeStruct((b_pad, n_pad, e_pad), jnp.float32)
        out_shapes += [mask_shape, mask_shape]
        out_specs += [mask_tile, mask_tile]
    if want_residuals:
        # LSE rides one head per sublane; pad the sublane dim to the 8-row
        # tile so ANY head count lowers (heads beyond num_heads are never
        # written or read — harmless garbage in a residual buffer)
        h_lse = _ceil_to(h, 8)
        out_shapes += [
            jax.ShapeDtypeStruct((b_pad, n_pad, e_pad), x.dtype),          # x1
            jax.ShapeDtypeStruct((b_pad, n_pad, hidden_pad), x.dtype),     # z1
            jax.ShapeDtypeStruct((b_pad, n_pad, hd_out_pad), x.dtype),     # ao
            jax.ShapeDtypeStruct((b_pad, h_lse, n_pad), jnp.float32),      # lse
        ]
        out_specs += [
            tile,
            pl.BlockSpec((group, n_pad, hidden_pad), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, n_pad, hd_out_pad), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, h_lse, n_pad), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes) if len(out_shapes) > 1 else out_shapes[0],
        grid=(b_pad // group,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        scratch_shapes=[] if want_residuals else [
            pltpu.VMEM((group * n_pad, hd_out_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*args)
    if not isinstance(res, (tuple, list)):
        res = (res,)
    out = res[0][:b, :n, :e]
    if want_residuals:
        # padded residuals (+ padded input) go straight into the saved
        # backward — unpadding them here would just re-pad in the vjp
        if rate > 0.0:
            m1p, m2p, x1p, z1p, aop, lsep = res[1:]
            return out, (xp, m1p, m2p, x1p, z1p, aop, lsep)
        x1p, z1p, aop, lsep = res[1:]
        return out, (xp, x1p, z1p, aop, lsep)
    if rate > 0.0:
        _, m1, m2 = res
        return (out, m1[:b, :n, :e], m2[:b, :n, :e])
    return out


# ---------------------------------------------------------------------------
# Saved-residual backward: one Pallas kernel, NO forward recompute
# ---------------------------------------------------------------------------


def _ln_stats(x, d_real, eps):
    """(yhat, rstd, mask) for backward LN recompute — same masking discipline
    as _layernorm; yhat is the normalized pre-scale activation."""
    dp = x.shape[-1]
    if d_real != dp:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        mask = (col < d_real).astype(jnp.float32)
        x = x * mask
        mean = jnp.sum(x, axis=-1, keepdims=True) / d_real
        centered = (x - mean) * mask
        var = jnp.sum(centered * centered, axis=-1, keepdims=True) / d_real
    else:
        mask = None
        mean = jnp.mean(x, axis=-1, keepdims=True)
        centered = x - mean
        var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    yhat = centered * rstd
    return yhat, rstd, mask


def _ln_bwd(dY, yhat, rstd, scale, d_real, mask):
    """dX for y = yhat*scale + bias given dY (pad lanes of dY must be zero)."""
    t = dY * scale  # γ pad lanes are zero, so t pad lanes are zero
    mean_t = jnp.sum(t, axis=-1, keepdims=True) / d_real
    mean_ty = jnp.sum(t * yhat, axis=-1, keepdims=True) / d_real
    dx = (t - mean_t - yhat * mean_ty) * rstd
    return dx * mask if mask is not None else dx


def _gelu_grad(z):
    """Exact d/dz of _gelu_exactish — differentiates the _erf_poly
    APPROXIMATION the forward actually computes (via _erf_poly_grad), so the
    saved backward is true AD of the kernel forward rather than the analytic
    erf-GELU derivative (which would carry a small systematic mismatch)."""
    c = 0.7071067811865476
    u = z * c
    # gelu(z) = 0.5 z (1 + E(u))  =>  gelu'(z) = 0.5 (1 + E(u)) + 0.5 z E'(u) c
    return 0.5 * (1.0 + _erf_poly(u)) + 0.5 * z * _erf_poly_grad(u) * c


def _bwd_kernel(*refs, n_real: int, e_real: int, num_heads: int, head_dim: int,
                scale: float, eps: float, has_drop: bool):
    """Block backward from saved residuals (x1, z1, ao, lse) — recomputes only
    the cheap VPU statistics (both LNs) and the softmax weights from LSE;
    never re-runs a forward matmul.  Weight/bias grads accumulate in f32
    output blocks across the sequential grid (init at program 0)."""
    pos = 0
    (x_ref, g_ref, x1_ref, z1_ref, ao_ref, lse_ref) = refs[pos:pos + 6]
    pos += 6
    if has_drop:
        m1_ref, m2_ref = refs[pos:pos + 2]; pos += 2
    (ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
     ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref) = refs[pos:pos + 12]
    pos += 12
    (dx_ref, dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
     dln2s_ref, dln2b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref) = refs[pos:pos + 13]
    pos += 13
    dqkv_ref = refs[pos]  # VMEM scratch (rows, hd_pad) f32

    grad_refs = (dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dwout_ref,
                 dbout_ref, dln2s_ref, dln2b_ref, dw1_ref, db1_ref,
                 dw2_ref, db2_ref)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grad_refs:
            r[:] = jnp.zeros_like(r)

    gb, n_pad, e_pad = x_ref.shape
    rows = gb * n_pad
    hd_pad = dqkv_ref.shape[-1]
    inv = 1.0 / math.sqrt(scale)
    # MAC dtype discipline — see _kernel: operands in the input dtype (bf16 in
    # production), f32 accumulation.  Weight-grad ACCUMULATORS stay f32 output
    # refs; only the per-product operands round, exactly like XLA's AD of a
    # bf16 matmul.
    mac_dt = x_ref.dtype

    x = x_ref[:].astype(jnp.float32).reshape(rows, e_pad)
    go = g_ref[:].astype(jnp.float32).reshape(rows, e_pad)
    x1 = x1_ref[:].astype(jnp.float32).reshape(rows, e_pad)
    z1 = z1_ref[:].astype(jnp.float32).reshape(rows, z1_ref.shape[-1])
    ao = ao_ref[:].astype(jnp.float32).reshape(rows, ao_ref.shape[-1])

    # --- MLP half backward: out = x1 + drop2(fc2(gelu(fc1(LN2 x1))))
    dmlp = go * m2_ref[:].astype(jnp.float32).reshape(rows, e_pad) if has_drop else go
    h1 = _gelu_exactish(z1)
    dw2_ref[:] += jax.lax.dot_general(h1.astype(mac_dt), dmlp.astype(mac_dt),
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(dmlp, axis=0, keepdims=True)
    dh1 = jax.lax.dot_general(dmlp.astype(mac_dt), w2_ref[:].astype(mac_dt),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dz1 = dh1 * _gelu_grad(z1)
    yhat2, rstd2, emask = _ln_stats(x1, e_real, eps)
    y2 = _ln_y(yhat2, ln2s_ref, ln2b_ref, emask)
    dw1_ref[:] += jax.lax.dot_general(y2.astype(mac_dt), dz1.astype(mac_dt),
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dz1, axis=0, keepdims=True)
    dy2 = jax.lax.dot_general(dz1.astype(mac_dt), w1_ref[:].astype(mac_dt),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dln2s_ref[:] += jnp.sum(dy2 * yhat2, axis=0, keepdims=True)
    dln2b_ref[:] += jnp.sum(dy2, axis=0, keepdims=True)
    dx1 = go + _ln_bwd(dy2, yhat2, rstd2, ln2s_ref[:].astype(jnp.float32),
                       e_real, emask)

    # --- attention half backward: x1 = x + drop1(Wout·ao + bout)
    da = dx1 * m1_ref[:].astype(jnp.float32).reshape(rows, e_pad) if has_drop else dx1
    dwout_ref[:] += jax.lax.dot_general(ao.astype(mac_dt), da.astype(mac_dt),
                                        (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dbout_ref[:] += jnp.sum(da, axis=0, keepdims=True)
    dao = jax.lax.dot_general(da.astype(mac_dt), wout_ref[:].astype(mac_dt),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    # qkv recompute (ONE matmul — the only re-run MXU op; q/k/v and the
    # softmax weights are rebuilt from it and the saved LSE, flash-style)
    yhat1, rstd1, _ = _ln_stats(x, e_real, eps)
    y1 = _ln_y(yhat1, ln1s_ref, ln1b_ref, emask)
    qkv = (jnp.dot(y1.astype(mac_dt), wqkv_ref[:].astype(mac_dt),
                   preferred_element_type=jnp.float32)
           + bqkv_ref[:].astype(jnp.float32))

    dqkv_ref[:] = jnp.zeros_like(dqkv_ref)
    key_col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    key_mask = key_col < n_real
    row_valid = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
                 < n_real)
    for b in range(gb):
        base = b * n_pad
        s_qkv = qkv[base:base + n_pad]
        lse_b = lse_ref[b]  # (ceil8(H), n_pad) f32, head h in sublane h
        for h in range(num_heads):
            q = s_qkv[:, h * head_dim:(h + 1) * head_dim]
            k = s_qkv[:, (num_heads + h) * head_dim:(num_heads + h + 1) * head_dim]
            v = s_qkv[:, (2 * num_heads + h) * head_dim:
                      (2 * num_heads + h + 1) * head_dim]
            do_h = dao[base:base + n_pad, h * head_dim:(h + 1) * head_dim]
            ao_h = ao[base:base + n_pad, h * head_dim:(h + 1) * head_dim]
            s = jax.lax.dot_general(q.astype(mac_dt), k.astype(mac_dt),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * inv
            # P from saved LSE; pad KEYS get zero mass, pad QUERY rows carry
            # garbage LSE -> zero the rows (their cotangent is zero anyway,
            # but NaN*0 would poison dV)
            p = jnp.exp(jnp.where(key_mask, s, -jnp.inf)
                        - lse_b[h:h + 1, :].reshape(n_pad, 1))
            p = jnp.where(row_valid, p, 0.0)
            dv = jax.lax.dot_general(p.astype(mac_dt), do_h.astype(mac_dt),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do_h.astype(mac_dt), v.astype(mac_dt),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            delta = jnp.sum(do_h * ao_h, axis=-1, keepdims=True)
            ds = p * (dp - delta)
            dq = jnp.dot(ds.astype(mac_dt), k.astype(mac_dt),
                         preferred_element_type=jnp.float32) * inv
            dk = jax.lax.dot_general(ds.astype(mac_dt), q.astype(mac_dt),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * inv
            dqkv_ref[base:base + n_pad, h * head_dim:(h + 1) * head_dim] = dq
            dqkv_ref[base:base + n_pad,
                     (num_heads + h) * head_dim:(num_heads + h + 1) * head_dim] = dk
            dqkv_ref[base:base + n_pad,
                     (2 * num_heads + h) * head_dim:
                     (2 * num_heads + h + 1) * head_dim] = dv

    dqkv = dqkv_ref[:]
    dwqkv_ref[:] += jax.lax.dot_general(y1.astype(mac_dt), dqkv.astype(mac_dt),
                                        (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dbqkv_ref[:] += jnp.sum(dqkv, axis=0, keepdims=True)
    dy1 = jax.lax.dot_general(dqkv.astype(mac_dt), wqkv_ref[:].astype(mac_dt),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dln1s_ref[:] += jnp.sum(dy1 * yhat1, axis=0, keepdims=True)
    dln1b_ref[:] += jnp.sum(dy1, axis=0, keepdims=True)
    dx = dx1 + _ln_bwd(dy1, yhat1, rstd1, ln1s_ref[:].astype(jnp.float32),
                       e_real, emask)
    dx_ref[:] = dx.reshape(gb, n_pad, e_pad).astype(dx_ref.dtype)


def _ln_y(yhat, s_ref, b_ref, mask):
    """Scale+shift a normalized activation, masked at padded lanes."""
    y = yhat * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    return y * mask if mask is not None else y


def fused_encoder_block_bwd(params, g, res, *, num_heads: int, eps: float,
                            group: int, interpret: bool, n_real: int,
                            has_drop: bool):
    """Saved-residual block backward.  ``res`` is the PADDED residual tuple
    from ``fused_encoder_block(want_residuals=True)`` — (xp[, m1p, m2p], x1p,
    z1p, aop, lsep); ``g`` is the UNPADDED output cotangent (b, n, e).
    Returns (dx unpadded, dparams pytree matching ``params``)."""
    if has_drop:
        xp, m1p, m2p, x1p, z1p, aop, lsep = res
    else:
        xp, x1p, z1p, aop, lsep = res
    h, dh, hidden, pads = _pad_params(params, num_heads, g.dtype)
    b, n, e = g.shape
    b_pad, n_pad, e_pad = xp.shape
    hd_pad = pads["wqkv"].shape[-1]
    hd_out_pad = pads["wout"].shape[0]
    hidden_pad = pads["w1"].shape[-1]
    group = saved_bwd_group(group, n_pad, e_pad, hidden_pad, hd_pad,
                            dropout=has_drop)
    if group == 0:
        raise ValueError(
            f"saved-residual megablock backward cannot fit scoped VMEM even "
            f"at group=1 (n_pad={n_pad}, e_pad={e_pad}, "
            f"hidden_pad={hidden_pad}) — route this shape to the standard "
            f"path (maybe_megablock checks saved_bwd_group)")
    while b_pad % group:  # b_pad was padded with the FORWARD's group
        group //= 2
    gp = jnp.pad(g, ((0, b_pad - b), (0, n_pad - n), (0, e_pad - e)))

    kernel = functools.partial(
        _bwd_kernel, n_real=n_real, e_real=e, num_heads=h, head_dim=dh,
        scale=float(dh), eps=eps, has_drop=has_drop)
    full = lambda g_: (0, 0)  # noqa: E731
    tile = pl.BlockSpec((group, n_pad, e_pad), lambda g_: (g_, 0, 0),
                        memory_space=pltpu.VMEM)
    act_specs = [
        tile,  # x
        tile,  # g
        tile,  # x1
        pl.BlockSpec((group, n_pad, hidden_pad), lambda g_: (g_, 0, 0),
                     memory_space=pltpu.VMEM),  # z1
        pl.BlockSpec((group, n_pad, hd_out_pad), lambda g_: (g_, 0, 0),
                     memory_space=pltpu.VMEM),  # ao
        pl.BlockSpec((group, lsep.shape[1], n_pad), lambda g_: (g_, 0, 0),
                     memory_space=pltpu.VMEM),  # lse
    ]
    args = [xp, gp, x1p, z1p, aop, lsep]
    if has_drop:
        act_specs += [tile, tile]
        args += [m1p, m2p]
    param_specs = [pl.BlockSpec(pads[k].shape, full, memory_space=pltpu.VMEM)
                   for k in _PAD_KEYS]
    args += [pads[k] for k in _PAD_KEYS]

    grad_shapes = {k: jax.ShapeDtypeStruct(pads[k].shape, jnp.float32)
                   for k in _PAD_KEYS}
    out_shapes = [jax.ShapeDtypeStruct((b_pad, n_pad, e_pad), g.dtype)]
    out_specs = [tile]
    for k in _PAD_KEYS:
        out_shapes.append(grad_shapes[k])
        out_specs.append(pl.BlockSpec(pads[k].shape, full,
                                      memory_space=pltpu.VMEM))

    res_out = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(b_pad // group,),
        in_specs=act_specs + param_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((group * n_pad, hd_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*args)
    dxp, *dpads = res_out
    dx = dxp[:b, :n, :e]
    gd = dict(zip(_PAD_KEYS, dpads))

    # un-pad + un-layout back into the params pytree
    dparams = {
        "ln1": {"scale": gd["ln1s"][0, :e].astype(params["ln1"]["scale"].dtype),
                "bias": gd["ln1b"][0, :e].astype(params["ln1"]["bias"].dtype)},
        "ln2": {"scale": gd["ln2s"][0, :e].astype(params["ln2"]["scale"].dtype),
                "bias": gd["ln2b"][0, :e].astype(params["ln2"]["bias"].dtype)},
        "fc1": {"w": gd["w1"][:e, :hidden].astype(params["fc1"]["w"].dtype),
                "b": gd["b1"][0, :hidden].astype(params["fc1"]["b"].dtype)},
        "fc2": {"w": gd["w2"][:hidden, :e].astype(params["fc2"]["w"].dtype),
                "b": gd["b2"][0, :e].astype(params["fc2"]["b"].dtype)},
    }
    qkv_w = params["msha"]["qkv"]
    dqkv_w = (gd["wqkv"][:e, :3 * h * dh].reshape(e, 3, h, dh)
              .transpose(1, 2, 0, 3).astype(qkv_w.dtype))
    msha = {"qkv": dqkv_w,
            "out": {"w": gd["wout"][:h * dh, :e]
                    .astype(params["msha"]["out"]["w"].dtype),
                    "b": gd["bout"][0, :e]
                    .astype(params["msha"]["out"]["b"].dtype)}}
    if "qkv_b" in params["msha"]:
        msha["qkv_b"] = (gd["bqkv"][0, :3 * h * dh].reshape(3, h, dh)
                         .astype(params["msha"]["qkv_b"].dtype))
    dparams["msha"] = msha
    return dx, dparams


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def encoder_block_fused_saved(x, params, num_heads: int, eps: float = 1e-5,
                              group: int = 8, interpret: bool = False,
                              bwd_group: int = 2):
    """Differentiable megablock with the SAVED-RESIDUAL Pallas backward: the
    forward emits (x1, z1, ao, lse) and the backward is one kernel that never
    re-runs a forward matmul except the qkv projection (flash-style softmax
    rebuild from LSE).  ``bwd_group`` is small because the backward's VMEM
    working set (z1/h1/dz1 at 4x hidden width, all in f32) is ~3x the
    forward's."""
    out, _ = fused_encoder_block(x, params, num_heads=num_heads, eps=eps,
                                 group=group, interpret=interpret,
                                 want_residuals=True)
    return out


def _fwd_saved(x, params, num_heads, eps, group, interpret, bwd_group):
    out, res = fused_encoder_block(x, params, num_heads=num_heads, eps=eps,
                                   group=group, interpret=interpret,
                                   want_residuals=True)
    return out, (params, x.shape[1], res)


def _bwd_saved(num_heads, eps, group, interpret, bwd_group, residuals, g):
    params, n_real, res = residuals
    return fused_encoder_block_bwd(params, g, res, num_heads=num_heads,
                                   eps=eps, group=bwd_group,
                                   interpret=interpret, n_real=n_real,
                                   has_drop=False)


encoder_block_fused_saved.defvjp(_fwd_saved, _bwd_saved)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def encoder_block_fused_dropout_saved(x, params, seed, rate: float,
                                      num_heads: int, eps: float = 1e-5,
                                      group: int = 8, interpret: bool = False,
                                      bwd_group: int = 2):
    """In-kernel-dropout megablock with the saved-residual Pallas backward;
    the hardware-PRNG multiply-masks ride along as residuals and the backward
    kernel applies them exactly (no forward recompute)."""
    out, _ = fused_encoder_block(x, params, num_heads=num_heads, eps=eps,
                                 group=group, interpret=interpret,
                                 rate=rate, seed=seed, want_residuals=True)
    return out


def _fwd_dropout_saved(x, params, seed, rate, num_heads, eps, group,
                       interpret, bwd_group):
    out, res = fused_encoder_block(x, params, num_heads=num_heads, eps=eps,
                                   group=group, interpret=interpret,
                                   rate=rate, seed=seed, want_residuals=True)
    return out, (params, x.shape[1], res, seed)


def _bwd_dropout_saved(rate, num_heads, eps, group, interpret, bwd_group,
                       residuals, g):
    import numpy as np

    params, n_real, res, seed = residuals
    dx, dparams = fused_encoder_block_bwd(params, g, res, num_heads=num_heads,
                                          eps=eps, group=bwd_group,
                                          interpret=interpret, n_real=n_real,
                                          has_drop=True)
    return dx, dparams, np.zeros(seed.shape, jax.dtypes.float0)


encoder_block_fused_dropout_saved.defvjp(_fwd_dropout_saved, _bwd_dropout_saved)


def maybe_megablock(params, x, cfg, rng, train):
    """Policy gate for models/vitgan_v2._encoder_apply: route the block through
    the fused kernel when enabled — the dropout-free kernel when dropout is
    inactive, the hardware-PRNG dropout kernel when training with dropout on a
    real TPU.  ``runtime.megablock_bwd`` picks the backward: 'saved' = the
    single-kernel saved-residual backward (no forward recompute), 'recompute'
    = exact XLA recompute.  Returns None for the standard path."""
    from vitgan_tpu.ops.policy import (megablock_bwd_mode, megablock_group,
                                       megablock_mode, on_tpu)

    mode = megablock_mode()
    if mode == "off":
        return None
    saved = megablock_bwd_mode() == "saved"
    if not train:
        # Inference (serving/eval/sampling): no backward will run, so the
        # saved variant would write x1/z1/ao/LSE residual tiles nobody reads
        # (a pallas_call's outputs cannot be DCE'd).  Route the residual-free
        # forward; its recompute VJP never executes.
        saved = False
    if saved:
        # The saved-residual BACKWARD must also fit scoped VMEM — at hires'
        # ~1k tokens x hidden 1536 it cannot (saved_bwd_group == 0) even
        # though the forward fits, and 'on' mode used to route it into a
        # Mosaic compile failure.  Refuse the pair here, in every mode.
        n_, e_ = x.shape[1], x.shape[2]
        h_ = params["msha"]["qkv"].shape[1]
        dh_ = params["msha"]["qkv"].shape[-1]
        hidden_ = params["fc1"]["w"].shape[-1]
        drop_ = train and cfg.dropout > 0.0
        if saved_bwd_group(1, _ceil_to(n_, 8), _ceil_to(e_, 128),
                           _ceil_to(hidden_, 128), _ceil_to(3 * h_ * dh_, 128),
                           dropout=drop_) < 1:
            if mode == "on":
                import warnings

                warnings.warn(
                    f"megablock='on' requested but the saved backward cannot "
                    f"fit scoped VMEM at N={n_} E={e_} hidden={hidden_}; "
                    f"falling back to the standard path for this block")
                return None
            saved = False  # auto: recompute bwd loses (round-2 A/B) -> below
    if mode == "auto":
        # Measured-win regime only: saved-bwd 1.83-1.88x at 257 tokens
        # (MEGABLOCK_r03/r04), 1.30-1.34x at 1032 tokens under the 96 MB
        # scoped limit (MEGABLOCK_r04.json — both hires presets are 1032
        # tokens); 0.83-0.95x at 65 tokens.  The 1056-token cap bounds auto
        # to the measured range; beyond it flash attention owns the regime
        # until someone measures further.  The win was measured with the
        # saved backward — the recompute backward LOST end-to-end (round-2
        # A/B), so megablock_bwd='recompute' (the escape hatch from the
        # saved kernels) falls back to the standard path entirely under
        # auto.  Real TPU only — the interpret-mode kernel is for parity
        # tests, not speed.  Both VMEM clamps must fit (the bwd check above
        # already cleared `saved`; fwd checked here).
        n, e = x.shape[1], x.shape[2]
        h = params["msha"]["qkv"].shape[1]
        dh = params["msha"]["qkv"].shape[-1]
        hidden = params["fc1"]["w"].shape[-1]
        fits = saved_fwd_group(1, _ceil_to(n, 8), _ceil_to(e, 128),
                               _ceil_to(hidden, 128),
                               _ceil_to(3 * h * dh, 128),
                               dropout=train and cfg.dropout > 0.0) >= 1
        # `saved` is required for TRAINING routes only (the recompute bwd
        # lost); at inference the plain forward carries the win by itself.
        if not (saved or not train) or not 128 <= n <= 1056 or not fits \
                or not on_tpu():
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
        if saved:
            return encoder_block_fused_dropout_saved(
                x, params, seed, float(cfg.dropout), cfg.num_heads, 1e-5,
                megablock_group(), not on_tpu())
        return encoder_block_fused_dropout(x, params, seed, float(cfg.dropout),
                                           cfg.num_heads, 1e-5,
                                           megablock_group(), not on_tpu())
    if saved:
        return encoder_block_fused_saved(x, params, cfg.num_heads, 1e-5,
                                         megablock_group(), not on_tpu())
    return encoder_block_fused(x, params, cfg.num_heads, 1e-5,
                               megablock_group(), not on_tpu())
