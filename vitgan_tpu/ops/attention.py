"""Pallas TPU flash attention with dot-product and L2-distance score modes.

The reference's attention hot loop is torch einsum/cdist + softmax
(ref:src/v1/attention.py:50-70, ref:src/v2/modules.py:140-152), materializing
the full (N, N) score matrix in HBM.  This kernel is the TPU-native
reformulation: blockwise online-softmax attention (flash style) that tiles the
sequence so scores live only in VMEM, with three score modes:

- ``dot``   : softmax(q k^T / sqrt(scale)) v
- ``l2``    : softmax(-||q-k||^2 / sqrt(scale)) v — ViTGAN-paper L2 attention,
              distances expressed as |q|^2+|k|^2-2qk so the MXU does the bulk
- ``l2ref`` : softmax(+||q-k|| / sqrt(scale)) v — bit-faithful reference quirk

At CIFAR scale (<=65 tokens) XLA's fused attention is already near optimal;
this kernel is the scaling path for the 64-256px configs (BASELINE configs
#4-#5, ~1k-4k tokens) where the O(N^2) score matrix stops fitting on chip.
``use_pallas_attention`` gates on platform + sequence length accordingly.

Backward: Pallas dq and dk/dv kernels driven by the forward's saved
log-sum-exp for the 'dot' and 'l2' modes (measured ~25% faster than XLA's
chunked recompute at 4k tokens); 'l2ref' falls back to ``attention_chunked``,
a jax.checkpoint-per-q-chunk recompute with O(N*chunk) memory.  Above an 8MB
K/V VMEM budget the forward streams K/V tiles from HBM with double-buffered
DMA.  Nothing ever materializes (N, N) in HBM.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _scores_block(q, qq, k_blk, score_mode: str, inv_scale: float):
    """Pre-softmax scores for one (Bq, Bk) tile.

    Matmul operands stay in the INPUT dtype (bf16 feeds the MXU at full rate)
    with float32 accumulation; all softmax-side math is float32.
    """
    qk = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
    if score_mode == "dot":
        return qk * inv_scale
    kk = jnp.sum(k_blk.astype(jnp.float32) ** 2, axis=-1)[None, :]
    d2 = jnp.maximum(qq + kk - 2.0 * qk, 0.0)
    return (-d2 * inv_scale) if score_mode == "l2" else (jnp.sqrt(d2 + 1e-12) * inv_scale)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, score_mode: str,
                  inv_scale: float, block_k: int, seq_len: int):
    """One (batch*head, q-block) program: online softmax over k blocks.

    Also writes the per-row log-sum-exp so the backward kernels can recompute
    the probabilities without a second softmax pass.
    """
    q = q_ref[0]                                # (Bq, D), input dtype
    block_q, d = q.shape
    n_padded = k_ref.shape[1]
    num_kb = n_padded // block_k
    in_dtype = q.dtype

    qq = (jnp.sum(q.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
          if score_mode in ("l2", "l2ref") else None)

    def body(kb, carry):
        acc, m_i, l_i = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = _scores_block(q, qq, k_blk, score_mode, inv_scale)
        if seq_len < n_padded:  # static: no padded keys -> no mask work at all
            key_ids = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(key_ids < seq_len, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(in_dtype), v_blk,
                                    preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m_i = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((block_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc, m_i, l_i))
    o_ref[0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)
    # Row vectors live sublane-replicated as (8, block) tiles — Mosaic requires
    # the trailing block dims to be (8k, 128k)-aligned.
    lse_row = (m_i + jnp.log(jnp.maximum(l_i, 1e-30)))[:, 0]
    lse_ref[0] = jnp.broadcast_to(lse_row[None, :], (8, lse_row.shape[0]))


def _flash_kernel_dma(q_ref, k_hbm, v_hbm, o_ref, lse_ref, k_buf, v_buf, k_sem, v_sem,
                      *, score_mode: str, inv_scale: float, block_k: int, seq_len: int,
                      n_pad: int):
    """Flash forward with K/V resident in HBM, double-buffered DMA per k-block.

    Used when K/V no longer fit comfortably in VMEM (very long sequences): each
    (batch*head, q-block) program streams K/V tiles into two VMEM slots,
    prefetching block kb+1 while computing block kb.
    """
    bh = pl.program_id(0)
    q = q_ref[0]
    block_q, d = q.shape
    num_kb = n_pad // block_k
    in_dtype = q.dtype

    def k_dma(slot, kb):
        return pltpu.make_async_copy(
            k_hbm.at[bh, pl.ds(kb * block_k, block_k), :], k_buf.at[slot], k_sem.at[slot])

    def v_dma(slot, kb):
        return pltpu.make_async_copy(
            v_hbm.at[bh, pl.ds(kb * block_k, block_k), :], v_buf.at[slot], v_sem.at[slot])

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    qq = (jnp.sum(q.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
          if score_mode in ("l2", "l2ref") else None)

    def body(kb, carry):
        acc, m_i, l_i = carry
        slot = kb % 2
        nxt = (kb + 1) % 2

        @pl.when(kb + 1 < num_kb)
        def _():
            k_dma(nxt, kb + 1).start()
            v_dma(nxt, kb + 1).start()

        k_dma(slot, kb).wait()
        v_dma(slot, kb).wait()
        k_blk = k_buf[slot]
        v_blk = v_buf[slot]
        s = _scores_block(q, qq, k_blk, score_mode, inv_scale)
        if seq_len < n_pad:  # static: skip mask when nothing is padded
            key_ids = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(key_ids < seq_len, s, NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(in_dtype), v_blk,
                                    preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m_i = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((block_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc, m_i, l_i))
    o_ref[0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)
    lse_row = (m_i + jnp.log(jnp.maximum(l_i, 1e-30)))[:, 0]
    lse_ref[0] = jnp.broadcast_to(lse_row[None, :], (8, lse_row.shape[0]))


def _flash_forward_dma(qp, kp, vp, b, h, n, n_pad, d_pad, score_mode, inv_scale,
                       block_q, block_k, interpret, dtype):
    grid = (b * h, n_pad // block_q)
    kernel = functools.partial(
        _flash_kernel_dma, score_mode=score_mode, inv_scale=inv_scale,
        block_k=block_k, seq_len=n, n_pad=n_pad,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n_pad, d_pad), dtype),
            jax.ShapeDtypeStruct((b * h, 8, n_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # K stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # V stays in HBM
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda bh, qi: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_k, d_pad), dtype),
            pltpu.VMEM((2, block_k, d_pad), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(qp, kp, vp)


# K/V VMEM budget above which the forward streams them from HBM instead.
_KV_VMEM_BUDGET_BYTES = 8 * 1024 * 1024

# Whole-sequence block threshold (tokens, after 128-rounding): below this the
# default block is the entire padded sequence — the f32 score tile (n_ceil^2,
# 5.3 MB at 1152) plus q/k/v/out must fit the ~16 MB VMEM alongside the bwd
# kernel's accumulators.  1152 is validated on v5e for BOTH score modes
# (scripts/bench_flash_blocks.py, /tmp probes r3); the l2 backward at 1280+
# failed to compile (VMEM pressure from its extra |k|^2 / distance tiles), so
# the cap stays at the largest production-validated size.
_WHOLE_SEQ_MAX = 1152


def _pad_qkv(q, k, v, block_q: int, block_k: int):
    b, h, n, d = q.shape
    d_pad = _ceil_to(d, 128)
    n_pad = _ceil_to(n, max(block_q, block_k))
    pad_spec = ((0, 0), (0, 0), (0, n_pad - n), (0, d_pad - d))
    qp = jnp.pad(q, pad_spec).reshape(b * h, n_pad, d_pad)
    kp = jnp.pad(k, pad_spec).reshape(b * h, n_pad, d_pad)
    vp = jnp.pad(v, pad_spec).reshape(b * h, n_pad, d_pad)
    return qp, kp, vp, n_pad, d_pad


def _flash_forward(q, k, v, score_mode: str, scale: float, block_q: int, block_k: int,
                   interpret: bool, with_lse: bool = False):
    b, h, n, d = q.shape
    inv_scale = 1.0 / math.sqrt(scale)
    qp, kp, vp, n_pad, d_pad = _pad_qkv(q, k, v, block_q, block_k)

    kv_bytes = 2 * n_pad * d_pad * q.dtype.itemsize
    if kv_bytes > _KV_VMEM_BUDGET_BYTES:
        out, lse = _flash_forward_dma(qp, kp, vp, b, h, n, n_pad, d_pad, score_mode,
                                      inv_scale, block_q, block_k, interpret, q.dtype)
        out = out.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]
        if with_lse:
            return out, lse[:, 0, :].reshape(b, h, n_pad)[:, :, :n]
        return out

    grid = (b * h, n_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, score_mode=score_mode, inv_scale=inv_scale,
        block_k=block_k, seq_len=n,
    )
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, 8, n_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d_pad), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d_pad), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda bh, qi: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    out = out.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]
    if with_lse:
        return out, lse[:, 0, :].reshape(b, h, n_pad)[:, :, :n]
    return out


# ---------------------------------------------------------------------------
# Flash backward kernels (dq; dk+dv) for 'dot' and 'l2' score modes
# ---------------------------------------------------------------------------
#
# Standard two-pass flash backward with saved log-sum-exp:
#   p_ij  = exp(s_ij - lse_i)
#   dp_ij = dO_i . v_j
#   ds_ij = p_ij (dp_ij - delta_i),   delta_i = dO_i . O_i
# score gradients:
#   dot: s = inv * q k^T          -> dq_i += inv * ds @ K;  dk_j += inv * ds^T @ Q
#   l2:  s = -inv * ||q - k||^2   -> dq_i += 2 inv (ds @ K - rowsum(ds) q_i)
#                                     dk_j += 2 inv (ds^T @ Q - colsum(ds) k_j)
# ('l2ref' keeps the chunked-recompute backward: its sqrt makes the chain rule
#  singular at d2=0 and it is a parity mode, not a performance path.)


def _dq_block_update(q, qq, do, lse, delta, k_blk, v_blk, kb, block_k, seq_len,
                     score_mode, inv_scale, carry, padded: bool = True):
    """Shared per-k-block dq math (used by the VMEM and the DMA-streaming kernels).

    ``padded`` is static — False skips the key mask entirely when the
    sequence fills its blocks exactly (the common production shapes)."""
    dq, ds_rowsum = carry
    in_dtype = q.dtype
    s = _scores_block(q, qq, k_blk, score_mode, inv_scale)
    if padded:
        key_ids = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_ids < seq_len, s, NEG_INF)
    p = jnp.exp(s - lse)
    dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq = dq + jnp.dot(ds.astype(in_dtype), k_blk, preferred_element_type=jnp.float32)
    return dq, ds_rowsum + jnp.sum(ds, axis=-1, keepdims=True)


def _dq_finalize(dq_ref, q, dq, ds_rowsum, score_mode, inv_scale):
    if score_mode == "dot":
        dq_ref[0] = (inv_scale * dq).astype(dq_ref.dtype)
    else:  # l2
        dq_ref[0] = (2.0 * inv_scale
                     * (dq - ds_rowsum * q.astype(jnp.float32))).astype(dq_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
                         score_mode: str, inv_scale: float, block_k: int, seq_len: int):
    q = q_ref[0]                              # (Bq, D), input dtype
    do = do_ref[0]                            # (Bq, D)
    lse = lse_ref[0, 0, :][:, None]           # sublane-replicated rows -> (Bq, 1)
    delta = delta_ref[0, 0, :][:, None]       # (Bq, 1)
    num_kb = k_ref.shape[1] // block_k
    qq = (jnp.sum(q.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
          if score_mode == "l2" else None)

    def body(kb, carry):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        return _dq_block_update(q, qq, do, lse, delta, k_blk, v_blk, kb, block_k,
                                seq_len, score_mode, inv_scale, carry,
                                padded=seq_len < k_ref.shape[1])

    dq0 = jnp.zeros(q.shape, jnp.float32)
    rs0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    dq, ds_rowsum = jax.lax.fori_loop(0, num_kb, body, (dq0, rs0))
    _dq_finalize(dq_ref, q, dq, ds_rowsum, score_mode, inv_scale)


def _flash_bwd_dq_kernel_dma(q_ref, k_hbm, v_hbm, do_ref, lse_ref, delta_ref, dq_ref,
                             k_buf, v_buf, k_sem, v_sem, *, score_mode: str,
                             inv_scale: float, block_k: int, seq_len: int, n_pad: int):
    """dq with K/V streamed from HBM (double-buffered), same math as above."""
    bh = pl.program_id(0)
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0, :][:, None]
    delta = delta_ref[0, 0, :][:, None]
    num_kb = n_pad // block_k
    qq = (jnp.sum(q.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
          if score_mode == "l2" else None)

    def k_dma(slot, kb):
        return pltpu.make_async_copy(
            k_hbm.at[bh, pl.ds(kb * block_k, block_k), :], k_buf.at[slot], k_sem.at[slot])

    def v_dma(slot, kb):
        return pltpu.make_async_copy(
            v_hbm.at[bh, pl.ds(kb * block_k, block_k), :], v_buf.at[slot], v_sem.at[slot])

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    def body(kb, carry):
        slot = kb % 2
        nxt = (kb + 1) % 2

        @pl.when(kb + 1 < num_kb)
        def _():
            k_dma(nxt, kb + 1).start()
            v_dma(nxt, kb + 1).start()

        k_dma(slot, kb).wait()
        v_dma(slot, kb).wait()
        return _dq_block_update(q, qq, do, lse, delta, k_buf[slot], v_buf[slot], kb,
                                block_k, seq_len, score_mode, inv_scale, carry,
                                padded=seq_len < n_pad)

    dq0 = jnp.zeros(q.shape, jnp.float32)
    rs0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    dq, ds_rowsum = jax.lax.fori_loop(0, num_kb, body, (dq0, rs0))
    _dq_finalize(dq_ref, q, dq, ds_rowsum, score_mode, inv_scale)


def _dkv_block_update(k_blk, kk, q, do, lse, delta, qb, ki, block_q, block_k,
                      seq_len, score_mode, inv_scale, v_blk, carry,
                      padded: bool = True):
    """Shared per-q-block dk/dv math (VMEM and DMA-streaming kernels).

    ``padded`` is static — False skips both the key and the q-row masks when
    the sequence fills its blocks exactly."""
    dk, dv, ds_colsum = carry
    in_dtype = k_blk.dtype
    qk = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
    if score_mode == "dot":
        s = qk * inv_scale
    else:
        qq = jnp.sum(q.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        s = -jnp.maximum(qq + kk - 2.0 * qk, 0.0) * inv_scale
    if padded:
        # GLOBAL key index of this k-block's columns (ki = the kernel's k-block
        # grid position): padded keys must be masked in every block, not just
        # the first — a local iota only masked block 0's tail.
        key_ids = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_ids < seq_len, s, NEG_INF)
        # Padded q rows have lse=0 from the fwd pad; mask their p to 0.
        row_ids = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        p = jnp.where(row_ids < seq_len, jnp.exp(s - lse), 0.0)
    else:
        p = jnp.exp(s - lse)
    dv = dv + jnp.dot(p.astype(in_dtype).T, do, preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk = dk + jnp.dot(ds.astype(in_dtype).T, q, preferred_element_type=jnp.float32)
    return dk, dv, ds_colsum + jnp.sum(ds, axis=0)[:, None]


def _dkv_finalize(dk_ref, dv_ref, k_blk, dk, dv, ds_colsum, score_mode, inv_scale):
    if score_mode == "dot":
        dk_ref[0] = (inv_scale * dk).astype(dk_ref.dtype)
    else:
        dk_ref[0] = (2.0 * inv_scale
                     * (dk - ds_colsum * k_blk.astype(jnp.float32))).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, score_mode: str, inv_scale: float,
                          block_q: int, block_k: int, seq_len: int):
    k_blk = k_ref[0]                          # (Bk, D), input dtype
    v_blk = v_ref[0]                          # (Bk, D)
    ki = pl.program_id(1)                     # this program's k-block position
    num_qb = q_ref.shape[1] // block_q
    kk = (jnp.sum(k_blk.astype(jnp.float32) ** 2, axis=-1)[None, :]
          if score_mode == "l2" else None)

    def body(qb, carry):
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, pl.ds(qb * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        return _dkv_block_update(k_blk, kk, q, do, lse, delta, qb, ki, block_q,
                                 block_k, seq_len, score_mode, inv_scale, v_blk,
                                 carry, padded=seq_len < q_ref.shape[1])

    z = jnp.zeros(k_blk.shape, jnp.float32)
    cs0 = jnp.zeros((k_blk.shape[0], 1), jnp.float32)
    dk, dv, ds_colsum = jax.lax.fori_loop(0, num_qb, body, (z, z, cs0))
    _dkv_finalize(dk_ref, dv_ref, k_blk, dk, dv, ds_colsum, score_mode, inv_scale)


def _flash_bwd_dkv_kernel_dma(q_hbm, k_ref, v_ref, do_hbm, lse_ref, delta_ref,
                              dk_ref, dv_ref, q_buf, do_buf, q_sem, do_sem, *,
                              score_mode: str, inv_scale: float, block_q: int,
                              block_k: int, seq_len: int, n_pad: int):
    """dk/dv with Q and dO streamed from HBM (double-buffered)."""
    bh = pl.program_id(0)
    k_blk = k_ref[0]
    v_blk = v_ref[0]
    ki = pl.program_id(1)
    num_qb = n_pad // block_q
    kk = (jnp.sum(k_blk.astype(jnp.float32) ** 2, axis=-1)[None, :]
          if score_mode == "l2" else None)

    def q_dma(slot, qb):
        return pltpu.make_async_copy(
            q_hbm.at[bh, pl.ds(qb * block_q, block_q), :], q_buf.at[slot], q_sem.at[slot])

    def do_dma(slot, qb):
        return pltpu.make_async_copy(
            do_hbm.at[bh, pl.ds(qb * block_q, block_q), :], do_buf.at[slot],
            do_sem.at[slot])

    q_dma(0, 0).start()
    do_dma(0, 0).start()

    def body(qb, carry):
        slot = qb % 2
        nxt = (qb + 1) % 2

        @pl.when(qb + 1 < num_qb)
        def _():
            q_dma(nxt, qb + 1).start()
            do_dma(nxt, qb + 1).start()

        q_dma(slot, qb).wait()
        do_dma(slot, qb).wait()
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        return _dkv_block_update(k_blk, kk, q_buf[slot], do_buf[slot], lse, delta,
                                 qb, ki, block_q, block_k, seq_len, score_mode,
                                 inv_scale, v_blk, carry, padded=seq_len < n_pad)

    z = jnp.zeros(k_blk.shape, jnp.float32)
    cs0 = jnp.zeros((k_blk.shape[0], 1), jnp.float32)
    dk, dv, ds_colsum = jax.lax.fori_loop(0, num_qb, body, (z, z, cs0))
    _dkv_finalize(dk_ref, dv_ref, k_blk, dk, dv, ds_colsum, score_mode, inv_scale)


def _flash_bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                            dq_ref, dk_ref, dv_ref, dq_acc, rs_acc, *,
                            score_mode: str, inv_scale: float, block_q: int,
                            block_k: int, seq_len: int):
    """Single-pass flash backward: dq, dk, dv in ONE sweep (5 matmuls/tile).

    The two-pass backward recomputes the score and dp matmuls in both the dq
    and the dk/dv kernels (7 block-matmuls total); this kernel computes them
    once.  Grid is (batch*heads, k-blocks) with the k index iterating fastest:
    each program owns one k-block's dk/dv and scatters its dq contributions
    into a full-sequence float32 VMEM accumulator, which persists across the
    sequential k-block visits (TPU grid programs run in order on one core)
    and is flushed to the dq output at the last k-block.  Q/dO blocks are
    VMEM-resident across visits (their index map ignores the k position), so
    nothing is refetched from HBM either.  VMEM-regime only — the streaming
    path keeps the two-pass kernels.
    """
    ki = pl.program_id(1)
    num_kb = pl.num_programs(1)
    k_blk = k_ref[0]                           # (Bk, D), input dtype
    v_blk = v_ref[0]
    n_pad = q_ref.shape[1]
    num_qb = n_pad // block_q
    in_dtype = k_blk.dtype
    padded = seq_len < n_pad

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros(dq_acc.shape, dq_acc.dtype)
        if score_mode == "l2":
            rs_acc[...] = jnp.zeros(rs_acc.shape, rs_acc.dtype)

    kk = (jnp.sum(k_blk.astype(jnp.float32) ** 2, axis=-1)[None, :]
          if score_mode == "l2" else None)

    def body(qb, carry):
        dk, dv, cs = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, pl.ds(qb * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        qk = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        if score_mode == "dot":
            s = qk * inv_scale
        else:
            qq = jnp.sum(q.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
            s = -jnp.maximum(qq + kk - 2.0 * qk, 0.0) * inv_scale
        if padded:
            key_ids = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(key_ids < seq_len, s, NEG_INF)
            row_ids = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            p = jnp.where(row_ids < seq_len, jnp.exp(s - lse), 0.0)
        else:
            p = jnp.exp(s - lse)
        dv = dv + jnp.dot(p.astype(in_dtype).T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jnp.dot(ds.astype(in_dtype).T, q, preferred_element_type=jnp.float32)
        cs = cs + jnp.sum(ds, axis=0)[:, None]
        # dq contribution of this (q-block, k-block) tile — accumulated across
        # the sequential k-block programs.
        sl = pl.ds(qb * block_q, block_q)
        dq_acc[sl, :] = dq_acc[sl, :] + jnp.dot(ds.astype(in_dtype), k_blk,
                                                preferred_element_type=jnp.float32)
        if score_mode == "l2":
            rs = jnp.sum(ds, axis=-1)
            rs_acc[:, sl] = rs_acc[:, sl] + jnp.broadcast_to(rs[None, :],
                                                             (8, block_q))
        return dk, dv, cs

    z = jnp.zeros(k_blk.shape, jnp.float32)
    cs0 = jnp.zeros((k_blk.shape[0], 1), jnp.float32)
    dk, dv, ds_colsum = jax.lax.fori_loop(0, num_qb, body, (z, z, cs0))
    _dkv_finalize(dk_ref, dv_ref, k_blk, dk, dv, ds_colsum, score_mode, inv_scale)

    @pl.when(ki == num_kb - 1)
    def _flush_dq():
        if score_mode == "dot":
            dq_ref[0] = (inv_scale * dq_acc[...]).astype(dq_ref.dtype)
        else:
            rs = rs_acc[0, :][:, None]
            dq_ref[0] = (2.0 * inv_scale
                         * (dq_acc[...] - rs * q_ref[0].astype(jnp.float32))
                         ).astype(dq_ref.dtype)


def _flash_backward_fused(qp, kp, vp, gp, lse_p, delta, bh, n_pad, d_pad,
                          score_mode, inv_scale, block_q, block_k, seq_len,
                          interpret, dtype):
    """pallas_call wrapper for the single-pass backward (VMEM regime)."""
    kernel = functools.partial(
        _flash_bwd_fused_kernel, score_mode=score_mode, inv_scale=inv_scale,
        block_q=block_q, block_k=block_k, seq_len=seq_len)
    full_q = pl.BlockSpec((1, n_pad, d_pad), lambda b, ki: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    full_row = pl.BlockSpec((1, 8, n_pad), lambda b, ki: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, d_pad), lambda b, ki: (b, ki, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bh, n_pad, d_pad), dtype),   # dq
            jax.ShapeDtypeStruct((bh, n_pad, d_pad), dtype),   # dk
            jax.ShapeDtypeStruct((bh, n_pad, d_pad), dtype),   # dv
        ),
        grid=(bh, n_pad // block_k),
        in_specs=[full_q, k_spec, k_spec, full_q, full_row, full_row],
        out_specs=(full_q, k_spec, k_spec),
        scratch_shapes=[
            pltpu.VMEM((n_pad, d_pad), jnp.float32),   # dq accumulator
            pltpu.VMEM((8, n_pad), jnp.float32),       # l2 ds-rowsum accumulator
        ],
        interpret=interpret,
    )(qp, kp, vp, gp, lse_p, delta)


# Above this K/V byte size the fused backward's full-sequence VMEM residency
# (q + dO + dq accumulator + score tiles) stops fitting; use the two-pass
# kernels (which also have DMA-streaming variants) instead.
_FUSED_BWD_KV_BUDGET_BYTES = 4 * 1024 * 1024
# Score-tile width: the fused kernel keeps 4 (block_q x block_k) f32 tiles
# live; 512 blocks keep that under 4MB where 1024 blocks would need 16MB.
_FUSED_BWD_MAX_BLOCK = 512


def _flash_backward(q, k, v, out, lse, g, score_mode: str, scale: float,
                    block_q: int, block_k: int, interpret: bool):
    b, h, n, d = q.shape
    inv_scale = 1.0 / math.sqrt(scale)
    qp, kp, vp, n_pad, d_pad = _pad_qkv(q, k, v, block_q, block_k)
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, n_pad - n), (0, d_pad - d))).reshape(
        b * h, n_pad, d_pad)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, n_pad - n))).reshape(b * h, 1, n_pad)
    delta = jnp.broadcast_to(delta, (b * h, 8, n_pad))
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, n_pad - n))).reshape(b * h, 1, n_pad)
    lse_p = jnp.broadcast_to(lse_p, (b * h, 8, n_pad))

    full_spec = pl.BlockSpec((1, n_pad, d_pad), lambda bh, i: (bh, 0, 0),
                             memory_space=pltpu.VMEM)
    full_row = pl.BlockSpec((1, 8, n_pad), lambda bh, i: (bh, 0, 0),
                            memory_space=pltpu.VMEM)
    kv_bytes = 2 * n_pad * d_pad * q.dtype.itemsize
    stream = kv_bytes > _KV_VMEM_BUDGET_BYTES

    from vitgan_tpu.ops.policy import bwd_fusion_mode

    fuse = bwd_fusion_mode()
    if fuse == "auto":
        # Measured on v5e (scripts/bench_bwd_fusion.py, transfer-free timing):
        # dot fused wins 1.14x at 1024x64 and 1.09x at 4096x96; l2 fused is
        # 0.98x (its extra VPU work erases the saved matmuls at the fused
        # kernel's 512-block clamp) -> auto fuses dot only, within budget.
        fuse = ("fused" if score_mode == "dot"
                and kv_bytes <= _FUSED_BWD_KV_BUDGET_BYTES else "two_pass")
    if fuse == "fused":
        fb_q = min(block_q, _FUSED_BWD_MAX_BLOCK)
        fb_k = min(block_k, _FUSED_BWD_MAX_BLOCK)
        if not stream and n_pad % fb_q == 0 and n_pad % fb_k == 0:
            dq, dk, dv = _flash_backward_fused(
                qp, kp, vp, gp, lse_p, delta, b * h, n_pad, d_pad, score_mode,
                inv_scale, fb_q, fb_k, n, interpret, q.dtype)
            unpad = lambda x: x.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]  # noqa: E731
            return unpad(dq), unpad(dk), unpad(dv)
        if bwd_fusion_mode() == "fused":
            # EXPLICITLY requested but inapplicable: say so, or an A/B at a
            # streaming-regime shape silently measures two_pass vs two_pass.
            import warnings

            warnings.warn(
                f"bwd_fusion='fused' requested but inapplicable at this shape "
                f"(n_pad={n_pad}, K/V bytes={kv_bytes}, streaming={stream}) — "
                f"falling back to the two-pass backward", stacklevel=2)

    q_blk_spec = pl.BlockSpec((1, block_q, d_pad), lambda bh, qi: (bh, qi, 0),
                              memory_space=pltpu.VMEM)
    row_blk_spec = pl.BlockSpec((1, 8, block_q), lambda bh, qi: (bh, 0, qi),
                                memory_space=pltpu.VMEM)
    if stream:
        dq_kernel = functools.partial(
            _flash_bwd_dq_kernel_dma, score_mode=score_mode, inv_scale=inv_scale,
            block_k=block_k, seq_len=n, n_pad=n_pad)
        dq_kv_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
        dq_scratch = [pltpu.VMEM((2, block_k, d_pad), q.dtype),
                      pltpu.VMEM((2, block_k, d_pad), q.dtype),
                      pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))]
    else:
        dq_kernel = functools.partial(
            _flash_bwd_dq_kernel, score_mode=score_mode, inv_scale=inv_scale,
            block_k=block_k, seq_len=n)
        dq_kv_specs = [full_spec, full_spec]
        dq_scratch = []

    dq = pl.pallas_call(
        dq_kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype),
        grid=(b * h, n_pad // block_q),
        in_specs=[q_blk_spec, *dq_kv_specs, q_blk_spec, row_blk_spec, row_blk_spec],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=dq_scratch,
        interpret=interpret,
    )(qp, kp, vp, gp, lse_p, delta)

    if stream:
        dkv_kernel = functools.partial(
            _flash_bwd_dkv_kernel_dma, score_mode=score_mode, inv_scale=inv_scale,
            block_q=block_q, block_k=block_k, seq_len=n, n_pad=n_pad)
        dkv_qdo_spec = pl.BlockSpec(memory_space=pl.ANY)
        dkv_scratch = [pltpu.VMEM((2, block_q, d_pad), q.dtype),
                       pltpu.VMEM((2, block_q, d_pad), q.dtype),
                       pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))]
    else:
        dkv_kernel = functools.partial(
            _flash_bwd_dkv_kernel, score_mode=score_mode, inv_scale=inv_scale,
            block_q=block_q, block_k=block_k, seq_len=n)
        dkv_qdo_spec = full_spec
        dkv_scratch = []

    dk, dv = pl.pallas_call(
        dkv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((b * h, n_pad, d_pad), v.dtype),
        ),
        grid=(b * h, n_pad // block_k),
        in_specs=[
            dkv_qdo_spec,
            pl.BlockSpec((1, block_k, d_pad), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            dkv_qdo_spec, full_row, full_row,
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d_pad), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=dkv_scratch,
        interpret=interpret,
    )(qp, kp, vp, gp, lse_p, delta)

    unpad = lambda x: x.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]  # noqa: E731
    return unpad(dq), unpad(dk), unpad(dv)


# ---------------------------------------------------------------------------
# Reference implementation (backward + parity tests)
# ---------------------------------------------------------------------------


def attention_reference(q, k, v, score_mode: str, scale: float):
    """Pure-jax.numpy attention, used as the VJP recompute path and in tests."""
    from vitgan_tpu.models.layers import attention_scores

    s = attention_scores(q, k, scale, score_mode)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v, preferred_element_type=q.dtype)


def attention_chunked(q, k, v, score_mode: str, scale: float, chunk: int = 256):
    """Memory-bounded attention: q processed in chunks, each under jax.checkpoint.

    Differentiating the naive form materializes the full (N, N) score matrix as
    a residual — ~3 GB at 4k tokens x batch 8 x 6 heads.  Here the backward
    recomputes each chunk's scores, so peak memory is O(N * chunk) regardless of
    sequence length.  Used as the VJP recompute path of ``flash_attention`` for
    long sequences and as the long-sequence fallback off TPU.
    """
    n = q.shape[-2]
    if n <= chunk:
        return attention_reference(q, k, v, score_mode, scale)
    pad = (-n) % chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    n_chunks = q.shape[-2] // chunk
    qs = q.reshape(*q.shape[:-2], n_chunks, chunk, q.shape[-1])
    qs = jnp.moveaxis(qs, -3, 0)  # (n_chunks, B, H, chunk, D)

    @jax.checkpoint
    def one(q_chunk):
        return attention_reference(q_chunk, k, v, score_mode, scale)

    out = jax.lax.map(one, qs)
    out = jnp.moveaxis(out, 0, -3).reshape(*q.shape[:-2], q.shape[-2], v.shape[-1])
    return out[..., :n, :]


# ---------------------------------------------------------------------------
# Public API with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_attention_vjp(q, k, v, score_mode: str, scale: Optional[float],
                         block_q: int, block_k: int, interpret: bool):
    scale = float(scale if scale is not None else q.shape[-1])
    return _flash_forward(q, k, v, score_mode, scale, block_q, block_k, interpret)


def flash_attention(q, k, v, score_mode: str = "dot", scale: Optional[float] = None,
                    block_q: Optional[int] = None, block_k: Optional[int] = None,
                    interpret: bool = False):
    """(B, H, N, D) q/k/v -> (B, H, N, D) attention output.

    Block defaults are sequence-adaptive, from the v5e sweeps
    (scripts/tune_attention.py, scripts/bench_flash_blocks.py):

    - n_ceil <= _WHOLE_SEQ_MAX: **whole-sequence blocks** (block = the
      128-rounded sequence).  One q block and one k iteration per (b, h):
      a single MXU-wide score matmul in VMEM, and the HBM pad shrinks to
      the 128-lane minimum.  Decisive at the ragged production shapes —
      hires128_D (N=1025, CLS token breaks 512-divisibility) measured
      fwd 2537 us / fwd+grad 6040 us at block 1152 vs 3913 / 8707 at the
      old 512-block default (pad 1536): **1.44x**, and it also beats XLA
      reference and chunked attention at that shape.  Step-level hires128:
      49.4 -> 59.0 img/s (1.19x).
    - above that (scores would outgrow VMEM): 512-blocks, and 1024 at
      >=4k tokens (4k: 1024-blocks 3.92 ms fwd vs 5.37 ms for 512, 1.37x).
    """
    block_q, block_k = default_blocks(q.shape[-2], block_q, block_k)
    return _flash_attention_vjp(q, k, v, score_mode, scale,
                                block_q, block_k, interpret)


def default_blocks(n: int, block_q: Optional[int] = None,
                   block_k: Optional[int] = None) -> tuple:
    """Resolve the (block_q, block_k) actually used for an N-token sequence
    (the sequence-adaptive policy documented on ``flash_attention``)."""
    n_ceil = _ceil_to(n, 128)
    if block_q is None and block_k is None and n_ceil <= _WHOLE_SEQ_MAX:
        return n_ceil, n_ceil
    default = 1024 if n >= 4096 else 512
    return min(block_q or default, n_ceil), min(block_k or default, n_ceil)


def _fwd(q, k, v, score_mode, scale, block_q, block_k, interpret):
    scale_f = float(scale if scale is not None else q.shape[-1])
    out, lse = _flash_forward(q, k, v, score_mode, scale_f, block_q, block_k,
                              interpret, with_lse=True)
    # Named so remat='attn' can SAVE the kernel's residuals: without these a
    # checkpointed block must re-run the flash kernel in its backward just to
    # rebuild (out, lse) — q/k/v are qkv-matmul outputs, already saveable
    # under the dots policy.
    from jax.ad_checkpoint import checkpoint_name

    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


def _bwd(score_mode, scale, block_q, block_k, interpret, residuals, g):
    q, k, v, out, lse = residuals
    scale_f = float(scale if scale is not None else q.shape[-1])
    if score_mode in ("dot", "l2"):
        return _flash_backward(q, k, v, out, lse, g, score_mode, scale_f,
                               block_q, block_k, interpret)
    # 'l2ref' (sqrt-distance quirk mode): chunked-recompute backward.
    _, vjp = jax.vjp(lambda q, k, v: attention_chunked(q, k, v, score_mode, scale_f),
                     q, k, v)
    return vjp(g)


_flash_attention_vjp.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Dispatch policy
# ---------------------------------------------------------------------------

from vitgan_tpu.ops.policy import _POLICY, on_tpu as _on_tpu  # noqa: E402


def set_attention_policy(mode: str, min_seq_len: int = 256) -> None:
    """Back-compat alias for ops.policy.set_policy."""
    from vitgan_tpu.ops.policy import set_policy

    set_policy(mode=mode, min_seq_len=min_seq_len)


def use_pallas_attention(policy: Optional[str] = None, seq_len: int = 0,
                         min_seq_len: Optional[int] = None) -> bool:
    """'auto' enables the kernel on TPU once sequences outgrow XLA's comfort zone;
    'always'/'never' force.  Measured on v5e (B=8,H=4,D=96): pallas wins at
    N=4096 (~1.2x) and ties/wins at N<=65; XLA wins in between — the 256
    threshold keeps 'auto' conservative for the mid range."""
    from vitgan_tpu.ops.policy import sequence_parallel_active

    if sequence_parallel_active():
        # GSPMD cannot partition a pallas_call: under sequence parallelism the
        # kernel would force a full re-replication of the sharded activations.
        # XLA attention partitions cleanly from the token-axis constraint.
        return False
    policy = policy or _POLICY["mode"]
    min_seq_len = min_seq_len if min_seq_len is not None else _POLICY["min_seq_len"]
    if policy == "never":
        return False
    if policy == "always":
        return True
    return _on_tpu() and seq_len >= min_seq_len


def dispatch_attention(q, k, v, score_mode: str, scale: float):
    """Policy-routed attention: Pallas flash kernel or the pure-XLA reference.

    On non-TPU platforms a forced 'always' runs the kernel in interpreter mode
    (correctness testing); 'auto' stays on the XLA path there.

    Cross-attention shapes (nq != nk, e.g. gather-based context parallelism's
    local-q x global-k call) take the XLA path: the flash kernel's pad/block
    layout assumes self-attention lengths.
    """
    if q.shape[-2] == k.shape[-2] and use_pallas_attention(seq_len=q.shape[-2]):
        return flash_attention(q, k, v, score_mode, scale, interpret=not _on_tpu())
    if max(q.shape[-2], k.shape[-2]) > 1024:  # long-seq fallback: bound memory
        return attention_chunked(q, k, v, score_mode, scale)
    return attention_reference(q, k, v, score_mode, scale)
