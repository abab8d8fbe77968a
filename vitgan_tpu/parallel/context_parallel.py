"""Context (sequence) parallel attention over a mesh axis.

The reference's sequences are tiny (SURVEY §5.7), but resolution scales tokens
quadratically — at 256px/patch-4 a single chip would hold 4k tokens of score
state per head.  This module shards the SEQUENCE axis over a mesh axis:

- q/k/v live sharded on N;
- each device all-gathers K/V over ICI (tiled all-gather, XLA collective) and
  runs the local attention (policy-routed: Pallas flash on TPU) on its N-shard
  of queries;
- the output stays N-sharded — no score matrix ever exceeds the shard size.

Two schedules:

- ``cp_attention`` — gather-based: all-gather K/V over ICI, local attention
  on the query shard.  K/V memory O(N·D) per device, one collective.
- ``ring_cp_attention`` — ring schedule: K/V blocks rotate around the mesh
  axis via ``ppermute`` (XLA collective-permute riding ICI) while each
  device folds one block per step into an online-softmax accumulator.
  K/V memory O(N/devices · D) per device; compute and communication
  overlap step-by-step.  Fully differentiable (ppermute transposes to the
  inverse ring; each block is rematerialized under jax.checkpoint so the
  backward never holds more than one block's scores).

Both match single-device attention exactly (tests/test_context_parallel.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def cp_attention(q, k, v, mesh: Mesh, axis: str = "model", score_mode: str = "dot",
                 scale: Optional[float] = None):
    """(B, H, N, D) q/k/v with N sharded over ``axis`` -> (B, H, N, D) sharded alike.

    N must be divisible by the axis size.  Works on any platform (the local
    attention goes through the same dispatch policy as single-device calls).
    """
    n = q.shape[-2]
    n_shards = mesh.shape[axis]
    if n % n_shards != 0:
        raise ValueError(f"sequence {n} not divisible by axis {axis}={n_shards}")
    scale_f = float(scale if scale is not None else q.shape[-1])
    spec = P(None, None, axis, None)

    @partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
             check_vma=False)
    def inner(ql, kl, vl):
        from vitgan_tpu.ops.attention import dispatch_attention

        kg = jax.lax.all_gather(kl, axis, axis=2, tiled=True)
        vg = jax.lax.all_gather(vl, axis, axis=2, tiled=True)
        return dispatch_attention(ql, kg, vg, score_mode, scale_f)

    return inner(q, k, v)


def ring_cp_attention(q, k, v, mesh: Mesh, axis: str = "model",
                      score_mode: str = "dot", scale: Optional[float] = None):
    """Ring-schedule context-parallel attention.

    (B, H, N, D) q/k/v with N sharded over ``axis`` -> output sharded alike.
    Each device keeps only its (N/P)-token K/V block resident; blocks rotate
    P-1 times around the ring (ppermute to the next device) and are folded
    into a numerically-stable online-softmax state (m, l, o) in float32 —
    the same streaming-softmax algebra as the flash kernel's block loop, so
    the result is exact, not an approximation.
    """
    n = q.shape[-2]
    p_size = mesh.shape[axis]
    if n % p_size != 0:
        raise ValueError(f"sequence {n} not divisible by axis {axis}={p_size}")
    scale_f = float(scale if scale is not None else q.shape[-1])
    spec = P(None, None, axis, None)
    perm = [(i, (i + 1) % p_size) for i in range(p_size)]

    @partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
             check_vma=False)
    def inner(ql, kl, vl):
        from vitgan_tpu.models.layers import attention_scores

        b, h, nq, d = ql.shape

        @jax.checkpoint
        def fold(ml, ll, ol, kc, vc):
            s = attention_scores(ql, kc, scale_f, score_mode).astype(jnp.float32)
            m_blk = s.max(-1)
            m_new = jnp.maximum(ml, m_blk)
            pr = jnp.exp(s - m_new[..., None])
            l_blk = pr.sum(-1)
            o_blk = jnp.einsum("bhnm,bhmd->bhnd", pr.astype(ql.dtype), vc,
                               preferred_element_type=jnp.float32)
            alpha = jnp.exp(ml - m_new)
            return (m_new, ll * alpha + l_blk, ol * alpha[..., None] + o_blk)

        m = jnp.full((b, h, nq), -jnp.inf, jnp.float32)
        l = jnp.zeros((b, h, nq), jnp.float32)
        o = jnp.zeros((b, h, nq, d), jnp.float32)
        kc, vc = kl, vl
        for step in range(p_size):
            m, l, o = fold(m, l, o, kc, vc)
            if step + 1 < p_size:
                kc = jax.lax.ppermute(kc, axis, perm)
                vc = jax.lax.ppermute(vc, axis, perm)
        return (o / jnp.maximum(l, 1e-30)[..., None]).astype(ql.dtype)

    return inner(q, k, v)


def shard_sequence(x, mesh: Mesh, axis: str = "model"):
    """Place (B, H, N, D) with N sharded over ``axis``."""
    return jax.device_put(x, NamedSharding(mesh, P(None, None, axis, None)))
