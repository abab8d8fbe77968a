"""Context (sequence) parallel attention over a mesh axis.

The reference's sequences are tiny (SURVEY §5.7), but resolution scales tokens
quadratically — at 256px/patch-4 a single chip would hold 4k tokens of score
state per head.  This module shards the SEQUENCE axis over a mesh axis:

- q/k/v live sharded on N;
- each device all-gathers K/V over ICI (tiled all-gather, XLA collective) and
  runs the local attention (policy-routed: Pallas flash on TPU) on its N-shard
  of queries;
- the output stays N-sharded — no score matrix ever exceeds the shard size.

This is the gather-based CP scheme (memory O(N·D) for K/V, compute perfectly
balanced); the flash kernel's block structure also permits a future ring
schedule (pallas_guide ring-collective pattern) without changing callers.
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


def shard_sequence(x, mesh: Mesh, axis: str = "model"):
    """Place (B, H, N, D) with N sharded over ``axis``."""
    return jax.device_put(x, NamedSharding(mesh, P(None, None, axis, None)))
