"""Parameter sharding rules: tensor parallelism over the mesh's ``model`` axis.

The reference is single-device; TP here is the framework's scale-out path for
wider models (SURVEY §2.5 table): attention heads and MLP hidden width are
sharded over ``model`` while the batch shards over ``data``.  No hand-written
collectives — parameters are placed with NamedShardings and XLA's SPMD
partitioner inserts the all-reduces (row-sharded matmul outputs) over ICI.

Rules (matched by parameter path):
- ``qkv``   (3, H, D, Dh): heads H sharded -> per-device head groups
- ``qkv_b`` (3, H, Dh):    heads sharded
- attention ``out`` w (H*Dh, D): input rows sharded (contraction all-reduce)
- ``fc1`` w (D, hidden) / b: hidden columns sharded
- ``fc2`` w (hidden, D): hidden rows sharded (contraction all-reduce)
Everything else is replicated.  ISR spectral state follows its qkv: sigma0/u
are per-head, so they shard on the head axis with the weights.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple, leaf) -> P:
    names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
    ndim = getattr(leaf, "ndim", 0)
    joined = "/".join(names)
    if names and names[-1] == "qkv" and ndim == 4:
        return P(None, "model", None, None)
    if names and names[-1] == "qkv_b" and ndim == 3:
        return P(None, "model", None)
    if "isr" in names and names[-1] in ("sigma0", "u"):
        # (3, H) or (3, H, D): shard the head axis with the qkv weights.
        return P(None, "model") if ndim == 2 else P(None, "model", None)
    if len(names) >= 2 and names[-2] == "out" and names[-1] == "w" and ndim == 2:
        return P("model", None)
    if len(names) >= 2 and names[-2] == "fc1" and ndim == 2:
        return P(None, "model")
    if len(names) >= 2 and names[-2] == "fc1" and names[-1] == "b" and ndim == 1:
        return P("model")
    if len(names) >= 2 and names[-2] == "fc2" and names[-1] == "w" and ndim == 2:
        return P("model", None)
    return P()


def _divisible(leaf, spec: P, mesh: Mesh) -> bool:
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        if leaf.shape[dim] % mesh.shape[axis] != 0:
            return False
    return True


def tp_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for ``tree`` under the TP rules (replicated where a
    rule's axis does not divide the dimension)."""

    def one(path, leaf):
        spec = _spec_for(path, leaf)
        if spec != P() and not _divisible(leaf, spec, mesh):
            spec = P()
        return NamedSharding(mesh, spec)

    flat = jax.tree_util.tree_flatten_with_path(tree)
    leaves = [one(p, v) for p, v in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def shard_params_tp(tree: Any, mesh: Mesh) -> Any:
    """Place a parameter pytree with TP shardings over the mesh."""
    return jax.tree.map(jax.device_put, tree, tp_shardings(tree, mesh))


def _fsdp_extend(leaf, spec: P, mesh: Mesh, data_axis: str, min_size: int) -> P:
    """Add ``data``-axis sharding to a leaf's spec (ZeRO / fully-sharded DP):
    the largest still-unsharded dim divisible by the data-axis size takes it.
    Tiny leaves (< min_size elements) and scalars stay as they are — sharding
    them costs more collective latency than the bytes saved."""
    n = mesh.shape.get(data_axis, 1)
    ndim = getattr(leaf, "ndim", 0)
    if n <= 1 or ndim == 0 or leaf.size < min_size:
        return spec
    dims = list(spec) + [None] * (ndim - len(spec))
    for i in sorted(range(ndim), key=lambda i: -leaf.shape[i]):
        if dims[i] is None and leaf.shape[i] % n == 0:
            dims[i] = data_axis
            return P(*dims)
    return spec


def _placement_shardings(tree: Any, mesh: Mesh, tensor_parallel: bool,
                         fsdp_axis: Optional[str], min_size: int) -> Any:
    """One rule set for every placement path: TP spec (when enabled and
    divisible) optionally extended with FSDP data-axis sharding."""

    def one(path, leaf):
        spec = _spec_for(path, leaf) if tensor_parallel else P()
        if spec != P() and not _divisible(leaf, spec, mesh):
            spec = P()
        if fsdp_axis:
            spec = _fsdp_extend(leaf, spec, mesh, fsdp_axis, min_size)
        return NamedSharding(mesh, spec)

    flat = jax.tree_util.tree_flatten_with_path(tree)
    leaves = [one(p, v) for p, v in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def fsdp_shardings(tree: Any, mesh: Mesh, tensor_parallel: bool = False,
                   data_axis: str = "data", min_size: int = 2048) -> Any:
    """NamedSharding pytree for fully-sharded DP, composed with the TP rules
    (TP claims the head/width axes first; FSDP takes the largest free dim)."""
    return _placement_shardings(tree, mesh, tensor_parallel, data_axis, min_size)


def shard_train_state(state, mesh: Mesh, tensor_parallel: bool = False,
                      fsdp: bool = False, fsdp_min_size: int = 2048,
                      data_axis: str = "data"):
    """Place a TrainState: batch-independent leaves replicated, TP-sharded,
    and/or FSDP-sharded over the data axis (parameters AND optimizer moments —
    optax states are pytrees with the same leaf shapes, so one rule set
    places everything).
    """
    use_tp = tensor_parallel and mesh.shape.get("model", 1) > 1
    if fsdp and mesh.shape.get(data_axis, 1) > 1:
        return jax.tree.map(
            jax.device_put, state,
            _placement_shardings(state, mesh, use_tp, data_axis,
                                 fsdp_min_size))
    if not use_tp:
        repl = NamedSharding(mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, repl), state)
    return jax.tree.map(jax.device_put, state, tp_shardings(state, mesh))
