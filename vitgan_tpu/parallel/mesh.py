"""Device mesh construction and sharding rules.

The reference is single-device (SURVEY §2.5): device selection only
(ref:src/v2/training.py:143, ref:main-v1.py:13-17).  Here parallelism is
first-class: a ``jax.sharding.Mesh`` with a ``data`` axis (DP) and a reserved
``model`` axis (TP), gradient all-reduce emitted by XLA from sharding
constraints — collectives ride ICI, no hand-written comm code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitgan_tpu.config import MeshConfig


def initialize_distributed() -> None:
    """Multi-host bootstrap.  No-op on a single process.

    The reference has no distributed backend at all (SURVEY §2.5); this is the
    TPU-native equivalent of what NCCL/MPI init would be elsewhere.
    """
    import os

    if "COORDINATOR_ADDRESS" not in os.environ:
        return
    # On TPU pods initialize() auto-detects topology; non-TPU backends (the
    # CPU-backend multi-process smoke, scripts/multiproc_smoke.py) cannot, so
    # NUM_PROCESSES/PROCESS_ID are honored when set.
    kwargs = {"coordinator_address": os.environ["COORDINATOR_ADDRESS"]}
    if "NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["NUM_PROCESSES"])
    if "PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(os.environ["PROCESS_ID"])
    # ORDER MATTERS: jax.distributed.initialize() must run before anything
    # that initializes the XLA backends — including jax.process_count(), so
    # no "already initialized?" probe is possible here.  If the launcher
    # already initialized, initialize() raises and we keep its state; any
    # other failure is LOUD (a host silently training as an isolated
    # single-process world is the worst failure mode).
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "must be called before" in str(e) or "already" in str(e).lower():
            return  # launcher (or a prior call) initialized first — fine
        raise


def make_mesh(
    cfg: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over all devices.

    ``model_parallel`` devices go on the model axis; the rest are data-parallel.
    With one device this degenerates to a 1x1 mesh, so every code path is
    mesh-aware without special-casing single-chip runs.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    pp = max(1, getattr(cfg, "pipeline_parallel", 1))
    sp = max(1, getattr(cfg, "context_parallel", 1))
    if sp > 1 and pp > 1:
        raise ValueError(
            "context_parallel does not compose with pipeline_parallel: the "
            "pipeline shard_map owns the block stack the sequence sharding "
            "would constrain (pick one)")
    if n % (mp * pp * sp) != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={mp} x "
            f"pipeline_parallel={pp} x context_parallel={sp}")
    if sp > 1:
        arr = np.array(devices).reshape(n // (mp * sp), mp, sp)
        return Mesh(arr, axis_names=(cfg.data_axis, cfg.model_axis,
                                     getattr(cfg, "seq_axis", "seq")))
    if pp > 1:
        arr = np.array(devices).reshape(n // (mp * pp), mp, pp)
        return Mesh(arr, axis_names=(cfg.data_axis, cfg.model_axis, cfg.pipe_axis))
    arr = np.array(devices).reshape(n // mp, mp)
    return Mesh(arr, axis_names=(cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest.
    Scalar (0-d) leaves have no batch axis and are replicated."""
    if ndim == 0:
        return replicated_sharding(mesh)
    data_axis = mesh.axis_names[0]
    return NamedSharding(mesh, P(data_axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host array onto the mesh with the batch axis sharded over data."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, ndim=x.ndim)), batch
    )


def shard_pytree_replicated(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def local_batch_size(global_batch: int, mesh: Mesh,
                     process_count: Optional[int] = None) -> int:
    """Per-host slice of the global batch for multi-host data loading.

    Hosts take equal contiguous slices (data/pipeline.py epoch slicing), so
    the global batch must divide by BOTH the data-axis size (sharding) and
    the process count (loading) — the two checks are distinct because a host
    can drive several mesh devices.
    """
    n_data = mesh.shape[mesh.axis_names[0]]
    pc = process_count if process_count is not None else jax.process_count()
    if global_batch % n_data != 0:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {n_data}")
    if global_batch % pc != 0:
        raise ValueError(f"global batch {global_batch} not divisible by process count {pc}")
    return global_batch // pc
