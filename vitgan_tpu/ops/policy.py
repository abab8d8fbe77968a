"""Process-wide compute-path policy, set once from RuntimeConfig before tracing.

Consulted at trace time (all decisions are static under jit):
- ``mode``:        'auto' | 'always' | 'never' — Pallas kernel routing
- ``min_seq_len``: sequence threshold for the flash-attention kernel in 'auto'
- ``min_mlp_rows``: row threshold for the fused LN+MLP kernel in 'auto'
- ``remat``:       rematerialize transformer blocks (jax.checkpoint) to trade
                   FLOPs for HBM at high resolution (BASELINE config #5)
"""

from __future__ import annotations

import jax

_POLICY = {"mode": "auto", "min_seq_len": 256, "min_mlp_rows": 2048, "remat": "never",
           "head_pad": "auto", "bwd_fusion": "auto", "megablock": "auto",
           "megablock_group": 8, "megablock_bwd": "saved"}


def set_policy(mode: str | None = None, min_seq_len: int | None = None,
               min_mlp_rows: int | None = None, remat=None,
               head_pad: str | None = None, bwd_fusion: str | None = None,
               megablock: str | None = None,
               megablock_group: int | None = None,
               megablock_bwd: str | None = None) -> None:
    if mode is not None:
        assert mode in ("auto", "always", "never"), mode
        _POLICY["mode"] = mode
    if min_seq_len is not None:
        _POLICY["min_seq_len"] = min_seq_len
    if min_mlp_rows is not None:
        _POLICY["min_mlp_rows"] = min_mlp_rows
    if remat is not None:
        if isinstance(remat, bool):  # config back-compat: True == full
            remat = "full" if remat else "never"
        assert remat in ("never", "full", "dots", "attn"), remat
        _POLICY["remat"] = remat
    if head_pad is not None:
        assert head_pad in ("auto", "always", "never"), head_pad
        _POLICY["head_pad"] = head_pad
    if bwd_fusion is not None:
        assert bwd_fusion in ("auto", "fused", "two_pass"), bwd_fusion
        _POLICY["bwd_fusion"] = bwd_fusion
    if megablock is not None:
        assert megablock in ("off", "on", "auto"), megablock
        _POLICY["megablock"] = megablock
    if megablock_group is not None:
        _POLICY["megablock_group"] = int(megablock_group)
    if megablock_bwd is not None:
        assert megablock_bwd in ("saved", "recompute"), megablock_bwd
        _POLICY["megablock_bwd"] = megablock_bwd


def megablock_mode() -> str:
    """'on' routes v2 encoder blocks through the single-kernel megablock
    (ops/fused_block.py) everywhere it lowers; 'auto' routes only in the
    measured-win regime (>=128 tokens with the saved-residual backward, on
    real TPU — see ops/fused_block.maybe_megablock for the exact gate and
    MEGABLOCK_r03.json for the numbers); 'off' never.  ``mode='never'`` is
    the global Pallas kill switch and wins over this knob, as does sequence
    parallelism (GSPMD cannot partition a custom call)."""
    if _POLICY["mode"] == "never" or sequence_parallel_active():
        return "off"
    return _POLICY["megablock"]


def megablock_enabled() -> bool:
    return megablock_mode() != "off"


# --- sequence (context) parallelism ----------------------------------------
# Set by the trainer when mesh.context_parallel > 1: activations' token axis
# is pinned over the mesh's seq axis and GSPMD inserts the attention K/V
# all-gathers.  Process-global like the rest of the policy (consulted at
# trace time inside the model functions, which have no mesh handle).

_SP = {"mesh": None, "data_axis": None, "seq_axis": None}


def set_sequence_parallel(mesh=None, data_axis: str | None = None,
                          seq_axis: str | None = None) -> None:
    """Enable GSPMD sequence parallelism over ``mesh``'s ``seq_axis`` (token
    axis of every (B, N, E) encoder activation; batch stays on ``data_axis``).
    ``set_sequence_parallel(None)`` clears it.  While active, Pallas kernel
    routing is disabled (GSPMD cannot partition custom calls) — the manual
    ring schedule in parallel/context_parallel.py is the shard_map
    alternative when kernel fusion under SP matters."""
    if mesh is None:
        _SP["mesh"] = _SP["data_axis"] = _SP["seq_axis"] = None
        return
    if seq_axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {seq_axis!r} (axes: {mesh.axis_names})")
    _SP["mesh"], _SP["data_axis"], _SP["seq_axis"] = mesh, data_axis, seq_axis


def sequence_parallel_active() -> bool:
    return _SP["mesh"] is not None


def sequence_constraint(x):
    """Pin a (B, N, E) activation's token axis over the SP mesh axis.

    No-op when SP is off or ``x`` is not rank-3.  Uneven token counts (the
    v2 discriminator's N+1 CLS sequence) are fine: GSPMD pads the last shard
    internally, semantics are exact."""
    if _SP["mesh"] is None or getattr(x, "ndim", 0) != 3:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_SP["mesh"], P(_SP["data_axis"], _SP["seq_axis"], None)))


def megablock_group() -> int:
    """Samples per megablock grid step (VMEM working-set knob; the A/B
    harness sweeps 4/8/16 per shape)."""
    return _POLICY["megablock_group"]


def megablock_bwd_mode() -> str:
    """'saved' = single-kernel saved-residual backward (forward emits
    x1/z1/ao/LSE, backward never re-runs a forward matmul — the fix for the
    round-2 recompute backward that erased the megablock's 1.27-1.87x
    deit64 forward win), 'recompute' = exact XLA recompute backward."""
    return _POLICY["megablock_bwd"]


def bwd_fusion_mode() -> str:
    """Flash-backward kernel choice: 'fused' = single-pass dq+dk+dv (5 block
    matmuls, full-sequence VMEM residency), 'two_pass' = separate dq and
    dk/dv kernels (7 block matmuls, has DMA-streaming variants), 'auto' =
    fused within its VMEM budget (attention._FUSED_BWD_KV_BUDGET_BYTES)."""
    return _POLICY["bwd_fusion"]


def head_pad_amount(head_dim: int) -> int:
    """Zero-pad per-head width up to the TPU lane width (128).

    Padding with zeros is mathematically exact for dot AND L2 scores (zero
    dims contribute nothing to q.k or |q-k|^2) and for the output projection
    (zero rows).  Measured A/B on the v5e chip (scripts/bench_head_pad.py,
    scanned production step, host-readback timing): v1's 108-wide heads
    0.99x, deit64's 64-wide heads 0.96x — XLA/Mosaic already tiles
    partially-filled lanes well, and explicit padding only adds FLOPs and
    HBM traffic.  'auto' therefore never pads; 'always' remains for
    experimentation on future chips/shapes.
    """
    mode = _POLICY["head_pad"]
    pad = (-head_dim) % 128
    if mode == "always":
        return pad
    return 0


def get_policy() -> dict:
    return dict(_POLICY)


def remat_enabled() -> bool:
    return _POLICY["remat"] != "never"


def remat_mode() -> str:
    """'never' | 'full' | 'dots' | 'attn'.

    - full: jax.checkpoint the whole transformer block — O(1) block
      activations live at once, backward recomputes everything.
    - dots: jax.checkpoint with dots_with_no_batch_dims_saveable — matmul
      (MXU) outputs are saved, only elementwise/VPU work is recomputed;
      a middle point between memory and recompute FLOPs.
    - attn: 'dots' plus the NAMED flash-attention outputs (custom calls are
      not dots, so 'dots' re-runs the Pallas kernel in every rematted
      backward — measured as the largest block of hires128 step time).
    """
    return _POLICY["remat"]


def on_tpu() -> bool:
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False


def apply_from_runtime(runtime_cfg) -> None:
    """Configure from a RuntimeConfig (vitgan_tpu.config.RuntimeConfig)."""
    set_policy(mode=runtime_cfg.use_pallas, remat=runtime_cfg.remat,
               head_pad=getattr(runtime_cfg, "head_pad", None),
               bwd_fusion=getattr(runtime_cfg, "bwd_fusion", None),
               megablock=getattr(runtime_cfg, "megablock", None),
               megablock_group=getattr(runtime_cfg, "megablock_group", None),
               megablock_bwd=getattr(runtime_cfg, "megablock_bwd", None))
    impl = getattr(runtime_cfg, "prng_impl", None)
    if impl:
        jax.config.update("jax_default_prng_impl", impl)
    enable_persistent_compilation_cache()


def enable_persistent_compilation_cache() -> None:
    """XLA compiles of the big scanned train steps take minutes; cache them
    under $SCRATCH/jax_cache so every process after the first is instant."""
    import os

    from vitgan_tpu.config import scratch_root

    try:
        cache_dir = os.path.join(scratch_root(), "jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
