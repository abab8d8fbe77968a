"""Pipeline parallelism: GPipe schedule over a ``pipe`` mesh axis.

The reference is single-device and its models fit one chip with room to spare
(SURVEY §2.5 judges PP unnecessary at reference scale), so this module is the
scale-ready path for deeper presets: it shards the transformer BLOCK STACK —
the repeated, homogeneous middle of every ViT in the zoo — across a mesh axis
and streams microbatches through the stages.

TPU-native design (no torch analog to port):

- Each device holds ``depth / n_stages`` blocks, their params stacked on a
  leading axis that is sharded over ``pipe`` — HBM for block params scales as
  O(depth / stages).
- The schedule is plain GPipe expressed as data flow: a ``lax.scan`` over
  ``microbatches + stages - 1`` ticks; at every tick each device applies its
  stage to its current activation and rotates the result one hop around the
  ring with ``lax.ppermute`` (an XLA collective-permute riding ICI).  Stage 0
  injects a fresh microbatch each tick; the last stage collects into an
  output buffer.  There is no hand-written send/recv state machine — SPMD +
  masked selects express the whole pipeline.
- It is **differentiable end-to-end**: ``ppermute`` transposes to the inverse
  ring hop, so ``jax.grad`` of a pipelined forward IS the reverse pipeline —
  the backward schedule is derived by AD, not hand-scheduled.
- Bubble fraction is the GPipe ``(S-1)/(M+S-1)``; raise ``microbatches`` to
  amortize.  Within a stage the blocks run under a ``lax.scan`` over the
  stacked params, so compile time is O(1) in depth.
- Activations may be any PYTREE of arrays sharing the batch dim — the v1
  generator pipelines its ``(h, w)`` pair (the style vector rides the ring
  unchanged), the v2 stacks a single token array.

Numerics match the sequential block loop exactly — same ops in the same
order per microbatch; only the batch is split into microbatches, which is
invisible to per-sample ops (everything in these blocks is batch-pointwise).
Validated in tests/test_pipeline_parallel.py on the 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_blocks(blocks: Sequence[Any]):
    """List of per-block param pytrees -> one pytree with a leading block axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def pipeline_blocks(
    stacked_blocks,
    x,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    microbatches: int,
    block_fn: Callable[..., Any],
    rngs: Optional[jnp.ndarray] = None,
    dp_axis: Optional[str] = None,
    tp_axis: Optional[str] = None,
):
    """Apply a stacked block sequence to ``x`` with a GPipe schedule.

    Args:
      stacked_blocks: pytree whose leaves have leading dim ``depth`` (from
        :func:`stack_blocks`); sharded over ``axis`` (depth % stages == 0).
      x: activations — an array or any pytree of arrays sharing a leading
        batch dim B.  B must divide by ``microbatches`` (per data shard when
        ``dp_axis`` is given).
      mesh: mesh containing ``axis`` (and ``dp_axis`` if used).
      microbatches: GPipe microbatch count M.
      block_fn: ``block_fn(block_params, h)`` or, when ``rngs`` is given,
        ``block_fn(block_params, h, rng)``; must preserve ``h``'s pytree
        structure, shapes and dtypes.
      rngs: optional (depth, microbatches) PRNG keys (dropout etc.).  When
        ``dp_axis`` is set, keys are folded with the data-shard index so
        masks decorrelate across data shards.
      dp_axis: optional data-parallel mesh axis; x's batch dim is then
        sharded over it (composes DP x PP on one mesh).
      tp_axis: optional mesh axis (or tuple of axes) to leave AUTO: the
        shard_map goes manual over the remaining axes only, and inside each
        stage XLA's SPMD partitioner keeps the blocks' GSPMD shardings on the
        auto axes (``in_specs`` may only name manual axes) and inserts the
        collectives per tick.  Pass the TP axis to compose PP x TP; pass the
        DATA axis (with ``dp_axis=None``) to compose PP x FSDP — the stacked
        block leaves keep their data-axis (ZeRO) sharding and the batch rides
        GSPMD instead of the manual microbatch slicing; or pass both.
        Caveat: Pallas kernels inside the blocks see auto-axis operands as
        GSPMD arrays — a custom call forces an all-gather of its sharded
        operands, so kernel routing should prefer XLA compositions under
        these compositions (the default policy thresholds already do at
        these block sizes).

    Returns activations with the same pytree structure and sharding as ``x``:
    equal to applying the blocks sequentially.
    """
    n_stages = mesh.shape[axis]
    depth = jax.tree.leaves(stacked_blocks)[0].shape[0]
    if depth % n_stages != 0:
        raise ValueError(f"depth {depth} not divisible by pipeline stages {n_stages}")
    x_leaves = jax.tree.leaves(x)
    batch = x_leaves[0].shape[0]
    if any(leaf.shape[0] != batch for leaf in x_leaves):
        raise ValueError("all activation leaves must share the leading batch dim")
    n_dp = mesh.shape[dp_axis] if dp_axis else 1
    local_b = batch // n_dp
    if batch % n_dp != 0:
        raise ValueError(f"batch {batch} not divisible by data axis {n_dp}")
    if local_b % microbatches != 0:
        raise ValueError(
            f"local batch {local_b} not divisible by microbatches {microbatches}")
    if rngs is not None and tuple(rngs.shape[:2]) != (depth, microbatches):
        raise ValueError(
            f"rngs shape {rngs.shape} != (depth={depth}, microbatches={microbatches}, ...)")
    auto_axes = (set() if not tp_axis
                 else {tp_axis} if isinstance(tp_axis, str) else set(tp_axis))
    if (any(mesh.shape.get(a, 1) > 1 for a in auto_axes)
            and jax.default_backend() == "cpu"):
        # Upstream XLA:CPU bug (jax 0.9): AllReducePromotion's CloneAllReduce
        # aborts the PROCESS ("Invalid binary instruction opcode copy") when
        # promoting the bf16 contraction all-reduce GSPMD inserts inside the
        # pipeline tick scan.  TPU is unaffected (bf16 all-reduce is native —
        # the promotion pass never runs).  Refuse loudly instead of crashing;
        # scripts/repro_xla_allreduce_bug.py exits 0 once fixed upstream.
        leaves = jax.tree.leaves(stacked_blocks) + x_leaves
        if any(getattr(leaf, "dtype", None) == jnp.bfloat16 for leaf in leaves):
            raise ValueError(
                "pipelines with auto-axis collectives (PP+TP / PP+FSDP) in "
                "bfloat16 crash XLA:CPU's AllReducePromotion pass (upstream "
                "bug; scripts/repro_xla_allreduce_bug.py).  On the CPU "
                "backend use runtime.compute_dtype=float32; real TPUs reduce "
                "bf16 natively and are unaffected.")

    m = microbatches
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    x_spec = jax.tree.map(lambda _: P(dp_axis), x)  # batch dim only; rest replicated
    blk_spec = P(axis)
    rng_specs = (P(axis),) if rngs is not None else ()
    tmap = jax.tree.map
    # All mesh axes manual (the classic full-manual shard_map), except the
    # optional auto axes (TP and/or FSDP-data) GSPMD handles inside stages.
    if dp_axis and dp_axis in auto_axes:
        raise ValueError(f"axis {dp_axis!r} cannot be both the manual dp_axis "
                         "and an auto (tp_axis) axis — for PP x FSDP pass "
                         "dp_axis=None and put the data axis in tp_axis")
    manual = frozenset(mesh.axis_names) - auto_axes

    @partial(shard_map, mesh=mesh, axis_names=manual,
             in_specs=(blk_spec, x_spec) + rng_specs,
             out_specs=x_spec, check_vma=False)
    def inner(blocks_l, x_l, *rngs_l):
        stage = jax.lax.axis_index(axis)
        mb = jax.tree.leaves(x_l)[0].shape[0] // m
        mb_x = tmap(lambda a: a.reshape((m, mb) + a.shape[1:]), x_l)
        if rngs_l:
            keys_l = rngs_l[0]  # (blocks_per_stage, M)
            if dp_axis:
                didx = jax.lax.axis_index(dp_axis)
                keys_l = jax.vmap(jax.vmap(lambda kk: jax.random.fold_in(kk, didx)))(keys_l)

        def run_stage(h, mb_idx):
            """This device's blocks, sequentially, via scan over stacked params."""
            if rngs_l:
                def body(h, blk_and_key):
                    blk, kk = blk_and_key
                    return block_fn(blk, h, kk), None
                h, _ = jax.lax.scan(body, h, (blocks_l, keys_l[:, mb_idx]))
            else:
                def body(h, blk):
                    return block_fn(blk, h), None
                h, _ = jax.lax.scan(body, h, blocks_l)
            return h

        def tick(carry, t):
            state, outbuf = carry
            # stage 0 consumes microbatch t (clipped: past M the value is
            # masked garbage that never reaches the output); other stages
            # consume what the previous stage sent last tick.
            ti = jnp.clip(t, 0, m - 1)
            inj = tmap(lambda a: jax.lax.dynamic_index_in_dim(a, ti, 0,
                                                              keepdims=False), mb_x)
            inp = tmap(lambda i, s: jnp.where(stage == 0, i, s), inj, state)
            mb_idx = jnp.clip(t - stage, 0, m - 1)  # which microbatch this stage holds
            out = run_stage(inp, mb_idx)
            # last stage finished microbatch t-(S-1): write it out when valid.
            widx = t - (n_stages - 1)
            wi = jnp.clip(widx, 0, m - 1)
            valid = jnp.logical_and(stage == n_stages - 1, widx >= 0)
            outbuf = tmap(
                lambda buf, o: jnp.where(
                    valid, jax.lax.dynamic_update_index_in_dim(buf, o, wi, 0), buf),
                outbuf, out)
            if n_stages > 1:
                state = tmap(lambda o: jax.lax.ppermute(o, axis, perm), out)
            else:
                state = out
            return (state, outbuf), None

        state0 = tmap(lambda a: jnp.zeros((mb,) + a.shape[2:], a.dtype), mb_x)
        outbuf0 = tmap(lambda a: jnp.zeros_like(a), mb_x)
        (_, outbuf), _ = jax.lax.scan(tick, (state0, outbuf0),
                                      jnp.arange(m + n_stages - 1))
        # Only the last stage holds real outputs; psum over the pipe axis
        # broadcasts them to every stage so the result leaves replicated on
        # ``axis`` (matching out_specs, which doesn't mention it).
        if n_stages > 1:
            outbuf = tmap(
                lambda buf: jax.lax.psum(
                    jnp.where(stage == n_stages - 1, buf, jnp.zeros_like(buf)), axis),
                outbuf)
        return tmap(lambda buf, a: buf.reshape(a.shape), outbuf, x_l)

    args = (stacked_blocks, x) + ((rngs,) if rngs is not None else ())
    if tp_axis:
        # Partial-auto shard_map only canonicalizes its auto-axis output
        # shardings under jit (eager tracing rejects them in out_specs); the
        # train step is always jitted, this covers eager eval calls too.
        return jax.jit(inner)(*args)
    return inner(*args)


# ---------------------------------------------------------------------------
# Model integration: pipelined block runners for the encoder stacks
# ---------------------------------------------------------------------------


def _split_per_block_keys(rngs, microbatches: int):
    """List of per-block keys -> (depth, M) key array (one per microbatch)."""
    return jnp.stack([jax.random.split(r, microbatches) for r in rngs])


def _pipelineable_batch(x, mesh: Mesh, microbatches: int,
                        dp_axis: Optional[str], train: bool) -> bool:
    """True when x's batch divides into microbatches (per data shard).

    Eval paths call the wrapped applies with arbitrary batch sizes (sample
    grids, FID chunks, partial last batches); those fall back to the
    sequential stack — numerically identical (parity-tested), just unstaged.
    TRAINING batches are fixed by config, so an indivisible one there means
    the user's PP setting would silently never engage — fail loud instead.
    """
    batch = jax.tree.leaves(x)[0].shape[0]
    n_dp = mesh.shape[dp_axis] if dp_axis else 1
    ok = batch % n_dp == 0 and (batch // n_dp) % microbatches == 0
    if not ok and train:
        raise ValueError(
            f"training batch {batch} does not divide into "
            f"{n_dp} data shard(s) x {microbatches} microbatches — "
            f"pipeline parallelism would silently disable; adjust batch_size "
            f"or mesh.pipeline_microbatches")
    return ok


def make_pp_block_runner(cfg, *, mesh: Mesh, axis: str = "pipe",
                         microbatches: int, train: bool = False,
                         dp_axis: Optional[str] = None,
                         tp_axis: Optional[str] = None):
    """A ``blocks_runner`` for models.vitgan_v2 that pipelines the stack.

    Returns ``runner(blocks: list, x, rngs: list | None) -> x`` — the same
    contract as the default sequential loop in ``vitgan_v2.vit_encode`` /
    ``generator_apply``, so it drops into either via their ``blocks_runner``
    parameter and into the trainer via :func:`pp_bundle`.
    """
    from vitgan_tpu.models.vitgan_v2 import (_encoder_apply, _maybe_remat,
                                             _run_blocks)

    def runner(blocks: List[Any], x: jnp.ndarray, rngs) -> jnp.ndarray:
        if not _pipelineable_batch(x, mesh, microbatches, dp_axis, train):
            return _run_blocks(blocks, x, rngs, cfg, train, None)
        # Same remat policy as the sequential loop: without it the per-tick
        # scan would store every block's residuals and PP would cost the
        # activation memory that remat presets (hires) rely on saving.
        block = _maybe_remat(lambda p, h, kk=None: _encoder_apply(p, h, cfg, kk, train))
        return pipeline_blocks(
            stack_blocks(blocks), x, mesh=mesh, axis=axis,
            microbatches=microbatches, block_fn=block,
            rngs=(_split_per_block_keys(rngs, microbatches)
                  if rngs is not None else None),
            dp_axis=dp_axis, tp_axis=tp_axis)

    return runner


def make_pp_v1_generator_runner(tcfg, *, mesh: Mesh, axis: str = "pipe",
                                microbatches: int, train: bool = False,
                                dp_axis: Optional[str] = None,
                                tp_axis: Optional[str] = None):
    """A ``blocks_runner`` for the v1 SLN generator stack.

    The v1 blocks thread ``(h, w)`` — the style vector ``w`` enters every SLN
    unchanged (ref:src/v1/transformer.py:85-88) — so the activation pytree is
    the pair and ``w`` rides the ring alongside ``h``.  Generator blocks are
    state-free (no spectral rescaling, ref:src/v1/generator.py:28-38), which
    is what makes the stack pipelineable without a state side-channel.

    Contract: ``runner(blocks, (h, w), rngs) -> h_out``.
    """
    from vitgan_tpu.models.vitgan_v1 import _sln_transformer_block

    empty_state = {"msha": {}}

    def runner(blocks: List[Any], hw, rngs):
        def fn(p, hw, kk=None):
            h, w = hw
            h2, _ = _sln_transformer_block(p, empty_state, h, w, tcfg,
                                           rng=kk, train=train)
            return (h2, w)

        if not _pipelineable_batch(hw, mesh, microbatches, dp_axis, train):
            h, w = hw
            for p, r in zip(blocks, rngs if rngs is not None else [None] * len(blocks)):
                h, w = fn(p, (h, w), r)
            return h
        out = pipeline_blocks(stack_blocks(blocks), hw, mesh=mesh, axis=axis,
                              microbatches=microbatches, block_fn=fn,
                              rngs=(_split_per_block_keys(rngs, microbatches)
                                    if rngs is not None else None),
                              dp_axis=dp_axis, tp_axis=tp_axis)
        return out[0]

    return runner


def make_pp_v1_discriminator_runner(tcfg, *, mesh: Mesh, axis: str = "pipe",
                                    microbatches: int, train: bool = False,
                                    dp_axis: Optional[str] = None,
                                    tp_axis: Optional[str] = None):
    """A ``blocks_runner`` for the v1 ISR/L2-attention discriminator stack.

    The ISR power-iteration state is data-INdependent (spectral_rescale's
    estimate depends only on the weights), and its forward output is the same
    whether or not the carried ``u`` is refreshed — so the pipelined forward
    runs the blocks state-frozen, and the state refresh happens as ONE
    stacked spectral_rescale pass outside the ring (the einsums broadcast
    over the depth axis natively).

    Contract: ``runner(blocks_p, blocks_s, x, rngs, update_state) ->
    (x_out, new_blocks_s)``.
    """
    from vitgan_tpu.models.vitgan_v1 import _transformer_block

    def runner(blocks_p: List[Any], blocks_s: List[Any], x, rngs, update_state):
        merged = [{"p": p, "s": s} for p, s in zip(blocks_p, blocks_s)]

        def fn(blk, h, kk=None):
            out, _ = _transformer_block(blk["p"], blk["s"], h, tcfg,
                                        score_mode="l2", rng=kk, train=train,
                                        update_state=False)
            return out

        if not _pipelineable_batch(x, mesh, microbatches, dp_axis, train):
            h = x
            for blk, r in zip(merged, rngs if rngs is not None else [None] * len(merged)):
                h = fn(blk, h, r)
        else:
            h = pipeline_blocks(stack_blocks(merged), x, mesh=mesh, axis=axis,
                                microbatches=microbatches, block_fn=fn,
                                rngs=(_split_per_block_keys(rngs, microbatches)
                                      if rngs is not None else None),
                                dp_axis=dp_axis, tp_axis=tp_axis)

        new_s = blocks_s
        if update_state and blocks_s and "isr" in blocks_s[0].get("msha", {}):
            from vitgan_tpu.models.layers import spectral_rescale

            qkv = jnp.stack([p["msha"]["qkv"] for p in blocks_p])
            isr = stack_blocks([s["msha"]["isr"] for s in blocks_s])
            _, isr_new = spectral_rescale(qkv, isr, update=True)
            new_s = [{"msha": {"isr": jax.tree.map(lambda a: a[i], isr_new)}}
                     for i in range(len(blocks_s))]
        return h, new_s

    return runner


def pp_bundle(gan, cfg, *, mesh: Mesh, axis: str = "pipe", microbatches: int,
              dp_axis: Optional[str] = None, tp_axis: Optional[str] = None):
    """Wrap a GANBundle so its ViT block stacks run pipelined.

    Supports the v2 family (G and D stacks) and the v1 family (SLN generator
    stack AND the ISR/L2 discriminator stack — the ISR state refresh is
    data-independent and runs as a stacked pass outside the ring).  The param
    layout (list of blocks) is unchanged — checkpoints stay interchangeable
    with the single-device path; stacking happens inside the step and XLA
    shards the stacked leaves over ``axis`` per the shard_map in_specs.
    """
    from dataclasses import replace as dc_replace

    mcfg = cfg.model
    stages = mesh.shape[axis]
    depths = ((mcfg.depth,) if gan.family == "v2"
              else (mcfg.generator.depth, mcfg.discriminator.depth)
              if gan.family == "v1" else ())
    for depth in depths:
        if depth % stages != 0:
            raise ValueError(
                f"{gan.family} block depth {depth} not divisible by "
                f"pipeline stages {stages} (axis {axis!r})")
    if gan.family == "v2":
        from vitgan_tpu.models.vitgan_v2 import discriminator_apply, generator_apply

        def g_apply(variables, z, rng=None, train=False):
            runner = make_pp_block_runner(mcfg, mesh=mesh, axis=axis,
                                          microbatches=microbatches, train=train,
                                          dp_axis=dp_axis, tp_axis=tp_axis)
            return generator_apply(variables, z, mcfg, rng=rng, train=train,
                                   blocks_runner=runner)

        def d_apply(variables, images, rng=None, train=False, update_state=False):
            runner = make_pp_block_runner(mcfg, mesh=mesh, axis=axis,
                                          microbatches=microbatches, train=train,
                                          dp_axis=dp_axis, tp_axis=tp_axis)
            return discriminator_apply(variables, images, mcfg, rng=rng, train=train,
                                       update_state=update_state,
                                       blocks_runner=runner)

        return dc_replace(gan, generator_apply=g_apply, discriminator_apply=d_apply)

    if gan.family == "v1":
        from vitgan_tpu.models.vitgan_v1 import discriminator_apply, generator_apply

        def g_apply(variables, z, rng=None, train=False):
            runner = make_pp_v1_generator_runner(
                mcfg.generator.transformer, mesh=mesh, axis=axis,
                microbatches=microbatches, train=train, dp_axis=dp_axis,
                tp_axis=tp_axis)
            return generator_apply(variables, z, mcfg, rng=rng, train=train,
                                   blocks_runner=runner)

        def d_apply(variables, images, rng=None, train=False, update_state=False):
            runner = make_pp_v1_discriminator_runner(
                mcfg.discriminator.transformer, mesh=mesh, axis=axis,
                microbatches=microbatches, train=train, dp_axis=dp_axis,
                tp_axis=tp_axis)
            return discriminator_apply(variables, images, mcfg, rng=rng,
                                       train=train, update_state=update_state,
                                       blocks_runner=runner)

        return dc_replace(gan, generator_apply=g_apply, discriminator_apply=d_apply)

    raise ValueError(f"pipeline parallelism supports v1/v2 ViT stacks, not {gan.family!r}")
