"""Pipeline parallelism: the GPipe schedule over a ``pipe`` mesh axis must
match the sequential block loop exactly (forward AND gradients), compose with
the data axis, and drop into the v2 train step via pp_bundle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vitgan_tpu.parallel.pipeline import (pipeline_blocks, pp_bundle,
                                          stack_blocks)

DEPTH, BATCH, TOK, DIM = 8, 8, 6, 16


@pytest.fixture(scope="module")
def pipe_mesh():
    return Mesh(np.array(jax.devices()[:4]).reshape(4), axis_names=("pipe",))


@pytest.fixture(scope="module")
def dp_pipe_mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                axis_names=("data", "pipe"))


def _toy_blocks(key, depth=DEPTH, dim=DIM):
    keys = jax.random.split(key, depth)
    return [{"w": 0.5 * jax.random.normal(k, (dim, dim)),
             "b": 0.01 * jnp.arange(dim, dtype=jnp.float32)} for k in keys]


def _toy_block_fn(p, h):
    return jnp.tanh(h @ p["w"] + p["b"]) + h


def _sequential(blocks, x):
    for p in blocks:
        x = _toy_block_fn(p, x)
    return x


@pytest.mark.slow
def test_forward_matches_sequential(pipe_mesh, rng):
    k1, k2 = jax.random.split(rng)
    blocks = _toy_blocks(k1)
    x = jax.random.normal(k2, (BATCH, TOK, DIM))
    want = _sequential(blocks, x)
    got = pipeline_blocks(stack_blocks(blocks), x, mesh=pipe_mesh, axis="pipe",
                          microbatches=4, block_fn=_toy_block_fn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_single_stage_degenerates(rng):
    """A 1-stage pipe is just the sequential loop (no ppermute, no bubble)."""
    mesh1 = Mesh(np.array(jax.devices()[:1]), axis_names=("pipe",))
    k1, k2 = jax.random.split(rng)
    blocks = _toy_blocks(k1, depth=3)
    x = jax.random.normal(k2, (4, TOK, DIM))
    got = pipeline_blocks(stack_blocks(blocks), x, mesh=mesh1, axis="pipe",
                          microbatches=2, block_fn=_toy_block_fn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_sequential(blocks, x)),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_gradients_match_sequential(pipe_mesh, rng):
    """AD through ppermute/masked collection IS the reverse pipeline — grads
    wrt both the block params and the input must equal the sequential ones."""
    k1, k2, k3 = jax.random.split(rng, 3)
    blocks = _toy_blocks(k1)
    x = jax.random.normal(k2, (BATCH, TOK, DIM))
    cot = jax.random.normal(k3, (BATCH, TOK, DIM))

    def loss_pp(blocks, x):
        out = pipeline_blocks(stack_blocks(blocks), x, mesh=pipe_mesh,
                              axis="pipe", microbatches=4,
                              block_fn=_toy_block_fn)
        return jnp.sum(out * cot)

    def loss_seq(blocks, x):
        return jnp.sum(_sequential(blocks, x) * cot)

    g_pp = jax.grad(loss_pp, argnums=(0, 1))(blocks, x)
    g_seq = jax.grad(loss_seq, argnums=(0, 1))(blocks, x)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        # reverse-pipeline cotangent sums reduce in a different order than the
        # sequential backward — fp32 noise only, not a schedule error
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=1e-5)


def test_composes_with_data_axis(dp_pipe_mesh, rng):
    """DP x PP on one mesh: batch sharded over data, blocks over pipe."""
    k1, k2 = jax.random.split(rng)
    blocks = _toy_blocks(k1)
    x = jax.random.normal(k2, (BATCH, TOK, DIM))
    want = _sequential(blocks, x)
    got = pipeline_blocks(stack_blocks(blocks), x, mesh=dp_pipe_mesh,
                          axis="pipe", microbatches=2, block_fn=_toy_block_fn,
                          dp_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_rng_plumbing_deterministic(pipe_mesh, rng):
    """Per-(block, microbatch) keys reach the block_fn; same keys -> same out."""
    k1, k2, k3 = jax.random.split(rng, 3)
    blocks = _toy_blocks(k1, depth=4)
    x = jax.random.normal(k2, (BATCH, TOK, DIM))
    keys = jax.random.split(k3, 4 * 2).reshape(4, 2, -1)  # raw uint32 keys

    def noisy_block(p, h, kk):
        return _toy_block_fn(p, h) + 0.01 * jax.random.normal(kk, h.shape)

    run = lambda: pipeline_blocks(stack_blocks(blocks), x, mesh=pipe_mesh,
                                  axis="pipe", microbatches=2,
                                  block_fn=noisy_block, rngs=keys)
    a, b = run(), run()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the noise actually entered (differs from the noise-free stack)
    assert not np.allclose(np.asarray(a), np.asarray(_sequential(blocks, x)))


def test_rejects_indivisible(pipe_mesh, rng):
    blocks = _toy_blocks(rng, depth=6)  # 6 % 4 != 0
    x = jnp.zeros((BATCH, TOK, DIM))
    with pytest.raises(ValueError, match="not divisible by pipeline stages"):
        pipeline_blocks(stack_blocks(blocks), x, mesh=pipe_mesh, axis="pipe",
                        microbatches=4, block_fn=_toy_block_fn)
    blocks = _toy_blocks(rng, depth=8)
    with pytest.raises(ValueError, match="not divisible by microbatches"):
        pipeline_blocks(stack_blocks(blocks), x, mesh=pipe_mesh, axis="pipe",
                        microbatches=3, block_fn=_toy_block_fn)


# ---------------------------------------------------------------------------
# v2 model + train-step integration
# ---------------------------------------------------------------------------


def _pp_cfg():
    from vitgan_tpu import config as C

    cfg = C.smoke_config("v2")
    return C.replace(cfg, **{"v2.depth": 4, "v2.dropout": 0.0,
                             "runtime.compute_dtype": "float32",
                             "runtime.donate_state": False})


@pytest.mark.slow
def test_v2_generator_pp_matches(pipe_mesh, rng):
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.parallel.pipeline import make_pp_block_runner

    cfg = _pp_cfg()
    gan = build_gan(cfg)
    g_vars = gan.generator_init(rng)
    z = gan.sample_latent(jax.random.PRNGKey(7), 8)
    want, _ = gan.generator_apply(g_vars, z)
    runner = make_pp_block_runner(cfg.model, mesh=pipe_mesh, axis="pipe",
                                  microbatches=2)
    from vitgan_tpu.models.vitgan_v2 import generator_apply

    got, _ = generator_apply(g_vars, z, cfg.model, blocks_runner=runner)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def _v1_pp_cfg():
    from vitgan_tpu import config as C

    cfg = C.smoke_config("v1")
    return C.replace(cfg, **{"v1.generator.depth": 4,
                             "v1.discriminator.depth": 4,
                             "v1.generator.transformer.attn_dropout": 0.0,
                             "v1.generator.transformer.mlp_dropout": 0.0,
                             "v1.discriminator.transformer.attn_dropout": 0.0,
                             "v1.discriminator.transformer.mlp_dropout": 0.0,
                             "runtime.compute_dtype": "float32",
                             "runtime.donate_state": False})


@pytest.mark.slow
def test_v1_generator_pp_matches(pipe_mesh, rng):
    """The (h, w) pytree carry: v1 SLN blocks pipelined match the loop."""
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.models.vitgan_v1 import generator_apply
    from vitgan_tpu.parallel.pipeline import make_pp_v1_generator_runner

    cfg = _v1_pp_cfg()
    gan = build_gan(cfg)
    g_vars = gan.generator_init(rng)
    z = gan.sample_latent(jax.random.PRNGKey(11), 8)
    want, _ = gan.generator_apply(g_vars, z)
    runner = make_pp_v1_generator_runner(cfg.model.generator.transformer,
                                         mesh=pipe_mesh, axis="pipe",
                                         microbatches=2)
    got, new_state = generator_apply(g_vars, z, cfg.model, blocks_runner=runner)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
    assert new_state["blocks"] == g_vars["state"]["blocks"]  # state-free pass-through


@pytest.mark.slow
def test_v1_discriminator_pp_matches(pipe_mesh, rng):
    """The ISR/L2 discriminator stack pipelines: logits match, and the
    stacked out-of-ring ISR refresh equals the sequential in-loop one."""
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.models.vitgan_v1 import discriminator_apply
    from vitgan_tpu.parallel.pipeline import make_pp_v1_discriminator_runner

    cfg = _v1_pp_cfg()
    gan = build_gan(cfg)
    d_vars = gan.discriminator_init(rng)
    imgs = jax.random.uniform(jax.random.PRNGKey(13),
                              (8, cfg.model.image_size, cfg.model.image_size,
                               cfg.model.channels), minval=-1.0, maxval=1.0)
    want, want_state = gan.discriminator_apply(d_vars, imgs, update_state=True)
    runner = make_pp_v1_discriminator_runner(
        cfg.model.discriminator.transformer, mesh=pipe_mesh, axis="pipe",
        microbatches=2)
    got, got_state = discriminator_apply(d_vars, imgs, cfg.model,
                                         update_state=True,
                                         blocks_runner=runner)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    for a, b in zip(jax.tree.leaves(got_state), jax.tree.leaves(want_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_v1_pp_train_step_matches_sequential(pipe_mesh, rng):
    """v1 pp_bundle pipelines BOTH stacks (G SLN, D ISR/L2); one alternating
    update must reproduce the sequential losses and the ISR state."""
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state, make_train_step

    cfg = _v1_pp_cfg()
    gan = build_gan(cfg)
    ppg = pp_bundle(gan, cfg, mesh=pipe_mesh, axis="pipe", microbatches=2)
    real = jax.random.uniform(jax.random.PRNGKey(5),
                              (cfg.model.batch_size, cfg.model.image_size,
                               cfg.model.image_size, cfg.model.channels),
                              minval=-1.0, maxval=1.0)
    s_seq, m_seq = make_train_step(gan, cfg, donate=False)(
        create_train_state(rng, gan, cfg), real)
    s_pp, m_pp = make_train_step(ppg, cfg, donate=False)(
        create_train_state(rng, gan, cfg), real)
    for key in ("d_loss", "g_loss"):
        np.testing.assert_allclose(float(m_pp[key]), float(m_seq[key]),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s_pp.d_state), jax.tree.leaves(s_seq.d_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_trainer_pipeline_parallel(tmp_path):
    """mesh.pipeline_parallel=4 stages the v2 stacks through the trainer's
    whole surface: fit (dropout on, DP x PP mesh), eval grids, FID — odd
    eval batches take the sequential fallback."""
    from vitgan_tpu import config as C
    from vitgan_tpu.train.trainer import Trainer

    cfg = C.replace(
        C.smoke_config("v2"),
        **{"mesh.pipeline_parallel": 4, "v2.depth": 4,
           "run.steps_per_epoch": 2, "run.fid_num_samples": 16,
           "run.checkpoint_every_epochs": 0, "run_name": "pp"},
    )
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    assert tr.mesh.shape == {"data": 2, "model": 1, "pipe": 4}
    metrics = tr.fit(epochs=1)
    assert np.isfinite(metrics["d_loss"]) and np.isfinite(metrics["fid"])


def test_train_batch_indivisible_fails_loud(pipe_mesh, rng):
    """An indivisible TRAINING batch must raise, not silently un-pipeline."""
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.parallel.pipeline import make_pp_block_runner

    cfg = _pp_cfg()
    gan = build_gan(cfg)
    g_vars = gan.generator_init(rng)
    z = gan.sample_latent(jax.random.PRNGKey(7), 5)  # 5 % 2 microbatches != 0
    runner = make_pp_block_runner(cfg.model, mesh=pipe_mesh, axis="pipe",
                                  microbatches=2, train=True)
    from vitgan_tpu.models.vitgan_v2 import generator_apply

    with pytest.raises(ValueError, match="pipeline parallelism would silently"):
        generator_apply(g_vars, z, cfg.model, rng=rng, train=True,
                        blocks_runner=runner)
    # the same batch in EVAL falls back to the sequential stack
    got, _ = generator_apply(
        g_vars, z, cfg.model,
        blocks_runner=make_pp_block_runner(cfg.model, mesh=pipe_mesh,
                                           axis="pipe", microbatches=2))
    want, _ = gan.generator_apply(g_vars, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_mesh_allows_pp_tp_combination():
    from vitgan_tpu.config import MeshConfig
    from vitgan_tpu.parallel import make_mesh

    mesh = make_mesh(MeshConfig(model_parallel=2, pipeline_parallel=2))
    assert mesh.shape == {"data": 2, "model": 2, "pipe": 2}


def test_pp_tp_forward_and_grad_match(rng):
    """PP manual over 'pipe' with TP left AUTO ('model'): the stage-local
    scan runs under GSPMD with the block weights sharded over model — forward
    and grads must match the sequential replicated loop, and the weight grad
    must come back with its TP sharding intact."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                axis_names=("pipe", "model"))
    k1, k2, k3 = jax.random.split(rng, 3)
    blocks = _toy_blocks(k1, depth=4)
    x = jax.random.normal(k2, (BATCH, TOK, DIM))
    cot = jax.random.normal(k3, (BATCH, TOK, DIM))
    stacked = stack_blocks(blocks)
    # TP placement: weight columns sharded over model (b sharded to match)
    stacked = {
        "w": jax.device_put(stacked["w"],
                            NamedSharding(mesh, P("pipe", None, "model"))),
        "b": jax.device_put(stacked["b"], NamedSharding(mesh, P("pipe", "model"))),
    }

    def run(stacked, x):
        return pipeline_blocks(stacked, x, mesh=mesh, axis="pipe",
                               microbatches=4, block_fn=_toy_block_fn,
                               tp_axis="model")

    got = run(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_sequential(blocks, x)),
                               rtol=1e-5, atol=1e-5)

    def loss_pp(s, x):
        return jnp.sum(run(s, x) * cot)

    def loss_seq(blocks, x):
        return jnp.sum(_sequential(blocks, x) * cot)

    g_pp = jax.jit(jax.grad(loss_pp))(stacked, x)
    g_seq = jax.grad(loss_seq)(blocks, x)
    np.testing.assert_allclose(np.asarray(g_pp["w"]),
                               np.asarray(stack_blocks(g_seq)["w"]),
                               rtol=1e-4, atol=1e-5)
    assert "model" in jax.tree.leaves(
        jax.tree.map(lambda a: a.sharding.spec, g_pp["w"]))[0]


@pytest.mark.slow
def test_pp_tp_train_step_matches_sequential(rng):
    """One full alternating G/D update with the stacks pipelined AND the
    attention/MLP width TP-sharded inside each stage gives the same losses
    as the single-device step."""
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.parallel.sharding import shard_train_state
    from vitgan_tpu.train import create_train_state, make_train_step

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                axis_names=("pipe", "model"))
    cfg = _pp_cfg()
    gan = build_gan(cfg)
    ppg = pp_bundle(gan, cfg, mesh=mesh, axis="pipe", microbatches=2,
                    tp_axis="model")
    real = jax.random.uniform(jax.random.PRNGKey(5),
                              (cfg.model.batch_size, cfg.model.image_size,
                               cfg.model.image_size, cfg.model.channels),
                              minval=-1.0, maxval=1.0)
    state_a = create_train_state(rng, gan, cfg)
    state_b = shard_train_state(create_train_state(rng, gan, cfg), mesh,
                                tensor_parallel=True)
    _, m_seq = make_train_step(gan, cfg, donate=False)(state_a, real)
    _, m_pp = make_train_step(ppg, cfg, donate=False)(state_b, real)
    for key in ("d_loss", "g_loss"):
        np.testing.assert_allclose(float(m_pp[key]), float(m_seq[key]),
                                   rtol=1e-4, atol=1e-5)


def test_pp_fsdp_forward_and_grad_match(rng):
    """PP x FSDP: the DATA axis goes auto (tp_axis mechanism, dp_axis=None) —
    ZeRO-sharded block params and the GSPMD-sharded batch ride through the
    pipeline; forward and grads must equal the sequential replicated loop."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2),
                axis_names=("data", "pipe"))
    k1, k2, k3 = jax.random.split(rng, 3)
    blocks = _toy_blocks(k1, depth=4)
    x = jax.random.normal(k2, (BATCH, TOK, DIM))
    cot = jax.random.normal(k3, (BATCH, TOK, DIM))
    stacked = stack_blocks(blocks)
    stacked = {  # ZeRO: rows of w over data; depth over pipe
        "w": jax.device_put(stacked["w"],
                            NamedSharding(mesh, P("pipe", "data", None))),
        "b": jax.device_put(stacked["b"], NamedSharding(mesh, P("pipe"))),
    }
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    def run(s, x):
        return pipeline_blocks(s, x, mesh=mesh, axis="pipe", microbatches=4,
                               block_fn=_toy_block_fn, dp_axis=None,
                               tp_axis="data")

    got = jax.jit(run)(stacked, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_sequential(blocks, x)),
                               rtol=1e-5, atol=1e-5)

    def loss_pp(s, x):
        return jnp.sum(run(s, x) * cot)

    g_pp = jax.jit(jax.grad(loss_pp))(stacked, xs)
    g_seq = jax.grad(lambda bl, x: jnp.sum(_sequential(bl, x) * cot))(blocks, x)
    np.testing.assert_allclose(np.asarray(g_pp["w"]),
                               np.asarray(stack_blocks(g_seq)["w"]),
                               rtol=1e-4, atol=1e-5)


def test_pp_tp_bf16_on_cpu_fails_loud(rng):
    """bf16 + PP+TP on the CPU backend must raise (upstream XLA:CPU
    AllReducePromotion abort, scripts/repro_xla_allreduce_bug.py), not
    crash the process."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                axis_names=("pipe", "model"))
    blocks = _toy_blocks(rng, depth=2)
    stacked = jax.tree.map(lambda a: a.astype(jnp.bfloat16), stack_blocks(blocks))
    stacked = {"w": jax.device_put(stacked["w"],
                                   NamedSharding(mesh, P("pipe", "model", None))),
               "b": jax.device_put(stacked["b"], NamedSharding(mesh, P("pipe")))}
    x = jax.random.normal(rng, (4, TOK, DIM), jnp.bfloat16)
    with pytest.raises(ValueError, match="AllReducePromotion"):
        pipeline_blocks(stacked, x, mesh=mesh, axis="pipe", microbatches=2,
                        block_fn=_toy_block_fn, tp_axis="model")


@pytest.mark.slow
def test_v1_pp_tp_train_step_matches_sequential(rng):
    """v1 family under PP x TP: both stacks pipelined with the per-head
    qkv/ISR leaves TP-sharded inside each stage (parallel/sharding.py rules
    shard the head axis; smoke v1 has 4 heads / 2 model shards).  Losses AND
    the ISR power-iteration state must match the sequential step."""
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.parallel.sharding import shard_train_state
    from vitgan_tpu.train import create_train_state, make_train_step

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                axis_names=("pipe", "model"))
    cfg = _v1_pp_cfg()
    gan = build_gan(cfg)
    ppg = pp_bundle(gan, cfg, mesh=mesh, axis="pipe", microbatches=2,
                    tp_axis="model")
    real = jax.random.uniform(jax.random.PRNGKey(5),
                              (cfg.model.batch_size, cfg.model.image_size,
                               cfg.model.image_size, cfg.model.channels),
                              minval=-1.0, maxval=1.0)
    s_seq, m_seq = make_train_step(gan, cfg, donate=False)(
        create_train_state(rng, gan, cfg), real)
    state_tp = shard_train_state(create_train_state(rng, gan, cfg), mesh,
                                 tensor_parallel=True)
    s_pp, m_pp = make_train_step(ppg, cfg, donate=False)(state_tp, real)
    for key in ("d_loss", "g_loss"):
        np.testing.assert_allclose(float(m_pp[key]), float(m_seq[key]),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s_pp.d_state), jax.tree.leaves(s_seq.d_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_trainer_pp_tp(tmp_path):
    """mesh.pipeline_parallel=2 x model_parallel=2 through the whole trainer
    surface (DP x TP x PP on 8 devices)."""
    from vitgan_tpu import config as C
    from vitgan_tpu.train.trainer import Trainer

    cfg = C.replace(
        C.smoke_config("v2"),
        **{"mesh.pipeline_parallel": 2, "mesh.model_parallel": 2,
           "v2.depth": 4, "run.steps_per_epoch": 2, "run.fid_num_samples": 16,
           "run.checkpoint_every_epochs": 0, "run_name": "pptp",
           # bf16 PP+TP aborts XLA:CPU's AllReducePromotion (upstream bug,
           # scripts/repro_xla_allreduce_bug.py); f32 on the CPU mesh.
           "runtime.compute_dtype": "float32"},
    )
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    assert tr.mesh.shape == {"data": 2, "model": 2, "pipe": 2}
    metrics = tr.fit(epochs=1)
    assert np.isfinite(metrics["d_loss"]) and np.isfinite(metrics["fid"])


def test_pp_bundle_rejects_indivisible_depth(pipe_mesh):
    from vitgan_tpu import config as C
    from vitgan_tpu.models import build_gan

    cfg = C.replace(C.smoke_config("v2"), **{"v2.depth": 6})
    with pytest.raises(ValueError, match="not divisible by\\s+pipeline stages"):
        pp_bundle(build_gan(cfg), cfg, mesh=pipe_mesh, microbatches=2)


def test_pp_bundle_rejects_unsupported_family(pipe_mesh):
    from vitgan_tpu import config as C
    from vitgan_tpu.models import build_gan

    cfg = C.smoke_config("mlp")
    with pytest.raises(ValueError, match="pipeline parallelism supports"):
        pp_bundle(build_gan(cfg), cfg, mesh=pipe_mesh, microbatches=2)


@pytest.mark.slow
def test_pp_train_step_matches_sequential(pipe_mesh, rng):
    """One full alternating G/D update with the block stacks pipelined gives
    the same losses as the single-device step (dropout off, f32)."""
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state, make_train_step

    cfg = _pp_cfg()
    gan = build_gan(cfg)
    ppg = pp_bundle(gan, cfg, mesh=pipe_mesh, axis="pipe", microbatches=2)
    assert ppg.sample_latent is not None and ppg.family == "v2"

    real = jax.random.uniform(jax.random.PRNGKey(5),
                              (cfg.model.batch_size, cfg.model.image_size,
                               cfg.model.image_size, cfg.model.channels),
                              minval=-1.0, maxval=1.0)
    state_a = create_train_state(rng, gan, cfg)
    state_b = create_train_state(rng, gan, cfg)
    _, m_seq = make_train_step(gan, cfg, donate=False)(state_a, real)
    _, m_pp = make_train_step(ppg, cfg, donate=False)(state_b, real)
    for key in ("d_loss", "g_loss"):
        np.testing.assert_allclose(float(m_pp[key]), float(m_seq[key]),
                                   rtol=1e-4, atol=1e-5)
