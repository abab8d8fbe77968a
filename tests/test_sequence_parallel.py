"""Sequence (context) parallelism: mesh.context_parallel shards the v2
encoder token axis over a ``seq`` mesh axis via GSPMD constraints
(ops/policy.py: set_sequence_parallel / sequence_constraint, applied in
models/vitgan_v2._run_blocks).  Sharding may change reduction order, never
semantics — every test here is a parity check against the unsharded step.
The manual ring schedule is covered separately (test_context_parallel.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu import config as C
from vitgan_tpu.models import build_gan
from vitgan_tpu.ops.policy import (sequence_constraint, sequence_parallel_active,
                                   set_sequence_parallel)
from vitgan_tpu.parallel import make_mesh
from vitgan_tpu.parallel.sharding import shard_train_state
from vitgan_tpu.train import create_train_state, make_train_step


@pytest.fixture
def sp_guard():
    """Always clear the process-global SP policy, pass or fail."""
    yield
    set_sequence_parallel(None)


def _sp_mesh(context_parallel: int, model_parallel: int = 1):
    cfg = C.MeshConfig(context_parallel=context_parallel,
                       model_parallel=model_parallel)
    return cfg, make_mesh(cfg)


def _f32_smoke():
    # float32 + highest matmul precision (conftest): sharded-vs-single parity
    # is then limited only by reduction order, so tolerances can be tight.
    return C.replace(C.smoke_config("v2"),
                     **{"runtime.compute_dtype": "float32",
                        "runtime.donate_state": False})


def test_mesh_gains_seq_axis():
    _, mesh = _sp_mesh(4)
    assert mesh.axis_names == ("data", "model", "seq")
    assert mesh.shape["seq"] == 4 and mesh.shape["data"] == 2


def test_sp_does_not_compose_with_pp():
    with pytest.raises(ValueError, match="pipeline_parallel"):
        make_mesh(C.MeshConfig(context_parallel=2, pipeline_parallel=2))


def test_constraint_is_noop_when_off():
    assert not sequence_parallel_active()
    x = jnp.ones((2, 5, 4))
    assert sequence_constraint(x) is x


def test_constraint_places_token_axis(sp_guard):
    mcfg, mesh = _sp_mesh(4)
    set_sequence_parallel(mesh, mcfg.data_axis, mcfg.seq_axis)
    f = jax.jit(lambda x: sequence_constraint(x) * 2)
    out = f(jnp.ones((2, 8, 4)))
    # (PartitionSpec normalizes away the trailing None)
    assert out.sharding.spec == jax.sharding.PartitionSpec("data", "seq")
    # rank != 3 leaves pass through unconstrained
    out2 = jax.jit(lambda x: sequence_constraint(x) * 2)(jnp.ones((2, 4)))
    assert np.asarray(out2).shape == (2, 4)


def test_constraint_handles_uneven_tokens(sp_guard):
    """The v2 discriminator sequence is N+1 (CLS): 65 over 4 shards is
    uneven — GSPMD pads internally, values must be exact."""
    mcfg, mesh = _sp_mesh(4)
    set_sequence_parallel(mesh, mcfg.data_axis, mcfg.seq_axis)
    x = jnp.arange(2 * 65 * 4, dtype=jnp.float32).reshape(2, 65, 4)
    out = jax.jit(lambda x: sequence_constraint(x) + 1)(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x) + 1)


def test_sp_requires_seq_axis_on_mesh():
    _, plain = C.MeshConfig(), make_mesh(C.MeshConfig())
    with pytest.raises(ValueError, match="no axis"):
        set_sequence_parallel(plain, "data", "seq")


def test_sp_disables_pallas_routing(sp_guard):
    from vitgan_tpu.ops.attention import use_pallas_attention
    from vitgan_tpu.ops.policy import megablock_enabled, set_policy

    mcfg, mesh = _sp_mesh(2)
    set_sequence_parallel(mesh, mcfg.data_axis, mcfg.seq_axis)
    try:
        set_policy(mode="always", megablock="on")
        assert not use_pallas_attention(seq_len=4096)
        assert not megablock_enabled()
    finally:
        set_policy(mode="auto", megablock="auto")
    set_sequence_parallel(None)
    assert use_pallas_attention(policy="always", seq_len=4096)


@pytest.mark.slow
def test_sp_train_step_matches_single_device(sp_guard):
    """Full v2 G+D train step under data=2 x seq=4 == unsharded step."""
    cfg = _f32_smoke()
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    step = make_train_step(gan, cfg, donate=False)
    m = cfg.model
    real = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(1),
        (m.batch_size, m.image_size, m.image_size, m.channels)) * 2 - 1)

    _, m_single = step(state, jnp.array(real))

    mcfg, mesh = _sp_mesh(4)
    set_sequence_parallel(mesh, mcfg.data_axis, mcfg.seq_axis)
    state_sp = shard_train_state(create_train_state(jax.random.PRNGKey(0), gan, cfg),
                                 mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    real_sp = jax.device_put(real, NamedSharding(mesh, P("data", None, None, None)))
    step_sp = make_train_step(gan, cfg, donate=False)
    new_state, m_sp = step_sp(state_sp, real_sp)
    for key in ("d_loss", "g_loss"):
        np.testing.assert_allclose(float(m_sp[key]), float(m_single[key]),
                                   rtol=1e-4)
    assert int(new_state.step) == 1


@pytest.mark.slow
def test_sp_composes_with_tp(sp_guard):
    """data=2 x model=2 x seq=2: TP shards heads/MLP width, SP shards tokens;
    losses must still match the unsharded step."""
    cfg = _f32_smoke()
    gan = build_gan(cfg)
    state0 = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    step = make_train_step(gan, cfg, donate=False)
    m = cfg.model
    real = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(1),
        (m.batch_size, m.image_size, m.image_size, m.channels)) * 2 - 1)
    _, m_single = step(state0, jnp.array(real))

    mcfg, mesh = _sp_mesh(2, model_parallel=2)
    assert mesh.shape == {"data": 2, "model": 2, "seq": 2}
    set_sequence_parallel(mesh, mcfg.data_axis, mcfg.seq_axis)
    state_sp = shard_train_state(create_train_state(jax.random.PRNGKey(0), gan, cfg),
                                 mesh, tensor_parallel=True)
    from jax.sharding import NamedSharding, PartitionSpec as P

    real_sp = jax.device_put(real, NamedSharding(mesh, P("data", None, None, None)))
    _, m_sp = make_train_step(gan, cfg, donate=False)(state_sp, real_sp)
    for key in ("d_loss", "g_loss"):
        np.testing.assert_allclose(float(m_sp[key]), float(m_single[key]),
                                   rtol=1e-4)


def test_trainer_rejects_sp_for_non_v2(sp_guard, tmp_path):
    """Only the v2 encoder applies the token constraints — other families
    would silently replicate over the seq axis; the trainer refuses."""
    from vitgan_tpu.train.trainer import Trainer

    cfg = C.replace(C.smoke_config("v1"), **{"mesh.context_parallel": 2})
    with pytest.raises(ValueError, match="context_parallel requires family"):
        Trainer(cfg, run_base=str(tmp_path))


@pytest.mark.slow
def test_trainer_fit_under_sp(sp_guard, tmp_path):
    """End-to-end wiring: Trainer builds the seq mesh from the config, sets
    the policy, trains, and a fresh SP-off trainer clears the policy."""
    from vitgan_tpu.train.trainer import Trainer

    cfg = C.replace(_f32_smoke(), **{"mesh.context_parallel": 2,
                                     "run.epochs": 1, "run.steps_per_epoch": 2,
                                     "data.on_device": False})
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    assert sequence_parallel_active()
    assert tr.mesh.axis_names == ("data", "model", "seq")
    metrics = tr.fit(epochs=1)
    assert np.isfinite(metrics["d_loss"]) and np.isfinite(metrics["g_loss"])

    cfg_off = C.replace(_f32_smoke(), **{"run.epochs": 1, "run.steps_per_epoch": 1,
                                         "data.on_device": False})
    Trainer(cfg_off, run_base=str(tmp_path / "off"), fid_extractor="random_conv")
    assert not sequence_parallel_active()
