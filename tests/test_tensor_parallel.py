"""Tensor parallelism: TP-sharded params produce identical numerics to
replicated execution, with heads/MLP width split over the model axis."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vitgan_tpu import config as C
from vitgan_tpu.config import MeshConfig
from vitgan_tpu.models import build_gan
from vitgan_tpu.parallel import make_mesh, shard_batch
from vitgan_tpu.parallel.sharding import shard_train_state, tp_shardings
from vitgan_tpu.train import create_train_state, make_train_step


@pytest.fixture(scope="module")
def tp_mesh():
    return make_mesh(MeshConfig(model_parallel=2))  # 4 data x 2 model


def test_tp_sharding_rules(tp_mesh, rng):
    from vitgan_tpu.models import layers as L

    p, _ = L.mhsa_init(rng, 32, 4, qkv_bias=True)
    sh = tp_shardings(p, tp_mesh)
    assert sh["qkv"].spec == P(None, "model", None, None)
    assert sh["qkv_b"].spec == P(None, "model", None)
    assert sh["out"]["w"].spec == P("model", None)
    assert sh["out"]["b"].spec == P()


def test_tp_rule_indivisible_falls_back_replicated(tp_mesh, rng):
    from vitgan_tpu.models import layers as L

    p, _ = L.mhsa_init(rng, 33, 3)  # 3 heads not divisible by model=2
    sh = tp_shardings(p, tp_mesh)
    assert sh["qkv"].spec == P()


@pytest.mark.slow
def test_tp_train_step_matches_replicated(tp_mesh, rng):
    cfg = C.smoke_config("v2")
    gan = build_gan(cfg)
    state = create_train_state(rng, gan, cfg)
    step = make_train_step(gan, cfg, donate=False)
    real = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)) * 2 - 1)

    state_repl = shard_train_state(state, tp_mesh, tensor_parallel=False)
    _, m_repl = step(state_repl, shard_batch(tp_mesh, real))

    state_tp = shard_train_state(state, tp_mesh, tensor_parallel=True)
    # verify something actually got sharded on the model axis
    qkv_sh = state_tp.g_params["blocks"][0]["msha"]["qkv"].sharding
    assert qkv_sh.spec == P(None, "model", None, None)
    new_tp, m_tp = step(state_tp, shard_batch(tp_mesh, real))

    np.testing.assert_allclose(float(m_repl["d_loss"]), float(m_tp["d_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m_repl["g_loss"]), float(m_tp["g_loss"]), rtol=1e-4)


@pytest.mark.slow
def test_tp_v1_with_isr_state(tp_mesh, rng):
    cfg = C.smoke_config("v1")
    gan = build_gan(cfg)
    state = create_train_state(rng, gan, cfg)
    state_tp = shard_train_state(state, tp_mesh, tensor_parallel=True)
    isr = state_tp.d_state["blocks"][0]["msha"]["isr"]
    assert isr["sigma0"].sharding.spec == P(None, "model")
    step = make_train_step(gan, cfg, donate=False)
    real = shard_batch(tp_mesh, np.random.default_rng(0)
                       .uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))
    _, m = step(state_tp, real)
    assert np.isfinite(float(m["d_loss"]))
