"""Fully-sharded data parallelism (mesh.fsdp): parameters and optimizer
moments shard over the data axis; XLA inserts the all-gathers/reduce-scatters
from the placements.  Numerics must equal the replicated step exactly, and
the sharded placement must survive a train step (no silent re-replication)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from vitgan_tpu import config as C
from vitgan_tpu.models import build_gan
from vitgan_tpu.parallel.sharding import fsdp_shardings, shard_train_state
from vitgan_tpu.train import create_train_state, make_train_step


def _cfg(**kw):
    cfg = C.smoke_config("v2")
    return C.replace(cfg, **{"v2.depth": 2, "v2.dropout": 0.0,
                             "runtime.compute_dtype": "float32",
                             "runtime.donate_state": False, **kw})


def _real_batch(cfg, seed: int):
    return jax.random.uniform(jax.random.PRNGKey(seed),
                              (cfg.model.batch_size, cfg.model.image_size,
                               cfg.model.image_size, cfg.model.channels),
                              minval=-1.0, maxval=1.0)


@pytest.fixture(scope="module")
def data_mesh():
    import numpy as _np

    return Mesh(_np.array(jax.devices()).reshape(8, 1),
                axis_names=("data", "model"))


def test_fsdp_shardings_pick_largest_divisible_dim(data_mesh):
    tree = {"big": jnp.zeros((16, 384)), "tiny": jnp.zeros((4, 4)),
            "scalar": jnp.zeros(()), "odd": jnp.zeros((3, 4096))}
    sh = fsdp_shardings(tree, data_mesh, min_size=64)
    assert sh["big"].spec == P(None, "data")       # 384 divisible, larger dim
    assert sh["tiny"].spec == P()                  # under min_size
    assert sh["scalar"].spec == P()
    assert sh["odd"].spec == P(None, "data")       # dim0=3 indivisible by 8


@pytest.mark.slow
def test_fsdp_step_matches_replicated(data_mesh):
    cfg = _cfg()
    gan = build_gan(cfg)
    real = _real_batch(cfg, 5)
    step = make_train_step(gan, cfg, donate=False)
    base = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    s_rep, m_rep = step(shard_train_state(base, data_mesh), real)
    s_fs = shard_train_state(base, data_mesh, fsdp=True, fsdp_min_size=256)
    # something actually got sharded
    specs = [x.sharding.spec for x in jax.tree.leaves(s_fs.g_params)]
    assert any("data" in (s or ()) for s in specs)
    s_fs2, m_fs = step(s_fs, real)
    for key in ("d_loss", "g_loss"):
        np.testing.assert_allclose(float(m_fs[key]), float(m_rep[key]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_fs2.g_params), jax.tree.leaves(s_rep.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_fsdp_placement_survives_the_step(data_mesh):
    """The updated state must keep the FSDP shardings — otherwise step 2
    onward trains on silently re-replicated params."""
    cfg = _cfg()
    gan = build_gan(cfg)
    real = _real_batch(cfg, 6)
    s_fs = shard_train_state(create_train_state(jax.random.PRNGKey(0), gan, cfg),
                             data_mesh, fsdp=True, fsdp_min_size=256)
    step = make_train_step(gan, cfg, donate=False,
                           state_shardings=jax.tree.map(lambda x: x.sharding, s_fs))
    want = [x.sharding for x in jax.tree.leaves(s_fs.g_params)]
    s2, _ = step(s_fs, real)
    for leaf, w in zip(jax.tree.leaves(s2.g_params), want):
        assert leaf.sharding.is_equivalent_to(w, ndim=leaf.ndim), \
            (leaf.sharding, w)


@pytest.mark.slow
def test_fsdp_composes_with_tp():
    """TP claims the head/width axes; FSDP takes the largest free dim of the
    same leaf — and the composed step still matches replicated numerics."""
    import numpy as _np

    mesh = Mesh(_np.array(jax.devices()).reshape(4, 2), axis_names=("data", "model"))
    cfg = _cfg()
    gan = build_gan(cfg)
    base = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    sh = fsdp_shardings(base.d_params, mesh, tensor_parallel=True, min_size=64)
    flat = {tuple(str(getattr(k, "key", getattr(k, "name", k))) for k in p): v.spec
            for p, v in jax.tree_util.tree_flatten_with_path(sh)[0]}
    qkv_specs = [v for k, v in flat.items() if k[-1] == "qkv"]
    assert qkv_specs and all("model" in s and "data" in s for s in qkv_specs)

    real = _real_batch(cfg, 7)
    step = make_train_step(gan, cfg, donate=False)
    _, m_rep = step(shard_train_state(base, mesh), real)
    _, m_fs = step(shard_train_state(base, mesh, tensor_parallel=True,
                                     fsdp=True, fsdp_min_size=64), real)
    for key in ("d_loss", "g_loss"):
        np.testing.assert_allclose(float(m_fs[key]), float(m_rep[key]),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_trainer_fsdp_with_pipeline(tmp_path):
    """mesh.fsdp + mesh.pipeline_parallel compose: the data axis goes AUTO in
    the pipeline shard_map so block params keep their ZeRO sharding inside
    the stages (a manual data axis would silently all-gather them)."""
    from vitgan_tpu.train.trainer import Trainer

    cfg = C.replace(
        C.smoke_config("v2"),
        **{"mesh.fsdp": True, "mesh.fsdp_min_size": 256,
           "mesh.pipeline_parallel": 2, "v2.depth": 4,
           "run.steps_per_epoch": 2, "run.fid_num_samples": 16,
           "run.checkpoint_every_epochs": 0, "run_name": "fsdp_pp",
           # bf16 + auto-axis collectives in the pipeline aborts XLA:CPU
           # (scripts/repro_xla_allreduce_bug.py); f32 on the CPU mesh.
           "runtime.compute_dtype": "float32"},
    )
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    assert tr.mesh.shape == {"data": 4, "model": 1, "pipe": 2}
    specs = [x.sharding.spec for x in jax.tree.leaves(tr.state.g_params)]
    assert any("data" in (s or ()) for s in specs)
    metrics = tr.fit(epochs=1)
    assert np.isfinite(metrics["d_loss"]) and np.isfinite(metrics["fid"])
    # placement survived the epoch
    specs = [x.sharding.spec for x in jax.tree.leaves(tr.state.g_params)]
    assert any("data" in (s or ()) for s in specs)


@pytest.mark.slow
def test_trainer_fsdp_tp_pp_triple(tmp_path):
    """The full composition on one 2x2x2 mesh: ZeRO over data + TP over model
    (both AUTO inside the pipeline stages) + GPipe over pipe (manual)."""
    from vitgan_tpu.train.trainer import Trainer

    cfg = C.replace(
        C.smoke_config("v2"),
        **{"mesh.fsdp": True, "mesh.fsdp_min_size": 256,
           "mesh.model_parallel": 2, "mesh.pipeline_parallel": 2,
           "v2.depth": 4, "run.steps_per_epoch": 2, "run.fid_num_samples": 16,
           "run.checkpoint_every_epochs": 0, "run_name": "triple",
           "runtime.compute_dtype": "float32"},
    )
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    assert tr.mesh.shape == {"data": 2, "model": 2, "pipe": 2}
    flat = {tuple(str(getattr(k, "key", getattr(k, "name", k))) for k in p): v
            for p, v in jax.tree_util.tree_flatten_with_path(
                tr.state.d_params)[0]}
    qkv = [v.sharding.spec for k, v in flat.items() if k[-1] == "qkv"]
    assert qkv and all("model" in s for s in qkv)  # TP live
    specs = [x.sharding.spec for x in jax.tree.leaves(tr.state.g_params)]
    assert any("data" in (s or ()) for s in specs)  # FSDP live
    metrics = tr.fit(epochs=1)
    assert np.isfinite(metrics["d_loss"]) and np.isfinite(metrics["fid"])


@pytest.mark.slow
def test_trainer_fsdp(tmp_path):
    """mesh.fsdp=true through the whole trainer surface (fit + FID + ckpt)."""
    from vitgan_tpu.train.trainer import Trainer

    cfg = C.replace(
        C.smoke_config("v2"),
        **{"mesh.fsdp": True, "mesh.fsdp_min_size": 256,
           "run.steps_per_epoch": 2, "run.fid_num_samples": 16,
           "run.checkpoint_every_epochs": 1, "run_name": "fsdp"},
    )
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    specs = [x.sharding.spec for x in jax.tree.leaves(tr.state.g_params)]
    assert any("data" in (s or ()) for s in specs)
    metrics = tr.fit(epochs=1)
    assert np.isfinite(metrics["d_loss"]) and np.isfinite(metrics["fid"])
    tr.resume()  # restore re-applies the FSDP placement
    specs = [x.sharding.spec for x in jax.tree.leaves(tr.state.g_params)]
    assert any("data" in (s or ()) for s in specs)
