"""Core tests: config tree, run dirs, mesh construction."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vitgan_tpu import config as C
from vitgan_tpu.parallel import make_mesh, batch_sharding, shard_batch
from vitgan_tpu.utils import construct_directories
from vitgan_tpu.utils.run_dirs import data_dir, latest_run


def test_default_configs_match_reference_hparams():
    v1 = C.V1Config()
    assert v1.image_size == 32 and v1.batch_size == 128 and v1.latent_dim == 1024
    assert v1.generator.hidden_size == 384 and v1.generator.depth == 4
    assert v1.generator.siren_hidden == 768
    assert v1.discriminator.patch_size == 8 and v1.discriminator.overlap == 2
    assert v1.generator.optim.beta1 == 0.5 and v1.generator.optim.beta2 == 0.999
    v2 = C.V2Config()
    assert v2.batch_size == 64 and v2.embed_dim == 128 and v2.depth == 6
    assert v2.num_heads == 4 and v2.mlp_ratio == 2 and v2.patch_size == 4
    assert v2.dropout == 0.1 and v2.epochs == 500


def test_config_replace_dotted():
    cfg = C.ExperimentConfig()
    cfg2 = C.replace(cfg, **{"v2.depth": 3, "family": "v1"})
    assert cfg2.v2.depth == 3 and cfg2.family == "v1"
    assert cfg.v2.depth == 6  # original untouched


def test_configs_hashable():
    cfg = C.ExperimentConfig()
    hash(cfg)
    hash(C.smoke_config())


def test_run_dirs_layout(tmp_path):
    dirs = construct_directories("testrun", base=str(tmp_path))
    for sub in ("images", "input", "noise", "checkpoints"):
        assert os.path.isdir(os.path.join(str(tmp_path), "testrun", sub))
    assert latest_run(str(tmp_path)).endswith("testrun")
    assert os.path.isdir(data_dir("synthetic"))


def test_mesh_and_batch_sharding(mesh8):
    assert mesh8.devices.size == 8
    assert mesh8.axis_names == ("data", "model")
    batch = np.ones((16, 32, 32, 3), np.float32)
    sharded = shard_batch(mesh8, batch)
    assert sharded.sharding == batch_sharding(mesh8, 4)
    # Each device holds 1/8 of the batch.
    assert sharded.addressable_shards[0].data.shape == (2, 32, 32, 3)
    # Scalar (0-d) leaves in a batch pytree are replicated, not sharded.
    tree = shard_batch(mesh8, {"x": batch, "weight": np.float32(0.5)})
    assert float(tree["weight"]) == 0.5
    assert tree["weight"].sharding.is_fully_replicated


def test_mesh_model_axis():
    from vitgan_tpu.config import MeshConfig

    mesh = make_mesh(MeshConfig(model_parallel=2))
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
