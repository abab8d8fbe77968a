"""Trainer with a TP mesh: params actually sharded, training runs."""

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from vitgan_tpu import config as C
from vitgan_tpu.config import MeshConfig
from vitgan_tpu.parallel import make_mesh
from vitgan_tpu.train.trainer import Trainer
import pytest


@pytest.mark.slow
def test_trainer_tensor_parallel(tmp_path):
    cfg = C.replace(
        C.smoke_config("v2"),
        **{"mesh.model_parallel": 2, "run.steps_per_epoch": 2,
           "run.fid_num_samples": 16, "run.checkpoint_every_epochs": 0,
           "run_name": "tp"},
    )
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    qkv = tr.state.g_params["blocks"][0]["msha"]["qkv"]
    assert qkv.sharding.spec == P(None, "model", None, None)
    metrics = tr.fit(epochs=1)
    assert np.isfinite(metrics["d_loss"]) and np.isfinite(metrics["fid"])
