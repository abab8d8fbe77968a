"""Toy MLP GAN (ref:idc.py:52-90): ReLU MLP generator with tanh output, mirror
MLP discriminator with a single logit (reference applies sigmoid; we return the
logit and keep sigmoid inside BCE-with-logits)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from vitgan_tpu.config import MLPGANConfig
from vitgan_tpu.models import layers as L


def generator_init(key, cfg: MLPGANConfig, dtype=jnp.float32) -> Dict[str, Any]:
    out_dim = cfg.image_size * cfg.image_size * cfg.channels
    return {"params": L.mlp_init(key, cfg.latent_dim, out_dim, cfg.hidden, dtype),
            "state": {}}


def generator_apply(variables, z, cfg: MLPGANConfig, *, rng=None, train=False):
    x = L.mlp(variables["params"], z, activation="relu")
    img = jnp.tanh(x).reshape(-1, cfg.image_size, cfg.image_size, cfg.channels)
    return img, {}


def discriminator_init(key, cfg: MLPGANConfig, dtype=jnp.float32) -> Dict[str, Any]:
    in_dim = cfg.image_size * cfg.image_size * cfg.channels
    return {"params": L.mlp_init(key, in_dim, 1, tuple(reversed(cfg.hidden)), dtype),
            "state": {}}


def discriminator_apply(variables, images, cfg: MLPGANConfig, *, rng=None, train=False,
                        update_state: bool = False):
    x = images.reshape(images.shape[0], -1)
    return L.mlp(variables["params"], x, activation="relu")[:, 0], {}
