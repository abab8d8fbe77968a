"""Model zoo registry: a uniform GAN interface over all four families.

Families (SURVEY §2):
- ``v1``    — paper-style ViTGAN: SLN+SIREN generator, ISR/L2-attention discriminator
- ``v2``    — standard-ViT GAN (fixed-intent latent->image generator)
- ``dcgan`` — conv baseline (notebook)
- ``mlp``   — toy MLP GAN (idc.py)

Every family exposes ``init(key) -> {'params','state'}`` and pure applies:
``generator(vars, z, rng=, train=) -> (images_nhwc, new_state)`` and
``discriminator(vars, images, rng=, train=, update_state=) -> (logits, new_state)``.
Discriminators return raw logits; sigmoids live in the losses.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Tuple

import jax

from vitgan_tpu.config import ExperimentConfig
from vitgan_tpu.models import cnngan, dcgan, mlp_gan, vitgan_v1, vitgan_v2

_FAMILIES = {
    "v1": vitgan_v1,
    "v2": vitgan_v2,
    "dcgan": dcgan,
    "cnn": cnngan,
    "mlp": mlp_gan,
}


@dataclass(frozen=True)
class GANBundle:
    """Bound model family: closures carry the (static, hashable) model config."""

    family: str
    generator_init: Callable[[jax.Array], Any]
    generator_apply: Callable[..., Tuple[Any, Any]]
    discriminator_init: Callable[[jax.Array], Any]
    discriminator_apply: Callable[..., Tuple[Any, Any]]
    latent_dim: int
    image_shape: Tuple[int, int, int]  # (H, W, C)
    # True when D carries batch statistics (BatchNorm): the train step must
    # then run real/fake through SEPARATE forwards (two running-stat updates,
    # torch-reference semantics).  Stat-free discriminators (ViT, MLP — ISR
    # state depends only on weights) use one concatenated forward instead,
    # halving D-forward kernel dispatches with identical math.
    d_has_batch_stats: bool = False

    def sample_latent(self, rng: jax.Array, batch: int):
        """Fresh generator input noise (ref:src/v2/training.py:35-42 role)."""
        import jax.numpy as jnp

        return jax.random.normal(rng, (batch, self.latent_dim), jnp.float32)


def _tree_has_batch_stats(tree) -> bool:
    """True if any sub-dict carries BatchNorm running stats ({'mean','var'})."""
    if isinstance(tree, dict):
        if "mean" in tree and "var" in tree:
            return True
        return any(_tree_has_batch_stats(v) for v in tree.values())
    return False


def build_gan(cfg: ExperimentConfig) -> GANBundle:
    mod = _FAMILIES[cfg.family]
    mcfg = cfg.model
    d_init = partial(mod.discriminator_init, cfg=mcfg)
    # Derive the batch-stats flag from the ACTUAL state structure (abstract
    # init, no FLOPs) so the concat-D train-step optimization can never
    # silently desync from a family gaining/losing BatchNorm.
    d_shapes = jax.eval_shape(lambda: d_init(jax.random.PRNGKey(0)))
    return GANBundle(
        family=cfg.family,
        generator_init=partial(mod.generator_init, cfg=mcfg),
        generator_apply=partial(mod.generator_apply, cfg=mcfg),
        discriminator_init=d_init,
        discriminator_apply=partial(mod.discriminator_apply, cfg=mcfg),
        latent_dim=mcfg.latent_dim,
        image_shape=(mcfg.image_size, mcfg.image_size, mcfg.channels),
        d_has_batch_stats=_tree_has_batch_stats(d_shapes.get("state", {})),
    )


def count_params(tree) -> int:
    """Total parameter count (ref:src/v1/model_utils.py:1-5)."""
    return sum(x.size for x in jax.tree.leaves(tree))
