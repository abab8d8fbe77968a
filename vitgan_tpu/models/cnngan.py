"""v2 CNNGAN family: conv generator/discriminator with image-shaped noise.

Rebuild of the reference's v2 conv GAN wrappers (ref:src/v2/modules.py:256-341,
398-426 CNNGAN): the generator is an image-to-image conv stack — the latent is
image-SHAPED noise (ref:src/v2/training.py:35-42 construct_noise), downsampled
3x with BN+ReLU then upsampled back with transposed convs and tanh; the
discriminator is a 5-conv stack ending in a single logit (reference applies
sigmoid; we emit the logit).

Uniform GANBundle contract: the latent is carried as a flat (B, H*W*C) vector
and reshaped on entry, so `sample_latent` stays family-agnostic.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from vitgan_tpu.config import CNNGANConfig
from vitgan_tpu.models.dcgan import batch_norm, bn_init, conv, conv_init, conv_transpose


def generator_init(key, cfg: CNNGANConfig, dtype=jnp.float32) -> Dict[str, Any]:
    keys = jax.random.split(key, 6)
    bns = {f"bn{i}": bn_init(ch, dtype) for i, ch in
           zip((1, 2, 3, 4, 5), (64, 128, 256, 128, 64))}
    params = {
        "conv1": conv_init(keys[0], cfg.channels, 64, 4, dtype),
        "conv2": conv_init(keys[1], 64, 128, 4, dtype),
        "conv3": conv_init(keys[2], 128, 256, 4, dtype),
        "deconv1": conv_init(keys[3], 256, 128, 4, dtype),
        "deconv2": conv_init(keys[4], 128, 64, 4, dtype),
        "deconv3": conv_init(keys[5], 64, cfg.channels, 4, dtype),
        **{k: v[0] for k, v in bns.items()},
    }
    state = {k: v[1] for k, v in bns.items()}
    return {"params": params, "state": state}


def generator_apply(variables, z, cfg: CNNGANConfig, *, rng=None, train=False):
    """Flat noise -> (B,H,W,C) image noise -> conv down/up -> tanh image
    (ref:src/v2/modules.py:260-304)."""
    p, s = variables["params"], variables["state"]
    x = z.reshape(-1, cfg.image_size, cfg.image_size, cfg.channels)
    new_state = {}

    def down(name, bn, x, stride=2):
        y = conv(p[name], x, stride, 1)
        y, new_state[bn] = batch_norm(p[bn], s[bn], y, train)
        return jax.nn.relu(y)

    x = down("conv1", "bn1", x)            # 16x16x64
    x = down("conv2", "bn2", x)            # 8x8x128
    x = down("conv3", "bn3", x)            # 4x4x256
    y = conv_transpose(p["deconv1"], x, 2, 1)   # 8x8x128
    y, new_state["bn4"] = batch_norm(p["bn4"], s["bn4"], y, train)
    y = jax.nn.relu(y)
    y = conv_transpose(p["deconv2"], y, 2, 1)   # 16x16x64
    y, new_state["bn5"] = batch_norm(p["bn5"], s["bn5"], y, train)
    y = jax.nn.relu(y)
    y = jnp.tanh(conv_transpose(p["deconv3"], y, 2, 1))  # 32x32xC
    return y, new_state


def discriminator_init(key, cfg: CNNGANConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """5-conv stack 32->16->8->4->2->1 (ref:src/v2/modules.py:307-341)."""
    keys = jax.random.split(key, 5)
    bns = {f"bn{i}": bn_init(ch, dtype) for i, ch in zip((2, 3, 4), (128, 256, 512))}
    params = {
        "conv1": conv_init(keys[0], cfg.channels, 64, 4, dtype),
        "conv2": conv_init(keys[1], 64, 128, 4, dtype),
        "conv3": conv_init(keys[2], 128, 256, 4, dtype),
        "conv4": conv_init(keys[3], 256, 512, 4, dtype),
        "conv5": conv_init(keys[4], 512, 1, 2, dtype),
        **{k: v[0] for k, v in bns.items()},
    }
    return {"params": params, "state": {k: v[1] for k, v in bns.items()}}


def discriminator_apply(variables, images, cfg: CNNGANConfig, *, rng=None, train=False,
                        update_state: bool = False):
    p, s = variables["params"], variables["state"]
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)  # noqa: E731
    new_state = {}
    x = lrelu(conv(p["conv1"], images, 2, 1))    # 16x16x64, no BN on the first conv
    for i, name in ((2, "conv2"), (3, "conv3"), (4, "conv4")):
        x = conv(p[name], x, 2, 1)
        x, new_state[f"bn{i}"] = batch_norm(p[f"bn{i}"], s[f"bn{i}"], x, train)
        x = lrelu(x)                             # -> 8x8x128, 4x4x256, 2x2x512
    x = conv(p["conv5"], x, 1, 0)                # 1x1x1 logit
    return x.reshape(x.shape[0]), new_state
