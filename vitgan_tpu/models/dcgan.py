"""DCGAN baseline: conv generator/discriminator.

Rebuild of the reference's DCGAN notebook models (ref:cnn/cnn-gan.ipynb cell 10)
and the v2 conv GAN wrappers (ref:src/v2/modules.py:256-341): transposed-conv
generator from z=(latent,) and strided-conv discriminator, with the notebook's
exact BatchNorm placement (G: after the 2nd deconv only; D: after every conv).

TPU notes: convs run NHWC through lax.conv_general_dilated (XLA maps 4x4
stride-2 convs onto the MXU); BatchNorm batch statistics are computed in
float32 with running stats carried in the state tree (the functional equivalent
of torch's buffers).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vitgan_tpu.config import DCGANConfig


# ---------------------------------------------------------------------------
# Functional conv / conv-transpose / batchnorm
# ---------------------------------------------------------------------------


def conv_init(key, in_ch: int, out_ch: int, k: int, dtype=jnp.float32) -> Dict[str, Any]:
    """DCGAN init: N(0, 0.02) (the notebook's weights_init convention)."""
    return {"w": 0.02 * jax.random.normal(key, (k, k, in_ch, out_ch), dtype)}


def conv(params, x, stride: int, padding: int):
    return jax.lax.conv_general_dilated(
        x, params["w"].astype(x.dtype), window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def conv_transpose(params, x, stride: int, padding: int):
    """torch ConvTranspose2d(k, stride, padding) semantics in NHWC."""
    k = params["w"].shape[0]
    pad = k - 1 - padding
    return jax.lax.conv_general_dilated(
        x, jnp.flip(params["w"], (0, 1)).astype(x.dtype),
        window_strides=(1, 1), padding=[(pad, pad)] * 2,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def bn_init(ch: int, dtype=jnp.float32) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    params = {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}
    state = {"mean": jnp.zeros((ch,), jnp.float32), "var": jnp.ones((ch,), jnp.float32)}
    return params, state


def batch_norm(params, state, x, train: bool, momentum: float = 0.1, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return y.astype(x.dtype), new_state


# ---------------------------------------------------------------------------
# Generator: z -> 4x4 -> 8x8 -> 16x16 -> 32x32 (ref:cnn/cnn-gan.ipynb cell 10)
# ---------------------------------------------------------------------------


def generator_init(key, cfg: DCGANConfig, dtype=jnp.float32) -> Dict[str, Any]:
    b = cfg.base_width
    keys = jax.random.split(key, 4)
    bn_p, bn_s = bn_init(b * 2, dtype)
    params = {
        "deconv1": conv_init(keys[0], cfg.latent_dim, b * 4, 4, dtype),
        "deconv2": conv_init(keys[1], b * 4, b * 2, 4, dtype),
        "bn2": bn_p,
        "deconv3": conv_init(keys[2], b * 2, b, 4, dtype),
        "deconv4": conv_init(keys[3], b, cfg.channels, 4, dtype),
    }
    return {"params": params, "state": {"bn2": bn_s}}


def generator_apply(variables, z, cfg: DCGANConfig, *, rng=None, train=False):
    p, s = variables["params"], variables["state"]
    x = z.reshape(z.shape[0], 1, 1, cfg.latent_dim)
    x = jax.nn.relu(conv_transpose(p["deconv1"], x, 1, 0))      # 4x4
    x = conv_transpose(p["deconv2"], x, 2, 1)                   # 8x8
    x, bn2 = batch_norm(p["bn2"], s["bn2"], x, train)
    x = jax.nn.relu(x)
    x = jax.nn.relu(conv_transpose(p["deconv3"], x, 2, 1))      # 16x16
    x = jnp.tanh(conv_transpose(p["deconv4"], x, 2, 1))         # 32x32
    return x, {"bn2": bn2}


# ---------------------------------------------------------------------------
# Discriminator: 32 -> 16 -> 8 -> 4 -> 1 logit (ref:cnn/cnn-gan.ipynb cell 10;
# identical topology to v1's unused CNN discriminator,
# ref:src/v1/discriminatorCNN.py:7-23 — this module covers both)
# ---------------------------------------------------------------------------


def discriminator_init(key, cfg: DCGANConfig, dtype=jnp.float32) -> Dict[str, Any]:
    b = cfg.base_width
    keys = jax.random.split(key, 4)
    bns = [bn_init(b, dtype), bn_init(b * 2, dtype), bn_init(b * 4, dtype)]
    params = {
        "conv1": conv_init(keys[0], cfg.channels, b, 4, dtype),
        "conv2": conv_init(keys[1], b, b * 2, 4, dtype),
        "conv3": conv_init(keys[2], b * 2, b * 4, 4, dtype),
        "conv4": conv_init(keys[3], b * 4, 1, 4, dtype),
        "bn1": bns[0][0], "bn2": bns[1][0], "bn3": bns[2][0],
    }
    state = {"bn1": bns[0][1], "bn2": bns[1][1], "bn3": bns[2][1]}
    return {"params": params, "state": state}


def discriminator_apply(variables, images, cfg: DCGANConfig, *, rng=None, train=False,
                        update_state: bool = False):
    p, s = variables["params"], variables["state"]
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)  # noqa: E731
    new_state = {}
    x = conv(p["conv1"], images, 2, 1)                          # 16x16
    x, new_state["bn1"] = batch_norm(p["bn1"], s["bn1"], x, train)
    x = lrelu(x)
    x = conv(p["conv2"], x, 2, 1)                               # 8x8
    x, new_state["bn2"] = batch_norm(p["bn2"], s["bn2"], x, train)
    x = lrelu(x)
    x = conv(p["conv3"], x, 2, 1)                               # 4x4
    x, new_state["bn3"] = batch_norm(p["bn3"], s["bn3"], x, train)
    x = lrelu(x)
    x = conv(p["conv4"], x, 1, 0)                               # 1x1 logit
    return x.reshape(x.shape[0]), new_state
