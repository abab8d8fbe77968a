"""On-device differentiable augmentations (DiffAugment-style).

BASELINE config #4 calls for a DeiT-style discriminator with heavier
augmentations at 64x64.  The reference has only torchvision resize/crop/
normalize host transforms (ref:src/v1/utils.py:124-131); these are the
TPU-native augment kernels: pure jnp, jit/vmap-able, differentiable (so the
generator pass can backprop through augmented fakes, the DiffAugment recipe),
driven by explicit PRNG keys.

All ops take/return (B, H, W, C) in [-1, 1].
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp


def random_flip(rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample horizontal flip with p=0.5."""
    flip = jax.random.bernoulli(rng, 0.5, (x.shape[0], 1, 1, 1))
    return jnp.where(flip, x[:, :, ::-1, :], x)


def random_brightness(rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """x + U(-0.5, 0.5) per sample."""
    b = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype, -0.5, 0.5)
    return x + b


def random_saturation(rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Scale deviation from the per-pixel channel mean by U(0, 2)."""
    mean = x.mean(axis=-1, keepdims=True)
    s = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype, 0.0, 2.0)
    return (x - mean) * s + mean


def random_contrast(rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Scale deviation from the per-sample mean by U(0.5, 1.5)."""
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    c = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype, 0.5, 1.5)
    return (x - mean) * c + mean


def random_translation(rng: jax.Array, x: jnp.ndarray, ratio: float = 0.125) -> jnp.ndarray:
    """Shift by up to ratio*size per axis, zero padding (gather-based, static shapes)."""
    b, h, w, c = x.shape
    max_dy = max(1, int(h * ratio))
    max_dx = max(1, int(w * ratio))
    ky, kx = jax.random.split(rng)
    dy = jax.random.randint(ky, (b,), -max_dy, max_dy + 1)
    dx = jax.random.randint(kx, (b,), -max_dx, max_dx + 1)
    pad = jnp.pad(x, ((0, 0), (max_dy, max_dy), (max_dx, max_dx), (0, 0)))
    rows = (jnp.arange(h)[None, :] + max_dy - dy[:, None])  # (B, H)
    cols = (jnp.arange(w)[None, :] + max_dx - dx[:, None])  # (B, W)
    out = jax.vmap(lambda img, r, cc: img[r][:, cc])(pad, rows, cols)
    return out


def random_cutout(rng: jax.Array, x: jnp.ndarray, ratio: float = 0.5) -> jnp.ndarray:
    """Zero a random (ratio*H, ratio*W) window per sample."""
    b, h, w, c = x.shape
    ch, cw = max(1, int(h * ratio)), max(1, int(w * ratio))
    ky, kx = jax.random.split(rng)
    y0 = jax.random.randint(ky, (b, 1, 1), 0, h - ch + 1)
    x0 = jax.random.randint(kx, (b, 1, 1), 0, w - cw + 1)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    mask = ((yy >= y0) & (yy < y0 + ch) & (xx >= x0) & (xx < x0 + cw))
    return jnp.where(mask[..., None], 0.0, x).astype(x.dtype)


_AUGMENTS: Dict[str, Callable] = {
    "flip": random_flip,
    "brightness": random_brightness,
    "saturation": random_saturation,
    "contrast": random_contrast,
    "translation": random_translation,
    "cutout": random_cutout,
}
# 'color' = the DiffAugment color group.
_GROUPS: Dict[str, Sequence[str]] = {
    "color": ("brightness", "saturation", "contrast"),
}


def parse_augment_spec(spec: str) -> Sequence[str]:
    names = []
    for tok in (t.strip() for t in spec.split(",") if t.strip()):
        names.extend(_GROUPS.get(tok, (tok,)))
    unknown = [n for n in names if n not in _AUGMENTS]
    if unknown:
        raise ValueError(f"unknown augmentations: {unknown}")
    return tuple(names)


def apply_augment(rng: jax.Array, x: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Apply the comma-separated augment spec (e.g. 'color,translation,cutout')."""
    names = parse_augment_spec(spec)
    if not names:
        return x
    keys = jax.random.split(rng, len(names))
    for name, k in zip(names, keys):
        x = _AUGMENTS[name](k, x)
    return x
