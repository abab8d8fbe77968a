"""GAN losses: BCE/MSE criteria, WGAN-GP machinery, diversity loss.

Parity targets:
- BCE/MSE criterion picker (ref:src/v1/gan.py:16-20); label semantics real=1,
  fake=0, generator trained against 1s (ref:src/v1/gan.py:216-252).
  Discriminators here emit logits, so BCE is the numerically-stable
  with-logits form — identical math to sigmoid+BCELoss.
- WGAN-GP gradient penalty (ref:src/v2/utils.py:124-144), diversity loss
  (ref:src/v2/utils.py:147-152), instance noise + the Wasserstein D/G losses of
  the reference's (dead but coherent) WGAN path (ref:src/v2/training.py:67-125).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy on raw logits."""
    logits = logits.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def mse_on_probs(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """MSE criterion option (ref:src/v1/gan.py:16-20 'mse' branch) on sigmoid probs."""
    return jnp.mean(jnp.square(jax.nn.sigmoid(logits.astype(jnp.float32)) - targets))


def pick_criterion(name: str) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    if name == "bce":
        return bce_with_logits
    if name == "mse":
        return mse_on_probs
    raise ValueError(f"unknown criterion {name!r}")


def d_adversarial_loss(criterion, real_logits, fake_logits) -> jnp.ndarray:
    """D: real->1, fake->0 (ref:src/v1/gan.py:222-239)."""
    ones = jnp.ones_like(real_logits, jnp.float32)
    zeros = jnp.zeros_like(fake_logits, jnp.float32)
    return criterion(real_logits, ones) + criterion(fake_logits, zeros)


def g_adversarial_loss(criterion, fake_logits) -> jnp.ndarray:
    """G: fake->1, the non-saturating loss (ref:src/v1/gan.py:245-252)."""
    return criterion(fake_logits, jnp.ones_like(fake_logits, jnp.float32))


def wasserstein_d_loss(real_logits, fake_logits) -> jnp.ndarray:
    """E[D(fake)] - E[D(real)] (ref:src/v2/training.py:101-107 intent)."""
    return jnp.mean(fake_logits.astype(jnp.float32)) - jnp.mean(real_logits.astype(jnp.float32))


def wasserstein_g_loss(fake_logits) -> jnp.ndarray:
    """-E[D(fake)] (ref:src/v2/training.py:80-86)."""
    return -jnp.mean(fake_logits.astype(jnp.float32))


def gradient_penalty(disc_fn: Callable[[jnp.ndarray], jnp.ndarray],
                     real: jnp.ndarray, fake: jnp.ndarray,
                     rng: jax.Array) -> jnp.ndarray:
    """WGAN-GP: ((||grad_x D(x_interp)||_2 - 1)^2).mean() (ref:src/v2/utils.py:124-144)."""
    eps = jax.random.uniform(rng, (real.shape[0],) + (1,) * (real.ndim - 1), jnp.float32)
    interp = (eps * real.astype(jnp.float32) + (1 - eps) * fake.astype(jnp.float32)).astype(real.dtype)

    def scalar_disc(x):
        return jnp.sum(disc_fn(x).astype(jnp.float32))

    grads = jax.grad(scalar_disc)(interp).astype(jnp.float32)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(grads.shape[0], -1)), axis=-1) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0))


def r1_penalty(disc_fn: Callable[[jnp.ndarray], jnp.ndarray],
               real: jnp.ndarray) -> jnp.ndarray:
    """R1 regularization: E[||grad_x D(x)||^2] on REAL samples only
    (Mescheder et al. 2018, "Which Training Methods for GANs do actually
    Converge?").  Beyond-reference, documented deviation: one extra backward
    on the real batch instead of WGAN-GP's interpolate+backward — roughly
    half the extra cost, and the standard stabilizer in modern GANs
    (StyleGAN lineage).  The caller scales by gamma/2."""

    def scalar_disc(x):
        return jnp.sum(disc_fn(x).astype(jnp.float32))

    grads = jax.grad(scalar_disc)(real).astype(jnp.float32)
    return jnp.mean(jnp.sum(jnp.square(grads.reshape(grads.shape[0], -1)), axis=-1))


def diversity_loss(fakes: jnp.ndarray) -> jnp.ndarray:
    """Mean pairwise L1 distance over flattened fakes (ref:src/v2/utils.py:147-152).

    The reference *adds* weight*diversity to the G loss after negating — the
    coherent intent is to reward diversity, so the trainer subtracts this term.
    """
    flat = fakes.reshape(fakes.shape[0], -1).astype(jnp.float32)
    diffs = jnp.abs(flat[:, None, :] - flat[None, :, :]).mean(-1)
    n = flat.shape[0]
    return jnp.sum(diffs) / (n * (n - 1) + 1e-12)


def accuracy_from_logits(logits: jnp.ndarray, is_real: bool) -> jnp.ndarray:
    """D accuracy diagnostics (ref:src/v2/training.py:110-118 role)."""
    pred = logits.astype(jnp.float32) > 0.0
    return jnp.mean((pred if is_real else ~pred).astype(jnp.float32))
