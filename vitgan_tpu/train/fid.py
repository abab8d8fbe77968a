"""Frechet Inception Distance on TPU.

Parity target: torchmetrics FrechetInceptionDistance as used per-epoch by both
reference trainers (ref:src/v1/gan.py:207-208,254-283; ref:src/v2/utils.py:155-175):
images are converted to uint8, featurized, and the Frechet distance between
Gaussian fits of real/fake features is reported.

Zero-egress design: the Frechet math is exact and tested against analytic
cases; the feature extractor is pluggable —

- ``inception``: InceptionV3 pool3 features via torch (CPU) when a local
  torchvision checkpoint exists (matches torchmetrics numerics);
- ``random_conv`` (default): a fixed-seed, untrained conv feature extractor in
  JAX (a Frechet Random-Feature Distance).  Untrained-network FID variants are
  an established proxy; relative comparisons (is model A closer to the data
  than model B) remain meaningful, absolute values are NOT comparable to
  Inception-FID numbers.

Feature accumulation is streaming (count, sum, sum of outer products) so FID
over any sample budget needs O(D^2) memory, with the featurizer jitted on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Frechet distance math
# ---------------------------------------------------------------------------


class FeatureStats:
    """Streaming Gaussian moment accumulator."""

    def __init__(self, dim: int):
        self.n = 0
        self.sum = np.zeros((dim,), np.float64)
        self.sum_outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray) -> None:
        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.sum += f.sum(0)
        self.sum_outer += f.T @ f

    def moments(self) -> Tuple[np.ndarray, np.ndarray]:
        if self.n < 2:
            raise ValueError("need >=2 samples for covariance")
        mu = self.sum / self.n
        cov = (self.sum_outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, cov


def _sqrt_psd(mat: np.ndarray) -> np.ndarray:
    vals, vecs = np.linalg.eigh(mat)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """||mu1-mu2||^2 + Tr(C1 + C2 - 2 sqrtm(C1 C2)), via the PSD-stable form."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1, cov2 = np.asarray(cov1, np.float64), np.asarray(cov2, np.float64)
    a = _sqrt_psd(cov1)
    m = a @ cov2 @ a
    eigs = np.clip(np.linalg.eigvalsh(m), 0.0, None)
    tr_sqrt = float(np.sqrt(eigs).sum())
    diff = mu1 - mu2
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * tr_sqrt)


# ---------------------------------------------------------------------------
# Feature extractors
# ---------------------------------------------------------------------------


def _random_conv_params(key, channels: int, widths=(64, 128, 256, 512)):
    params = []
    c_in = channels
    for i, c_out in enumerate(widths):
        key, k = jax.random.split(key)
        w = jax.random.normal(k, (3, 3, c_in, c_out)) * np.sqrt(2.0 / (9 * c_in))
        params.append(w)
        c_in = c_out
    return params


def random_conv_features(params, x_u8: jnp.ndarray, feature_dim: int = 512) -> jnp.ndarray:
    """Pure feature fn of the fixed random conv net (jit/scan-able)."""
    x = x_u8.astype(jnp.float32) / 127.5 - 1.0
    for w in params:
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.gelu(x)
    x = jnp.mean(x, axis=(1, 2))
    return x[:, :feature_dim]


def make_random_conv_extractor(channels: int = 3, seed: int = 42,
                               feature_dim: int = 512) -> Callable[[np.ndarray], np.ndarray]:
    """Fixed random conv net: u8 images (N,H,W,C) -> (N, feature_dim) float32."""
    params = _random_conv_params(jax.random.PRNGKey(seed), channels)
    features = jax.jit(lambda x_u8: random_conv_features(params, x_u8, feature_dim))
    fn = lambda imgs: np.asarray(features(jnp.asarray(imgs)))  # noqa: E731
    fn.jax_params = params  # expose for the on-device FID path
    fn.jax_feature_fn = lambda x_u8: random_conv_features(params, x_u8, feature_dim)
    fn.feature_dim = feature_dim
    return fn


def inception_weights_path() -> Optional[str]:
    """Locate ported InceptionV3 weights: $INCEPTION_WEIGHTS, else
    $SCRATCH/inception/fid_inception.npz (see scripts/port_inception.py)."""
    import os

    p = os.environ.get("INCEPTION_WEIGHTS")
    if p and os.path.exists(p):
        return p
    scratch = os.environ.get("SCRATCH", ".")
    p = os.path.join(scratch, "inception", "fid_inception.npz")
    return p if os.path.exists(p) else None


def make_inception_jax_extractor(weights_path: Optional[str] = None,
                                 batch: int = 64) -> Callable[[np.ndarray], np.ndarray]:
    """JAX/TPU InceptionV3 pool3 features (2048-d), parity-verified against a
    torch mirror of the torchmetrics FID model (scripts/port_inception.py).

    Requires ported weights on disk (.npz via port_inception.py, or a raw
    torch .pth which is converted on the fly) — zero-egress environments
    cannot download them, so this raises FileNotFoundError when absent and
    ``make_feature_extractor("auto")`` falls back to random_conv.
    """
    from vitgan_tpu.models import inception as I

    path = weights_path or inception_weights_path()
    if path is None:
        raise FileNotFoundError(
            "no InceptionV3 weights found (set $INCEPTION_WEIGHTS or run "
            "scripts/port_inception.py <torchvision .pth> <out.npz>)")
    if path.endswith((".pth", ".pt")):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        params = I.convert_torch_state_dict(sd.get("state_dict", sd))
    else:
        params = I.load_params(path)
    params = jax.device_put(params)
    features = jax.jit(lambda x_u8: I.inception_features(params, x_u8))

    def fn(imgs: np.ndarray) -> np.ndarray:
        imgs = np.asarray(imgs)
        out = [np.asarray(features(jnp.asarray(imgs[i:i + batch])))
               for i in range(0, len(imgs), batch)]
        return np.concatenate(out, 0)

    fn.jax_feature_fn = lambda x_u8: I.inception_features(params, x_u8)
    fn.feature_dim = I.FEATURE_DIM
    if "fc" in params:  # torchvision checkpoints carry the classifier head;
        # pytorch-fid ones don't — Inception Score available only with the former.
        logits_jit = jax.jit(lambda x_u8: I.inception_logits(params, x_u8))

        def logits_fn(imgs: np.ndarray) -> np.ndarray:
            imgs = np.asarray(imgs)
            out = [np.asarray(logits_jit(jnp.asarray(imgs[i:i + batch])))
                   for i in range(0, len(imgs), batch)]
            return np.concatenate(out, 0)

        fn.logits_fn = logits_fn
    return fn


def make_inception_extractor() -> Callable[[np.ndarray], np.ndarray]:
    """torchvision InceptionV3 pool3 (2048-d), CPU.  Requires local weights."""
    import torch
    from torchvision.models import Inception_V3_Weights, inception_v3

    net = inception_v3(weights=Inception_V3_Weights.DEFAULT)  # raises offline w/o cache
    net.fc = torch.nn.Identity()
    net.eval()

    def features(imgs_u8: np.ndarray) -> np.ndarray:
        x = torch.from_numpy(np.asarray(imgs_u8)).permute(0, 3, 1, 2).float() / 255.0
        x = torch.nn.functional.interpolate(x, size=(299, 299), mode="bilinear",
                                            align_corners=False)
        x = (x - torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)) / torch.tensor(
            [0.229, 0.224, 0.225]
        ).view(1, 3, 1, 1)
        with torch.no_grad():
            return net(x).numpy()

    return features


def make_feature_extractor(name: str = "auto", channels: int = 3):
    """auto: ported JAX Inception weights if present, else torch-CPU
    torchvision Inception if importable, else the random-conv proxy."""
    if name == "inception":
        # The historical documented name: prefer the JAX port, but keep the
        # torch-CPU torchvision path as fallback (the pre-port behavior) so
        # runs with only torchvision weights staged keep working.
        try:
            return make_inception_jax_extractor()
        except Exception:
            return make_inception_extractor()
    if name == "inception_jax":
        return make_inception_jax_extractor()
    if name == "inception_torch":
        return make_inception_extractor()
    if name == "random_conv":
        return make_random_conv_extractor(channels)
    if name == "auto":
        try:
            return make_inception_jax_extractor()
        except Exception:
            pass
        try:
            return make_inception_extractor()
        except Exception:
            return make_random_conv_extractor(channels)
    raise ValueError(f"unknown extractor {name!r}")


# ---------------------------------------------------------------------------
# On-device FID: features + Gaussian moments entirely on chip, ONE host pull
# ---------------------------------------------------------------------------


def make_on_device_fid(gan, cfg, extractor_params, batch_size: int,
                       n_batches: int, feature_dim: int = 512,
                       feature_fn: Optional[Callable] = None):
    """Build a jitted (g_vars, dataset_u8, real_idx, rng) -> moments function.

    Real batches are gathered from the device-resident uint8 dataset; fake
    batches are generated with fresh noise per batch (ref:src/v2/utils.py:160-164)
    and quantized to uint8 like the host path.  Everything — generator forwards,
    feature extraction, running moment sums — stays on device; the caller pulls
    four small arrays once and finishes the Frechet math on host.

    ``feature_fn`` (u8 NHWC -> (N, feature_dim) f32, pure/jittable) selects the
    featurizer — e.g. an extractor's ``.jax_feature_fn`` (JAX Inception or the
    random-conv proxy).  Default: random_conv with ``extractor_params``.
    """
    from vitgan_tpu.train.step import _compute_dtype

    dtype = _compute_dtype(cfg)

    def feats_of_u8(x_u8):
        if feature_fn is not None:
            return feature_fn(x_u8)
        return random_conv_features(extractor_params, x_u8, feature_dim)

    @jax.jit
    def moments(g_vars, dataset_u8, real_idx, rng):
        def real_body(carry, idx):
            s, so = carry
            f = feats_of_u8(jnp.take(dataset_u8, idx, axis=0)).astype(jnp.float32)
            return (s + f.sum(0), so + f.T @ f), None

        def fake_body(carry, i):
            s, so = carry
            z = gan.sample_latent(jax.random.fold_in(rng, i), batch_size).astype(dtype)
            imgs, _ = gan.generator_apply(g_vars, z)
            u8 = jnp.clip(jnp.round((imgs.astype(jnp.float32) + 1.0) * 127.5),
                          0, 255).astype(jnp.uint8)
            f = feats_of_u8(u8).astype(jnp.float32)
            return (s + f.sum(0), so + f.T @ f), None

        zero = (jnp.zeros((feature_dim,), jnp.float32),
                jnp.zeros((feature_dim, feature_dim), jnp.float32))
        (rs, rso), _ = jax.lax.scan(real_body, zero, real_idx)
        (fs, fso), _ = jax.lax.scan(fake_body, zero, jnp.arange(n_batches))
        return jnp.stack([rs, fs]), jnp.stack([rso, fso])

    def compute(g_vars, dataset_u8, real_idx, rng) -> float:
        sums, souters = jax.device_get(moments(g_vars, dataset_u8, real_idx, rng))
        n = n_batches * batch_size
        out = []
        for s, so in zip(sums, souters):
            mu = s.astype(np.float64) / n
            cov = (so.astype(np.float64) - n * np.outer(mu, mu)) / (n - 1)
            out.append((mu, cov))
        (mu_r, cov_r), (mu_f, cov_f) = out
        return frechet_distance(mu_r, cov_r, mu_f, cov_f)

    return compute


# ---------------------------------------------------------------------------
# End-to-end FID evaluation
# ---------------------------------------------------------------------------


def to_uint8(images) -> np.ndarray:
    """[-1,1] floats -> uint8, matching the reference's pre-FID conversion
    (ref:src/v2/utils.py:165-173 convert_to_uint8 role)."""
    x = np.asarray(images, np.float32)
    return np.clip(np.rint((x + 1.0) * 127.5), 0, 255).astype(np.uint8)


def compute_fid(
    sample_batch: Callable[[jax.Array, int], np.ndarray],
    real_batches: Iterator[np.ndarray],
    extractor: Callable[[np.ndarray], np.ndarray],
    rng: jax.Array,
    num_samples: int,
    batch_size: int,
) -> float:
    """FID between generated samples and real batches.

    ``sample_batch(rng, n)`` returns n generated images in [-1,1];
    ``real_batches`` yields uint8 or [-1,1] real image batches.  Fresh noise per
    generated batch (ref:src/v2/utils.py:160-164).
    """
    dim = None
    real_stats = fake_stats = None
    seen = 0
    for rb in real_batches:
        rb = np.asarray(rb)
        if rb.dtype != np.uint8:
            rb = to_uint8(rb)
        take = min(len(rb), num_samples - seen)
        if take <= 0:
            break
        feats = extractor(rb[:take])
        if real_stats is None:
            dim = feats.shape[-1]
            real_stats, fake_stats = FeatureStats(dim), FeatureStats(dim)
        real_stats.update(feats)
        seen += take
        if seen >= num_samples:
            break
    if real_stats is None:
        raise ValueError("no real batches provided")
    generated = 0
    while generated < seen:
        rng, k = jax.random.split(rng)
        n = min(batch_size, seen - generated)
        fakes = sample_batch(k, n)
        fake_stats.update(extractor(to_uint8(fakes)))
        generated += n
    mu_r, cov_r = real_stats.moments()
    mu_f, cov_f = fake_stats.moments()
    return frechet_distance(mu_r, cov_r, mu_f, cov_f)
