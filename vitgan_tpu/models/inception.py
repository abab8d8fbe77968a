"""InceptionV3 pool3 feature extractor in JAX, for Inception-FID on TPU.

Parity target: the FID InceptionV3 used by torchmetrics/pytorch-fid per the
reference's per-epoch FID (ref:src/v2/utils.py:155-175 — torchmetrics
``FrechetInceptionDistance(feature=2048)``).  That model is torchvision's
InceptionV3 architecture with three FID-specific pooling quirks (the
"FIDInception" blocks):

- every in-block 3x3/stride-1 average pool excludes padding from its divisor
  (``count_include_pad=False``),
- ``Mixed_7c``'s pool branch is a 3x3/stride-1 **max** pool,
- inputs are bilinearly resized to 299x299 (half-pixel, no antialias) and
  scaled to [-1, 1].

This is a clean-room implementation from the published architecture
(Szegedy et al., "Rethinking the Inception Architecture", and the public
torchvision/pytorch-fid module graphs).  Weights are NOT bundled (zero-egress
environment): ``convert_torch_state_dict`` ingests a torchvision/pytorch-fid
``state_dict`` (``.pth``) and folds each eval-mode BatchNorm into its
preceding convolution, producing a flat params pytree; ``save_params`` /
``load_params`` round-trip that pytree as ``.npz``.  The torch-side parity
mirror lives in ``scripts/port_inception.py`` and is exercised (random
weights) by ``tests/test_inception.py`` — with real weights the same script
verifies the port end to end and emits the ``.npz``.

Layout: NHWC activations, HWIO kernels (TPU-native).  The whole feature
forward is one jittable pure function of (params, uint8 images).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm eps
FEATURE_DIM = 2048
INPUT_SIZE = 299


# ---------------------------------------------------------------------------
# Architecture table: every BasicConv2d as (name, c_in, c_out, kh, kw).
# Names are exactly the torchvision module paths so the converter and the
# torch parity mirror share one source of truth.
# ---------------------------------------------------------------------------


def _inception_a(name: str, c_in: int, pool: int) -> List[Tuple[str, int, int, int, int]]:
    return [
        (f"{name}.branch1x1", c_in, 64, 1, 1),
        (f"{name}.branch5x5_1", c_in, 48, 1, 1),
        (f"{name}.branch5x5_2", 48, 64, 5, 5),
        (f"{name}.branch3x3dbl_1", c_in, 64, 1, 1),
        (f"{name}.branch3x3dbl_2", 64, 96, 3, 3),
        (f"{name}.branch3x3dbl_3", 96, 96, 3, 3),
        (f"{name}.branch_pool", c_in, pool, 1, 1),
    ]


def _inception_b(name: str, c_in: int) -> List[Tuple[str, int, int, int, int]]:
    return [
        (f"{name}.branch3x3", c_in, 384, 3, 3),
        (f"{name}.branch3x3dbl_1", c_in, 64, 1, 1),
        (f"{name}.branch3x3dbl_2", 64, 96, 3, 3),
        (f"{name}.branch3x3dbl_3", 96, 96, 3, 3),
    ]


def _inception_c(name: str, c_in: int, c7: int) -> List[Tuple[str, int, int, int, int]]:
    return [
        (f"{name}.branch1x1", c_in, 192, 1, 1),
        (f"{name}.branch7x7_1", c_in, c7, 1, 1),
        (f"{name}.branch7x7_2", c7, c7, 1, 7),
        (f"{name}.branch7x7_3", c7, 192, 7, 1),
        (f"{name}.branch7x7dbl_1", c_in, c7, 1, 1),
        (f"{name}.branch7x7dbl_2", c7, c7, 7, 1),
        (f"{name}.branch7x7dbl_3", c7, c7, 1, 7),
        (f"{name}.branch7x7dbl_4", c7, c7, 7, 1),
        (f"{name}.branch7x7dbl_5", c7, 192, 1, 7),
        (f"{name}.branch_pool", c_in, 192, 1, 1),
    ]


def _inception_d(name: str, c_in: int) -> List[Tuple[str, int, int, int, int]]:
    return [
        (f"{name}.branch3x3_1", c_in, 192, 1, 1),
        (f"{name}.branch3x3_2", 192, 320, 3, 3),
        (f"{name}.branch7x7x3_1", c_in, 192, 1, 1),
        (f"{name}.branch7x7x3_2", 192, 192, 1, 7),
        (f"{name}.branch7x7x3_3", 192, 192, 7, 1),
        (f"{name}.branch7x7x3_4", 192, 192, 3, 3),
    ]


def _inception_e(name: str, c_in: int) -> List[Tuple[str, int, int, int, int]]:
    return [
        (f"{name}.branch1x1", c_in, 320, 1, 1),
        (f"{name}.branch3x3_1", c_in, 384, 1, 1),
        (f"{name}.branch3x3_2a", 384, 384, 1, 3),
        (f"{name}.branch3x3_2b", 384, 384, 3, 1),
        (f"{name}.branch3x3dbl_1", c_in, 448, 1, 1),
        (f"{name}.branch3x3dbl_2", 448, 384, 3, 3),
        (f"{name}.branch3x3dbl_3a", 384, 384, 1, 3),
        (f"{name}.branch3x3dbl_3b", 384, 384, 3, 1),
        (f"{name}.branch_pool", c_in, 192, 1, 1),
    ]


def conv_specs() -> List[Tuple[str, int, int, int, int]]:
    """All 94 BasicConv2d layers of the FID InceptionV3, in forward order."""
    specs: List[Tuple[str, int, int, int, int]] = [
        ("Conv2d_1a_3x3", 3, 32, 3, 3),
        ("Conv2d_2a_3x3", 32, 32, 3, 3),
        ("Conv2d_2b_3x3", 32, 64, 3, 3),
        ("Conv2d_3b_1x1", 64, 80, 1, 1),
        ("Conv2d_4a_3x3", 80, 192, 3, 3),
    ]
    specs += _inception_a("Mixed_5b", 192, 32)
    specs += _inception_a("Mixed_5c", 256, 64)
    specs += _inception_a("Mixed_5d", 288, 64)
    specs += _inception_b("Mixed_6a", 288)
    specs += _inception_c("Mixed_6b", 768, 128)
    specs += _inception_c("Mixed_6c", 768, 160)
    specs += _inception_c("Mixed_6d", 768, 160)
    specs += _inception_c("Mixed_6e", 768, 192)
    specs += _inception_d("Mixed_7a", 768)
    specs += _inception_e("Mixed_7b", 1280)
    specs += _inception_e("Mixed_7c", 2048)
    return specs


# ---------------------------------------------------------------------------
# Weight conversion: torch state_dict (OIHW conv + BN stats) -> folded HWIO
# ---------------------------------------------------------------------------


def convert_torch_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    """Fold each BasicConv2d's eval-mode BatchNorm into its conv.

    Accepts torchvision ``inception_v3`` or pytorch-fid ``InceptionV3``
    state_dicts (tensors or ndarrays); ``AuxLogits`` entries are ignored.
    Returns ``{name: {"w": HWIO float32, "b": (c_out,) float32}}``; when the
    source has a classifier head (torchvision ``fc.weight``/``fc.bias``,
    absent in pytorch-fid checkpoints) it is kept under ``"fc"`` as
    ``{"w": (2048, classes), "b": (classes,)}`` so Inception Score works too.
    """
    def arr(key):
        v = sd[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float64)

    params = {}
    if "fc.weight" in sd:
        params["fc"] = {"w": arr("fc.weight").T.astype(np.float32),
                        "b": arr("fc.bias").astype(np.float32)}
    for name, c_in, c_out, kh, kw in conv_specs():
        w = arr(f"{name}.conv.weight")          # (c_out, c_in, kh, kw)
        if w.shape != (c_out, c_in, kh, kw):
            raise ValueError(f"{name}: weight shape {w.shape} != "
                             f"{(c_out, c_in, kh, kw)}")
        gamma = arr(f"{name}.bn.weight")
        beta = arr(f"{name}.bn.bias")
        mean = arr(f"{name}.bn.running_mean")
        var = arr(f"{name}.bn.running_var")
        scale = gamma / np.sqrt(var + BN_EPS)
        w_hwio = np.transpose(w, (2, 3, 1, 0)) * scale  # scale broadcasts on O
        params[name] = {
            "w": np.ascontiguousarray(w_hwio, dtype=np.float32),
            "b": (beta - mean * scale).astype(np.float32),
        }
    return params


def save_params(path: str, params: Dict[str, Dict[str, np.ndarray]]) -> None:
    flat = {}
    for name, p in params.items():
        flat[f"{name}/w"] = p["w"]
        flat[f"{name}/b"] = p["b"]
    np.savez_compressed(path, **flat)


def load_params(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    with np.load(path) as z:
        params: Dict[str, Dict[str, np.ndarray]] = {}
        for key in z.files:
            name, leaf = key.rsplit("/", 1)
            params.setdefault(name, {})[leaf] = z[key]
    return params


def random_torch_state_dict(seed: int = 0) -> Dict[str, np.ndarray]:
    """A full random-weights state_dict in torchvision's exact key schema —
    used by the offline parity test (and by port_inception.py --selftest).

    BN stats are kept near identity: He-init conv + relu is roughly
    variance-preserving, and a net per-layer gain of ~1.2 would compound to
    ~1e7 over the 94 layers, drowning a cross-framework fp32 comparison in
    amplified rounding noise.  The perturbations stay non-trivial so the
    BN-folding math is still exercised.
    """
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}
    for name, c_in, c_out, kh, kw in conv_specs():
        fan_in = c_in * kh * kw
        sd[f"{name}.conv.weight"] = rng.normal(
            0.0, np.sqrt(2.0 / fan_in), (c_out, c_in, kh, kw)).astype(np.float32)
        sd[f"{name}.bn.weight"] = (1.0 + rng.normal(0.0, 0.05, c_out)).astype(np.float32)
        sd[f"{name}.bn.bias"] = rng.normal(0.0, 0.05, c_out).astype(np.float32)
        sd[f"{name}.bn.running_mean"] = rng.normal(0.0, 0.05, c_out).astype(np.float32)
        sd[f"{name}.bn.running_var"] = (1.0 + rng.uniform(-0.1, 0.1, c_out)).astype(np.float32)
    # Classifier head (torchvision schema) so the fc conversion is exercised.
    sd["fc.weight"] = rng.normal(0.0, np.sqrt(1.0 / 2048), (1000, 2048)).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    return sd


# ---------------------------------------------------------------------------
# Forward (pure, jittable)
# ---------------------------------------------------------------------------


def _conv(p, x, stride=1, padding=0):
    """BasicConv2d with BN pre-folded: conv + bias + relu.

    Precision.HIGHEST keeps the convs true fp32 (the backends' default conv
    precision is bf16-ish, which drifts ~1e-2 per layer vs torch) — FID is a
    cross-framework parity metric, so it runs at full precision.

    The optimization barrier before strided convs works around an XLA (jax
    0.9.0, CPU and TPU) miscompilation of conv -> stride-2-conv chains at
    spatial sizes == 1 mod 16 (17x17 and 33x33; repro:
    scripts/repro_xla_conv_bug.py) — InceptionV3 hits it at Mixed_7a (17x17).
    Verified against a NumPy direct convolution: the fused jit result is
    simply wrong there; the barrier restores correctness at no measurable
    cost on this eval-only path.
    """
    if stride > 1:
        x = jax.lax.optimization_barrier(x)
    if isinstance(padding, int):
        pad = ((padding, padding), (padding, padding))
    else:
        pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jax.nn.relu(y + p["b"].astype(x.dtype))


def _max_pool(x, k=3, stride=2, padding=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


def _avg_pool_nocount(x, k=3):
    """3x3 stride-1 SAME average pool with count_include_pad=False — divide
    each window sum by the number of in-bounds elements (FIDInception quirk)."""
    pad = [(0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)]
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1), pad)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1), pad)
    return s / cnt


def _block_a(P, name, x):
    b1 = _conv(P[f"{name}.branch1x1"], x)
    b5 = _conv(P[f"{name}.branch5x5_2"], _conv(P[f"{name}.branch5x5_1"], x), padding=2)
    b3 = _conv(P[f"{name}.branch3x3dbl_1"], x)
    b3 = _conv(P[f"{name}.branch3x3dbl_2"], b3, padding=1)
    b3 = _conv(P[f"{name}.branch3x3dbl_3"], b3, padding=1)
    bp = _conv(P[f"{name}.branch_pool"], _avg_pool_nocount(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(P, name, x):
    b3 = _conv(P[f"{name}.branch3x3"], x, stride=2)
    bd = _conv(P[f"{name}.branch3x3dbl_1"], x)
    bd = _conv(P[f"{name}.branch3x3dbl_2"], bd, padding=1)
    bd = _conv(P[f"{name}.branch3x3dbl_3"], bd, stride=2)
    return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


def _block_c(P, name, x):
    b1 = _conv(P[f"{name}.branch1x1"], x)
    b7 = _conv(P[f"{name}.branch7x7_1"], x)
    b7 = _conv(P[f"{name}.branch7x7_2"], b7, padding=(0, 3))
    b7 = _conv(P[f"{name}.branch7x7_3"], b7, padding=(3, 0))
    bd = _conv(P[f"{name}.branch7x7dbl_1"], x)
    bd = _conv(P[f"{name}.branch7x7dbl_2"], bd, padding=(3, 0))
    bd = _conv(P[f"{name}.branch7x7dbl_3"], bd, padding=(0, 3))
    bd = _conv(P[f"{name}.branch7x7dbl_4"], bd, padding=(3, 0))
    bd = _conv(P[f"{name}.branch7x7dbl_5"], bd, padding=(0, 3))
    bp = _conv(P[f"{name}.branch_pool"], _avg_pool_nocount(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(P, name, x):
    b3 = _conv(P[f"{name}.branch3x3_2"],
               _conv(P[f"{name}.branch3x3_1"], x), stride=2)
    b7 = _conv(P[f"{name}.branch7x7x3_1"], x)
    b7 = _conv(P[f"{name}.branch7x7x3_2"], b7, padding=(0, 3))
    b7 = _conv(P[f"{name}.branch7x7x3_3"], b7, padding=(3, 0))
    b7 = _conv(P[f"{name}.branch7x7x3_4"], b7, stride=2)
    return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


def _block_e(P, name, x, pool_branch: str):
    b1 = _conv(P[f"{name}.branch1x1"], x)
    b3 = _conv(P[f"{name}.branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv(P[f"{name}.branch3x3_2a"], b3, padding=(0, 1)),
        _conv(P[f"{name}.branch3x3_2b"], b3, padding=(1, 0)),
    ], axis=-1)
    bd = _conv(P[f"{name}.branch3x3dbl_1"], x)
    bd = _conv(P[f"{name}.branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate([
        _conv(P[f"{name}.branch3x3dbl_3a"], bd, padding=(0, 1)),
        _conv(P[f"{name}.branch3x3dbl_3b"], bd, padding=(1, 0)),
    ], axis=-1)
    if pool_branch == "max":  # FIDInceptionE_2 (Mixed_7c)
        pooled = _max_pool(x, k=3, stride=1, padding=1)
    else:
        pooled = _avg_pool_nocount(x)
    bp = _conv(P[f"{name}.branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_backbone(params, x: jnp.ndarray) -> jnp.ndarray:
    """(N, 299, 299, 3) in [-1, 1] -> (N, 2048) pool3 features."""
    x = _conv(params["Conv2d_1a_3x3"], x, stride=2)
    x = _conv(params["Conv2d_2a_3x3"], x)
    x = _conv(params["Conv2d_2b_3x3"], x, padding=1)
    x = _max_pool(x)
    x = _conv(params["Conv2d_3b_1x1"], x)
    x = _conv(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x)
    x = _block_a(params, "Mixed_5b", x)
    x = _block_a(params, "Mixed_5c", x)
    x = _block_a(params, "Mixed_5d", x)
    x = _block_b(params, "Mixed_6a", x)
    x = _block_c(params, "Mixed_6b", x)
    x = _block_c(params, "Mixed_6c", x)
    x = _block_c(params, "Mixed_6d", x)
    x = _block_c(params, "Mixed_6e", x)
    x = _block_d(params, "Mixed_7a", x)
    x = _block_e(params, "Mixed_7b", x, pool_branch="avg")
    x = _block_e(params, "Mixed_7c", x, pool_branch="max")
    return jnp.mean(x, axis=(1, 2))


def inception_features(params, x_u8: jnp.ndarray,
                       resize_to: int = INPUT_SIZE) -> jnp.ndarray:
    """uint8 NHWC images (any H, W) -> (N, 2048) float32 FID features.

    Preprocessing matches torchmetrics/pytorch-fid: x/255, bilinear resize to
    299x299 (half-pixel centers, no antialias — torch ``interpolate`` w/
    ``align_corners=False``), then scale to [-1, 1].
    """
    x = x_u8.astype(jnp.float32) / 255.0
    n, _, _, c = x.shape
    x = jax.image.resize(x, (n, resize_to, resize_to, c), method="bilinear",
                         antialias=False)
    x = x * 2.0 - 1.0
    return inception_backbone(params, x).astype(jnp.float32)


def apply_fc(params, feats: jnp.ndarray) -> jnp.ndarray:
    """(N, 2048) pool3 features -> (N, classes) logits via the classifier head.

    Requires a params tree converted from a torchvision checkpoint (pytorch-fid
    checkpoints carry no ``fc``)."""
    if "fc" not in params:
        raise KeyError("params have no 'fc' head (pytorch-fid checkpoints don't "
                       "include the classifier; port torchvision weights for "
                       "Inception Score)")
    return feats @ params["fc"]["w"] + params["fc"]["b"]


def inception_logits(params, x_u8: jnp.ndarray,
                     resize_to: int = INPUT_SIZE) -> jnp.ndarray:
    """uint8 NHWC images -> (N, classes) classifier logits (Inception Score
    path; same preprocessing as ``inception_features``)."""
    return apply_fc(params, inception_features(params, x_u8, resize_to))
