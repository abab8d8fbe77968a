"""Core neural-net primitives: pure init/apply pairs over param pytrees.

Design: no module framework — every layer is an ``init(key, ...) -> params`` plus
a pure ``apply(params, x, ...)``.  Multi-head attention is batched over heads in
single einsums (one (D, H·Dh) projection per Q/K/V) so the MXU sees large
matmuls instead of the reference's per-head ModuleList loop
(ref:src/v1/attention.py:85-103) — mathematically identical, TPU-shaped.

Behavioral parity targets (cited per function):
- MLP + activation picker: ref:src/v1/muilti_layer_perceptron.py:7-42
- SLN (self-modulated LayerNorm): ref:src/v1/spectral_layer_norm.py:16-20
- SIREN layer + init scheme:      ref:src/v1/siren.py:29-45
- L1/L2 attention + ISR:          ref:src/v1/attention.py:19-70
- v2 fused MHSA:                  ref:src/v2/modules.py:103-162
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def torch_linear_init(key, in_features: int, out_features: int, bias: bool = True,
                      dtype=jnp.float32) -> Params:
    """U(±1/sqrt(in)) weight+bias — torch nn.Linear default, the reference's init."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    p = {"w": jax.random.uniform(kw, (in_features, out_features), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_features,), dtype, -bound, bound)
    return p


def trunc_normal_init(key, in_features: int, out_features: int, std: float = 0.02,
                      bias: bool = True, dtype=jnp.float32) -> Params:
    """trunc_normal(0.02) weight, zero bias — ViT init (ref:src/v2/modules.py:241-247).

    torch parity detail: ``nn.init.trunc_normal_(std=0.02)`` truncates at the
    ABSOLUTE bounds a=-2, b=2 (i.e. ±100σ at std 0.02 — effectively
    untruncated), not at ±2σ; jax.random.truncated_normal takes bounds in σ
    units, so the bounds are divided by std here.
    """
    w = std * jax.random.truncated_normal(key, -2.0 / std, 2.0 / std,
                                          (in_features, out_features), dtype)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_features,), dtype)
    return p


def dense(params: Params, x: jnp.ndarray, precision=None) -> jnp.ndarray:
    y = jnp.dot(x, params["w"].astype(x.dtype), precision=precision,
                preferred_element_type=x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Dropout / activations
# ---------------------------------------------------------------------------


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0:
        return x
    if rng is None:
        raise ValueError("dropout in train mode requires an rng key")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def pick_activation(name: str):
    """Activation picker parity (ref:src/v1/muilti_layer_perceptron.py:7-15)."""
    return {
        "relu": jax.nn.relu,
        # exact erf form — torch nn.GELU default (the reference's GELUs)
        "gelu": partial(jax.nn.gelu, approximate=False),
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
        "leaky_relu": partial(jax.nn.leaky_relu, negative_slope=0.2),
    }.get(name, jax.nn.sigmoid)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def layer_norm_init(features: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((features,), dtype), "bias": jnp.zeros((features,), dtype)}


def layer_norm(params: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the trailing axis; statistics in float32 for stability."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(x.dtype)


def sln_init(key, features: int, dtype=jnp.float32) -> Params:
    """Self-modulated LayerNorm: scalar learned gamma/beta (ref:src/v1/spectral_layer_norm.py:16-17)."""
    kg, kb = jax.random.split(key)
    return {
        "ln": layer_norm_init(features, dtype),
        "gamma": jax.random.normal(kg, (1, 1, 1), dtype),
        "beta": jax.random.normal(kb, (1, 1, 1), dtype),
    }


def sln(params: Params, h: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """gamma * w * LN(h) + beta * w (ref:src/v1/spectral_layer_norm.py:20)."""
    g = params["gamma"].astype(h.dtype)
    b = params["beta"].astype(h.dtype)
    return g * w * layer_norm(params["ln"], h) + b * w


# ---------------------------------------------------------------------------
# MLP (configurable chain, activation between all but last)
# ---------------------------------------------------------------------------


def mlp_init(key, in_features: int, out_features: int, hidden: Tuple[int, ...] = (),
             dtype=jnp.float32) -> Params:
    """Linear chain [in]+hidden+[out] (ref:src/v1/muilti_layer_perceptron.py:24-34)."""
    dims = [in_features, *hidden, out_features]
    keys = jax.random.split(key, len(dims) - 1)
    return {"layers": [torch_linear_init(k, a, b, dtype=dtype)
                       for k, a, b in zip(keys, dims[:-1], dims[1:])]}


def mlp(params: Params, x: jnp.ndarray, activation: str = "gelu",
        dropout_rate: float = 0.0, rng: Optional[jax.Array] = None,
        train: bool = False) -> jnp.ndarray:
    """Forward with dropout after every linear, activation between all but last
    (ref:src/v1/muilti_layer_perceptron.py:37-42)."""
    act = pick_activation(activation)
    n = len(params["layers"])
    rngs = jax.random.split(rng, n) if (rng is not None and train and dropout_rate > 0) else [None] * n
    for i, layer in enumerate(params["layers"]):
        x = dense(layer, x)
        x = dropout(rngs[i], x, dropout_rate, train)
        if i != n - 1:
            x = act(x)
    return x


# ---------------------------------------------------------------------------
# SIREN
# ---------------------------------------------------------------------------


def siren_init(key, in_features: int, out_features: int, is_first: bool = False,
               omega_0: float = 30.0, dtype=jnp.float32) -> Params:
    """SIREN-paper init (ref:src/v1/siren.py:29-42): first layer U(±1/in),
    later layers U(±sqrt(6/in)/omega_0).  Bias keeps the torch-default init."""
    kw, kb = jax.random.split(key)
    bound = (1.0 / in_features) if is_first else (math.sqrt(6.0 / in_features) / omega_0)
    w = jax.random.uniform(kw, (in_features, out_features), dtype, -bound, bound)
    bb = 1.0 / math.sqrt(in_features)
    b = jax.random.uniform(kb, (out_features,), dtype, -bb, bb)
    return {"w": w, "b": b}


def siren(params: Params, x: jnp.ndarray, omega_0: float = 30.0) -> jnp.ndarray:
    """sin(omega_0 * Linear(x)) (ref:src/v1/siren.py:44-45)."""
    return jnp.sin(omega_0 * dense(params, x))


# ---------------------------------------------------------------------------
# Spectral norm (ISR) — power-iteration estimate, carried as non-trainable state
# ---------------------------------------------------------------------------
#
# The reference recomputes full SVDs of Wq/Wk/Wv on EVERY discriminator forward
# (ref:src/v1/attention.py:44-45,54-58) — 3 SVDs x 4 heads x 4 layers per step,
# hopeless on TPU.  TPU-native reformulation: sigma(W) is estimated by one power
# -iteration step per train step with persistent u vectors (the standard
# spectral-norm trick); sigma_0 is the exact max singular value at init (one
# SVD at init time, host-side).  Gradients flow through W in W*(sigma0/sigma)
# with the estimate stop-gradient'ed — the reference's nn.Parameter re-wrapping
# detached everything and silently reset optimizer state; we deliberately keep
# the rescale differentiable w.r.t. W only.


def spectral_state_init(w_stack: jnp.ndarray, key) -> Params:
    """State for a stack of matrices w_stack: (..., rows, cols).

    Returns sigma0 (exact, via SVD at init) and a random unit ``u`` per matrix.
    """
    sigma0 = jnp.linalg.svd(w_stack.astype(jnp.float32), compute_uv=False)[..., 0]
    u = jax.random.normal(key, w_stack.shape[:-1], jnp.float32)  # (..., rows)
    u = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-12)
    return {"sigma0": sigma0, "u": u}


def spectral_rescale(w_stack: jnp.ndarray, state: Params, update: bool,
                     iters: int = 1) -> Tuple[jnp.ndarray, Params]:
    """ISR: W <- (sigma0 / sigma_hat(W)) * W (ref:src/v1/attention.py:60-64).

    ``u`` is refreshed by ``iters`` power-iteration steps when ``update`` is True
    (train); at eval the stored estimate is reused.  All estimate math is
    stop-gradient'ed so grads flow only through the raw W.
    """
    wf = jax.lax.stop_gradient(w_stack.astype(jnp.float32))
    u = state["u"]
    for _ in range(max(1, iters)):
        v = jnp.einsum("...r,...rc->...c", u, wf)
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
        u_new = jnp.einsum("...c,...rc->...r", v, wf)
        u_norm = jnp.linalg.norm(u_new, axis=-1, keepdims=True)
        u = u_new / (u_norm + 1e-12)
    sigma = jnp.einsum("...r,...rc,...c->...", u, wf, v)
    sigma = jnp.maximum(jnp.abs(sigma), 1e-12)
    scale = (state["sigma0"] / sigma)[..., None, None]
    new_state = {"sigma0": state["sigma0"], "u": u if update else state["u"]}
    return w_stack * scale.astype(w_stack.dtype), new_state


# ---------------------------------------------------------------------------
# Multi-head self-attention (L1 dot-product / L2 distance score modes)
# ---------------------------------------------------------------------------


def mhsa_init(key, features: int, num_heads: int, head_dim: Optional[int] = None,
              spectral: bool = False, qkv_bias: bool = False, out_bias: bool = True,
              init: str = "torch", dtype=jnp.float32) -> Tuple[Params, Params]:
    """Init fused MHSA.  Returns (params, state); state is {} unless spectral.

    Head layout: qkv weights are (3, H, D, Dh) so per-head spectral norms match
    the reference's per-head Linears (ref:src/v1/attention.py:27-39) while the
    forward runs as one einsum.
    """
    head_dim = head_dim or features // num_heads
    k_qkv, k_out, k_b, k_sp = jax.random.split(key, 4)
    if init == "torch":
        bound = 1.0 / math.sqrt(features)
        qkv = jax.random.uniform(k_qkv, (3, num_heads, features, head_dim), dtype, -bound, bound)
        out = torch_linear_init(k_out, num_heads * head_dim, features, bias=out_bias, dtype=dtype)
    else:  # trunc_normal (v2 ViT init, ref:src/v2/modules.py:241-247)
        qkv = 0.02 * jax.random.truncated_normal(k_qkv, -2.0, 2.0,
                                                 (3, num_heads, features, head_dim), dtype)
        out = trunc_normal_init(k_out, num_heads * head_dim, features, bias=out_bias, dtype=dtype)
    params: Params = {"qkv": qkv, "out": out}
    if qkv_bias:
        params["qkv_b"] = jnp.zeros((3, num_heads, head_dim), dtype)
    state: Params = {}
    if spectral:
        # sigma of each (D, Dh) head matrix; transpose-invariant.
        state["isr"] = spectral_state_init(qkv, k_sp)
    return params, state


def attention_scores(q: jnp.ndarray, k: jnp.ndarray, scale: float,
                     score_mode: str) -> jnp.ndarray:
    """Pre-softmax scores, (B, H, N, N).

    - 'dot': q.k^T / sqrt(scale)                (ref:src/v1/attention.py:69-70)
    - 'l2':  -||q-k||^2 / sqrt(scale), the ViTGAN-paper L2 attention, expressed
      as fused norms (|q|^2+|k|^2-2qk^T) so the MXU does the heavy term.  The
      reference softmaxes +cdist (ref:src/v1/attention.py:66-67) which inverts
      the paper's similarity ordering; we implement the documented intent.
    - 'l2ref': softmax over +euclidean distance, bit-faithful to the reference.
    """
    inv = 1.0 / math.sqrt(scale)
    if score_mode == "dot":
        return jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) * inv
    qq = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1)[..., :, None]
    kk = jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1)[..., None, :]
    qk = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(qq + kk - 2.0 * qk, 0.0)
    if score_mode == "l2":
        return -d2 * inv
    if score_mode == "l2ref":
        return jnp.sqrt(d2 + 1e-12) * inv
    raise ValueError(f"unknown score_mode {score_mode!r}")


def mhsa(params: Params, state: Params, x: jnp.ndarray, *, score_mode: str = "dot",
         scale: Optional[float] = None, update_state: bool = False) -> Tuple[jnp.ndarray, Params]:
    """Fused multi-head self-attention.

    ``scale`` defaults to H*Dh, matching the reference's softmax(score/sqrt(H*Dh))
    (ref:src/v1/attention.py:50-52 with scale=output_dimension from
    attention.py:93); the v2 family passes scale=Dh (ref:src/v2/modules.py:144).
    """
    qkv_w = params["qkv"]
    new_state = dict(state)
    if "isr" in state:
        qkv_w, new_state["isr"] = spectral_rescale(qkv_w, state["isr"], update_state)
    _, num_heads, _, head_dim = qkv_w.shape
    if scale is None:
        scale = num_heads * head_dim  # real width — before any lane padding
    qkv_b = params.get("qkv_b")
    out_p = params["out"]
    # Lane alignment: zero-pad head_dim to the 128-wide MXU tile (exact for
    # dot and L2 scores and for the zero out-rows; see policy.head_pad_amount).
    from vitgan_tpu.ops.policy import head_pad_amount

    pad = head_pad_amount(head_dim)
    if pad:
        qkv_w = jnp.pad(qkv_w, ((0, 0), (0, 0), (0, 0), (0, pad)))
        if qkv_b is not None:
            qkv_b = jnp.pad(qkv_b, ((0, 0), (0, 0), (0, pad)))
        ow = out_p["w"].reshape(num_heads, head_dim, -1)
        ow = jnp.pad(ow, ((0, 0), (0, pad), (0, 0)))
        out_p = {**out_p, "w": ow.reshape(num_heads * (head_dim + pad), -1)}
        head_dim += pad
    qkv = jnp.einsum("bnd,phde->pbhne", x, qkv_w.astype(x.dtype),
                     preferred_element_type=x.dtype)
    if qkv_b is not None:
        qkv = qkv + qkv_b.astype(x.dtype)[:, None, :, None, :]
    q, k, v = qkv[0], qkv[1], qkv[2]
    # Policy-routed hot loop: Pallas flash kernel on TPU for long sequences,
    # fused XLA attention otherwise (see vitgan_tpu.ops.attention).
    from vitgan_tpu.ops.attention import dispatch_attention

    out = dispatch_attention(q, k, v, score_mode, float(scale))
    # Named for remat='attn' (save_only_these_names): rematted blocks can save
    # the attention output and skip re-running the flash kernel in the
    # backward, which an MXU-dots policy would NOT save (it's a custom call).
    from jax.ad_checkpoint import checkpoint_name

    out = checkpoint_name(out, "attn_out")
    out = out.transpose(0, 2, 1, 3).reshape(*x.shape[:-1], num_heads * head_dim)
    return dense(out_p, out), new_state
