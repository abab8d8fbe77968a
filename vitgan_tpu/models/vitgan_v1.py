"""v1 — paper-style ViTGAN: SLN generator with SIREN head + ISR L2-attention discriminator.

Rebuild of the reference's intended v1 behavior (the as-committed code crashes at
construction, SURVEY §2.4.1):

- Generator (ref:src/v1/generator.py:13-69): mapping MLP latent -> image_size
  style tokens of width ``hidden``; learned base embedding; ``depth``
  TransformerSLN blocks (dot-product attention, no spectral scaling); final SLN;
  two SIREN layers hidden -> siren_hidden -> channels*image_size, one token per
  output row.  Output layout here is NHWC with the natural row mapping (each
  token paints its image row) rather than the reference's channel-interleaving
  view(B,C,H,W) quirk.
- Discriminator (ref:src/v1/discriminatorViT.py:17-51): overlapping patch
  extraction (window patch+2*overlap, computed stride,
  ref:src/v1/patch_encoder.py:20-27), linear projection to ``token_size``
  (implementing the intent of the never-assigned projection_output_size,
  §2.4.1), CLS + learned positional embedding, ``depth`` pre-LN transformer
  blocks with ISR spectral rescaling and L2 attention, Linear head on the CLS
  token.  Returns a raw logit; the reference's sigmoid
  (ref:src/v1/discriminatorViT.py:41,51) lives in the loss via BCE-with-logits.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vitgan_tpu.config import V1Config
from vitgan_tpu.models import layers as L


# ---------------------------------------------------------------------------
# Shared transformer blocks
# ---------------------------------------------------------------------------


def _block_init(key, features: int, cfg, spectral: bool, dtype=jnp.float32):
    """One pre-LN transformer block (ref:src/v1/transformer.py:9-45 topology)."""
    k1, k2, _, _ = jax.random.split(key, 4)
    msha_p, msha_s = L.mhsa_init(
        k1, features, cfg.num_heads, spectral=spectral, qkv_bias=False, dtype=dtype
    )
    params = {
        "ln1": L.layer_norm_init(features, dtype),
        "ln2": L.layer_norm_init(features, dtype),
        "msha": msha_p,
        "mlp": L.mlp_init(k2, features, features, cfg.mlp_hidden, dtype),
    }
    return params, {"msha": msha_s}


def _sln_block_init(key, features: int, cfg, dtype=jnp.float32):
    """TransformerSLN block: both norms are SLN (ref:src/v1/transformer.py:49-88)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    msha_p, msha_s = L.mhsa_init(k1, features, cfg.num_heads, spectral=False,
                                 qkv_bias=False, dtype=dtype)
    params = {
        "sln1": L.sln_init(k3, features, dtype),
        "sln2": L.sln_init(k4, features, dtype),
        "msha": msha_p,
        "mlp": L.mlp_init(k2, features, features, cfg.mlp_hidden, dtype),
    }
    return params, {"msha": msha_s}


def _transformer_block(params, state, x, cfg, *, score_mode, rng, train, update_state):
    """x + drop(MSHA(LN1 x)); then + MLP(LN2 x) (ref:src/v1/transformer.py:40-45)."""
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    a, msha_state = L.mhsa(params["msha"], state["msha"], L.layer_norm(params["ln1"], x),
                           score_mode=score_mode, update_state=update_state)
    x = x + L.dropout(r1, a, cfg.attn_dropout, train)
    x = x + L.mlp(params["mlp"], L.layer_norm(params["ln2"], x),
                  activation=cfg.mlp_activation, dropout_rate=cfg.mlp_dropout,
                  rng=r2, train=train)
    return x, {"msha": msha_state}


def _sln_transformer_block(params, state, h, w, cfg, *, rng, train):
    """htmp = drop(MSHA(SLN(h,w))) + h; hf = MLP(SLN(htmp,w)) + htmp
    (ref:src/v1/transformer.py:85-88)."""
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    a, msha_state = L.mhsa(params["msha"], state["msha"], L.sln(params["sln1"], h, w),
                           score_mode="dot")
    htmp = L.dropout(r1, a, cfg.attn_dropout, train) + h
    hf = L.mlp(params["mlp"], L.sln(params["sln2"], htmp, w),
               activation=cfg.mlp_activation, dropout_rate=cfg.mlp_dropout,
               rng=r2, train=train) + htmp
    return hf, {"msha": msha_state}


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


def generator_init(key, cfg: V1Config, dtype=jnp.float32) -> Dict[str, Any]:
    g = cfg.generator
    n_tokens = cfg.image_size
    keys = jax.random.split(key, g.depth + 5)
    blocks = [_sln_block_init(keys[i], g.hidden_size, g.transformer, dtype)
              for i in range(g.depth)]
    params = {
        "mapping": L.mlp_init(keys[-5], cfg.latent_dim, n_tokens * g.hidden_size, (), dtype),
        "embedding": jax.random.normal(keys[-4], (n_tokens, g.hidden_size), dtype),
        "blocks": [p for p, _ in blocks],
        "sln": L.sln_init(keys[-3], g.hidden_size, dtype),
        "siren1": L.siren_init(keys[-2], g.hidden_size, g.siren_hidden,
                               is_first=True, omega_0=g.siren.omega_0, dtype=dtype),
        "siren2": L.siren_init(keys[-1], g.siren_hidden, cfg.channels * cfg.image_size,
                               is_first=False, omega_0=g.siren.omega_0, dtype=dtype),
    }
    state = {"blocks": [s for _, s in blocks]}
    return {"params": params, "state": state}


def generator_apply(variables, z: jnp.ndarray, cfg: V1Config, *,
                    rng: Optional[jax.Array] = None, train: bool = False,
                    blocks_runner=None) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """z (B, latent) -> images (B, H, W, C) in [-1, 1] (ref:src/v1/generator.py:58-68).

    ``blocks_runner`` (parallel.pipeline) replaces the sequential SLN-block
    loop with a pipelined one; generator blocks are state-free (no spectral
    rescaling), so the state passes through unchanged on that path.
    """
    params, state = variables["params"], variables["state"]
    g = cfg.generator
    n_tokens = cfg.image_size
    w = L.mlp(params["mapping"], z).reshape(-1, n_tokens, g.hidden_size)
    h = jnp.broadcast_to(params["embedding"].astype(w.dtype), w.shape)
    rngs = jax.random.split(rng, g.depth) if rng is not None else None
    if blocks_runner is not None:
        h = blocks_runner(params["blocks"], (h, w), rngs)
        new_blocks = state["blocks"]
    else:
        rng_list = rngs if rngs is not None else [None] * g.depth
        new_blocks = []
        for p, s, r in zip(params["blocks"], state["blocks"], rng_list):
            h, ns = _sln_transformer_block(p, s, h, w, g.transformer, rng=r, train=train)
            new_blocks.append(ns)
    tokens = L.sln(params["sln"], h, w)
    y = L.siren(params["siren1"], tokens, g.siren.omega_0)
    y = L.siren(params["siren2"], y, g.siren.omega_0)
    # One token per row: (B, H, W*C) -> (B, H, W, C).
    img = y.reshape(-1, cfg.image_size, cfg.image_size, cfg.channels)
    return img, {"blocks": new_blocks}


# ---------------------------------------------------------------------------
# Overlapping patch extraction (double-unfold semantics, ref:src/v1/patch_encoder.py:55-73)
# ---------------------------------------------------------------------------


def patch_geometry(image_size: int, patch_size: int, overlap: int) -> Tuple[int, int, int]:
    """(window, stride, tokens_per_side) per ref:src/v1/patch_encoder.py:17-27."""
    window = patch_size + 2 * overlap
    stride = (image_size - window) // patch_size + 1
    per_side = (image_size - window) // stride + 1
    return window, stride, per_side


def extract_overlapping_patches(images: jnp.ndarray, patch_size: int, overlap: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, T, window*window*C) flattened overlapping patches.

    Implemented with conv_general_dilated_patches — XLA lowers this to an
    im2col the MXU consumes directly; no gather loops.
    """
    b, hh, ww, c = images.shape
    window, stride, per_side = patch_geometry(hh, patch_size, overlap)
    patches = jax.lax.conv_general_dilated_patches(
        images, filter_shape=(window, window), window_strides=(stride, stride),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, per_side, per_side, C*window*window)
    return patches.reshape(b, per_side * per_side, c * window * window)


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------


def discriminator_init(key, cfg: V1Config, dtype=jnp.float32) -> Dict[str, Any]:
    d = cfg.discriminator
    window, _, per_side = patch_geometry(cfg.image_size, d.patch_size, d.overlap)
    raw_dim = cfg.channels * window * window
    token_size = d.token_size or raw_dim
    n_tokens = per_side * per_side
    keys = jax.random.split(key, d.depth + 4)
    blocks = [_block_init(keys[i], token_size, d.transformer,
                          spectral=d.spectral_rescale, dtype=dtype)
              for i in range(d.depth)]
    params = {
        "proj": {"w": L.torch_linear_init(keys[-4], raw_dim, token_size, bias=False,
                                          dtype=dtype)["w"]},
        "cls": jax.random.normal(keys[-3], (1, 1, token_size), dtype),
        "pos": jax.random.normal(keys[-2], (n_tokens + 1, token_size), dtype),
        "blocks": [p for p, _ in blocks],
        "head": L.torch_linear_init(keys[-1], token_size, 1, dtype=dtype),
    }
    state = {"blocks": [s for _, s in blocks]}
    return {"params": params, "state": state}


def discriminator_apply(variables, images: jnp.ndarray, cfg: V1Config, *,
                        rng: Optional[jax.Array] = None, train: bool = False,
                        update_state: bool = False, blocks_runner=None
                        ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """images (B, H, W, C) -> real/fake logits (B,) (ref:src/v1/discriminatorViT.py:44-51).

    ``blocks_runner`` (parallel.pipeline) replaces the sequential block loop;
    it receives (params, states, x, rngs, update_state) and returns
    (x, new_states) — ISR refresh happens as a stacked pass there.
    """
    params, state = variables["params"], variables["state"]
    d = cfg.discriminator
    tokens = extract_overlapping_patches(images, d.patch_size, d.overlap)
    tokens = L.dense(params["proj"], tokens)
    b = tokens.shape[0]
    cls = jnp.broadcast_to(params["cls"].astype(tokens.dtype), (b, 1, tokens.shape[-1]))
    x = jnp.concatenate([cls, tokens], axis=1) + params["pos"].astype(tokens.dtype)
    n_rngs = d.depth + 1
    rngs = jax.random.split(rng, n_rngs) if rng is not None else None
    x = L.dropout(rngs[0] if rng is not None else None, x, d.embed_dropout, train)
    if blocks_runner is not None:
        x, new_blocks = blocks_runner(params["blocks"], state["blocks"], x,
                                      rngs[1:] if rng is not None else None,
                                      update_state)
    else:
        rng_list = rngs if rngs is not None else [None] * n_rngs
        new_blocks = []
        for p, s, r in zip(params["blocks"], state["blocks"], rng_list[1:]):
            x, ns = _transformer_block(p, s, x, d.transformer, score_mode="l2",
                                       rng=r, train=train, update_state=update_state)
            new_blocks.append(ns)
    logits = L.dense(params["head"], x[:, 0, :])[:, 0]
    return logits, {"blocks": new_blocks}
