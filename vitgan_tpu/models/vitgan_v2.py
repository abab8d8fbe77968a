"""v2 — standard-ViT GAN family: VisionTransformer backbone + GAN wrappers.

Rebuild of the reference's v2 modules (ref:src/v2/modules.py:67-426) with the
dimensionally-broken generator replaced by its documented intent (SURVEY §2.4.8
/ BASELINE north star): a real latent -> token-grid -> unpatchify generator.

TPU-first choices:
- conv patchify with kernel=stride=patch (ref:src/v2/modules.py:71-74) is
  algebraically a reshape + one matmul; implemented exactly so — the MXU gets a
  single large GEMM, no conv window machinery;
- MHSA is the fused-projection form (ref:src/v2/modules.py:103-162) with
  softmax scale 1/sqrt(head_dim) (ref:src/v2/modules.py:144);
- pre-LN encoder blocks with GELU MLP of width embed*mlp_ratio
  (ref:src/v2/modules.py:165-183);
- trunc-normal(0.02) init for all projections, CLS and pos-embedding, LN at 1/0
  (ref:src/v2/modules.py:241-253).

The reference adds the positional embedding BEFORE concatenating CLS so the CLS
token carries no positional term (ref:src/v2/modules.py:93-98); we keep that
semantic (CLS gets no pos-embedding) since it is visible in trained weights.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vitgan_tpu.config import V2Config
from vitgan_tpu.models import layers as L


# ---------------------------------------------------------------------------
# Patchify / unpatchify (kernel=stride conv == one matmul)
# ---------------------------------------------------------------------------


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N, patch*patch*C)."""
    b, h, w, c = images.shape
    x = images.reshape(b, h // patch, patch, w // patch, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // patch) * (w // patch), patch * patch * c)


def unpatchify(tokens: jnp.ndarray, patch: int, image_size: int, channels: int) -> jnp.ndarray:
    """(B, N, patch*patch*C) -> (B, H, W, C), inverse of patchify."""
    b = tokens.shape[0]
    side = image_size // patch
    x = tokens.reshape(b, side, side, patch, patch, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, image_size, image_size, channels)


# ---------------------------------------------------------------------------
# VisionTransformer backbone (ref:src/v2/modules.py:202-238)
# ---------------------------------------------------------------------------


def _maybe_remat(fn):
    """Rematerialize a transformer block under the process remat policy —
    trades recompute FLOPs for HBM at high resolution (BASELINE config #5).
    'dots' saves matmul (MXU) outputs and recomputes only elementwise work."""
    from vitgan_tpu.ops.policy import remat_mode

    mode = remat_mode()
    if mode == "full":
        return jax.checkpoint(fn)
    if mode == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if mode == "attn":
        # 'dots' recomputes the flash-attention CUSTOM CALL in every rematted
        # backward (only dot outputs are saveable under that policy) — the
        # hires128 op profile shows that recompute is the single largest
        # block of step time.  This policy additionally saves the named
        # attention output ("attn_out", layers.mhsa) AND the flash kernel's
        # residuals ("flash_out"/"flash_lse", ops.attention._fwd) — saving
        # only the post-vjp output measured neutral vs dots because the
        # custom_vjp backward still re-ran the kernel to rebuild lse.
        return jax.checkpoint(fn, policy=jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names(
                "attn_out", "flash_out", "flash_lse")))
    return fn


def _encoder_init(key, cfg: V2Config, dtype=jnp.float32):
    """Pre-LN encoder block (ref:src/v2/modules.py:165-176)."""
    k1, k2, k3 = jax.random.split(key, 3)
    msha_p, _ = L.mhsa_init(k1, cfg.embed_dim, cfg.num_heads, qkv_bias=True,
                            init="trunc_normal", dtype=dtype)
    hidden = cfg.embed_dim * cfg.mlp_ratio
    return {
        "ln1": L.layer_norm_init(cfg.embed_dim, dtype),
        "ln2": L.layer_norm_init(cfg.embed_dim, dtype),
        "msha": msha_p,
        "fc1": L.trunc_normal_init(k2, cfg.embed_dim, hidden, dtype=dtype),
        "fc2": L.trunc_normal_init(k3, hidden, cfg.embed_dim, dtype=dtype),
    }


def _encoder_apply(p, x, cfg: V2Config, rng, train):
    """x + drop(MHSA(LN1 x)); x + drop(FC2(GELU(FC1(LN2 x)))) (ref:src/v2/modules.py:178-183).

    The MLP half routes through the fused Pallas LN+MLP kernel when the policy
    allows (residual applied after dropout, so the kernel runs residual-free).
    """
    from vitgan_tpu.ops.fused_block import maybe_megablock
    from vitgan_tpu.ops.fused_mlp import dispatch_ln_mlp

    fused = maybe_megablock(p, x, cfg, rng, train)  # opt-in single-kernel path
    if fused is not None:
        return fused

    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    head_dim = cfg.embed_dim // cfg.num_heads
    a, _ = L.mhsa(p["msha"], {}, L.layer_norm(p["ln1"], x), score_mode="dot", scale=head_dim)
    x = x + L.dropout(r1, a, cfg.dropout, train)
    mlp_out = dispatch_ln_mlp(
        x, p["ln2"]["scale"], p["ln2"]["bias"],
        p["fc1"]["w"], p["fc1"]["b"], p["fc2"]["w"], p["fc2"]["b"],
        activation="gelu", residual=False,
    )
    x = x + L.dropout(r2, mlp_out, cfg.dropout, train)
    return x


def vit_init(key, cfg: V2Config, n_classes: int, dtype=jnp.float32,
             head_extra: int = 0) -> Dict[str, Any]:
    """VisionTransformer params (ref:src/v2/modules.py:202-231).

    ``head_extra`` widens the classifier head's input by that many features —
    used by the discriminator's minibatch-std statistic (see vit_apply)."""
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    patch_dim = cfg.patch_size ** 2 * cfg.channels
    keys = jax.random.split(key, cfg.depth + 5)
    return {
        "embed": L.trunc_normal_init(keys[0], patch_dim, cfg.embed_dim, dtype=dtype),
        "pos": 0.02 * jax.random.truncated_normal(keys[1], -2.0, 2.0,
                                                  (n_patches, cfg.embed_dim), dtype),
        "cls": 0.02 * jax.random.truncated_normal(keys[2], -2.0, 2.0,
                                                  (1, 1, cfg.embed_dim), dtype),
        "blocks": [_encoder_init(keys[3 + i], cfg, dtype) for i in range(cfg.depth)],
        "ln": L.layer_norm_init(cfg.embed_dim, dtype),
        "head_fc1": L.trunc_normal_init(keys[-2], cfg.embed_dim + head_extra,
                                        cfg.embed_dim, dtype=dtype),
        "head_fc2": L.trunc_normal_init(keys[-1], cfg.embed_dim, n_classes, dtype=dtype),
    }


def minibatch_std_feature(feats: jnp.ndarray, group_size: int = 8) -> jnp.ndarray:
    """Per-group batch-std scalar (ProGAN minibatch stddev, CLS-feature form).

    Splits the batch into contiguous groups of ``group_size`` rows, computes
    the per-feature std across each group, means it to one scalar per group,
    and broadcasts it back to the rows: (B, E) -> (B, 1).  Contiguous grouping
    keeps the statistic within pure-real / pure-fake rows under the train
    step's concatenated [real; fake] D forward (train/step.py concat_d).
    Collapse becomes VISIBLE to D: a homogeneous fake batch carries a
    near-zero std feature no real group ever shows.
    """
    b, _ = feats.shape
    # g must divide the HALF batch, not just the batch: the concatenated
    # [real; fake] forward has its boundary at b//2, and a group straddling
    # it would mix the two distributions (leaking group membership and
    # masking collapsed fakes behind real-row variance).  g | b//2 => g | b,
    # and it keeps every group boundary-aligned; fake-only forwards (the G
    # update) just get slightly smaller groups.
    half = b // 2 if b % 2 == 0 else b
    g = max(1, min(group_size, half))
    while half % g:
        g -= 1
    f = feats.reshape(b // g, g, -1).astype(jnp.float32)
    std = jnp.sqrt(jnp.var(f, axis=1) + 1e-8)          # (groups, E)
    s = jnp.mean(std, axis=-1, keepdims=True)          # (groups, 1)
    return jnp.repeat(s, g, axis=0).astype(feats.dtype)  # (B, 1)


def _run_blocks(blocks, x, rngs, cfg: V2Config, train, blocks_runner):
    """Apply the encoder stack: sequential remat loop, or a pluggable runner
    (parallel.pipeline installs a GPipe schedule here; rngs is a list of
    per-block keys or None)."""
    if blocks_runner is not None:
        return blocks_runner(blocks, x, rngs)
    from vitgan_tpu.ops.policy import sequence_constraint

    block = _maybe_remat(lambda p, x, r: _encoder_apply(p, x, cfg, r, train))
    rngs = rngs if rngs is not None else [None] * len(blocks)
    # Sequence parallelism (mesh.context_parallel): pin the token axis over
    # the seq mesh axis at stack entry and after every block so GSPMD keeps
    # LN/MLP token-sharded and inserts the attention K/V all-gathers.  No-op
    # when SP is off (ops/policy.py).
    x = sequence_constraint(x)
    for p, r in zip(blocks, rngs):
        x = sequence_constraint(block(p, x, r))
    return x


def vit_encode(params, images, cfg: V2Config, *, rng=None, train=False,
               blocks_runner=None) -> jnp.ndarray:
    """images -> (B, N+1, E) encoded tokens after the final LN."""
    x = L.dense(params["embed"], patchify(images, cfg.patch_size))
    x = x + params["pos"].astype(x.dtype)  # CLS excluded, ref:src/v2/modules.py:93-98
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls"].astype(x.dtype), (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    n = cfg.depth + 1
    rngs = jax.random.split(rng, n) if rng is not None else None
    x = L.dropout(rngs[0] if rng is not None else None, x, cfg.dropout, train)
    x = _run_blocks(params["blocks"], x, rngs[1:] if rng is not None else None,
                    cfg, train, blocks_runner)
    return L.layer_norm(params["ln"], x)


def vit_apply(params, images, cfg: V2Config, *, rng=None, train=False,
              blocks_runner=None, with_mbstd: bool = False) -> jnp.ndarray:
    """Full ViT: encode then CLS -> Linear -> Tanh -> Linear (ref:src/v2/modules.py:186-199).

    ``with_mbstd`` appends the minibatch-std scalar to the CLS features before
    the head (requires params built with head_extra=1)."""
    x = vit_encode(params, images, cfg, rng=rng, train=train,
                   blocks_runner=blocks_runner)
    cls = x[:, 0, :]
    if with_mbstd:
        cls = jnp.concatenate([cls, minibatch_std_feature(cls)], axis=-1)
    h = jnp.tanh(L.dense(params["head_fc1"], cls))
    return L.dense(params["head_fc2"], h)


# ---------------------------------------------------------------------------
# GAN wrappers
# ---------------------------------------------------------------------------


def generator_init(key, cfg: V2Config, dtype=jnp.float32) -> Dict[str, Any]:
    """Latent -> token grid -> encoder stack -> per-token pixels -> unpatchify.

    Replaces the reference's broken classes->batch_size reshape generator
    (ref:src/v2/modules.py:344-372, SURVEY §2.4.8) with the intended design.
    """
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    patch_dim = cfg.patch_size ** 2 * cfg.channels
    keys = jax.random.split(key, cfg.depth + 4)
    params = {
        "mapping": L.trunc_normal_init(keys[0], cfg.latent_dim,
                                       n_patches * cfg.embed_dim, dtype=dtype),
        "pos": 0.02 * jax.random.truncated_normal(keys[1], -2.0, 2.0,
                                                  (n_patches, cfg.embed_dim), dtype),
        "blocks": [_encoder_init(keys[2 + i], cfg, dtype) for i in range(cfg.depth)],
        "ln": L.layer_norm_init(cfg.embed_dim, dtype),
        "to_pixels": L.trunc_normal_init(keys[-1], cfg.embed_dim, patch_dim, dtype=dtype),
    }
    return {"params": params, "state": {}}


def generator_apply(variables, z, cfg: V2Config, *, rng=None, train=False,
                    blocks_runner=None):
    params = variables["params"]
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    x = L.dense(params["mapping"], z).reshape(-1, n_patches, cfg.embed_dim)
    x = x + params["pos"].astype(x.dtype)
    rngs = jax.random.split(rng, cfg.depth) if rng is not None else None
    x = _run_blocks(params["blocks"], x, rngs, cfg, train, blocks_runner)
    x = L.layer_norm(params["ln"], x)
    pix = jnp.tanh(L.dense(params["to_pixels"], x))
    return unpatchify(pix, cfg.patch_size, cfg.image_size, cfg.channels), {}


def discriminator_init(key, cfg: V2Config, dtype=jnp.float32) -> Dict[str, Any]:
    """Plain ViT scoring real/fake with one logit (ref:src/v2/modules.py:375-395,
    with the 10-class head narrowed to the GAN-coherent single logit).
    ``cfg.minibatch_std`` widens the head by the batch-std feature."""
    return {"params": vit_init(key, cfg, n_classes=1, dtype=dtype,
                               head_extra=1 if cfg.minibatch_std else 0),
            "state": {}}


def discriminator_apply(variables, images, cfg: V2Config, *, rng=None, train=False,
                        update_state: bool = False, blocks_runner=None):
    logits = vit_apply(variables["params"], images, cfg, rng=rng, train=train,
                       blocks_runner=blocks_runner, with_mbstd=cfg.minibatch_std)
    return logits[:, 0], {}
