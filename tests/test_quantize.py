"""Weight-only int8 quantization (utils/quantize.py) + quantized serving.

The reference has no quantization surface (its inference is one float32 PNG
script, ref:src/v2/generation.py) — this is a TPU-serving addition, so the
tests pin down our own contract: exact per-channel error bounds, pytree
pass-through rules, fused in-jit dequantization, and end-to-end sampler
parity against the native-weight path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu import config as C
from vitgan_tpu.utils.quantize import (QuantLeaf, dequantize_tree,
                                       maybe_quantize, quantize_leaf,
                                       quantize_tree, quantized_bytes)


def test_roundtrip_error_bound():
    # Per-channel symmetric int8: worst-case |w - deq| is half a quantization
    # step, i.e. amax_channel / (2 * 127).
    w = jax.random.normal(jax.random.PRNGKey(0), (96, 48), jnp.float32) * 3.0
    leaf = quantize_leaf(w)
    deq = leaf.dequantize()
    amax = jnp.max(jnp.abs(w), axis=0)
    bound = amax / 254.0 + 1e-7
    assert leaf.q.dtype == jnp.int8 and deq.dtype == w.dtype
    assert jnp.all(jnp.abs(w - deq) <= bound[None, :])


def test_negation_is_exact():
    # We clip to +/-127 (never emit -128), so quantization commutes with
    # negation — a cheap invariant that catches asymmetric-range bugs.
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 64))
    a, b = quantize_leaf(w), quantize_leaf(-w)
    assert jnp.array_equal(a.q, -b.q)
    assert jnp.array_equal(a.scale, b.scale)


def test_tree_pass_through_rules():
    tree = {
        "w_big": jnp.ones((64, 64)),            # quantized (>= min_elems)
        "bias": jnp.ones((64,)),                # 1D -> exact
        "w_small": jnp.ones((4, 4)),            # tiny -> exact
        "step": jnp.array(7, jnp.int32),        # integer -> exact
        "nested": {"emb": jnp.ones((128, 32))}, # quantized
    }
    q = quantize_tree(tree, min_elems=1024)
    assert isinstance(q["w_big"], QuantLeaf)
    assert isinstance(q["nested"]["emb"], QuantLeaf)
    assert q["bias"] is tree["bias"] and q["w_small"] is tree["w_small"]
    assert q["step"] is tree["step"]
    # Idempotent: re-quantizing an already-quantized tree is a no-op.
    q2 = quantize_tree(q, min_elems=1024)
    assert q2["w_big"] is q["w_big"]
    # Dequantize restores shapes/dtypes everywhere; identity on plain leaves.
    d = dequantize_tree(q)
    assert d["w_big"].shape == (64, 64) and d["w_big"].dtype == jnp.float32
    assert d["bias"] is tree["bias"]


def test_dequantize_is_identity_on_plain_trees():
    tree = {"a": jnp.ones((8, 8)), "b": jnp.zeros((3,))}
    d = dequantize_tree(tree)
    assert d["a"] is tree["a"] and d["b"] is tree["b"]


def test_maybe_quantize_modes():
    tree = {"w": jnp.ones((64, 64))}
    assert maybe_quantize(tree, None) is tree
    assert maybe_quantize(tree, "none") is tree
    assert isinstance(maybe_quantize(tree, "int8")["w"], QuantLeaf)
    with pytest.raises(ValueError, match="unknown quantization"):
        maybe_quantize(tree, "int4")


def test_quantized_bytes_shrink():
    tree = {"w": jnp.ones((256, 256), jnp.float32), "b": jnp.ones((256,))}
    stored, dense = quantized_bytes(quantize_tree(tree))
    # 256x256 int8 + 256 f32 scales + 256 f32 bias vs all-f32.
    assert dense == (256 * 256 + 256) * 4
    assert stored == 256 * 256 + 256 * 4 + 256 * 4
    assert stored < dense / 3.5


def test_quantleaf_is_a_pytree():
    leaf = quantize_leaf(jnp.ones((32, 32)))
    flat, tdef = jax.tree_util.tree_flatten(leaf)
    assert len(flat) == 2  # q + scale
    back = jax.tree_util.tree_unflatten(tdef, flat)
    assert isinstance(back, QuantLeaf) and back.dtype == leaf.dtype
    # jit through a QuantLeaf argument (the serving path's usage).
    out = jax.jit(lambda l: jnp.sum(l.dequantize()))(leaf)
    assert np.isfinite(float(out))


def test_serve_sampler_parity_and_reproducibility():
    """int8 weights through the REAL single-dispatch serving sampler: output
    must stay close to the native-weight samples (bounded drift) and remain
    bit-reproducible for a fixed seed."""
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state, make_serve_sample_fn

    cfg = C.smoke_config("v2")
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    sample = make_serve_sample_fn(gan, cfg, batch=8)

    native = np.asarray(sample(state.g_vars, 5, 0))
    qtree = quantize_tree(state.g_vars, min_elems=256)
    quant = np.asarray(sample(qtree, 5, 0))
    again = np.asarray(sample(qtree, 5, 0))

    assert native.shape == quant.shape and quant.dtype == np.uint8
    assert np.array_equal(quant, again)  # seeded reproducibility survives
    diff = np.abs(native.astype(np.int32) - quant.astype(np.int32))
    # Weight-only per-channel int8 on the smoke generator: empirically the
    # uint8 outputs drift by ~1 gray level on average; these bounds are ~3x
    # the observed drift, far below visible degradation (tolerances would
    # catch a broken scale/axis immediately: that yields diffs of 50-200).
    assert diff.mean() <= 4.0, f"mean u8 drift {diff.mean():.2f}"
    assert np.quantile(diff, 0.99) <= 24, f"p99 u8 drift {np.quantile(diff, 0.99)}"


def test_sampler_service_quantized():
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.serve import SamplerService
    from vitgan_tpu.train import create_train_state

    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    svc = SamplerService(cfg, gan, state.g_vars_ema, batch=8, quantize="int8")
    info = svc.info()
    assert info["quantize"] == "int8"
    ref = SamplerService(cfg, gan, state.g_vars_ema, batch=8)
    assert info["weight_bytes"] < ref.info()["weight_bytes"]
    out = svc.sample(4, seed=3)
    assert out.shape[0] == 4 and np.isfinite(out).all()
    assert np.array_equal(out, svc.sample(4, seed=3))
