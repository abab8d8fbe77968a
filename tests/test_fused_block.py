"""Megablock kernel parity: one fused v2 encoder block == the XLA composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu.config import V2Config
from vitgan_tpu.models.vitgan_v2 import _encoder_apply, _encoder_init
from vitgan_tpu.ops.fused_block import _block_reference, fused_encoder_block


@pytest.mark.parametrize("shape", [
    # (batch, image/patch -> tokens via cfg, embed, heads, mlp_ratio)
    dict(b=4, image_size=16, patch=4, embed=32, heads=2),     # padded E lane
    dict(b=5, image_size=32, patch=4, embed=128, heads=4),    # v2 flagship shape (65 tokens w/ cls -> here 64)
])
@pytest.mark.slow
def test_fused_block_matches_encoder(rng, shape):
    cfg = V2Config(image_size=shape["image_size"], patch_size=shape["patch"],
                   embed_dim=shape["embed"], num_heads=shape["heads"],
                   mlp_ratio=2, dropout=0.0)
    params = _encoder_init(rng, cfg)
    n = (cfg.image_size // cfg.patch_size) ** 2 + 1  # CLS included
    x = jax.random.normal(jax.random.PRNGKey(3), (shape["b"], n, cfg.embed_dim),
                          jnp.float32)
    want = _encoder_apply(params, x, cfg, None, False)
    got = fused_encoder_block(x, params, num_heads=cfg.num_heads, group=4,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_block_grads_match(rng):
    """custom_vjp (recompute backward) == AD through the XLA composition."""
    from vitgan_tpu.ops.fused_block import encoder_block_fused

    cfg = V2Config(image_size=16, patch_size=4, embed_dim=32, num_heads=2,
                   mlp_ratio=2, dropout=0.0)
    params = _encoder_init(rng, cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 17, 32), jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(6), (4, 17, 32), jnp.float32)

    def loss_fused(x, p):
        return jnp.sum(encoder_block_fused(x, p, 2, 1e-5, 4, True) * cot)

    def loss_ref(x, p):
        return jnp.sum(_encoder_apply(p, x, cfg, None, False) * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("shape", [
    dict(b=4, n=17, e=32, heads=2),    # padded E lane, ragged tokens
    dict(b=3, n=65, e=128, heads=4),   # v2 flagship shape, ragged batch
])
@pytest.mark.slow
def test_fused_block_saved_grads_match(rng, shape):
    """custom_vjp (saved-residual Pallas backward) == AD through XLA."""
    from vitgan_tpu.ops.fused_block import encoder_block_fused_saved

    cfg = V2Config(image_size=16, patch_size=4, embed_dim=shape["e"],
                   num_heads=shape["heads"], mlp_ratio=2, dropout=0.0)
    params = _encoder_init(rng, cfg)
    b, n, e = shape["b"], shape["n"], shape["e"]
    x = jax.random.normal(jax.random.PRNGKey(5), (b, n, e), jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(6), (b, n, e), jnp.float32)

    def loss_fused(x, p):
        return jnp.sum(encoder_block_fused_saved(
            x, p, shape["heads"], 1e-5, 4, True, 2) * cot)

    def loss_ref(x, p):
        return jnp.sum(_encoder_apply(p, x, cfg, None, False) * cot)

    out_f = encoder_block_fused_saved(x, params, shape["heads"], 1e-5, 4, True, 2)
    out_r = _encoder_apply(params, x, cfg, None, False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)
    gf = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    for (pa, a), (pb, bb) in zip(
            jax.tree_util.tree_leaves_with_path(gf),
            jax.tree_util.tree_leaves_with_path(gr)):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)}")


def test_megablock_policy_routing(rng):
    """runtime.megablock=on routes dropout-free blocks through the kernel;
    train-with-dropout keeps the standard path (no in-kernel RNG)."""
    from vitgan_tpu.ops.policy import set_policy

    cfg = V2Config(image_size=16, patch_size=4, embed_dim=32, num_heads=2,
                   mlp_ratio=2, dropout=0.1)
    params = _encoder_init(rng, cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 17, 32), jnp.float32)
    want = _encoder_apply(params, x, cfg, None, False)
    try:
        set_policy(megablock="on")
        got = _encoder_apply(params, x, cfg, None, False)  # eval: kernel path
        # train with dropout: must still work (standard path) and differ by masks
        r = jax.random.PRNGKey(8)
        trained = _encoder_apply(params, x, cfg, r, True)
    finally:
        set_policy(megablock="auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    assert np.isfinite(np.asarray(trained)).all()


def test_megablock_routes_train_dropout(rng):
    """megablock=on with train+dropout: off-TPU the in-kernel-RNG variant has
    no interpret lowering, so the standard XLA dropout path must be used
    (finite, differs from eval); the kernel variant is covered in the
    on-chip lane (tests/test_tpu_onchip.py)."""
    from vitgan_tpu.ops.policy import set_policy

    cfg = V2Config(image_size=16, patch_size=4, embed_dim=32, num_heads=2,
                   mlp_ratio=2, dropout=0.2)
    params = _encoder_init(rng, cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 17, 32), jnp.float32)
    try:
        set_policy(megablock="on", megablock_group=4)
        trained = _encoder_apply(params, x, cfg, jax.random.PRNGKey(8), True)
        evaled = _encoder_apply(params, x, cfg, None, False)
    finally:
        set_policy(megablock="auto", megablock_group=8)
    assert np.isfinite(np.asarray(trained)).all()
    assert not np.allclose(np.asarray(trained), np.asarray(evaled))


def test_megablock_auto_gate(rng, monkeypatch):
    """megablock=auto routes only the measured-win regime: >=128 tokens,
    saved forward fits scoped VMEM, real TPU.  Decision logic is checked by
    faking on_tpu; actual speed numbers live in MEGABLOCK_r03.json."""
    from vitgan_tpu.ops import fused_block as FB
    from vitgan_tpu.ops.policy import set_policy

    routed_saved, routed_plain = [], []
    real_saved = FB.encoder_block_fused_saved
    real_plain = FB.encoder_block_fused

    monkeypatch.setattr("vitgan_tpu.ops.policy.on_tpu", lambda: True)
    # on_tpu=True makes maybe_megablock pass interpret=False; re-fake the
    # kernel wrappers so the CPU test still executes (interpret mode)
    monkeypatch.setattr(
        FB, "encoder_block_fused_saved",
        lambda x, p, h, eps, g, interp, bg=2: (
            routed_saved.append(x.shape),
            real_saved(x, p, h, eps, g, True, bg))[1])
    monkeypatch.setattr(
        FB, "encoder_block_fused",
        lambda x, p, h, eps, g, interp: (
            routed_plain.append(x.shape),
            real_plain(x, p, h, eps, g, True))[1])

    cfg_small = V2Config(image_size=16, patch_size=4, embed_dim=32,
                         num_heads=2, mlp_ratio=2, dropout=0.0)
    cfg_big = V2Config(image_size=64, patch_size=4, embed_dim=64,
                       num_heads=2, mlp_ratio=2, dropout=0.0)
    try:
        set_policy(megablock="auto")
        p_small = _encoder_init(rng, cfg_small)
        x_small = jax.random.normal(jax.random.PRNGKey(1), (2, 17, 32))
        _encoder_apply(p_small, x_small, cfg_small, None, False)
        assert routed_saved == routed_plain == []  # 17 tokens: below threshold

        p_big = _encoder_init(rng, cfg_big)
        x_big = jax.random.normal(jax.random.PRNGKey(2), (2, 257, 64))
        # inference: the residual-free forward (saved would write residual
        # tiles nobody reads — round-4 routing change)
        out = _encoder_apply(p_big, x_big, cfg_big, None, False)
        assert routed_plain == [(2, 257, 64)] and routed_saved == []
        want = _block_reference(x_big, p_big, cfg_big.num_heads, 1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        # training (dropout 0): the saved-backward kernel
        out_t = _encoder_apply(p_big, x_big, cfg_big, jax.random.PRNGKey(3),
                               True)
        assert routed_saved == [(2, 257, 64)]
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
    finally:
        set_policy(megablock="auto")


def test_fused_block_group_padding(rng):
    """Batch not divisible by the group: padded samples must not leak."""
    cfg = V2Config(image_size=16, patch_size=4, embed_dim=32, num_heads=2,
                   mlp_ratio=2, dropout=0.0)
    params = _encoder_init(rng, cfg)
    x = jax.random.normal(jax.random.PRNGKey(9), (3, 17, 32), jnp.float32)
    want = _encoder_apply(params, x, cfg, None, False)
    got = fused_encoder_block(x, params, num_heads=2, group=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gelu_grad_is_exact_ad_of_kernel_forward():
    """_gelu_grad must differentiate the _erf_poly approximation the forward
    actually computes — not analytic erf-GELU (ADVICE r3: a small systematic
    mismatch, fixed by _erf_poly_grad)."""
    from vitgan_tpu.ops.fused_block import _gelu_grad
    from vitgan_tpu.ops.fused_mlp import _gelu_exactish

    z = jnp.linspace(-6.0, 6.0, 2049, dtype=jnp.float32)
    want = jax.vmap(jax.grad(_gelu_exactish))(z)
    got = _gelu_grad(z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_fused_block_saved_many_heads(rng):
    """num_heads > 8: the LSE residual's sublane dim must pad to ceil8(H)
    (ADVICE r3: the hardcoded 8 made 16-head configs fail at trace time)."""
    from vitgan_tpu.ops.fused_block import encoder_block_fused_saved

    cfg = V2Config(image_size=16, patch_size=4, embed_dim=64, num_heads=16,
                   mlp_ratio=2, dropout=0.0)
    params = _encoder_init(rng, cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 17, 64), jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(6), (2, 17, 64), jnp.float32)

    out_f = encoder_block_fused_saved(x, params, 16, 1e-5, 4, True, 2)
    out_r = _encoder_apply(params, x, cfg, None, False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)

    def loss_fused(x, p):
        return jnp.sum(encoder_block_fused_saved(x, p, 16, 1e-5, 4, True, 2)
                       * cot)

    def loss_ref(x, p):
        return jnp.sum(_encoder_apply(p, x, cfg, None, False) * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_megablock_auto_honors_bwd_knob(rng, monkeypatch):
    """megablock_bwd='recompute' is the escape hatch from the saved kernels;
    under auto (whose win was measured WITH the saved backward) it must fall
    back to the standard path rather than being silently ignored (ADVICE r3)."""
    from vitgan_tpu.ops import fused_block as FB
    from vitgan_tpu.ops.policy import set_policy

    routed = []
    monkeypatch.setattr(
        FB, "encoder_block_fused_saved",
        lambda x, *a, **k: routed.append(("saved", x.shape)) or x)
    monkeypatch.setattr(
        FB, "encoder_block_fused",
        lambda x, *a, **k: routed.append(("plain", x.shape)) or x)
    monkeypatch.setattr("vitgan_tpu.ops.policy.on_tpu", lambda: True)

    cfg = V2Config(image_size=64, patch_size=4, embed_dim=64, num_heads=2,
                   mlp_ratio=2, dropout=0.0)
    params = _encoder_init(rng, cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 257, 64))
    k = jax.random.PRNGKey(3)
    try:
        # escape hatch honored under auto at TRAINING: no megablock routing
        # (the recompute backward measured a loss, round-2 A/B)
        set_policy(megablock="auto", megablock_bwd="recompute")
        _encoder_apply(params, x, cfg, k, True)
        assert routed == []
        set_policy(megablock_bwd="saved")
        _encoder_apply(params, x, cfg, k, True)
        assert routed == [("saved", (2, 257, 64))]
        # at INFERENCE the bwd knob is irrelevant: the residual-free forward
        # routes under either setting (round-4 routing change)
        routed.clear()
        set_policy(megablock_bwd="recompute")
        _encoder_apply(params, x, cfg, None, False)
        assert routed == [("plain", (2, 257, 64))]
    finally:
        set_policy(megablock="auto", megablock_bwd="saved")


def test_saved_group_vmem_clamp():
    """The scoped-VMEM clamp formulas are calibrated against measured Mosaic
    stack sizes (MEGABLOCK_r03.json vmem_calibration); pin the decisions they
    must make at the production shapes so a formula regression is caught
    before an on-chip OOM."""
    from vitgan_tpu.ops.fused_block import _VMEM_BUDGET, saved_fwd_group

    # deit64: n_pad 264, e_pad 256, hidden_pad 768, hd_pad 640.  Under the
    # raised 48 MB per-kernel limit the dropout-free fwd (measured 13.06
    # KB/row -> 26 MB at group 8) fits un-clamped; both paths stay >= 1.
    assert saved_fwd_group(8, 264, 256, 768, 640) == 8
    assert saved_fwd_group(8, 264, 256, 768, 640, dropout=True) >= 4
    # A shape whose group-1 estimate exceeds the budget must return 0
    # (fused_encoder_block raises rather than compile an OOM kernel).
    assert saved_fwd_group(8, 8192, 1024, 4096, 3072) == 0
    # hires (1032 tokens): the auto gate routes it since round 4 (measured
    # 1.30-1.34x, MEGABLOCK_r04.json) — both clamps must fit at group >= 1
    # under the 96 MB default limit.
    assert saved_fwd_group(8, 1032, 384, 1536, 1152) >= 1
    from vitgan_tpu.ops.fused_block import saved_bwd_group

    assert saved_bwd_group(8, 1032, 384, 1536, 1152, dropout=True) >= 1
    # round 4: 96 MB default (the bf16 operand copies of the input-dtype MACs
    # pushed deit64's measured stack to 48.72 MB past the old 48 MB limit,
    # and the hires saved pair needs ~94 MB at group 1); must stay well under
    # the 128 MB physical VMEM to leave I/O-tile room.
    assert _VMEM_BUDGET <= 96 * 2**20


def test_megablock_refuses_4k_tokens():
    """hires256p4 routing decision (HIRES256P4_r05.json): at 4096(+CLS)
    tokens x embed 384 x hidden 1536, the saved-residual backward cannot fit
    scoped VMEM even at group 1 under the calibrated 96 MB budget, so
    megablock routing (auto AND forced 'on') must refuse and leave the flash
    DMA-streaming attention path in charge.  Shape-static: this pins the
    refusal without chip time."""
    from vitgan_tpu.ops.fused_block import _ceil_to, saved_bwd_group

    n = _ceil_to(4097, 8)
    assert saved_bwd_group(1, n, _ceil_to(384, 128), _ceil_to(1536, 128),
                           _ceil_to(3 * 6 * 64, 128), dropout=True) == 0
    assert saved_bwd_group(1, n, _ceil_to(384, 128), _ceil_to(1536, 128),
                           _ceil_to(3 * 6 * 64, 128), dropout=False) == 0
