"""The jitted alternating G/D train step — the framework's hot loop.

Semantics follow the reference's per-batch update (ref:src/v1/gan.py:216-252,
ref:cnn/cnn-gan.ipynb cell 12): D backward on real (labels 1) and detached fake
(labels 0), D optimizer step, then G step against the *updated* D with labels
flipped to 1.  The optional WGAN-GP path implements the reference's coherent
dead-code trainer (ref:src/v2/training.py:67-125): Wasserstein losses, gradient
penalty, instance noise on D inputs, diversity bonus for G, per-network grad
clipping (0.5 G / 5.0 D via the optimizer chain).

TPU-native structure: the whole alternating update — noise sampling, three D
forwards, two G forwards, both backwards, both optax updates, ISR power
-iteration refresh — is ONE ``jax.jit`` region with donated state.  With the
batch sharded over the mesh's data axis and state replicated, XLA emits the
gradient all-reduces over ICI; there is no hand-written collective code.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from vitgan_tpu.config import ExperimentConfig
from vitgan_tpu.models import GANBundle
from vitgan_tpu.train import losses as LO
from vitgan_tpu.train.state import TrainState, make_optimizer, _optim_cfg


def _compute_dtype(cfg: ExperimentConfig):
    return jnp.bfloat16 if cfg.runtime.compute_dtype == "bfloat16" else jnp.float32


def make_raw_train_step(gan: GANBundle, cfg: ExperimentConfig):
    """Build the UN-jitted (state, real_images) -> (state, metrics) step.

    Used directly by the scanned multi-step builders (a jit-of-scan-of-step),
    and wrapped in ``jax.jit`` by :func:`make_train_step` for single-step use.
    """
    mcfg = cfg.model
    loss_name = getattr(mcfg, "loss", "bce")
    criterion = LO.pick_criterion(loss_name if loss_name in ("bce", "mse") else "bce")
    use_wgan = loss_name == "wgan-gp"
    r1_gamma = float(getattr(mcfg, "r1_gamma", 0.0) or 0.0)
    r1_interval = max(1, int(getattr(mcfg, "r1_interval", 1) or 1))
    g_tx = make_optimizer(_optim_cfg(cfg, "gen"))
    d_tx = make_optimizer(_optim_cfg(cfg, "disc"))
    dtype = _compute_dtype(cfg)
    ema_decay = cfg.run.ema_decay
    gen_accum = int(getattr(_optim_cfg(cfg, "gen"), "grad_accum", 1))

    augment_spec = cfg.run.diff_augment

    concat_d = not gan.d_has_batch_stats

    disc_steps = max(1, int(getattr(mcfg, "disc_steps", 1) or 1))

    def step(state: TrainState, real: jnp.ndarray) -> Tuple[TrainState, Dict[str, Any]]:
        if disc_steps > 1:
            # The 12th key seeds the extra critic iterations; splitting 12
            # only on this path keeps disc_steps=1 numerics bit-identical to
            # every pre-knob checkpoint/test.
            (rng, k_noise, k_gen, k_d_real, k_d_fake, k_d_fake2, k_gp, k_in,
             k_a1, k_a2, k_a3, k_critic) = jax.random.split(state.rng, 12)
        else:
            (rng, k_noise, k_gen, k_d_real, k_d_fake, k_d_fake2, k_gp, k_in,
             k_a1, k_a2, k_a3) = jax.random.split(state.rng, 11)
            k_critic = None
        real = real.astype(dtype)
        z = gan.sample_latent(k_noise, real.shape[0]).astype(dtype)

        # ONE generator forward for the whole step, with its VJP captured: the
        # primal ``fake`` feeds the D update detached (ref:src/v1/gan.py:231-239)
        # and the G update pulls its image-space gradient back through the same
        # linearization — the reference recomputes this forward (same params,
        # same rng => identical value), we don't.
        def g_forward(g_params):
            return gan.generator_apply({"params": g_params, "state": state.g_state},
                                       z, rng=k_gen, train=True)

        fake, g_vjp, g_state = jax.vjp(g_forward, state.g_params, has_aux=True)
        fake_sg = jax.lax.stop_gradient(fake)

        d_real_in, d_fake_in = real, fake_sg
        if use_wgan and mcfg.instance_noise > 0:  # ref:src/v2/training.py:99
            n1, n2 = jax.random.split(k_in)
            d_real_in = real + mcfg.instance_noise * jax.random.normal(n1, real.shape, dtype)
            d_fake_in = fake_sg + mcfg.instance_noise * jax.random.normal(n2, fake.shape, dtype)
        if augment_spec:  # DiffAugment: augment every D input, real and fake alike.
            from vitgan_tpu.ops.augment import apply_augment

            d_real_in = apply_augment(k_a1, d_real_in, augment_spec)
            d_fake_in = apply_augment(k_a2, d_fake_in, augment_spec)

        # ---------------- D update ----------------
        def d_loss_on(d_params, d_state_in, real_in, fake_in, kdr, kdf, kgp,
                      with_r1):
            """One D loss evaluation, parametrized over params/state/inputs/
            keys so the same math serves the final update AND the extra WGAN
            critic iterations (disc_steps > 1)."""
            dv = {"params": d_params, "state": d_state_in}
            if concat_d:
                # Stat-free D: one forward over [real; fake] — identical math,
                # twice the rows per kernel (better MXU tiling), half the
                # dispatches.  BatchNorm discriminators keep two forwards so
                # running stats see pure-real and pure-fake batches (torch
                # reference semantics).
                b = real_in.shape[0]
                logits, d_state2 = gan.discriminator_apply(
                    dv, jnp.concatenate([real_in, fake_in], axis=0),
                    rng=kdr, train=True, update_state=True
                )
                real_logits, fake_logits = logits[:b], logits[b:]
            else:
                real_logits, d_state1 = gan.discriminator_apply(
                    dv, real_in, rng=kdr, train=True, update_state=True
                )
                fake_logits, d_state2 = gan.discriminator_apply(
                    {"params": d_params, "state": d_state1}, fake_in,
                    rng=kdf, train=True
                )
            r1 = jnp.zeros((), jnp.float32)  # unscaled R1 penalty (0 off-step)
            if use_wgan:
                k_gp_eps, k_gp_drop = jax.random.split(kgp)
                gp = LO.gradient_penalty(
                    lambda x: gan.discriminator_apply(dv, x, rng=k_gp_drop, train=True)[0],
                    real_in, fake_in, k_gp_eps,
                )
                loss = LO.wasserstein_d_loss(real_logits, fake_logits) + mcfg.gp_lambda * gp
                loss_real = -jnp.mean(real_logits.astype(jnp.float32))
                loss_fake = jnp.mean(fake_logits.astype(jnp.float32))
            else:
                ones = jnp.ones_like(real_logits, jnp.float32)
                zeros = jnp.zeros_like(fake_logits, jnp.float32)
                loss_real = criterion(real_logits, ones)
                loss_fake = criterion(fake_logits, zeros)
                loss = loss_real + loss_fake
                if with_r1:  # beyond-reference stabilizer (losses.r1_penalty)
                    # Lazy R1 (StyleGAN2 lazy regularization): applied every
                    # k-th step, scaled by k so the time-averaged LOSS
                    # gradient matches the every-step form.  The equivalence
                    # is pre-optimizer: grad clipping can rescale the spiked
                    # on-step update and Adam's moments see a burstier
                    # signal (StyleGAN2 compensates with c = k/(k+1) on
                    # lr/betas) — monitor the unscaled d_r1 metric.
                    r1 = LO.r1_penalty(
                        lambda x: gan.discriminator_apply(dv, x, rng=kgp,
                                                          train=True)[0],
                        real_in,
                    ).astype(jnp.float32)
                    loss = loss + 0.5 * r1_gamma * r1_interval * r1
            aux = {
                "d_state": d_state2,
                "loss_real": loss_real,
                "loss_fake": loss_fake,
                "r1": r1,
                "real_acc": LO.accuracy_from_logits(real_logits, True),
                "fake_acc": LO.accuracy_from_logits(fake_logits, False),
            }
            return loss, aux

        # Extra critic iterations (WGAN n_critic): disc_steps-1 updates on a
        # FRESH latent batch each (same reals, per-iteration noise/augment
        # keys), threading params/opt/state sequentially; the final update
        # below then runs with the original step keys.  Static python loop —
        # disc_steps is a config constant, XLA sees a straight-line graph.
        d_params_c, d_opt_c, d_state_c = state.d_params, state.d_opt, state.d_state
        for i in range(disc_steps - 1):
            (kz_i, kg_i, kdr_i, kdf_i, kgp_i, kin_i, ka1_i, ka2_i
             ) = jax.random.split(jax.random.fold_in(k_critic, i), 8)
            z_i = gan.sample_latent(kz_i, real.shape[0]).astype(dtype)
            fake_i, _ = gan.generator_apply(
                {"params": state.g_params, "state": state.g_state}, z_i,
                rng=kg_i, train=True)
            fake_i = jax.lax.stop_gradient(fake_i)
            real_i = real
            if use_wgan and mcfg.instance_noise > 0:
                n1_i, n2_i = jax.random.split(kin_i)
                real_i = real + mcfg.instance_noise * jax.random.normal(
                    n1_i, real.shape, dtype)
                fake_i = fake_i + mcfg.instance_noise * jax.random.normal(
                    n2_i, fake_i.shape, dtype)
            if augment_spec:
                from vitgan_tpu.ops.augment import apply_augment

                real_i = apply_augment(ka1_i, real_i, augment_spec)
                fake_i = apply_augment(ka2_i, fake_i, augment_spec)
            (_, aux_i), grads_i = jax.value_and_grad(
                lambda p: d_loss_on(p, d_state_c, real_i, fake_i,
                                    kdr_i, kdf_i, kgp_i, False),
                has_aux=True)(d_params_c)
            upd_i, d_opt_c = d_tx.update(grads_i, d_opt_c, d_params_c)
            d_params_c = optax.apply_updates(d_params_c, upd_i)
            d_state_c = aux_i["d_state"]

        def d_loss_fn(d_params, with_r1):
            return d_loss_on(d_params, d_state_c, d_real_in, d_fake_in,
                             k_d_real, k_d_fake, k_gp, with_r1)

        def d_update(with_r1):
            return jax.value_and_grad(
                lambda p: d_loss_fn(p, with_r1), has_aux=True
            )(d_params_c)

        if (not use_wgan) and r1_gamma > 0 and r1_interval > 1:
            # Lazy R1: the double-backward runs only on every r1_interval-th
            # step.  lax.cond compiles both branches but EXECUTES one, so the
            # off-steps cost a plain BCE update (measured: every-step R1 is
            # ~1.83x a plain step — the same as WGAN-GP; lazy amortizes that
            # to ~1/k).  Both branches share one pytree structure.
            (d_loss, d_aux), d_grads = jax.lax.cond(
                state.step % r1_interval == 0,
                lambda _: d_update(True), lambda _: d_update(False), None,
            )
        else:
            (d_loss, d_aux), d_grads = d_update((not use_wgan) and r1_gamma > 0)
        d_updates, d_opt = d_tx.update(d_grads, d_opt_c, d_params_c)
        d_params = optax.apply_updates(d_params_c, d_updates)
        d_state = d_aux["d_state"]

        # ---------------- G update (against updated D, ref:src/v1/gan.py:242-252) ----
        # Image-space loss differentiated at ``fake``, chained through the
        # captured generator VJP: dL/dg = g_vjp(dL/dfake).  Mathematically the
        # reference's recompute-and-backprop, minus one full G forward.
        def g_image_loss(fake_img):
            fake_in = fake_img
            if augment_spec:  # differentiable augment on the G path too
                from vitgan_tpu.ops.augment import apply_augment

                fake_in = apply_augment(k_a3, fake_img, augment_spec)
            fake_logits, _ = gan.discriminator_apply(
                {"params": d_params, "state": d_state}, fake_in, rng=k_d_fake2, train=True
            )
            if use_wgan:
                loss = LO.wasserstein_g_loss(fake_logits)
                if mcfg.diversity_weight > 0:  # ref:src/v2/training.py:85-88
                    loss = loss - mcfg.diversity_weight * LO.diversity_loss(fake_img)
            else:
                loss = LO.g_adversarial_loss(criterion, fake_logits)
                if getattr(mcfg, "g_diversity", False) and mcfg.diversity_weight > 0:
                    # Beyond-reference anti-collapse knob (v2.g_diversity):
                    # the reference gates the diversity bonus inside its dead
                    # WGAN path only; under BCE the round-4 probes measured
                    # every recipe at recall ~0 (mode collapse).
                    loss = loss - mcfg.diversity_weight * LO.diversity_loss(fake_img)
            return loss

        g_loss, d_fake_img = jax.value_and_grad(g_image_loss)(fake)
        (g_grads,) = g_vjp(d_fake_img)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        g_ema = state.g_ema
        if ema_decay > 0 and g_ema is not None:
            g_ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, g_ema, g_params
            )
            if gen_accum > 1:
                # Under gradient accumulation G params only move on every
                # k-th call; decaying the EMA on frozen-param calls would
                # shrink its horizon by k vs the large-batch baseline.  Gate
                # on MultiSteps' own counter (pre-update mini_step == k-1 on
                # applying calls) so mid-accumulation resume stays exact.
                applied = state.g_opt.mini_step == gen_accum - 1
                g_ema = jax.tree.map(
                    lambda new, old: jnp.where(applied, new, old),
                    g_ema, state.g_ema)

        metrics = {
            "d_loss": d_loss,
            "d_loss_real": d_aux["loss_real"],
            "d_loss_fake": d_aux["loss_fake"],
            "g_loss": g_loss,
            "d_real_acc": d_aux["real_acc"],
            "d_fake_acc": d_aux["fake_acc"],
            "d_grad_norm": optax.global_norm(d_grads),
            "g_grad_norm": optax.global_norm(g_grads),
        }
        if r1_gamma > 0 and not use_wgan:
            # Unscaled penalty, comparable across r1_interval choices (the
            # k-scaled term inside d_loss spikes on lazy on-steps by design).
            metrics["d_r1"] = d_aux["r1"]
        new_state = state.replace(
            step=state.step + 1, rng=rng,
            g_params=g_params, g_state=g_state, g_opt=g_opt,
            d_params=d_params, d_state=d_state, d_opt=d_opt,
            g_ema=g_ema,
        )
        return new_state, metrics

    return step


def _pin_state(state, shardings):
    """Pin the updated state to its input placements (FSDP): without this the
    compiler may re-replicate small updated leaves, silently undoing the
    sharding from step 2 onward."""
    if shardings is None:
        return state
    return jax.tree.map(jax.lax.with_sharding_constraint, state, shardings)


def make_train_step(gan: GANBundle, cfg: ExperimentConfig, donate: bool = True,
                    state_shardings=None):
    """Build the jitted (state, real_images) -> (state, metrics) step.

    ``state_shardings``: optional pytree of NamedShardings matching the state
    (e.g. FSDP placements) — the returned state is constrained to them.
    """
    raw_step = make_raw_train_step(gan, cfg)

    def step(state: TrainState, real: jnp.ndarray):
        s2, m = raw_step(state, real)
        return _pin_state(s2, state_shardings), m

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_multi_train_step(gan: GANBundle, cfg: ExperimentConfig, n_steps: int,
                          donate: bool = True, state_shardings=None):
    """Scan ``n_steps`` alternating updates in ONE device call.

    Input: (state, reals) with reals (n_steps, B, H, W, C) — a stack of
    microbatches.  Semantics are identical to calling the single step n times
    (true sequential G/D updates, not gradient accumulation); the scan removes
    per-step host dispatch, which dominates at CIFAR scale (~2ms/step model).
    Returns per-step metrics stacked along axis 0.
    """
    raw_step = make_raw_train_step(gan, cfg)
    unroll = max(1, int(getattr(cfg.runtime, "scan_unroll", 1)))

    def multi(state: TrainState, reals: jnp.ndarray):
        def body(s, real):
            s2, m = raw_step(s, real)
            return _pin_state(s2, state_shardings), m

        return jax.lax.scan(body, state, reals, unroll=unroll)

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def make_device_data_train_fn(gan: GANBundle, cfg: ExperimentConfig, n_steps: int,
                              donate: bool = True, state_shardings=None):
    """Device-resident-dataset training: scan K updates with ON-DEVICE batch
    assembly.

    CIFAR-scale datasets (50k x 32x32x3 = 150 MB uint8) fit in HBM, so the
    host->device image path disappears entirely: the uint8 dataset is placed on
    device once, and each scanned step gathers its microbatch by indices,
    normalizes to [-1,1], and (optionally) flips — all inside the jit region.
    Call: fn(state, dataset_u8, indices (n_steps, B) int32) -> (state, metrics).
    Only integer indices cross the host boundary per call.
    """
    raw_step = make_raw_train_step(gan, cfg)
    flip = cfg.data.augment_flip
    unroll = max(1, int(getattr(cfg.runtime, "scan_unroll", 1)))

    def multi(state: TrainState, dataset_u8: jnp.ndarray, indices: jnp.ndarray):
        def body(s, idx):
            real_u8 = jnp.take(dataset_u8, idx, axis=0)
            real = real_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0
            if flip:
                krng = jax.random.fold_in(s.rng, 1)
                do = jax.random.bernoulli(krng, 0.5, (real.shape[0], 1, 1, 1))
                real = jnp.where(do, real[:, :, ::-1, :], real)
            s2, m = raw_step(s, real)
            return _pin_state(s2, state_shardings), m

        return jax.lax.scan(body, state, indices, unroll=unroll)

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def make_sample_fn(gan: GANBundle, cfg: ExperimentConfig):
    """Jitted eval-mode batched sampler (test-generation.py parity, SURVEY §3.3)."""
    dtype = _compute_dtype(cfg)

    @jax.jit
    def sample(g_vars, z):
        imgs, _ = gan.generator_apply(g_vars, z.astype(dtype))
        return imgs.astype(jnp.float32)

    return sample


def make_serve_sample_fn(gan: GANBundle, cfg: ExperimentConfig, batch: int):
    """Jitted ONE-dispatch serving sampler: (g_vars, seed, call) -> uint8 images.

    The serving path pays per-call tunnel overhead on every host<->device
    round trip, so unlike :func:`make_sample_fn` this folds the whole request
    into a single device call: PRNG key construction, latent sampling, the
    generator forward, and the [-1,1]->uint8 quantization all run on device.
    Returning uint8 moves 4x fewer bytes over the wire.  PNG output is 8-bit
    anyway (the grid consumes the uint8 directly, bit-identically); npy output
    is float32 whose values are 8-bit grid points — a DOCUMENTED serving
    contract (serve.py endpoint docs), traded for 4x less tunnel traffic.

    Reproducibility contract (same as serve.py's seeded requests): batch
    ``call`` of seed ``s`` is always fold_in(PRNGKey(s), call).

    ``g_vars`` may be an int8-quantized tree (utils/quantize.py): the
    dequantization happens HERE, inside the jit, so XLA keeps int8 in HBM
    and fuses the scale-multiply into each consuming matmul.  For plain
    trees ``dequantize_tree`` is the identity.
    """
    from vitgan_tpu.utils.quantize import dequantize_tree

    dtype = _compute_dtype(cfg)

    @jax.jit
    def sample_u8(g_vars, seed, call):
        g_vars = dequantize_tree(g_vars)
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), call)
        z = gan.sample_latent(rng, batch).astype(dtype)
        imgs, _ = gan.generator_apply(g_vars, z)
        imgs = jnp.clip(imgs.astype(jnp.float32), -1.0, 1.0)
        return jnp.round((imgs + 1.0) * 127.5).astype(jnp.uint8)

    return sample_u8


def make_eval_step(gan: GANBundle, cfg: ExperimentConfig):
    """Jitted no-update validation step (the working form of the reference's
    broken _validate, ref:src/v1/gan.py:330-372 / SURVEY §2.4.6): D losses and
    accuracies on real and freshly generated batches, eval mode."""
    mcfg = cfg.model
    loss_name = getattr(mcfg, "loss", "bce")
    criterion = LO.pick_criterion(loss_name if loss_name in ("bce", "mse") else "bce")
    dtype = _compute_dtype(cfg)

    @jax.jit
    def eval_step(state: TrainState, real: jnp.ndarray, rng: jax.Array):
        real = real.astype(dtype)
        z = gan.sample_latent(rng, real.shape[0]).astype(dtype)
        fake, _ = gan.generator_apply(state.g_vars, z)
        real_logits, _ = gan.discriminator_apply(state.d_vars, real)
        fake_logits, _ = gan.discriminator_apply(state.d_vars, fake)
        ones = jnp.ones_like(real_logits, jnp.float32)
        zeros = jnp.zeros_like(fake_logits, jnp.float32)
        return {
            "val_d_loss_real": criterion(real_logits, ones),
            "val_d_loss_fake": criterion(fake_logits, zeros),
            "val_g_loss": LO.g_adversarial_loss(criterion, fake_logits),
            "val_real_acc": LO.accuracy_from_logits(real_logits, True),
            "val_fake_acc": LO.accuracy_from_logits(fake_logits, False),
        }

    return eval_step


def make_discriminate_fn(gan: GANBundle, cfg: ExperimentConfig):
    """Jitted eval-mode discriminator probabilities (ref:src/v1/vitgan.py:23 role)."""
    dtype = _compute_dtype(cfg)

    @jax.jit
    def discriminate(d_vars, images):
        logits, _ = gan.discriminator_apply(d_vars, images.astype(dtype))
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    return discriminate
