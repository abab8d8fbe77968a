"""Train state: both networks' params/state, both optimizer states, PRNG, step.

The reference keeps G+D modules plus two torch optimizers inside a GAN object
(ref:src/v1/gan.py:24-69,301-328) and never checkpoints optimizer moments
(SURVEY §5.4).  Here the full train state is one pytree — params, model state
(ISR power-iteration vectors, BatchNorm stats), both optax states, the PRNG
key, and the step counter — so checkpoint/resume is exact.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from vitgan_tpu.config import ExperimentConfig, OptimConfig
from vitgan_tpu.models import GANBundle


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    rng: jax.Array
    g_params: Any
    g_state: Any
    d_params: Any
    d_state: Any
    g_opt: optax.OptState
    d_opt: optax.OptState
    g_ema: Any = None  # EMA copy of g_params when run.ema_decay > 0

    @property
    def g_vars(self) -> Dict[str, Any]:
        return {"params": self.g_params, "state": self.g_state}

    @property
    def g_vars_ema(self) -> Dict[str, Any]:
        """Sampling-quality params: EMA when tracked, else the live params."""
        return {"params": self.g_ema if self.g_ema is not None else self.g_params,
                "state": self.g_state}

    @property
    def d_vars(self) -> Dict[str, Any]:
        return {"params": self.d_params, "state": self.d_state}


def make_lr(cfg: OptimConfig):
    """Learning rate or an optax step schedule (OptimConfig.schedule).

    Schedules are pure functions of the optimizer step count, so they trace
    into jit/scan and resume exactly with the restored optimizer state (the
    count lives in the Adam moments' companion state)."""
    if cfg.schedule == "constant":
        if cfg.warmup_steps > 0:
            return optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
        return cfg.learning_rate
    if cfg.schedule in ("cosine", "warmup_cosine"):
        if not cfg.decay_steps:
            raise ValueError(f"schedule={cfg.schedule!r} requires decay_steps")
        if cfg.schedule == "cosine" and cfg.warmup_steps > 0:
            raise ValueError("schedule='cosine' ignores warmup_steps — use "
                             "schedule='warmup_cosine'")
        if cfg.schedule == "warmup_cosine":
            if cfg.warmup_steps <= 0:
                raise ValueError("schedule='warmup_cosine' requires "
                                 "warmup_steps > 0 (or use schedule='cosine')")
            return optax.warmup_cosine_decay_schedule(
                0.0, cfg.learning_rate, cfg.warmup_steps, cfg.decay_steps,
                end_value=cfg.learning_rate * cfg.min_lr_ratio)
        return optax.cosine_decay_schedule(cfg.learning_rate, cfg.decay_steps,
                                           alpha=cfg.min_lr_ratio)
    raise ValueError(f"unknown schedule {cfg.schedule!r} "
                     "(constant | cosine | warmup_cosine)")


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """Optimizer factory (ref:src/v1/gan.py:301-328 _pick_optimizer +
    ref:src/v2/training.py:150-157 AdamW, with the v2 dead-path grad clips)."""
    if cfg.inject_lr:
        # lr lives in the optimizer STATE (hyperparams leaf) — vmapped states
        # can then carry per-trial lrs (hpo.sweep vectorized trials).
        if cfg.schedule != "constant" or cfg.warmup_steps:
            raise ValueError("inject_lr supports constant lr only")
        if cfg.grad_accum > 1:
            # MultiSteps must stay OUTERMOST (train/step reads opt.mini_step
            # to gate EMA); wrapping it in inject_hyperparams would bury it.
            raise ValueError("inject_lr is incompatible with grad_accum")
        makers = {
            "adam": lambda learning_rate: optax.adam(
                learning_rate, b1=cfg.beta1, b2=cfg.beta2),
            "adamw": lambda learning_rate: optax.adamw(
                learning_rate, b1=cfg.beta1, b2=cfg.beta2,
                weight_decay=cfg.weight_decay),
            "sgd": optax.sgd,
        }
        if cfg.name not in makers:
            raise ValueError(f"unknown optimizer {cfg.name!r}")

        inner = makers[cfg.name]  # closure, NOT a default arg:
        # inject_hyperparams introspects the factory signature and would
        # treat any extra parameter as a hyperparameter to inject.

        def _maker(learning_rate):
            tx = inner(learning_rate)
            if cfg.grad_clip is not None:
                # Clip INSIDE the injected maker: inject_hyperparams keeps
                # its hyperparams leaf at the TOP of the state regardless of
                # the inner chain, so vmapped per-trial lrs (hpo.sweep) and
                # clipping compose — vectorized trials clip exactly like
                # sequential ones.
                tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
            return tx

        return optax.inject_hyperparams(_maker)(
            learning_rate=cfg.learning_rate)
    lr = make_lr(cfg)
    if cfg.name == "adam":
        tx = optax.adam(lr, b1=cfg.beta1, b2=cfg.beta2)
    elif cfg.name == "adamw":
        tx = optax.adamw(lr, b1=cfg.beta1, b2=cfg.beta2,
                         weight_decay=cfg.weight_decay)
    elif cfg.name == "sgd":
        tx = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optimizer {cfg.name!r}")
    if cfg.grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    if cfg.grad_accum > 1:
        # Mean-accumulate grads over k step calls (each a fresh batch) and
        # apply on the k-th: effective batch = k x batch_size.  The clip above
        # wraps INSIDE MultiSteps, so it clips the accumulated mean gradient
        # (the large-batch semantic), and schedules/moments advance once per
        # effective update.  MultiSteps state (the grad accumulator) rides in
        # the TrainState, so checkpoints resume mid-accumulation exactly.
        tx = optax.MultiSteps(tx, every_k_schedule=int(cfg.grad_accum))
    return tx


def _optim_cfg(cfg: ExperimentConfig, which: str) -> OptimConfig:
    m = cfg.model
    if hasattr(m, f"{which}_optim"):
        return getattr(m, f"{which}_optim")
    # v1 nests optim under generator/discriminator configs
    return getattr(m, "generator" if which == "gen" else "discriminator").optim


def create_train_state(rng: jax.Array, gan: GANBundle, cfg: ExperimentConfig) -> TrainState:
    kg, kd, krest = jax.random.split(rng, 3)
    g_vars = gan.generator_init(kg)
    d_vars = gan.discriminator_init(kd)
    g_tx = make_optimizer(_optim_cfg(cfg, "gen"))
    d_tx = make_optimizer(_optim_cfg(cfg, "disc"))
    ema = jax.tree.map(jnp.copy, g_vars["params"]) if cfg.run.ema_decay > 0 else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        rng=krest,
        g_params=g_vars["params"],
        g_state=g_vars["state"],
        d_params=d_vars["params"],
        d_state=d_vars["state"],
        g_opt=g_tx.init(g_vars["params"]),
        d_opt=d_tx.init(d_vars["params"]),
        g_ema=ema,
    )
