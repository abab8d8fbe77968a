"""Configuration tree for vitgan_tpu.

Frozen dataclasses mirroring the reference's pydantic config surface:

- v1 hyperparameters: ref:src/v1/config.py:20-73 (ViTGANParameters and children)
- v2 hyperparameters: ref:src/v2/utils.py:25-43 (Config)
- run-dir layout + SCRATCH/DEV env contract: ref:src/v1/config.py:7-17,
  ref:src/v2/utils.py:13-22

plus TPU-native knobs the reference has no equivalent for (mesh shape, dtypes,
Pallas kernel toggles).  Everything is hashable so configs can be closed over by
``jax.jit`` as static state.
"""

from __future__ import annotations

import dataclasses
import datetime
import os
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


def scratch_root() -> str:
    """Artifact root. Honors the reference's SCRATCH env contract (ref:src/v1/config.py:9)."""
    return os.environ.get("SCRATCH", os.path.join(os.path.expanduser("~"), ".vitgan_tpu"))


def dev_mode() -> bool:
    """DEV env flag (ref:src/v2/utils.py:22): shrink everything for smoke runs."""
    return os.environ.get("DEV", "").lower() in ("1", "true", "yes")


def timestamp() -> str:
    return datetime.datetime.now().strftime("%Y%m%d-%H%M%S")


# ---------------------------------------------------------------------------
# Shared building blocks
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TransformerConfig:
    """Transformer block hyperparameters (ref:src/v1/config.py:34-43)."""

    num_heads: int = 4
    attn_dropout: float = 0.2
    mlp_dropout: float = 0.2
    mlp_activation: str = "relu"  # relu | gelu | tanh | sigmoid
    mlp_hidden: Tuple[int, ...] = ()  # empty => single linear, matching reference default


@dataclass(frozen=True)
class SirenConfig:
    """SIREN head hyperparameters (ref:src/v1/siren.py:29-45)."""

    omega_0: float = 30.0


@dataclass(frozen=True)
class OptimConfig:
    """Per-network optimizer settings (ref:src/v1/config.py:60-70, src/v2/training.py:150-157)."""

    name: str = "adam"  # adam | adamw | sgd
    learning_rate: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    weight_decay: float = 0.0
    grad_clip: Optional[float] = None  # global-norm clip; v2 dead path used 0.5 (G) / 5.0 (D)
    # Step-based LR schedule (the working version of the reference's dead
    # ReduceLROnPlateau lines, ref:src/v2/training.py:215-217 — plateau needs
    # a host-fed metric and is deliberately not replicated; step schedules
    # are pure functions of the optimizer step count, so they live inside
    # jit/scan and resume exactly with the optimizer state).
    schedule: str = "constant"  # constant | cosine | warmup_cosine
    warmup_steps: int = 0       # linear 0 -> lr over this many steps
    decay_steps: Optional[int] = None  # cosine horizon (required for cosine*)
    min_lr_ratio: float = 0.0   # floor as a fraction of peak lr
    # Gradient accumulation (optax.MultiSteps): grads MEAN-accumulate over k
    # consecutive train steps (each on a fresh batch) and the update applies
    # on the k-th — effective batch = k x batch_size without the memory.
    # Schedules and moments advance once per EFFECTIVE update.
    grad_accum: int = 1
    # Carry the learning rate IN the optimizer state (optax.inject_hyperparams)
    # instead of baking it into the jitted step — lets vmapped train states
    # hold per-trial lrs (hpo.sweep vectorized mode).  Constant schedule only;
    # composes with grad_clip (the clip chains inside the injected maker) but
    # not grad_accum (MultiSteps must stay outermost for opt.mini_step).
    inject_lr: bool = False


# ---------------------------------------------------------------------------
# v1 — paper-style ViTGAN (ref:src/v1/*)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GeneratorV1Config:
    """SLN generator (ref:src/v1/generator.py:13-69, config.py:45-49)."""

    hidden_size: int = 384
    depth: int = 4
    siren_hidden: int = 768
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    siren: SirenConfig = field(default_factory=SirenConfig)
    optim: OptimConfig = field(default_factory=lambda: OptimConfig(learning_rate=2e-4))


@dataclass(frozen=True)
class DiscriminatorV1Config:
    """ISR L2-attention discriminator (ref:src/v1/discriminatorViT.py, config.py:52-57).

    ``token_size`` is the width patches are projected to.  The reference intended a
    projection but never assigned it (ref:src/v1/patch_encoder.py:30 — the §2.4.1
    defect); we implement the intent: flattened overlapping patches -> Linear(token_size).
    """

    depth: int = 4
    patch_size: int = 8
    overlap: int = 2
    # None => project to the raw flattened patch width (channels*(patch+2*overlap)^2
    # = 432 at defaults), the width the reference sizes its transformer by
    # (ref:src/v1/discriminatorViT.py:24-27).
    token_size: Optional[int] = None
    embed_dropout: float = 0.0  # EncoderParameters.dropout_rate default (ref:src/v1/config.py:23)
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    spectral_rescale: bool = True  # ISR (ref:src/v1/attention.py:37-64)
    optim: OptimConfig = field(default_factory=lambda: OptimConfig(learning_rate=2e-4))


@dataclass(frozen=True)
class V1Config:
    """Top-level v1 ViTGAN config (ref:src/v1/config.py:60-70)."""

    image_size: int = 32
    channels: int = 3
    batch_size: int = 128
    latent_dim: int = 1024
    seed: int = 0
    generator: GeneratorV1Config = field(default_factory=GeneratorV1Config)
    discriminator: DiscriminatorV1Config = field(default_factory=DiscriminatorV1Config)
    # bce | mse (criterion picker, ref:src/v1/gan.py:16-20) | wgan-gp (the
    # v2 dead-path loss ref:src/v2/training.py:67-125, available on the v1
    # family too so the paper architecture can train with the recipe the
    # round-4 probes measured as the only converging one).
    loss: str = "bce"
    # WGAN-GP / stabilizer knobs, same semantics as V2Config (the train step
    # is family-generic, train/step.py reads these off whichever family's
    # model config is active).  Defaults mirror V2Config.
    gp_lambda: float = 10.0
    instance_noise: float = 0.1  # ref:src/v2/training.py:99
    diversity_weight: float = 0.1  # ref:src/v2/training.py:88
    g_diversity: bool = False
    r1_gamma: float = 0.0
    r1_interval: int = 16
    # Critic updates per G update (WGAN n_critic, Arjovsky 2017 standard 5).
    # Each extra update draws a FRESH latent batch against the same reals.
    # Round-5 motivation: every v1 WGAN arm sat at precision 1.0 / recall 0
    # through 200 epochs — a critic-starved equilibrium where a near-constant
    # G goes unpunished; n_critic is the principled fix, not another lr tweak.
    disc_steps: int = 1


# ---------------------------------------------------------------------------
# v2 — simplified ViT-GAN (ref:src/v2/*)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class V2Config:
    """v2 Config parity (ref:src/v2/utils.py:25-41) with the intended (non-broken) loss.

    The reference's live loss was shape-invalid (§2.4.9); the coherent spec is plain
    BCE real/fake (as in v1 and the DCGAN notebook) with an optional WGAN-GP path
    (the reference's dead-code trainer, ref:src/v2/training.py:67-125).
    """

    image_size: int = 32
    channels: int = 3
    batch_size: int = 64
    embed_dim: int = 128
    depth: int = 6
    num_heads: int = 4
    mlp_ratio: int = 2
    patch_size: int = 4
    dropout: float = 0.1
    latent_dim: int = 128
    epochs: int = 500
    seed: int = 0
    loss: str = "bce"  # bce | wgan-gp
    gp_lambda: float = 10.0
    # R1 regularization gamma (Mescheder 2018): gamma/2 * E[|grad_x D(x)|^2]
    # on reals, added to the bce/mse D loss when > 0.  Beyond-reference
    # stabilizer.  Measured (scripts/bench_losses.py): applied EVERY step the
    # double-backward costs the same ~1.83x as WGAN-GP — the honest cheap
    # form is LAZY R1 below.
    r1_gamma: float = 0.0
    # Lazy R1 (StyleGAN2 §lazy regularization): apply the penalty only every
    # k-th D step, scaled by k to keep the same time-averaged LOSS gradient.
    # 0/1 = every step; 16 (the StyleGAN2 default) amortizes the
    # double-backward from 1.83x to 1.06x a plain step (measured,
    # scripts/bench_losses.py).  NOTE the equivalence is pre-optimizer: grad
    # clipping and Adam moments see a k-scaled spike on on-steps (StyleGAN2
    # compensates with c=k/(k+1) on lr/betas); monitor the unscaled d_r1
    # metric.  Default only matters when r1_gamma > 0 (off by default).
    r1_interval: int = 16
    diversity_weight: float = 0.1  # ref:src/v2/training.py:88
    # Apply the diversity bonus to the G loss under bce/mse too (the reference
    # gates it inside the WGAN path only, ref:src/v2/training.py:85-88).
    # Beyond-reference anti-mode-collapse knob: round-4 probes measured every
    # BCE recipe at precision ~0.99 / recall ~0 on the synthetic set.
    g_diversity: bool = False
    # Minibatch standard deviation in the ViT discriminator (ProGAN/StyleGAN
    # technique): per-group CLS-feature std appended as one extra head
    # feature, so D can SEE a low-diversity batch — samples are otherwise
    # scored independently and mode collapse is invisible to it.  Group size
    # 8 keeps the stat within pure-real/pure-fake rows under the train step's
    # concatenated D forward.  Beyond-reference anti-collapse knob.
    minibatch_std: bool = False
    instance_noise: float = 0.1  # ref:src/v2/training.py:99
    # Critic updates per G update (WGAN n_critic; see V1Config.disc_steps).
    disc_steps: int = 1
    gen_optim: OptimConfig = field(
        default_factory=lambda: OptimConfig(
            name="adamw", learning_rate=5e-4, beta1=0.9, weight_decay=1e-3, grad_clip=0.5
        )
    )
    disc_optim: OptimConfig = field(
        default_factory=lambda: OptimConfig(
            name="adamw", learning_rate=5e-4, beta1=0.9, weight_decay=1e-3, grad_clip=5.0
        )
    )


# ---------------------------------------------------------------------------
# DCGAN baseline (ref:cnn/cnn-gan.ipynb cell 10) and toy MLP GAN (ref:idc.py:52-90)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DCGANConfig:
    image_size: int = 32
    channels: int = 3
    batch_size: int = 128
    latent_dim: int = 100
    base_width: int = 64
    seed: int = 999  # notebook seed (cnn-gan.ipynb cell 3)
    gen_optim: OptimConfig = field(default_factory=lambda: OptimConfig(learning_rate=2e-4))
    disc_optim: OptimConfig = field(default_factory=lambda: OptimConfig(learning_rate=2e-4))


@dataclass(frozen=True)
class CNNGANConfig:
    """v2 CNNGAN: conv G/D with image-shaped noise (ref:src/v2/modules.py:256-341,
    ref:src/v2/training.py:35-42)."""

    image_size: int = 32
    channels: int = 3
    batch_size: int = 64
    seed: int = 0
    gen_optim: OptimConfig = field(
        default_factory=lambda: OptimConfig(name="adamw", learning_rate=5e-4,
                                            beta1=0.9, weight_decay=1e-3)
    )
    disc_optim: OptimConfig = field(
        default_factory=lambda: OptimConfig(name="adamw", learning_rate=5e-4,
                                            beta1=0.9, weight_decay=1e-3)
    )

    @property
    def latent_dim(self) -> int:
        return self.image_size * self.image_size * self.channels


@dataclass(frozen=True)
class MLPGANConfig:
    image_size: int = 32
    channels: int = 3
    batch_size: int = 128
    latent_dim: int = 128
    hidden: Tuple[int, ...] = (256, 512, 1024)
    seed: int = 0
    gen_optim: OptimConfig = field(default_factory=lambda: OptimConfig(learning_rate=2e-4))
    disc_optim: OptimConfig = field(default_factory=lambda: OptimConfig(learning_rate=2e-4))


# ---------------------------------------------------------------------------
# TPU-native knobs (no reference equivalent)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout.  ``data`` is the DP axis; ``model`` is reserved for TP;
    ``pipe`` (present only when ``pipeline_parallel > 1``) stages the
    transformer block stacks as a GPipe schedule (parallel/pipeline.py)."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1  # number of devices on the model axis
    seq_axis: str = "seq"
    # Sequence (context) parallelism: shard the transformer TOKEN axis over
    # ``seq`` devices (v2-family encoder stacks).  Activations are pinned with
    # sharding constraints and GSPMD inserts the K/V all-gathers for attention
    # (parallel/context_parallel.py holds the manual ring schedule for
    # beyond-GSPMD scale).  Composes with TP and FSDP; not with PP (the
    # pipeline shard_map owns the block stack).  Pallas kernels route to XLA
    # under SP — GSPMD cannot partition a custom call (ops/policy.py).
    context_parallel: int = 1
    pipe_axis: str = "pipe"
    pipeline_parallel: int = 1  # number of pipeline stages (v1/v2 families)
    # GPipe microbatches per step; bubble fraction = (S-1)/(M+S-1).  Batches
    # that don't divide (per data shard) fall back to the sequential stack.
    pipeline_microbatches: int = 2
    # ZeRO-style fully-sharded data parallelism: parameters AND optimizer
    # moments shard over the data axis (largest divisible dim per leaf; tiny
    # leaves stay replicated).  XLA inserts the per-use all-gathers and the
    # reduce-scatter of gradients from the placements alone.  Composes with
    # tensor parallelism (TP rules claim their axis first).
    fsdp: bool = False
    # Leaves smaller than this many elements stay replicated under FSDP
    # (sharding tiny tensors costs more collective latency than it saves).
    fsdp_min_size: int = 2048


@dataclass(frozen=True)
class RuntimeConfig:
    """Compute-path knobs."""

    compute_dtype: str = "bfloat16"  # activations/matmul inputs
    param_dtype: str = "float32"
    use_pallas: str = "auto"  # auto | always | never — auto => pallas on TPU only
    # jax.checkpoint transformer blocks: False/'never' | True/'full' | 'dots'
    # ('dots' saves MXU outputs, recomputing only elementwise work).
    remat: object = False
    donate_state: bool = True
    # PRNG implementation for all keys.  'rbg' drives dropout masks through the
    # hardware RNG: measured 1.5x whole-step speedup at v2-CIFAR scale vs
    # threefry mask hashing (still fully deterministic per key; checkpoints are
    # not portable across impls — the key array shape differs).
    prng_impl: str = "rbg"  # rbg | threefry2x32
    # Zero-pad per-head attention width to the 128-lane MXU tile (exact math).
    # Measured A/B on v5e: no win (XLA tiles partial lanes well), so 'auto'
    # never pads; 'always' remains as an experiment knob.
    head_pad: str = "auto"  # auto | always | never
    # Flash-backward kernel: 'fused' single-pass dq+dk+dv (5 block matmuls)
    # vs 'two_pass' dq then dk/dv (7, with DMA-streaming variants); 'auto'
    # fuses within the VMEM budget (ops/attention.py).
    bwd_fusion: str = "auto"  # auto | fused | two_pass
    # Route v2 encoder blocks through the single-kernel Pallas megablock
    # (ops/fused_block.py).  The round-2 A/B with the recompute backward lost
    # at v2-32px (0.62x) and was neutral at deit64; the saved-residual
    # backward ('megablock_bwd=saved', which emits x1/z1/ao/LSE from the
    # forward and runs a single-kernel backward with no forward recompute)
    # wins 1.85x at the deit64 block shape (MEGABLOCK_r03.json).  'auto'
    # routes only that measured-win regime: >=128 tokens, saved forward fits
    # scoped VMEM, real TPU (ops/fused_block.maybe_megablock).
    # use_pallas='never' wins over this knob.
    megablock: str = "auto"  # off | on | auto
    megablock_group: int = 8  # samples per megablock grid step (VMEM knob)
    megablock_bwd: str = "saved"  # saved | recompute
    # lax.scan unroll factor for the scanned multi-step train paths: copies of
    # the step body XLA may fuse across.  Measured A/B on v5e at v2 scale
    # (scripts/bench_unroll.py): 2 → +1.6% (≈noise, 2× compile), 4 → −4.6% —
    # adjacent steps serialize through the full train state, so cross-step
    # fusion barely exists.  Default 1; knob kept for larger presets.
    scan_unroll: int = 1


@dataclass(frozen=True)
class DataConfig:
    """Data pipeline (ref:src/v1/utils.py:107-132, src/v2/utils.py:99-121)."""

    dataset: str = "cifar10"  # cifar10 | mnist | synthetic
    data_dir: Optional[str] = None  # default: $SCRATCH/data/<dataset>
    shuffle: bool = True
    drop_last: bool = True
    prefetch: int = 2
    augment_flip: bool = False
    num_workers: int = 0  # >0 enables the native C++ decode path when built
    # Keep the uint8 dataset resident in device HBM and assemble batches
    # on-device (single-device meshes, datasets <= on_device_max_bytes).
    on_device: bool = True
    on_device_max_bytes: int = 1 << 29
    synthetic_samples: int = 2048  # dataset size when dataset == "synthetic"


@dataclass(frozen=True)
class TrainRunConfig:
    """Trainer-level settings (ref:src/v1/gan.py:71-177, src/v2/training.py:34-268)."""

    epochs: int = 500
    steps_per_epoch: Optional[int] = None  # None => full dataset pass
    checkpoint_every_epochs: int = 50  # ref:src/v1/gan.py:165-173
    sample_grid_every_epochs: int = 1
    fid_every_epochs: int = 1
    fid_num_samples: int = 2560  # ~20 batches of 128 (ref:src/v1/gan.py:207-208)
    best_metric: str = "fid"  # best-model tracking criterion (ref:src/v1/gan.py:77,136-138)
    log_every_steps: int = 50
    keep_checkpoints: int = 3
    diff_augment: str = ""  # DiffAugment spec for D inputs, e.g. "color,translation,cutout"
    steps_per_call: int = 1  # >1 scans this many updates in one device call (dispatch amortization)
    early_stop_patience: int = 0  # >0 enables FID early stopping (ref:src/v2/modules.py:26-45)
    # Minimum FID improvement that resets the patience counter (the
    # reference's hard-coded 2.0, ref:src/v2/modules.py:30 — now a knob:
    # steady sub-delta improvements would otherwise stop a converging run).
    early_stop_min_delta: float = 2.0
    ema_decay: float = 0.0  # >0 keeps an EMA copy of G params for sampling/FID
    # Failure detection: non-finite epoch-mean losses abort the run (NaN
    # params never recover in GAN training).  The epilogue then SKIPS the
    # final state save so `--resume` restores the last finite checkpoint
    # instead of the poisoned state.  Costs nothing: the per-epoch means are
    # already materialized on the host for logging.
    abort_on_nan: bool = True
    # Collapse detection (the GAN failure mode NaN guards miss): when the
    # epoch-mean D accuracy (avg of real/fake) stays >= collapse_acc for
    # collapse_window consecutive epochs, D has won everything — for a GAN
    # that plateau is as terminal as NaN (working form of the reference's
    # best-criterion intent, ref:src/v1/gan.py:136-138).  Always warns loudly
    # and logs train/collapse=1; collapse_abort additionally stops the run
    # (the state is finite, so the final checkpoint IS saved — a collapsed
    # run is a failed experiment, not a poisoned one).  Accuracy-based so it
    # works for BCE (d_loss -> 0) and WGAN (whose healthy d_loss wanders
    # near 0) alike.  collapse_window=0 disables.
    collapse_window: int = 10
    collapse_acc: float = 0.98
    collapse_abort: bool = False


@dataclass(frozen=True)
class ExperimentConfig:
    """One full experiment: model family + data + runtime + trainer."""

    family: str = "v2"  # v1 | v2 | dcgan | cnn | mlp
    v1: V1Config = field(default_factory=V1Config)
    v2: V2Config = field(default_factory=V2Config)
    dcgan: DCGANConfig = field(default_factory=DCGANConfig)
    cnn: CNNGANConfig = field(default_factory=CNNGANConfig)
    mlp: MLPGANConfig = field(default_factory=MLPGANConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)
    data: DataConfig = field(default_factory=DataConfig)
    run: TrainRunConfig = field(default_factory=TrainRunConfig)
    run_name: Optional[str] = None  # default: timestamp

    @property
    def model(self):
        return getattr(self, self.family)

    def image_shape(self) -> Tuple[int, int, int]:
        m = self.model
        return (m.image_size, m.image_size, m.channels)


def replace(cfg: Any, **kwargs: Any) -> Any:
    """``dataclasses.replace`` that also accepts dotted paths: replace(c, **{'v2.depth': 2})."""
    direct = {k: v for k, v in kwargs.items() if "." not in k}
    nested: dict = {}
    for k, v in kwargs.items():
        if "." in k:
            head, rest = k.split(".", 1)
            nested.setdefault(head, {})[rest] = v
    for head, sub in nested.items():
        direct[head] = replace(getattr(cfg, head), **sub)
    return dataclasses.replace(cfg, **direct)


def to_dict(cfg: ExperimentConfig) -> dict:
    """JSON-safe nested dict of the full experiment config."""
    return dataclasses.asdict(cfg)


def from_dict(d: dict, cls: Any = None) -> Any:
    """Inverse of ``to_dict``: rebuild the frozen dataclass tree.

    Tolerant of unknown keys (forward compat) and coerces JSON lists back to
    tuples where the field type is a tuple.
    """
    cls = cls or ExperimentConfig
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for name, val in d.items():
        if name not in fields:
            continue
        ftype = fields[name].type
        base = ftype.split("[")[0].replace("Optional", "").strip() if isinstance(ftype, str) else ""
        target = globals().get(base)
        if dataclasses.is_dataclass(target) and isinstance(val, dict):
            kwargs[name] = from_dict(val, target)
        elif isinstance(val, list):
            kwargs[name] = tuple(val)
        else:
            kwargs[name] = val
    return cls(**kwargs)


def save_config(cfg: ExperimentConfig, path: str) -> None:
    import json

    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2, default=str)


def load_config(path: str) -> ExperimentConfig:
    import json

    with open(path) as f:
        return from_dict(json.load(f))


def deit64_config() -> ExperimentConfig:
    """BASELINE config #4: DeiT-style discriminator with heavier augmentations
    at 64x64 (patch 4 => 256 tokens + CLS, exercising the augment kernels and
    the flash-attention threshold)."""
    cfg = ExperimentConfig(family="v2")
    return replace(
        cfg,
        **{
            "v2.image_size": 64,
            "v2.embed_dim": 192,  # DeiT-Tiny width
            "v2.depth": 12,
            "v2.num_heads": 3,
            "v2.mlp_ratio": 4,
            "v2.patch_size": 4,
            "run.diff_augment": "color,translation,cutout",
        },
    )


def highres_config(image_size: int = 128) -> ExperimentConfig:
    """BASELINE config #5: deeper transformer generator at 128-256px
    (~1k-4k tokens at patch 4) — blockwise Pallas attention + remat territory."""
    assert image_size in (128, 256)
    cfg = ExperimentConfig(family="v2")
    return replace(
        cfg,
        **{
            "v2.image_size": image_size,
            "v2.embed_dim": 384,
            "v2.depth": 12,
            "v2.num_heads": 6,
            "v2.mlp_ratio": 4,
            "v2.patch_size": 8 if image_size == 256 else 4,
            "v2.batch_size": 32,
            "v2.latent_dim": 256,
            # Measured on chip (scripts/bench_remat.py, fused bwd active):
            # full 40.2 / dots 43.3 / attn 48.8 / never OOM img/s at 128px —
            # 'attn' (dots + saved flash-attention residuals) wins 1.13x.
            "runtime.remat": "attn",
            "run.diff_augment": "color,translation",
        },
    )


def highres256p4_config() -> ExperimentConfig:
    """BASELINE config #5 at its TRUE stress point: 256px at PATCH 4 =>
    64x64 = 4096 tokens (+CLS) per image — the first production train-step
    config in the flash kernel's DMA-streaming regime (K/V too large for
    VMEM residence, ops/attention.py).  VERDICT r4 weak #4: highres_config
    picked patch 8 at 256px, so "hires256" ran the same 1024-token
    sequences as hires128 and the >=4k-token regime was only ever exercised
    by the isolated on-chip kernel lane (ONCHIP_r04.json, 32k tokens).

    Sizing: embed 384 / heads 6 keeps the per-head width at 64 (MXU lane
    width); batch 8 and remat keep the 12-block residual stream inside HBM
    at 4k tokens (activations ~25 MB/block/batch-8 in bf16).
    """
    cfg = ExperimentConfig(family="v2")
    return replace(
        cfg,
        **{
            "v2.image_size": 256,
            "v2.embed_dim": 384,
            "v2.depth": 12,
            "v2.num_heads": 6,
            "v2.mlp_ratio": 4,
            "v2.patch_size": 4,  # 4096 tokens — the whole point
            "v2.batch_size": 8,
            "v2.latent_dim": 256,
            "runtime.remat": "attn",
            "run.diff_augment": "color,translation",
        },
    )


def smoke_config(family: str = "v2") -> ExperimentConfig:
    """Tiny CPU-runnable config (BASELINE config #1; DEV flag parity ref:src/v2/utils.py:22)."""
    cfg = ExperimentConfig(family=family, data=DataConfig(dataset="synthetic"))
    cfg = replace(
        cfg,
        **{
            "v2.batch_size": 8,
            "v2.embed_dim": 32,
            "v2.depth": 2,
            "v2.num_heads": 2,
            "v2.latent_dim": 16,
            "v1.batch_size": 8,
            "v1.latent_dim": 64,
            "v1.generator.hidden_size": 64,
            "v1.generator.depth": 2,
            "v1.generator.siren_hidden": 64,
            "v1.discriminator.depth": 2,
            "v1.discriminator.token_size": 64,
            "dcgan.batch_size": 8,
            "dcgan.base_width": 16,
            "cnn.batch_size": 4,  # conv widths are fixed by the reference; shrink batch only
            "mlp.batch_size": 8,
            "mlp.hidden": (32, 64),
            "run.epochs": 1,
            "run.steps_per_epoch": 2,
            "run.fid_num_samples": 16,
            "runtime.use_pallas": "never",
        },
    )
    return cfg
