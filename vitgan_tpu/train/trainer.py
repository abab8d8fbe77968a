"""Trainer: epoch loop, observability, checkpoint/resume, FID, best tracking.

The v1/v2 trainer roles combined (ref:src/v1/gan.py:71-177 GAN.fit,
ref:src/v2/training.py:34-268 train_model):

- epoch loop over the host pipeline with the jitted train step;
- per-epoch: sample/noise/input image grids (ref:src/v2/training.py:166-172),
  scalar logging to TensorBoard/JSONL (ref:src/v1/gan.py:132-134), FID
  evaluation + best-FID checkpoint (ref:src/v2/training.py:213-226), periodic
  full-state checkpoint (ref:src/v1/gan.py:165-173), loss-curve figures
  (ref:src/v2/utils.py:46-96);
- crash-safe finally: final checkpoint + figures + samples on ANY exit,
  including Ctrl-C (ref:main-v1.py:39-44, ref:src/v2/training.py:248-268);
- resume restores the exact step state (params, optimizer moments, PRNG),
  strictly stronger than the reference's epoch+lr restore (ref:src/v1/gan.py:84-91).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vitgan_tpu.config import ExperimentConfig
from vitgan_tpu.data import make_pipeline
from vitgan_tpu.models import build_gan, count_params
from vitgan_tpu.parallel import make_mesh
from vitgan_tpu.train import fid as FID
from vitgan_tpu.train.state import create_train_state
from vitgan_tpu.train.step import make_sample_fn, make_train_step
from vitgan_tpu.utils import MetricLogger, construct_directories, get_logger
from vitgan_tpu.utils import preemption
from vitgan_tpu.utils.checkpoint import CheckpointManager
from vitgan_tpu.utils.images import make_grid, save_image_grid


def _params_finite(host_state) -> bool:
    """All G/D parameter leaves finite?  Host-side (numpy) — called on the
    epilogue's already-fetched state, so it costs one isfinite pass."""
    leaves = jax.tree.leaves({"g": host_state.g_params, "d": host_state.d_params})
    # float32 view: np.isfinite rejects ml_dtypes bfloat16 arrays directly.
    return all(bool(np.isfinite(np.asarray(leaf, np.float32)).all())
               for leaf in leaves)


class Trainer:
    def __init__(self, cfg: ExperimentConfig, mesh=None, run_base: Optional[str] = None,
                 fid_extractor: str = "auto"):
        self.cfg = cfg
        from vitgan_tpu.ops.policy import apply_from_runtime

        apply_from_runtime(cfg.runtime)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        from vitgan_tpu.ops.policy import set_sequence_parallel

        if cfg.mesh.context_parallel > 1:
            if cfg.family != "v2":
                # Only the v2 encoder stacks apply the token-axis constraints;
                # any other family would silently replicate over the seq axis
                # (half the devices doing duplicate work) while still losing
                # the Pallas kernel routing — fail loudly instead.
                raise ValueError(
                    f"mesh.context_parallel requires family 'v2' (and its "
                    f"deit64/highres presets), got {cfg.family!r}")
            # GSPMD sequence parallelism: token-axis constraints inside the
            # v2 encoder stacks (models/vitgan_v2._run_blocks); the policy is
            # process-global like the kernel routing it also disables.
            set_sequence_parallel(self.mesh, cfg.mesh.data_axis,
                                  cfg.mesh.seq_axis)
        else:
            set_sequence_parallel(None)  # don't inherit a prior trainer's SP
        self.dirs = construct_directories(cfg.run_name, base=run_base)
        # Persist the exact experiment config so `generate`/resume tooling can
        # rebuild the same model without re-deriving CLI overrides.
        from vitgan_tpu.config import save_config
        from vitgan_tpu.utils.manifest import write_env_manifest

        save_config(cfg, f"{self.dirs.root}/config.json")
        write_env_manifest(f"{self.dirs.root}/env.json")
        self.log = get_logger("vitgan_tpu", self.dirs.training_log)
        self.metrics = MetricLogger(self.dirs.logs)
        self.ckpts = CheckpointManager(self.dirs.checkpoints, keep=cfg.run.keep_checkpoints)
        self.gan = build_gan(cfg)
        if cfg.mesh.pipeline_parallel > 1:
            # Stage the ViT block stacks over the mesh's pipe axis (GPipe,
            # parallel/pipeline.py); eval-path batches that don't divide the
            # microbatch count fall back to the sequential stack.
            from vitgan_tpu.parallel.pipeline import pp_bundle

            dp = (cfg.mesh.data_axis
                  if self.mesh.shape.get(cfg.mesh.data_axis, 1) > 1 else None)
            auto = []
            if self.mesh.shape.get(cfg.mesh.model_axis, 1) > 1:
                auto.append(cfg.mesh.model_axis)  # TP inside stages
            if cfg.mesh.fsdp and dp:
                # PP x FSDP: the data axis goes AUTO so the stacked block
                # leaves keep their ZeRO sharding inside the shard_map (a
                # manual data axis would silently all-gather them); the batch
                # rides GSPMD instead of the manual microbatch slicing.
                auto.append(dp)
                dp = None
            self.gan = pp_bundle(self.gan, cfg, mesh=self.mesh,
                                 axis=cfg.mesh.pipe_axis,
                                 microbatches=cfg.mesh.pipeline_microbatches,
                                 dp_axis=dp, tp_axis=tuple(auto) or None)
        m = cfg.model
        self.pipeline = make_pipeline(
            cfg.data, m.batch_size, m.image_size, m.channels,
            mesh=self.mesh, seed=m.seed,
            synthetic_samples=cfg.data.synthetic_samples,
        )
        key = jax.random.PRNGKey(m.seed)
        from vitgan_tpu.parallel.sharding import shard_train_state

        self.state = shard_train_state(
            create_train_state(key, self.gan, cfg), self.mesh,
            tensor_parallel=cfg.mesh.model_parallel > 1,
            fsdp=cfg.mesh.fsdp, fsdp_min_size=cfg.mesh.fsdp_min_size,
            data_axis=cfg.mesh.data_axis,
        )
        # Under FSDP the step must pin its output state to the input
        # placements — the compiler otherwise re-replicates small updated
        # leaves, silently undoing the sharding from step 2 onward.
        self._state_shardings = (
            jax.tree.map(lambda x: x.sharding, self.state)
            if cfg.mesh.fsdp else None)
        self.train_step = make_train_step(self.gan, cfg, donate=cfg.runtime.donate_state,
                                          state_shardings=self._state_shardings)
        self.steps_per_call = max(1, cfg.run.steps_per_call)
        if self.steps_per_call > 1:
            from vitgan_tpu.train.step import make_multi_train_step

            self.multi_step = make_multi_train_step(
                self.gan, cfg, self.steps_per_call, donate=cfg.runtime.donate_state,
                state_shardings=self._state_shardings
            )
        # Device-resident dataset: batches assembled on-chip, only indices cross
        # the host boundary (single-device meshes; multi-device keeps the host
        # pipeline whose batches are pre-sharded over the data axis).
        self._device_dataset = None
        # The on-device scan has a fixed batch shape, so it can only run full
        # batches; when drop_last=False actually implies a partial batch, use
        # the host pipeline (which honors it) instead of silently dropping it.
        honors_partial = (cfg.data.drop_last
                          or len(self.pipeline.images) % m.batch_size == 0)
        if (cfg.data.on_device and self.mesh.devices.size == 1
                and honors_partial
                and self.pipeline.images.nbytes <= cfg.data.on_device_max_bytes):
            from vitgan_tpu.train.step import make_device_data_train_fn

            self._device_dataset = jax.device_put(self.pipeline.images)
            # One scanned call per epoch by default: on tunneled devices every
            # per-call host round trip costs ~200ms once any metric has been
            # read, so the fewer device calls per epoch the better.  Sized
            # from FULL batches and the steps_per_epoch cap —
            # len(self.pipeline) would count a partial batch and compile a
            # scan length the epoch never uses.
            n_full = len(self.pipeline.images) // m.batch_size
            k = min(max(1, n_full), 1024)
            if cfg.run.steps_per_epoch:
                k = min(k, cfg.run.steps_per_epoch)
            self._device_steps_per_call = (
                self.steps_per_call if cfg.run.steps_per_call > 1 else k
            )
            self._device_train_fn = make_device_data_train_fn(
                self.gan, cfg, self._device_steps_per_call,
                donate=cfg.runtime.donate_state,
                state_shardings=self._state_shardings,
            )
        self.sample_fn = make_sample_fn(self.gan, cfg)
        self._extractor_name = fid_extractor
        self._extractor = None
        # Fixed noise for comparable per-epoch grids (ref:cnn/cnn-gan.ipynb cell 12 convention).
        self.eval_noise = self.gan.sample_latent(jax.random.PRNGKey(m.seed + 1),
                                                 min(64, m.batch_size))
        self.best_metric = float("inf")
        self.epoch = 0
        self._metric_agg = jax.jit(
            lambda em: {
                k: jnp.mean(jnp.concatenate([jnp.atleast_1d(x) for x in v]))
                for k, v in em.items()
            }
        )
        self._early = None
        if cfg.run.early_stop_patience > 0:
            from vitgan_tpu.utils.logging import EarlyStopping

            self._early = EarlyStopping(patience=cfg.run.early_stop_patience,
                                        min_delta=cfg.run.early_stop_min_delta)
        self.log.info(
            "model %s: G params %d, D params %d | devices %d",
            cfg.family,
            count_params(self.state.g_params),
            count_params(self.state.d_params),
            self.mesh.devices.size,
        )

    # ------------------------------------------------------------------ utils

    @property
    def extractor(self):
        if self._extractor is None:
            self._extractor = FID.make_feature_extractor(
                self._extractor_name, self.cfg.model.channels
            )
        return self._extractor

    def resume(self, step: Optional[int] = None, best: bool = False) -> None:
        from vitgan_tpu.parallel.sharding import shard_train_state

        self.state, meta = self.ckpts.restore(self.state, step=step, best=best)
        self.state = shard_train_state(self.state, self.mesh,
                                       tensor_parallel=self.cfg.mesh.model_parallel > 1,
                                       fsdp=self.cfg.mesh.fsdp,
                                       fsdp_min_size=self.cfg.mesh.fsdp_min_size,
                                       data_axis=self.cfg.mesh.data_axis)
        self.epoch = int(meta.get("epoch", 0))
        self.best_metric = float(meta.get("best_metric", float("inf")))
        self.log.info("resumed from step %d (epoch %d)", int(self.state.step), self.epoch)

    def sample(self, n: int, rng: Optional[jax.Array] = None) -> np.ndarray:
        z = self.gan.sample_latent(rng if rng is not None else jax.random.PRNGKey(0), n)
        return np.asarray(self.sample_fn(self.state.g_vars_ema, z))

    def validate(self, num_batches: int = 8) -> Dict[str, float]:
        """No-update validation pass: D/G losses + accuracies over held-out-style
        batches (working form of ref:src/v1/gan.py:111-119,330-372)."""
        from vitgan_tpu.train.step import make_eval_step

        if not hasattr(self, "_eval_step"):
            self._eval_step = make_eval_step(self.gan, self.cfg)
        sums: Dict[str, float] = {}
        n = 0
        for i, (real, _labels) in enumerate(self.pipeline.epoch()):
            if i >= num_batches:
                break
            m = self._eval_step(self.state, real, jax.random.PRNGKey(1000 + i))
            # ONE host pull per batch — float(v) per metric would pay a
            # device-link round trip for every scalar.
            m = jax.device_get(m)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}

    def profile(self, n_steps: int = 5) -> str:
        """Capture a jax.profiler trace of n_steps train steps; returns trace dir."""
        from vitgan_tpu.utils.profiling import trace

        real, _ = next(iter(self.pipeline.epoch()))
        trace_dir = f"{self.dirs.logs}/profile"
        with trace(trace_dir):
            for _ in range(n_steps):
                self.state, m = self.train_step(self.state, real)
            jax.block_until_ready(m["d_loss"])
        return trace_dir

    def warm_start_discriminator(self, source_d_params) -> int:
        """strict=False warm start of D params from another checkpoint's tree
        (ref:src/v2/modules.py:429-440 role).  Accepts a bare params tree or a
        ``{"params", "state"}`` variables dict (e.g. utils/torch_port import —
        conv discriminators carry BN running stats in "state").  Returns
        #leaves loaded."""
        from vitgan_tpu.utils.checkpoint import partial_load

        source_d_state = None
        if (isinstance(source_d_params, dict)
                and set(source_d_params) == {"params", "state"}):
            source_d_state = source_d_params["state"]
        merged, loaded, _total = partial_load(
            jax.device_get(self.state.d_params),
            source_d_params["params"] if source_d_state is not None
            else source_d_params,
        )
        new_state = self.state.d_state
        if source_d_state:
            new_state, s_loaded, _ = partial_load(
                jax.device_get(self.state.d_state), source_d_state)
            loaded += s_loaded
            new_state = jax.tree.map(jax.device_put, new_state)
        self.state = self.state.replace(
            d_params=jax.tree.map(
                lambda x: jax.device_put(x), merged
            ),
            d_state=new_state,
        )
        from vitgan_tpu.parallel.sharding import shard_train_state

        self.state = shard_train_state(self.state, self.mesh,
                                       tensor_parallel=self.cfg.mesh.model_parallel > 1,
                                       fsdp=self.cfg.mesh.fsdp,
                                       fsdp_min_size=self.cfg.mesh.fsdp_min_size,
                                       data_axis=self.cfg.mesh.data_axis)
        self.log.info("warm-started discriminator: %d leaves loaded", loaded)
        return loaded

    def evaluate_fid(self, num_samples: Optional[int] = None) -> float:
        num_samples = num_samples or self.cfg.run.fid_num_samples
        num_samples = min(num_samples, self.pipeline.num_samples)
        b = self.cfg.model.batch_size
        # On-device FID when the dataset is chip-resident and the extractor is
        # the JAX one: a single device call + one small host pull.
        if self._device_dataset is not None and hasattr(self.extractor, "jax_feature_fn"):
            n_batches = max(1, num_samples // b)
            if getattr(self, "_fid_n_batches", None) != n_batches:
                self._fid_fn = FID.make_on_device_fid(
                    self.gan, self.cfg, None, b, n_batches,
                    self.extractor.feature_dim,
                    feature_fn=self.extractor.jax_feature_fn,
                )
                self._fid_n_batches = n_batches
            rng_np = np.random.default_rng(int(self.state.step))
            # With replacement when the dataset is smaller than the draw
            # (batch > dataset): choice(replace=False) would raise.
            n_pop = self.pipeline.num_samples
            real_idx = rng_np.choice(n_pop, size=(n_batches, b),
                                     replace=n_batches * b > n_pop).astype(np.int32)
            return self._fid_fn(self.state.g_vars_ema, self._device_dataset,
                                jnp.asarray(real_idx),
                                jax.random.PRNGKey(int(self.state.step)))

        def sample_batch(rng, n):
            z = self.gan.sample_latent(rng, n)
            return np.asarray(self.sample_fn(self.state.g_vars_ema, z))

        real_batches = (np.asarray(x) for x, _ in self.pipeline.epoch())
        return FID.compute_fid(
            sample_batch, real_batches, self.extractor,
            jax.random.PRNGKey(int(self.state.step)), num_samples, b,
        )

    # ------------------------------------------------------------------ loop

    def _save_grids(self, epoch: int) -> None:
        imgs = np.asarray(self.sample_fn(self.state.g_vars_ema, self.eval_noise))
        save_image_grid(f"{self.dirs.images}/epoch_{epoch:04d}.png", imgs)
        self.metrics.image_grid("samples", make_grid(imgs), int(self.state.step))

    def _epoch_steps(self, run):
        """Yield (metrics, images_done) per update, batching ``steps_per_call``
        microbatches into one scanned device call when configured."""
        import jax.numpy as jnp

        if self._device_dataset is not None:
            yield from self._epoch_steps_on_device(run)
            return
        it = self.pipeline.epoch()
        if self.steps_per_call == 1:
            for i, (real, _labels) in enumerate(it):
                if run.steps_per_epoch and i >= run.steps_per_epoch:
                    break
                self.state, m = self.train_step(self.state, real)
                yield m, real.shape[0]
            return
        step_idx, buf = 0, []
        for real, _labels in it:
            if run.steps_per_epoch and step_idx >= run.steps_per_epoch:
                break
            buf.append(real)
            step_idx += 1
            if len(buf) == self.steps_per_call:
                self.state, ms = self.multi_step(self.state, jnp.stack(buf))
                n = sum(b.shape[0] for b in buf)
                buf = []
                yield ms, n
        for real in buf:  # remainder: single steps
            self.state, m = self.train_step(self.state, real)
            yield m, real.shape[0]

    def _epoch_steps_on_device(self, run):
        """Index-only epoch: permutation on host, gather/normalize/train on chip."""
        b = self.cfg.model.batch_size
        order = self.pipeline._epoch_order()
        n_batches = len(order) // b
        if run.steps_per_epoch:
            n_batches = min(n_batches, run.steps_per_epoch)
        idx = np.asarray(order[: n_batches * b], np.int32).reshape(n_batches, b)
        k = self._device_steps_per_call
        n_full_calls = (n_batches // k) * k
        # ONE host->device transfer for the whole epoch's indices: per-call
        # transfers each pay the device-link round trip (measured ~40ms on the
        # tunneled chip).  Device-side slicing per call is free by comparison.
        idx_dev = jax.device_put(idx[:n_full_calls].reshape(-1, k, b))
        # Yield the per-call stacked metric arrays untouched: any reduction or
        # host pull here would serialize tiny ops through the device link every
        # call.  fit() batches one device_get per epoch.
        for ci in range(n_full_calls // k):
            self.state, ms = self._device_train_fn(
                self.state, self._device_dataset, idx_dev[ci]
            )
            yield ms, k * b
        rem = n_batches % k
        if rem:  # remainder: a lazily-compiled scan of the leftover length
            if getattr(self, "_device_rem_len", None) != rem:
                from vitgan_tpu.train.step import make_device_data_train_fn

                self._device_rem_fn = make_device_data_train_fn(
                    self.gan, self.cfg, rem, donate=self.cfg.runtime.donate_state,
                    state_shardings=self._state_shardings,
                )
                self._device_rem_len = rem
            chunk = idx[n_batches - rem :]
            self.state, ms = self._device_rem_fn(
                self.state, self._device_dataset, jnp.asarray(chunk)
            )
            yield ms, rem * b

    def fit(self, epochs: Optional[int] = None) -> Dict[str, float]:
        run = self.cfg.run
        epochs = epochs if epochs is not None else run.epochs
        last: Dict[str, float] = {}
        t_start = time.time()
        self._poisoned = False  # set when abort_on_nan trips (skip final save)
        self.collapsed = False  # set when collapse detection trips
        collapse_run = 0  # consecutive epochs at D-wins-everything accuracy
        try:
            # Input/noise reference grids once per run (ref:src/v2/training.py:166-168).
            first_real, _ = next(iter(self.pipeline.epoch()))
            save_image_grid(f"{self.dirs.input}/real.png", np.asarray(first_real[:64]))
            np.save(f"{self.dirs.noise}/eval_noise.npy", np.asarray(self.eval_noise))

            for epoch in range(self.epoch, epochs):
                self.epoch = epoch
                epoch_metrics: Dict[str, list] = {}
                t0, images_done = time.time(), 0
                for i, (m, n_images) in enumerate(self._epoch_steps(run)):
                    images_done += n_images
                    for k, v in m.items():
                        epoch_metrics.setdefault(k, []).append(v)
                    if run.log_every_steps and (i + 1) % run.log_every_steps == 0:
                        lm = jax.device_get({"d": m["d_loss"], "g": m["g_loss"]})
                        self.log.info(
                            "epoch %d step %d | D %.4f G %.4f",
                            epoch, i + 1, float(np.mean(lm["d"])), float(np.mean(lm["g"])),
                        )
                    if preemption.requested():
                        break
                if preemption.requested():
                    # SIGTERM during the epoch (utils/preemption.py): stop
                    # before touching self.epoch so the crash-safe finally
                    # persists THIS epoch as next-to-run — the same
                    # re-run-the-incomplete-epoch convention as a crash.
                    self.log.info(
                        "preemption requested — stopping in epoch %d after %d images",
                        epoch, images_done,
                    )
                    break
                # ONE jitted aggregation + ONE device->host transfer per epoch:
                # eager per-metric concatenation would launch hundreds of tiny
                # device ops, each paying the device-link round trip.
                if epoch_metrics:
                    agg = self._metric_agg({k: tuple(v) for k, v in epoch_metrics.items()})
                    means = {k: float(v) for k, v in jax.device_get(agg).items()}
                else:
                    means = {}
                dt = time.time() - t0
                means["images_per_sec"] = images_done / max(dt, 1e-9)
                self.metrics.scalars(
                    {f"train/{k}": v for k, v in means.items()}, int(self.state.step)
                )
                if run.abort_on_nan and not all(
                    np.isfinite(means.get(k, 0.0)) for k in ("d_loss", "g_loss")
                ):
                    # NaN params never recover in GAN training: stop NOW,
                    # before grids/FID/periodic save touch the poisoned state.
                    self._poisoned = True
                    last = means
                    self.log.error(
                        "non-finite losses at epoch %d (d_loss=%s g_loss=%s) — "
                        "aborting; the final-state save is skipped so resume "
                        "restores the last finite checkpoint (step %s)",
                        epoch, means.get("d_loss"), means.get("g_loss"),
                        self.ckpts.latest_step(),
                    )
                    break
                # Collapse detection (VERDICT r3: a d_loss≈0 / D-accuracy≈1
                # plateau is as terminal as NaN for a GAN, and the NaN guard
                # alone let a collapsed 61k-step soak report ok).  Epoch-mean
                # D accuracy is already on the host; a sustained plateau at
                # >= collapse_acc for collapse_window epochs means D wins
                # everything and G gradients are vanishing.
                if run.collapse_window > 0 and "d_real_acc" in means:
                    acc = 0.5 * (means["d_real_acc"] + means["d_fake_acc"])
                    collapse_run = collapse_run + 1 if acc >= run.collapse_acc else 0
                    tripped = collapse_run >= run.collapse_window
                    self.metrics.scalar("train/collapse", float(tripped),
                                        int(self.state.step))
                    if tripped and not self.collapsed:
                        self.collapsed = True
                        self.log.error(
                            "GAN collapse detected at epoch %d: mean D accuracy "
                            ">= %.2f for %d consecutive epochs (d_loss=%.4f "
                            "g_loss=%.4f) — the discriminator has won and "
                            "generator gradients are vanishing.  %s",
                            epoch, run.collapse_acc, run.collapse_window,
                            means.get("d_loss", float("nan")),
                            means.get("g_loss", float("nan")),
                            "Aborting (run.collapse_abort=True); the final "
                            "state is finite and IS checkpointed."
                            if run.collapse_abort else
                            "Continuing (set run.collapse_abort=True to stop "
                            "collapsed runs automatically).")
                        if run.collapse_abort:
                            last = means
                            self.epoch = epoch + 1  # epoch completed; resume continues after it
                            break

                if run.sample_grid_every_epochs and (epoch + 1) % run.sample_grid_every_epochs == 0:
                    self._save_grids(epoch)
                if run.fid_every_epochs and (epoch + 1) % run.fid_every_epochs == 0:
                    t_fid = time.time()
                    fid_val = self.evaluate_fid()
                    means["fid"] = fid_val
                    self.metrics.scalar("eval/fid", fid_val, int(self.state.step))
                    # images_per_sec deliberately excludes eval; log the eval
                    # wall so the per-epoch FID cost stays visible/honest.
                    self.metrics.scalar("eval/fid_seconds", time.time() - t_fid,
                                        int(self.state.step))
                    # Best-model tracking on a NAMED criterion (default fid),
                    # the role of ref:src/v1/gan.py:77,136-138.
                    crit = means.get(run.best_metric, fid_val)
                    if crit < self.best_metric:
                        self.best_metric = crit
                        # Metadata uses the same keys resume() reads
                        # ('best_metric', 'epoch' = NEXT epoch to run) so
                        # resume(best=True) keeps the best tracking instead
                        # of resetting it to inf and overwriting best/ with
                        # a worse later model.
                        self.ckpts.save_best(
                            int(self.state.step), jax.device_get(self.state),
                            run.best_metric, crit,
                            {"epoch": epoch + 1, "best_metric": crit},
                        )
                    if self._early is not None and self._early.step(fid_val):
                        self.log.info("early stopping at epoch %d (FID %.3f)", epoch, fid_val)
                        last = means
                        # Epoch IS complete here — advance the resume cursor
                        # exactly like the loop tail does, or the epilogue
                        # persists this epoch as next-to-run and a later
                        # fit() re-trains it.
                        self.epoch = epoch + 1
                        break
                if run.checkpoint_every_epochs and (epoch + 1) % run.checkpoint_every_epochs == 0:
                    self.ckpts.save(int(self.state.step), jax.device_get(self.state),
                                    {"epoch": epoch + 1, "best_metric": self.best_metric})
                self.log.info(
                    "epoch %d done | %s", epoch,
                    " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items())),
                )
                last = means
                self.epoch = epoch + 1  # so a later fit()/resume continues, not repeats
        finally:
            # Crash-safe epilogue (ref:src/v2/training.py:252-268, ref:main-v1.py:39-44).
            # Convention: persisted 'epoch' is the NEXT epoch to run.  self.epoch
            # already holds that after a completed epoch (incremented at the end
            # of the loop body); after a mid-epoch crash it holds the incomplete
            # epoch, which resume should re-run.  No +1 here — that double
            # -incremented and silently skipped an epoch on resume.
            # shield(): a further SIGTERM during this epilogue must not
            # unwind mid-save and destroy the checkpoint the FIRST SIGTERM
            # was sent to trigger (utils/preemption.py).
            with preemption.shield():
                host_state = jax.device_get(self.state)
                if not getattr(self, "_poisoned", False) and run.abort_on_nan \
                        and not _params_finite(host_state):
                    # Exits that bypass the per-epoch loss check (preemption
                    # break, an exception mid-epoch) can still carry NaN
                    # params — catch them here, on the already-fetched state.
                    self._poisoned = True
                    self.log.error("non-finite parameters detected at exit")
                if getattr(self, "_poisoned", False):
                    # abort_on_nan tripped: persisting the non-finite state
                    # would make it the latest checkpoint and poison resume.
                    self.log.error("final checkpoint SKIPPED: train state is "
                                   "non-finite (last durable step: %s)",
                                   self.ckpts.latest_step())
                else:
                    self.ckpts.save(int(host_state.step), host_state,
                                    {"epoch": self.epoch,
                                     "best_metric": self.best_metric,
                                     "final": True})
                self.ckpts.wait()  # the final save must be durable before we return
            self.metrics.save_figures(self.dirs.images)
            try:
                # Label the final grid with the LAST COMPLETED epoch —
                # self.epoch is the next-to-run cursor, and naming the file
                # after it would mislabel the frame (and collide with the
                # real epoch-N grid on a resumed run).
                self._save_grids(max(0, self.epoch - 1))
                from vitgan_tpu.utils.images import save_training_gif

                save_training_gif(self.dirs.images,
                                  f"{self.dirs.images}/training_progress.gif")
            except Exception:
                pass
            self.log.info("training finished in %.1fs", time.time() - t_start)
        return last
