"""Ray-free hyperparameter sweep runner.

Replaces the reference's Ray Tune HPO (ref:src/v2/training.py:271-294) — whose
search-space keys never matched its Config and so could not run (SURVEY §2.4.11)
— with a working random-search sweep over the same space:

- generator/discriminator lr: loguniform 1e-6 .. 1e-4
- embed_dim in {128, 256, 512}, heads in {4, 8}, batch in {128, 256}
  (ref:src/v2/training.py:277-283)

Trials run sequentially on the local chip (process-level trial parallelism
across hosts/slices is a launcher concern: each host runs a disjoint trial
range via --set sweep indices).  Metric: min FID, matching tune.run(metric=
"fid_score", mode="min") (ref:src/v2/training.py:285-292).

:func:`run_sweep_vectorized` (CLI ``sweep --vectorize``) is the on-device
alternative: trials sharing a model shape train SIMULTANEOUSLY as one vmapped
step with per-trial learning rates carried in the optimizer state.
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Dict, List, Optional

import numpy as np

from vitgan_tpu.utils import preemption


def sample_search_space(rng: np.random.Generator) -> Dict[str, Any]:
    """Reference space (ref:src/v2/training.py:277-283) extended with the
    knobs the round-4 probe matrix measured as decisive (VERDICT r4 #3):

    - ``loss``: every probed BCE recipe collapsed (RECIPES_r04.json); only
      WGAN-GP held equilibrium — searching the reference's BCE-only space
      re-finds collapse by construction.
    - lr upper bound stretched 1e-4 -> 3e-4: the measured winner (weak-D
      TTUR, g 2e-4 / d 1e-4) sits ABOVE the reference's lr ceiling, so the
      old space could not even express it.
    - ``diversity_weight``: the 0.5 arm scored recall 0.206 vs 0.1's baseline.
    """
    return {
        "gen_lr": float(10 ** rng.uniform(-5, np.log10(3e-4))),
        "disc_lr": float(10 ** rng.uniform(-5, np.log10(3e-4))),
        "embed_dim": int(rng.choice([128, 256, 512])),
        "num_heads": int(rng.choice([4, 8])),
        "batch_size": int(rng.choice([128, 256])),
        "loss": str(rng.choice(["bce", "wgan-gp"])),
        "diversity_weight": float(rng.choice([0.1, 0.5])),
    }


def _trial_config(base, trial: Dict[str, Any]):
    from vitgan_tpu import config as C

    over = {
        "v2.embed_dim": trial["embed_dim"],
        "v2.num_heads": trial["num_heads"],
        "v2.batch_size": trial["batch_size"],
        "v2.gen_optim.learning_rate": trial["gen_lr"],
        "v2.disc_optim.learning_rate": trial["disc_lr"],
    }
    if "loss" in trial:
        # Trials drawn from the extended space also train with the
        # GAN-standard optimizer the round-4 matrix established (Adam(0,
        # 0.99), no weight decay) — AdamW(0.9, wd) is a classifier recipe
        # and D momentum a known destabilizer.
        over["v2.loss"] = trial["loss"]
        for net in ("gen_optim", "disc_optim"):
            over.update({f"v2.{net}.name": "adam", f"v2.{net}.beta1": 0.0,
                         f"v2.{net}.beta2": 0.99,
                         f"v2.{net}.weight_decay": 0.0})
    if "diversity_weight" in trial:
        over["v2.diversity_weight"] = trial["diversity_weight"]
    return C.replace(base, **over)



_EMPTY_BEST = {"trial": None, "params": None, "fid": float("inf")}


def _sweep_base(base_cfg, epochs_per_trial: int, dataset: str):
    from vitgan_tpu import config as C

    return base_cfg or C.replace(
        C.ExperimentConfig(family="v2", data=C.DataConfig(dataset=dataset)),
        **{"run.epochs": epochs_per_trial, "run.checkpoint_every_epochs": 0,
           "run.sample_grid_every_epochs": 0,
           # Collapsed trials are excluded from the ranking anyway
           # (_finish_sweep); aborting them the moment the detector trips
           # returns their remaining budget to the sweep.
           "run.collapse_abort": True},
    )


def _sweep_paths(run_base):
    from vitgan_tpu import config as C

    out_dir = run_base or os.path.join(C.scratch_root(), "sweeps")
    os.makedirs(out_dir, exist_ok=True)
    return out_dir, os.path.join(out_dir, "sweep_results.jsonl")


def _finish_sweep(results, out_dir, log_path: Optional[str] = None) -> Dict[str, Any]:
    """Rank trials and persist the winner.

    When ``log_path`` is given, re-read the shared JSONL first: concurrent
    workers (disjoint --trial-offset slices appending to the SAME file — the
    process-level parallelism Ray provided, ref:src/v2/training.py:275) each
    see every completed trial, so whichever worker finishes last leaves a
    globally-correct ``best_config.json``."""
    if log_path:
        merged = _load_recorded_trials(log_path)
        for r in results:  # local trials not yet durable (shouldn't happen)
            merged.setdefault(int(r["trial"]), r)
        results = list(merged.values())
    if not results:
        return dict(_EMPTY_BEST)
    # Collapse-aware ranking (VERDICT r4 weak #2): proxy-FID alone is blind
    # to mode collapse — the round-4 sweep ranked a d_acc-0.99 run first on
    # FID 2.54 while the framework's own detector called it terminal.  A
    # trial whose collapse verdict tripped can NEVER outrank a non-collapsed
    # one; if every trial collapsed, the best is returned flagged so a
    # caller cannot mistake it for a working recipe.
    viable = [r for r in results if not r.get("collapsed")]
    pool = viable or results
    best = dict(min(pool, key=lambda r: r["fid"] if math.isfinite(r["fid"]) else 1e18))
    best["all_trials_collapsed"] = not viable
    best["excluded_collapsed_trials"] = len(results) - len(viable)
    with open(os.path.join(out_dir, "best_config.json"), "w") as f:
        json.dump(best, f, indent=2)
    return best


def _load_recorded_trials(log_path: str) -> Dict[int, Dict[str, Any]]:
    """Completed-trial records from a sweep's JSONL, keyed by trial index.
    Tolerates a torn trailing line (a SIGKILL mid-append)."""
    done: Dict[int, Dict[str, Any]] = {}
    if os.path.exists(log_path):
        with open(log_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                    done[int(rec["trial"])] = rec
                except (ValueError, KeyError, TypeError):
                    continue
    return done


def run_sweep(num_trials: int = 10, epochs_per_trial: int = 1, seed: int = 0,
              dataset: str = "synthetic", base_cfg=None,
              run_base: Optional[str] = None,
              trial_offset: int = 0, trial_stride: int = 1,
              resume: bool = False) -> Dict[str, Any]:
    """Random search; returns the best trial {params, fid}. Results JSONL per trial.

    Multi-host trial parallelism (the role Ray played, SURVEY §2.5): every host
    draws the SAME seeded trial sequence and runs the slice
    ``i % trial_stride == trial_offset``; results land in per-trial JSONL lines
    that a coordinator can merge.

    ``resume=True`` skips trials already recorded in the sweep dir's JSONL
    (same seed => same drawn sequence), so a preempted/crashed sweep picks up
    where it stopped and the final ranking covers old + new trials.
    """
    from vitgan_tpu import config as C
    from vitgan_tpu.train.trainer import Trainer

    if not 0 <= trial_offset < max(1, trial_stride):
        raise ValueError(
            f"trial_offset={trial_offset} out of range for "
            f"trial_stride={trial_stride} (valid: 0..{max(1, trial_stride) - 1}) — "
            "an out-of-range offset would silently run zero trials")
    rng = np.random.default_rng(seed)
    base = _sweep_base(base_cfg, epochs_per_trial, dataset)
    results: List[Dict[str, Any]] = []
    out_dir, log_path = _sweep_paths(run_base)
    done = _load_recorded_trials(log_path) if resume else {}
    results.extend(done.values())  # prior trials compete in the final ranking
    for i in range(num_trials):
        trial = sample_search_space(rng)  # drawn by every host for determinism
        if i % max(1, trial_stride) != trial_offset:
            continue
        if i in done:
            if done[i].get("params") != trial:
                # different seed/search space than the recorded sweep — the
                # index collision would silently mix two different sweeps.
                raise ValueError(
                    f"resume mismatch: recorded trial {i} params "
                    f"{done[i].get('params')} != drawn {trial} — pass the "
                    "original --seed (or point at a fresh sweep dir)")
            print(f"resume: skipping trial {i} "
                  f"(recorded fid={done[i].get('fid')})", flush=True)
            continue
        cfg = C.replace(_trial_config(base, trial), run_name=f"trial_{i:03d}")
        trainer = Trainer(cfg, run_base=out_dir, fid_extractor="random_conv")
        metrics = trainer.fit(epochs=epochs_per_trial)
        if preemption.requested():
            # SIGTERM (utils/preemption.py) interrupted THIS fit: its metrics
            # describe a partial trial — recording them would poison the
            # merged ranking.  Discard it and finish the sweep over the
            # trials already durable in the JSONL.
            break
        fid = metrics.get("fid", float("inf"))
        rec = {"trial": i, "params": trial, "fid": fid,
               "collapsed": bool(getattr(trainer, "collapsed", False)),
               "metrics": {k: v for k, v in metrics.items() if isinstance(v, float)}}
        results.append(rec)
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return _finish_sweep(results, out_dir, log_path)


# ---------------------------------------------------------------------------
# Vectorized trials: same-shape configs vmapped into ONE jit region
# ---------------------------------------------------------------------------


def _shape_key(trial: Dict[str, Any]):
    """Everything BAKED into the compiled step — only the injected lrs may
    differ inside a vmapped group (loss/diversity change the loss graph,
    embed/heads/batch the shapes)."""
    return (trial["embed_dim"], trial["num_heads"], trial["batch_size"],
            trial.get("loss", "bce"), trial.get("diversity_weight"))


def _set_lr(opt_state, lrs):
    """Per-trial learning rates into an inject_hyperparams state (leaves are
    stacked over the trial axis after vmapped init)."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = lrs
    return opt_state._replace(hyperparams=hp)


def run_sweep_vectorized(num_trials: int = 10, epochs_per_trial: int = 1,
                         seed: int = 0, dataset: str = "synthetic",
                         base_cfg=None, run_base: Optional[str] = None,
                         resume: bool = False) -> Dict[str, Any]:
    """TPU-idiomatic trial parallelism: trials sharing a model SHAPE
    (embed/heads/batch — the only shape-affecting keys in the reference's
    search space, ref:src/v2/training.py:277-283) train SIMULTANEOUSLY as one
    vmapped train step — K optimizer states ride a leading trial axis, each
    carrying its own lr (OptimConfig.inject_lr) and PRNG stream.

    vs the sequential runner: one compile and one device-call stream per shape
    GROUP instead of per trial.  Trials in a group see the same real-data
    order (noise/dropout streams still differ per trial); FID is evaluated
    per trial after training.  The vmapped path keeps the XLA compositions
    (kernel routing off: pallas_call has no batching rule).
    """
    import jax
    import jax.numpy as jnp

    from vitgan_tpu import config as C
    from vitgan_tpu.data import make_pipeline
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import fid as FID
    from vitgan_tpu.train.state import create_train_state
    from vitgan_tpu.train.step import make_raw_train_step, make_sample_fn

    import logging

    log = logging.getLogger("vitgan_tpu.sweep")
    rng = np.random.default_rng(seed)
    trials = [(i, sample_search_space(rng)) for i in range(num_trials)]
    base = _sweep_base(base_cfg, epochs_per_trial, dataset)
    out_dir, log_path = _sweep_paths(run_base)

    results: List[Dict[str, Any]] = []
    done = _load_recorded_trials(log_path) if resume else {}
    for i, t in trials:
        if i in done and done[i].get("params") != t:
            raise ValueError(
                f"resume mismatch: recorded trial {i} params "
                f"{done[i].get('params')} != drawn {t} — pass the original "
                "--seed (or point at a fresh sweep dir)")
    results.extend(done.values())  # prior trials compete in the final ranking

    groups: Dict[Any, List] = {}
    for i, t in trials:
        if i in done:  # same seed => same draw; the recorded score stands
            continue
        groups.setdefault(_shape_key(t), []).append((i, t))
    for key, members in sorted(groups.items()):
        if preemption.requested():
            # SIGTERM during the previous group's FID scoring: stop before
            # compiling/training another group.
            break
        k = len(members)
        # grad_clip composes with inject_lr (the clip chains inside the
        # injected maker, train/state.py) — vectorized trials train with the
        # SAME clipping as sequential ones.
        cfg = C.replace(
            _trial_config(base, members[0][1]),
            **{"v2.gen_optim.inject_lr": True, "v2.disc_optim.inject_lr": True,
               "runtime.use_pallas": "never", "runtime.donate_state": False},
        )
        # the overrides above are runtime POLICY, which is process-global:
        # without this the vmapped step could still route into pallas_call
        # (no batching rule) under a previously-applied policy.
        from vitgan_tpu.ops.policy import apply_from_runtime

        apply_from_runtime(cfg.runtime)
        gan = build_gan(cfg)
        m = cfg.model
        keys = jnp.stack([jax.random.PRNGKey(seed * 1000 + i) for i, _ in members])
        states = jax.vmap(lambda kk: create_train_state(kk, gan, cfg))(keys)
        gen_lrs = jnp.asarray([t["gen_lr"] for _, t in members], jnp.float32)
        disc_lrs = jnp.asarray([t["disc_lr"] for _, t in members], jnp.float32)
        states = states.replace(g_opt=_set_lr(states.g_opt, gen_lrs),
                                d_opt=_set_lr(states.d_opt, disc_lrs))

        vstep = jax.jit(jax.vmap(make_raw_train_step(gan, cfg),
                                 in_axes=(0, None)), donate_argnums=(0,))
        pipeline = make_pipeline(cfg.data, m.batch_size, m.image_size,
                                 m.channels, seed=m.seed,
                                 synthetic_samples=cfg.data.synthetic_samples)
        steps_cap = base.run.steps_per_epoch
        preempted = False
        # Per-trial collapse verdict, same rule as the trainer's detector
        # (train/trainer.py): epoch-mean D accuracy >= collapse_acc for
        # collapse_window consecutive epochs.  Tracked on host from the
        # vmapped metrics (one K-vector readback per epoch, not per step).
        c_window = base.run.collapse_window
        c_acc = base.run.collapse_acc
        consec = np.zeros(k, np.int64)
        tripped = np.zeros(k, bool)
        for _epoch in range(epochs_per_trial):
            acc_sum, n_steps = None, 0
            for s_i, (real, _) in enumerate(pipeline.epoch()):
                if real.shape[0] != m.batch_size:
                    continue  # fixed-shape vmapped step: skip partial batches
                states, metrics = vstep(states, jnp.asarray(real))
                a = 0.5 * (metrics["d_real_acc"] + metrics["d_fake_acc"])
                acc_sum = a if acc_sum is None else acc_sum + a
                n_steps += 1
                if preemption.requested():
                    preempted = True
                    break
                if steps_cap and s_i + 1 >= steps_cap:
                    break
            if c_window > 0 and n_steps:
                epoch_acc = np.asarray(acc_sum, np.float32) / n_steps
                consec = np.where(epoch_acc >= c_acc, consec + 1, 0)
                tripped |= consec >= c_window
            if preempted:
                break
        if preempted:
            # SIGTERM (utils/preemption.py): this group is partially trained —
            # scoring it would rank half-trained trials against finished ones.
            # Abandon it; earlier groups are already durable in the JSONL.
            log.warning("preemption: abandoning vectorized group %s "
                        "mid-training (no records written)", key)
            break

        extractor = FID.make_feature_extractor("random_conv", m.channels)
        sample_fn = make_sample_fn(gan, cfg)
        num_fid = min(base.run.fid_num_samples, pipeline.num_samples)
        # real-side moments once per GROUP — identical for every trial slot
        real_stats = None
        seen = 0
        for rb, _ in pipeline.epoch():
            rb = FID.to_uint8(np.asarray(rb))
            take = min(len(rb), num_fid - seen)
            if take <= 0:
                break
            feats = extractor(rb[:take])
            if real_stats is None:
                real_stats = FID.FeatureStats(feats.shape[-1])
            real_stats.update(feats)
            seen += take
        mu_r, cov_r = real_stats.moments()
        for slot, (i, t) in enumerate(members):
            st = jax.tree.map(lambda x, s=slot: x[s], states)
            fake_stats = FID.FeatureStats(len(mu_r))
            frng = jax.random.PRNGKey(10_000 + i)
            generated = 0
            while generated < seen:
                frng, fk = jax.random.split(frng)
                n = min(m.batch_size, seen - generated)
                z = gan.sample_latent(fk, n)
                fakes = np.asarray(sample_fn(st.g_vars_ema, z))
                fake_stats.update(extractor(FID.to_uint8(fakes)))
                generated += n
            mu_f, cov_f = fake_stats.moments()
            fid = FID.frechet_distance(mu_r, cov_r, mu_f, cov_f)
            rec = {"trial": i, "params": t, "fid": float(fid),
                   "collapsed": bool(tripped[slot]),
                   "vectorized_group": list(key), "group_size": k}
            results.append(rec)
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    return _finish_sweep(results, out_dir, log_path)
