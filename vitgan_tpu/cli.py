"""Command-line interface.

The reference has no CLI at all (behavior edited in source, two env vars —
SURVEY §5.6); parity plus a thin argparse layer:

- ``train``    — main-v1.py / main-v2.py / cnn notebook / idc.py roles via --family
- ``generate`` — test-generation.py role (ref:src/v2/generation.py:10-60)
- ``eval``     — FID/KID/precision-recall for a checkpoint (beyond-reference:
                 the reference tracks FID only, ref:src/v2/utils.py:155-175)
- ``sweep``    — train_with_ray() role, Ray-free (ref:src/v2/training.py:271-294)

Env contract preserved: $SCRATCH artifact root, DEV shrink flag.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional


def _collect_overrides(args, family: Optional[str] = None) -> dict:
    """CLI flags -> dotted config overrides.  ``family`` keys the per-family
    flags (--batch-size/--seed/--loss); callers restoring a run dir MUST pass
    the run's persisted family — args.family is just the parser default
    ('v2') there, and mis-keyed overrides would be silently ignored."""
    family = family or args.family
    overrides = {}
    if args.dataset:
        overrides["data.dataset"] = args.dataset
    if args.epochs is not None:
        overrides["run.epochs"] = args.epochs
    if args.batch_size is not None:
        overrides[f"{family}.batch_size"] = args.batch_size
    if args.seed is not None:
        overrides[f"{family}.seed"] = args.seed
    if args.loss is not None and family in ("v1", "v2"):
        overrides[f"{family}.loss"] = args.loss
    if args.run_name:
        overrides["run_name"] = args.run_name
    for kv in args.set or []:
        key, val = kv.split("=", 1)
        try:
            overrides[key] = json.loads(val)
        except json.JSONDecodeError:
            overrides[key] = val  # bare string
    return overrides


def _build_cfg(args) -> "ExperimentConfig":
    from vitgan_tpu import config as C

    preset = getattr(args, "preset", None)
    if preset:  # explicit preset wins over DEV shrinking; --set still applies
        cfg = {"deit64": C.deit64_config,
               "highres128": lambda: C.highres_config(128),
               "highres256": lambda: C.highres_config(256),
               "highres256p4": C.highres256p4_config}[preset]()
    elif C.dev_mode():
        cfg = C.smoke_config(args.family)
    else:
        cfg = C.ExperimentConfig(family=args.family)
    overrides = _collect_overrides(args)
    return C.replace(cfg, **overrides) if overrides else cfg


def cmd_train(args) -> int:
    from vitgan_tpu import config as C
    from vitgan_tpu.parallel import initialize_distributed
    from vitgan_tpu.train.trainer import Trainer

    initialize_distributed()
    cfg = _build_cfg(args)
    try:
        trainer = Trainer(cfg)
    except FileNotFoundError as e:
        # Dataset archives absent (e.g. zero-egress machine): fall back to the
        # deterministic synthetic source so entry points still run end to end.
        print(f"[vitgan-tpu] {e}\n[vitgan-tpu] falling back to the synthetic dataset",
              file=sys.stderr)
        cfg = C.replace(cfg, **{"data.dataset": "synthetic"})
        trainer = Trainer(cfg)
    if args.resume:
        trainer.resume()
        if getattr(args, "warm_start_d", None):
            # Resuming restored a trained D (+ its optimizer moments);
            # re-applying the warm start would roll D back to the import
            # while G keeps its resumed weights — skip it.
            print("[vitgan-tpu] --warm-start-d ignored on --resume (the "
                  "resumed checkpoint already carries the trained D)",
                  file=sys.stderr)
    elif getattr(args, "warm_start_d", None):
        _warm_start_d(trainer, args.warm_start_d, cfg)
    from vitgan_tpu.utils.preemption import graceful_preemption

    # SIGTERM (spot/TPU-pod preemption) stops at the next step-group boundary
    # and flows through the trainer's crash-safe checkpoint epilogue; resume
    # with `train --resume` re-runs the interrupted epoch.
    with graceful_preemption():
        trainer.fit()
    return 0


def _num_heads(cfg) -> int:
    """Attention head count for torch-import conversions (v2 families; the
    reference default is 4, ref:src/v2/utils.py:26)."""
    return getattr(cfg.model, "num_heads", 4)


def _warm_start_d(trainer, path: str, cfg) -> int:
    """Warm-start the discriminator from a reference torch checkpoint
    (ref:src/v2/modules.py:429-440 role, via utils/torch_port) or from another
    vitgan-tpu run directory's checkpoint."""
    from vitgan_tpu.utils.torch_port import TORCH_SUFFIXES, import_checkpoint

    if path.endswith(TORCH_SUFFIXES):
        variables = import_checkpoint(path, cfg.family, role="discriminator",
                                      num_heads=_num_heads(cfg))
    else:
        from vitgan_tpu.ops.policy import apply_from_runtime
        from vitgan_tpu.utils.run_dirs import restore_run

        _, _, state, _ = restore_run(path)
        variables = {"params": state.d_params, "state": state.d_state}
        # restore_run applied the SOURCE run's runtime policy globally
        # (kernel routing, PRNG impl); re-assert this training run's.
        apply_from_runtime(cfg.runtime)
    loaded = trainer.warm_start_discriminator(variables)
    if loaded == 0:
        raise ValueError(f"warm start from {path} matched no leaves — "
                         "wrong family or model shape?")
    return loaded


def _generate_from_torch(args) -> int:
    """Sample directly from a reference torch generator checkpoint — no run
    dir needed (migration path: cnn/dcgan generators import cleanly; the v2
    reference generator is broken, utils/torch_port docstring)."""
    import jax
    import numpy as np

    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import make_sample_fn
    from vitgan_tpu.utils.images import save_image_grid
    from vitgan_tpu.utils.torch_port import import_checkpoint

    cfg = _build_cfg(args)
    gan = build_gan(cfg)
    g_vars = import_checkpoint(args.from_torch, cfg.family, role="generator",
                               num_heads=_num_heads(cfg))
    g_vars = jax.tree.map(jax.numpy.asarray, g_vars)
    sample = make_sample_fn(gan, cfg)
    z = gan.sample_latent(jax.random.PRNGKey(args.seed or 0), args.num_images)
    imgs = np.asarray(sample(g_vars, z))
    out_dir = os.path.join(os.path.dirname(os.path.abspath(args.from_torch)),
                           "vitgan_tpu_samples")
    save_image_grid(os.path.join(out_dir, "generated_images.png"), imgs)
    print(f"wrote {args.num_images} samples to {out_dir} "
          f"(imported {os.path.basename(args.from_torch)}, family {cfg.family})")
    return 0


def cmd_import_torch(args) -> int:
    """Materialize a reference torch checkpoint as a first-class run dir
    (persisted config + orbax checkpoint at step 0), so ``generate``,
    ``serve``, ``eval`` and ``train --resume`` (fine-tuning) all work on it
    through the one restore path (utils/run_dirs.restore_run)."""
    import jax

    from vitgan_tpu import config as C
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state
    from vitgan_tpu.utils.checkpoint import CheckpointManager, partial_load
    from vitgan_tpu.utils.run_dirs import construct_directories
    from vitgan_tpu.utils.torch_port import import_checkpoint, load_torch_state_dict

    cfg = _build_cfg(args)
    # Same runtime policy the trainer and restore_run apply (PRNG impl etc.),
    # so the saved state matches the restore template exactly.
    from vitgan_tpu.ops.policy import apply_from_runtime

    apply_from_runtime(cfg.runtime)
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(cfg.model.seed), gan, cfg)
    sd = load_torch_state_dict(args.path)

    if args.roles:
        roles = [r.strip() for r in args.roles.split(",")]
        bad = [r for r in roles if r not in ("generator", "discriminator")]
        if bad:
            raise ValueError(f"unknown role(s) {bad}; valid: generator, "
                             "discriminator")
    else:
        roles = (["discriminator"] if cfg.family == "v2"
                 else ["generator", "discriminator"])
    imported = []
    for role in roles:
        try:
            variables = import_checkpoint(sd, cfg.family, role=role,
                                          num_heads=_num_heads(cfg))
        except (KeyError, ValueError) as e:
            # KeyError: role's keys absent.  ValueError: keys present but the
            # wrong module (e.g. a DCGAN G-only state_dict also has
            # main.0.weight, so the D mapping hits a BN leaf with conv axes).
            if args.roles:  # explicitly requested -> fail loud
                raise
            print(f"[import-torch] {role} does not fit this state_dict "
                  f"({type(e).__name__}: {e}); skipped", file=sys.stderr)
            continue
        target = ({"params": state.d_params, "state": state.d_state}
                  if role == "discriminator" else
                  {"params": state.g_params, "state": state.g_state})
        merged, n, total = partial_load(jax.device_get(target), variables)
        if n != total:
            raise ValueError(
                f"{role}: only {n}/{total} leaves matched — model shape "
                f"mismatch (check --family and --set model overrides)")
        if role == "discriminator":
            state = state.replace(d_params=merged["params"], d_state=merged["state"])
        else:
            state = state.replace(g_params=merged["params"], g_state=merged["state"])
            if state.g_ema is not None:
                state = state.replace(
                    g_ema=jax.tree.map(lambda x: x.copy(), merged["params"]))
        imported.append(role)
    if not imported:
        print("no role could be imported from this state_dict", file=sys.stderr)
        return 1

    run_name = args.run_name or (
        f"imported_{os.path.splitext(os.path.basename(args.path))[0]}")
    cfg = C.replace(cfg, run_name=run_name)
    dirs = construct_directories(run_name)
    C.save_config(cfg, os.path.join(dirs.root, "config.json"))
    ckpts = CheckpointManager(dirs.checkpoints, keep=cfg.run.keep_checkpoints)
    ckpts.save(0, jax.device_get(state),
               {"epoch": 0, "imported_from": os.path.abspath(args.path),
                "imported_roles": imported})
    ckpts.wait()
    print(f"imported {cfg.family} {'+'.join(imported)} from {args.path} -> {dirs.root}")
    return 0


def cmd_export_torch(args) -> int:
    """Export a trained checkpoint to a reference-format torch state_dict
    (.pth) so it drops into torch tooling (utils/torch_export)."""
    import jax

    from vitgan_tpu.utils.torch_export import save_torch_checkpoint

    loaded = _load_run_state(args)
    if loaded is None:
        print("no run directory found", file=sys.stderr)
        return 1
    cfg, gan, state, meta, run_dir = loaded
    if args.role == "generator":
        variables = jax.device_get(state.g_vars_ema)
    else:
        variables = jax.device_get({"params": state.d_params, "state": state.d_state})
    out = args.out or os.path.join(run_dir, f"{cfg.family}_{args.role}.pth")
    save_torch_checkpoint(out, variables, cfg.family, role=args.role,
                          channels=cfg.model.channels)
    print(f"exported {cfg.family} {args.role} (ckpt step {meta.get('step')}) -> {out}")
    return 0


def _load_run_state(args):
    """(cfg, gan, state, meta, run_dir) from a run directory's persisted
    config + checkpoint — shared by ``generate`` and ``eval``; the restore
    sequence itself lives in utils.run_dirs.restore_run (also the serving
    path's restore)."""
    from vitgan_tpu import config as C
    from vitgan_tpu.utils.run_dirs import latest_run, restore_run

    run_dir = args.run_dir or latest_run()
    if run_dir is None:
        return None
    # The run's persisted training config is the source of truth for the model
    # shape (and whether g_ema exists in the checkpoint tree); CLI --set
    # overrides still apply on top for runtime knobs.  Overrides are keyed by
    # the PERSISTED family, not the parser default.
    cfg_path = os.path.join(run_dir, "config.json")
    base_cfg = C.load_config(cfg_path) if os.path.exists(cfg_path) else _build_cfg(args)
    overrides = _collect_overrides(args, family=base_cfg.family)
    cfg, gan, state, meta = restore_run(run_dir, best=args.best,
                                        overrides=overrides, default_cfg=base_cfg)
    return cfg, gan, state, meta, run_dir


def cmd_generate(args) -> int:
    """Load a checkpoint, sample a grid (ref:src/v2/generation.py:26-60)."""
    import jax
    import numpy as np

    from vitgan_tpu.train import make_sample_fn
    from vitgan_tpu.utils.images import save_image_grid

    if getattr(args, "from_torch", None):
        return _generate_from_torch(args)
    loaded = _load_run_state(args)
    if loaded is None:
        print("no run directory found", file=sys.stderr)
        return 1
    cfg, gan, state, meta, run_dir = loaded
    sample = make_sample_fn(gan, cfg)
    z = gan.sample_latent(jax.random.PRNGKey(args.seed or 0), args.num_images)
    # Sample from the EMA params when tracked — same weights FID/best tracking use.
    imgs = np.asarray(sample(state.g_vars_ema, z))
    out_dir = os.path.join(run_dir, "test")
    save_image_grid(os.path.join(out_dir, "generated_images.png"), imgs)
    np.save(os.path.join(out_dir, "noise.npy"), np.asarray(z))
    print(f"wrote {args.num_images} samples to {out_dir} (ckpt step {meta.get('step')})")
    return 0


def cmd_eval(args) -> int:
    """Full sample-quality evaluation of a checkpoint: FID + KID +
    precision/recall against the run's dataset, one JSON line + metrics.json."""
    import jax
    import numpy as np

    from vitgan_tpu.data import make_pipeline
    from vitgan_tpu.train import make_sample_fn
    from vitgan_tpu.train.fid import make_feature_extractor, to_uint8
    from vitgan_tpu.train.metrics import collect_features, evaluate_generative_metrics

    loaded = _load_run_state(args)
    if loaded is None:
        print("no run directory found", file=sys.stderr)
        return 1
    cfg, gan, state, meta, run_dir = loaded
    b = cfg.model.batch_size
    # Evaluation reals must be CLEAN: a run trained with augment_flip would
    # otherwise have its real manifold measured on flipped images.
    from vitgan_tpu import config as C

    eval_data = C.replace(cfg, **{"data.augment_flip": False}).data
    pipeline = make_pipeline(eval_data, b, cfg.model.image_size, cfg.model.channels,
                             seed=cfg.model.seed,
                             synthetic_samples=cfg.data.synthetic_samples)
    num = min(args.num_samples, pipeline.num_samples)
    extractor = make_feature_extractor(args.extractor, cfg.model.channels)

    # Feed host-resident uint8 images straight to the extractor — the
    # normalize->device_put->readback->to_uint8 round trip through
    # pipeline.epoch() is two full-array tunnel transfers for data that
    # never needed to leave the host.
    imgs = pipeline.images
    real_feats = collect_features(
        extractor, (imgs[i:i + b] for i in range(0, len(imgs), b)), num)

    # One fake sample set, reused for features and (when available) IS logits.
    sample = make_sample_fn(gan, cfg)
    rng = jax.random.PRNGKey(args.seed or 0)
    fakes_u8 = []
    got = 0
    while got < num:
        rng, k = jax.random.split(rng)
        z = gan.sample_latent(k, b)
        batch_u8 = to_uint8(np.asarray(sample(state.g_vars_ema, z)))[:num - got]
        fakes_u8.append(batch_u8)
        got += len(batch_u8)
    fakes_u8 = np.concatenate(fakes_u8, 0)
    fake_feats = np.asarray(extractor(fakes_u8), np.float64)

    inception_is = None
    if hasattr(extractor, "logits_fn"):  # classifier head present -> also IS
        from vitgan_tpu.train.metrics import inception_score

        inception_is = inception_score(extractor.logits_fn(fakes_u8))

    result = evaluate_generative_metrics(
        real_feats, fake_feats,
        kid_subset_size=min(args.kid_subset_size, num),
        kid_subsets=args.kid_subsets, pr_k=args.pr_k, seed=args.seed or 0)
    if inception_is is not None:
        result["inception_score_mean"], result["inception_score_std"] = inception_is
    result.update({
        "run_dir": run_dir, "ckpt_step": meta.get("step"),
        "extractor": args.extractor,
        "feature_dim": getattr(extractor, "feature_dim", None)
        or int(real_feats.shape[1]),
        "dataset": cfg.data.dataset,
    })
    out_path = os.path.join(run_dir, "metrics.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


def cmd_serve(args) -> int:
    """Long-lived batched sampling server (vitgan_tpu/serve.py)."""
    from vitgan_tpu.serve import serve
    from vitgan_tpu.utils.run_dirs import latest_run

    run_dirs = args.run_dir or latest_run()
    if run_dirs is None:
        print("no run directory found", file=sys.stderr)
        return 1
    httpd = serve(run_dirs, host=args.host, port=args.port, batch=args.batch,
                  best=args.best, quantize=args.quantize)
    print(f"serving {run_dirs} on http://{args.host}:{httpd.server_address[1]} "
          f"(GET /healthz, /metrics, POST /sample)")
    # SIGTERM (spot preemption / orchestrator stop) drains like Ctrl-C:
    # shutdown() stops accepting and lets in-flight requests finish.
    import signal as _signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    _signal.signal(_signal.SIGTERM, _term)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()
    finally:
        # Joins in-flight handler threads (serve() makes them non-daemon):
        # the current responses complete before the process exits.
        httpd.server_close()
    return 0


def cmd_bench(args) -> int:
    """Scanned-production-path throughput for any preset (utils/benchutil)."""
    from vitgan_tpu.ops.policy import apply_from_runtime
    from vitgan_tpu.utils.benchutil import (
        build_preset_cfg, measure_scanned_train, xla_step_gflops,
    )

    cfg = build_preset_cfg(args.preset)
    apply_from_runtime(cfg.runtime)
    ips = measure_scanned_train(cfg, args.scan, args.iters)
    rec = {"metric": f"{args.preset} train-step images/sec (scan {args.scan})",
           "value": round(ips, 2), "unit": "images/sec"}
    if args.flops:
        import jax

        from vitgan_tpu.models import build_gan
        from vitgan_tpu.train import create_train_state

        gan = build_gan(cfg)
        state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
        g = xla_step_gflops(cfg, gan, state)
        if g:
            rec["step_gflops"] = round(g, 2)
            rec["sustained_tflops"] = round(g * ips / cfg.model.batch_size / 1e3, 2)
    print(json.dumps(rec))
    return 0


def cmd_warmup(args) -> int:
    """AOT-compile preset train steps into the persistent XLA cache, so the
    first real `train` of each preset skips its minutes-long compile.  The
    compiled module is the TRAINER's own device call (same donation,
    steps-per-call and dataset shapes — anything else would be a different
    cache key); --scan additionally pre-compiles the `bench` harness."""
    from vitgan_tpu import config as C
    from vitgan_tpu.ops.policy import apply_from_runtime
    from vitgan_tpu.utils.benchutil import build_preset_cfg, warmup_compile

    out = {}
    for preset in args.presets:
        cfg = build_preset_cfg(preset)
        if args.dataset:
            cfg = C.replace(cfg, **{"data.dataset": args.dataset})
        cfg = C.replace(cfg, run_name=f"warmup_{preset}")
        apply_from_runtime(cfg.runtime)
        out[preset] = round(warmup_compile(cfg, args.scan), 1)
        print(f"[warmup] {preset}: compiled in {out[preset]}s", file=sys.stderr)
    print(json.dumps({"compile_seconds": out, "scan": args.scan}))
    return 0


def cmd_doctor(args) -> int:
    """Environment health report: accelerator reachability (probed in a
    SUBPROCESS with a timeout — a dead tunneled device hangs jax.devices()
    forever, the exact failure mode this command exists to diagnose),
    compilation cache, native loader, torch interop, scratch layout."""
    import subprocess

    from vitgan_tpu import config as C

    checks = {}

    # the axon sitecustomize force-registers the tunneled TPU even when the
    # env says JAX_PLATFORMS=cpu; honor the env explicitly (bench.py pattern)
    probe = ("import os, jax\n"
             "if 'cpu' in os.environ.get('JAX_PLATFORMS', '').lower():\n"
             "    jax.config.update('jax_platforms', 'cpu')\n"
             "d = jax.devices()\nimport jax.numpy as jnp\n"
             "assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0\n"
             "print(d[0].platform, len(d))")
    try:
        r = subprocess.run([sys.executable, "-c", probe], capture_output=True,
                           text=True, timeout=args.device_timeout)
        out = (r.stdout or "").strip().split("\n")[-1]
        checks["devices"] = ({"ok": True, "detail": out} if r.returncode == 0
                             else {"ok": False,
                                   "detail": (r.stderr or "")[-300:].strip()})
    except subprocess.TimeoutExpired:
        checks["devices"] = {
            "ok": False,
            "detail": f"no response in {args.device_timeout}s — tunneled "
                      "accelerator down? (CPU runs: JAX_PLATFORMS=cpu)"}

    scratch = C.scratch_root()
    checks["scratch"] = {"ok": os.path.isdir(scratch), "detail": scratch}
    cache = os.path.join(scratch, "jax_cache")
    n_cached = (len(os.listdir(cache)) if os.path.isdir(cache) else 0)
    checks["compilation_cache"] = {"ok": True,
                                   "detail": f"{cache} ({n_cached} entries)"}
    try:
        from vitgan_tpu.data.native import load_library

        load_library()
        checks["native_loader"] = {"ok": True, "detail": "built and loadable"}
    except Exception as e:
        checks["native_loader"] = {
            "ok": False, "detail": f"{type(e).__name__}: {e} (python "
            "fallback path is used automatically)"}
    try:
        import torch

        checks["torch_interop"] = {"ok": True, "detail": torch.__version__}
    except Exception as e:
        checks["torch_interop"] = {
            "ok": False,
            "detail": f"{e} (import/export-torch and the torch FID "
                      "extractor are unavailable)"}
    from vitgan_tpu.train.fid import inception_weights_path

    w = inception_weights_path()
    checks["inception_weights"] = {
        "ok": w is not None,
        "detail": w or "not staged — FID uses the random-conv extractor "
                       "(relative tracking only)"}

    for name, c in checks.items():
        print(f"[{'ok' if c['ok'] else 'FAIL'}] {name}: {c['detail']}")
    hard_fail = not checks["devices"]["ok"] and not args.allow_no_device
    print(json.dumps({k: v for k, v in checks.items()}))
    return 1 if hard_fail else 0


def cmd_profile(args) -> int:
    """Capture a jax.profiler trace of a few train steps (op-level timeline;
    open with TensorBoard/xprof)."""
    from vitgan_tpu.train.trainer import Trainer

    cfg = _build_cfg(args)
    trainer = Trainer(cfg, fid_extractor="random_conv")
    trace_dir = trainer.profile(n_steps=args.steps)
    print(f"trace ({args.steps} steps, family {cfg.family}) -> {trace_dir}")
    return 0


def cmd_sweep(args) -> int:
    from vitgan_tpu.utils.preemption import graceful_preemption

    # SIGTERM between trials finishes the sweep over the completed trials
    # (each is already durable in the JSONL) instead of losing the summary.
    with graceful_preemption():
        return _cmd_sweep_inner(args)


def _sweep_base_from_args(args):
    """Base trial config honoring DEV shrink and --set/--dataset (the sweep
    previously ignored both, so `DEV=1 cli sweep` trained FULL-SIZE trials).
    The search space itself (ref:src/v2/training.py:277-283) is v2-only, so
    the family is pinned to v2; per-trial keys override this base."""
    from vitgan_tpu import config as C

    args.family = "v2"
    cfg = _build_cfg(args)
    epochs = args.epochs or 1
    return C.replace(cfg, **{
        "run.epochs": epochs, "run.checkpoint_every_epochs": 0,
        "run.sample_grid_every_epochs": 0,
        "data.dataset": args.dataset or "synthetic",
    }), epochs


def _cmd_sweep_inner(args) -> int:
    base, epochs = _sweep_base_from_args(args)
    if args.vectorize:
        from vitgan_tpu.hpo.sweep import run_sweep_vectorized

        if args.trial_stride > 1 or args.trial_offset != 0:
            raise ValueError("--vectorize replaces host striding (trials "
                             "parallelize on-device); drop --trial-stride/"
                             "--trial-offset")
        best = run_sweep_vectorized(num_trials=args.num_trials,
                                    epochs_per_trial=epochs,
                                    seed=args.seed or 0,
                                    dataset=args.dataset or "synthetic",
                                    base_cfg=base,
                                    resume=args.resume)
        print(json.dumps(best, indent=2, default=str))
        return 0
    from vitgan_tpu.hpo.sweep import run_sweep

    best = run_sweep(num_trials=args.num_trials, epochs_per_trial=epochs,
                     seed=args.seed or 0, dataset=args.dataset or "synthetic",
                     base_cfg=base,
                     trial_offset=args.trial_offset, trial_stride=args.trial_stride,
                     resume=args.resume)
    print(json.dumps(best, indent=2, default=str))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vitgan-tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--family", choices=["v1", "v2", "dcgan", "cnn", "mlp"], default="v2")
        sp.add_argument("--dataset", choices=["cifar10", "mnist", "synthetic"], default=None)
        sp.add_argument("--epochs", type=int, default=None)
        sp.add_argument("--batch-size", type=int, default=None)
        sp.add_argument("--seed", type=int, default=None)
        sp.add_argument("--loss", choices=["bce", "mse", "wgan-gp"], default=None)
        sp.add_argument("--run-name", default=None)
        sp.add_argument("--preset",
                        choices=["deit64", "highres128", "highres256",
                                 "highres256p4"],
                        default=None,
                        help="BASELINE configs #4/#5 (64px DeiT-D, 128/256px "
                             "deep G; 256p4 = 4096-token patch-4 stress)")
        sp.add_argument("--set", action="append", metavar="dotted.key=value",
                        help="raw config override, e.g. --set v2.depth=8")

    t = sub.add_parser("train", help="train a GAN family")
    common(t)
    t.add_argument("--resume", action="store_true")
    t.add_argument("--warm-start-d", default=None, metavar="PATH",
                   help="warm-start the discriminator from a checkpoint before "
                        "training: a reference torch .pth/.pt/.ckpt state_dict "
                        "(imported via utils/torch_port) or a vitgan-tpu run dir")
    t.set_defaults(fn=cmd_train)

    g = sub.add_parser("generate", help="sample images from a checkpoint")
    common(g)
    g.add_argument("--run-dir", default=None, help="defaults to latest under $SCRATCH/output")
    g.add_argument("--best", action="store_true", help="use the best-FID checkpoint")
    g.add_argument("--num-images", type=int, default=64)
    g.add_argument("--from-torch", default=None, metavar="PATH",
                   help="sample from a reference torch generator state_dict "
                        "(.pth/.pt/.ckpt; families cnn/dcgan) instead of a run dir")
    g.set_defaults(fn=cmd_generate)

    i = sub.add_parser("import-torch", help="materialize a reference torch "
                       "checkpoint as a run dir (generate/serve/eval/fine-tune "
                       "all work on it)")
    common(i)
    i.add_argument("path", help="reference .pth/.pt/.ckpt state_dict")
    i.add_argument("--roles", default=None,
                   help="comma list of generator,discriminator; defaults to "
                        "discriminator for v2 and whatever the state_dict "
                        "carries for cnn/dcgan")
    i.set_defaults(fn=cmd_import_torch)

    x = sub.add_parser("export-torch", help="export a checkpoint to a reference-"
                       "format torch state_dict (.pth)")
    common(x)
    x.add_argument("--run-dir", default=None)
    x.add_argument("--best", action="store_true")
    x.add_argument("--role", choices=("generator", "discriminator"),
                   default="discriminator",
                   help="v2 exports the discriminator only (the reference v2 "
                        "generator is dimensionally broken); cnn/dcgan export both")
    x.add_argument("--out", default=None, help="defaults to <run-dir>/<family>_<role>.pth")
    x.set_defaults(fn=cmd_export_torch)

    e = sub.add_parser("eval", help="FID/KID/precision-recall for a checkpoint")
    common(e)
    e.add_argument("--run-dir", default=None, help="defaults to latest under $SCRATCH/output")
    e.add_argument("--best", action="store_true", help="use the best-FID checkpoint")
    e.add_argument("--num-samples", type=int, default=2048,
                   help="evaluation budget per side (real and generated)")
    e.add_argument("--extractor", default="auto",
                   choices=["auto", "inception", "inception_jax", "inception_torch",
                            "random_conv"])
    e.add_argument("--kid-subset-size", type=int, default=1000)
    e.add_argument("--kid-subsets", type=int, default=100)
    e.add_argument("--pr-k", type=int, default=3,
                   help="k-NN order for the precision/recall manifolds")
    e.set_defaults(fn=cmd_eval)

    v = sub.add_parser("serve", help="batched sampling server over HTTP")
    v.add_argument("--run-dir", action="append", default=None,
                   help="repeatable: several run dirs form a multi-model "
                        "registry (POST {'model': <basename>}); defaults to "
                        "latest under $SCRATCH/output")
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8000)
    v.add_argument("--batch", type=int, default=64, help="fixed device batch per call")
    v.add_argument("--best", action="store_true", help="use the best-FID checkpoint")
    v.add_argument("--quantize", choices=["int8"], default=None,
                   help="weight-only int8 serving: 4x less weight upload/HBM "
                        "traffic, dequantization fused into the jitted sampler "
                        "(utils/quantize.py; parity bounded by test)")
    v.set_defaults(fn=cmd_serve)

    b = sub.add_parser("bench", help="honest train-step throughput for a preset")
    b.add_argument("--preset", default="v2",
                   help="v1|v2|dcgan|cnn|mlp|deit64|hires128|hires256")
    b.add_argument("--scan", type=int, default=16, help="steps per device call")
    b.add_argument("--iters", type=int, default=5)
    b.add_argument("--flops", action="store_true",
                   help="also print the XLA FLOP model + sustained TFLOP/s")
    b.set_defaults(fn=cmd_bench)

    w = sub.add_parser("warmup", help="AOT-compile preset train steps into the "
                                      "persistent XLA cache")
    w.add_argument("presets", nargs="+",
                   help="v1|v2|dcgan|cnn|mlp|deit64|hires128|hires256")
    w.add_argument("--dataset", choices=["cifar10", "mnist", "synthetic"],
                   default=None, help="match the dataset you will train on "
                                      "(shapes are part of the cache key)")
    w.add_argument("--scan", type=int, default=0,
                   help="also pre-compile the `bench` harness at this scan length")
    w.set_defaults(fn=cmd_warmup)

    d = sub.add_parser("doctor", help="environment health report (device probe "
                       "is subprocess+timeout: a dead tunnel can't hang it)")
    d.add_argument("--device-timeout", type=float, default=90.0)
    d.add_argument("--allow-no-device", action="store_true",
                   help="exit 0 even when no accelerator answers (CPU-only use)")
    d.set_defaults(fn=cmd_doctor)

    pr = sub.add_parser("profile", help="jax.profiler trace of a few train steps")
    common(pr)
    pr.add_argument("--steps", type=int, default=5)
    pr.set_defaults(fn=cmd_profile)

    s = sub.add_parser("sweep", help="hyperparameter sweep (Ray-free)")
    common(s)
    s.add_argument("--num-trials", type=int, default=10)
    s.add_argument("--trial-offset", type=int, default=0,
                   help="this host's slice of the trial sequence")
    s.add_argument("--trial-stride", type=int, default=1,
                   help="total hosts sharing the sweep")
    s.add_argument("--vectorize", action="store_true",
                   help="vmap same-shape trials into one jitted step: K "
                        "optimizer states with per-trial lrs train "
                        "simultaneously (one compile per shape group)")
    s.add_argument("--resume", action="store_true",
                   help="skip trials already recorded in the sweep dir's "
                        "JSONL (same --seed draws the same sequence) — picks "
                        "a preempted sweep up where it stopped")
    s.set_defaults(fn=cmd_sweep)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    # Honor an explicit JAX_PLATFORMS=cpu even on images whose site
    # customization force-registers an accelerator platform.
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
