"""REAL 2-process ``jax.distributed`` smoke (VERDICT r4 #3).

Round 3's multi-host story was simulated: per-process data slicing was
unit-tested inside one process and ``initialize_distributed`` had never
executed.  This harness runs the actual thing on one box, CPU backend:

  - a coordinator at localhost, 2 processes x 4 virtual devices each
    (``--xla_force_host_platform_device_count=4``),
  - ``initialize_distributed()`` executes for real in every process
    (COORDINATOR_ADDRESS + NUM_PROCESSES/PROCESS_ID env contract,
    parallel/mesh.py),
  - each process feeds its own contiguous slice of every global batch
    through ``jax.make_array_from_process_local_data``
    (data/pipeline.HostDataPipeline, the same code path single-host runs
    exercise),
  - a DP train step over the global 8-device mesh runs for several steps,
  - the per-step losses must match a single-process 8-device run of the
    identical program to 1e-3 (the dryrun tolerance).

Role in the reference: none exists — SURVEY §2.5 names the distributed comm
backend a first-class component the rebuild must add.

Usage:
  python scripts/multiproc_smoke.py --out MULTIPROC_r04.json
Exit code 0 iff both processes executed distributed init AND losses match.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_STEPS = 3


def _runner(out_path: str) -> int:
    """Executed inside each process (single-proc reference AND both
    distributed workers): init, pipeline, N train steps, write metrics."""
    sys.path.insert(0, REPO)
    from vitgan_tpu.parallel import initialize_distributed

    initialize_distributed()  # no-op without COORDINATOR_ADDRESS

    import jax
    import numpy as np

    assert jax.devices()[0].platform == "cpu", (
        "smoke child must run on the virtual CPU platform, got "
        f"{jax.devices()[0].platform} — axon plugin leaked into the child env")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vitgan_tpu import config as C
    from vitgan_tpu.data import make_pipeline
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.ops.policy import apply_from_runtime
    from vitgan_tpu.parallel.mesh import make_mesh
    from vitgan_tpu.train.state import create_train_state
    from vitgan_tpu.train.step import make_train_step

    mode = os.environ.get("MP_SMOKE_MODE", "dp")  # dp | tp | fsdp | pp
    cfg = C.smoke_config("v2")
    # threefry: sharding-invariant random bits, so the 1-process and
    # 2-process programs draw identical noise/dropout (rbg's partitionable
    # generator does not guarantee that).
    cfg = C.replace(cfg, **{"v2.batch_size": 16,
                            "runtime.prng_impl": "threefry2x32",
                            "data.on_device": False})
    if mode == "tp":
        # TP variant: the model axis spans devices owned by BOTH processes,
        # so GSPMD's TP collectives (qkv/MLP all-reduces) cross the process
        # boundary — a strictly stronger claim than DP-only parity.
        cfg = C.replace(cfg, **{"mesh.model_parallel": 2})
    if mode == "pp":
        # PP runs float32 with dropout off: bf16 PP hits the XLA:CPU
        # AllReducePromotion abort (scripts/repro_xla_allreduce_bug.py) and
        # shard_map dropout keys differ from the sequential stack's.
        cfg = C.replace(cfg, **{"v2.dropout": 0.0,
                                "runtime.compute_dtype": "float32"})
    apply_from_runtime(cfg.runtime)

    if mode == "pp":
        # Pipeline parallelism with the PIPE AXIS SPANNING THE PROCESS
        # BOUNDARY (VERDICT r4 #7): devices are laid out so stage s of every
        # pipeline ring lives on process s — jax.devices() orders process 0's
        # 4 devices first, so reshape(2, 4).T puts (devices[d], devices[d+4])
        # in each pipe pair and every ppermute hop crosses processes.  The
        # default make_mesh layout would keep both stages process-local.
        from jax.sharding import Mesh

        from vitgan_tpu.parallel.pipeline import pp_bundle

        devs = np.array(jax.devices()).reshape(-1, 4).T  # (data=4, pipe=nproc)
        mesh = Mesh(devs.reshape(4, 1, -1), axis_names=("data", "model", "pipe"))
        gan = pp_bundle(build_gan(cfg), cfg, mesh=mesh, axis="pipe",
                        microbatches=2, dp_axis="data")
    else:
        mesh = make_mesh(cfg.mesh)
        gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    # Place over the GLOBAL mesh from host values: every process computes
    # the identical init, and device_put of host arrays to a multi-process
    # sharding is the standard placement incantation (each process
    # contributes only its addressable shards).
    state_shardings = None
    if mode == "fsdp":
        # ZeRO placement across the process boundary: params + optimizer
        # moments shard over data=8 (4 devices per process), exercising
        # device_put-to-global-FSDP-shardings and the per-use all-gathers /
        # grad reduce-scatters GSPMD inserts ACROSS processes.
        from vitgan_tpu.parallel.sharding import shard_train_state

        state = shard_train_state(jax.tree.map(np.asarray, state), mesh,
                                  fsdp=True, fsdp_min_size=256)
        specs = [x.sharding.spec for x in jax.tree.leaves(state.g_params)]
        assert any("data" in (sp or ()) for sp in specs), (
            "FSDP smoke is vacuous: no generator leaf sharded over data")
        # Pin output placements so the update doesn't re-replicate leaves
        # (train/step._pin_state contract, same as the trainer wiring).
        state_shardings = jax.tree.map(lambda x: x.sharding, state)
    else:
        repl = NamedSharding(mesh, P())
        state = jax.tree.map(lambda x: jax.device_put(np.asarray(x), repl), state)
    step = make_train_step(gan, cfg, donate=False,
                           state_shardings=state_shardings)
    losses = []
    if mode == "pp":
        # Host-fed deterministic batches: the DP/TP/FSDP phases already
        # exercise the per-process data pipeline; this phase targets the
        # cross-process ppermute ring, and the pipe-transposed mesh breaks
        # the pipeline's contiguous-slice assumption (every process
        # addresses ALL batch shards), so each process feeds the identical
        # global batch and device_put places its local shards.
        rng = np.random.default_rng(7)
        mcfg = cfg.model
        batch_sh = NamedSharding(mesh, P("data", None, None, None))
        for i in range(N_STEPS):
            real = jax.device_put(
                rng.uniform(-1, 1, (mcfg.batch_size, mcfg.image_size,
                                    mcfg.image_size, mcfg.channels)
                            ).astype(np.float32), batch_sh)
            state, m = step(state, real)
            losses.append({"d_loss": float(np.asarray(m["d_loss"])),
                           "g_loss": float(np.asarray(m["g_loss"]))})
    else:
        pipeline = make_pipeline(cfg.data, cfg.model.batch_size,
                                 cfg.model.image_size, cfg.model.channels,
                                 mesh=mesh, seed=0,
                                 synthetic_samples=cfg.data.synthetic_samples)
        it = pipeline.epoch()
        for i, (real, _labels) in enumerate(it):
            if i >= N_STEPS:
                break
            state, m = step(state, real)
            # d/g losses are replicated scalars: readable on every process.
            losses.append({"d_loss": float(np.asarray(m["d_loss"])),
                           "g_loss": float(np.asarray(m["g_loss"]))})
    info = {
        "process_count": jax.process_count(),
        "process_index": jax.process_index(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "distributed_initialized": jax.process_count() > 1,
        "losses": losses,
    }
    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump(info, f, indent=2)
    # All processes must exit cleanly — a worker crash is a smoke failure.
    return 0


def _spawn(role_env: dict, out_path: str, log_path: str):
    env = dict(os.environ)
    env.pop("COORDINATOR_ADDRESS", None)
    env.pop("NUM_PROCESSES", None)
    env.pop("PROCESS_ID", None)
    # The image's sitecustomize force-registers the axon TPU plugin and
    # overrides the platform choice whenever PALLAS_AXON_POOL_IPS is set —
    # with it present the children silently ran on the 1-chip axon backend
    # (device_count=1) instead of the virtual 8-device CPU platform.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(role_env)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, os.path.abspath(__file__), "--run-child", out_path]
    lf = open(log_path, "w")
    return subprocess.Popen(cmd, cwd=REPO, stdout=lf, stderr=subprocess.STDOUT,
                            env=env), lf


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-child", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--out", default="MULTIPROC_r04.json")
    ap.add_argument("--tol", type=float, default=1e-3)
    args = ap.parse_args()
    if args.run_child:
        return _runner(args.run_child)

    t0 = time.time()

    def _wait(p, lf):
        """Bounded wait that converts a hang into an rc instead of an
        uncaught TimeoutExpired (which would unwind main() without writing
        the artifact and leave sibling workers orphaned — e.g. a worker
        blocked forever in jax.distributed.initialize after the coordinator
        died at startup)."""
        try:
            rc = p.wait(timeout=1200)
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
            rc = -9
        lf.close()
        return rc

    def phase(tag, extra_env):
        """One parity experiment: single-process 8-device reference vs
        2-process x 4-device distributed run of the identical program."""
        ref_out = f"/tmp/mp_ref_{tag}.json"
        p, lf = _spawn({"XLA_FLAGS": "--xla_force_host_platform_device_count=8",
                        **extra_env}, ref_out, f"/tmp/mp_ref_{tag}.log")
        rc_ref = _wait(p, lf)
        port = _free_port()
        dist_out = f"/tmp/mp_dist_{tag}.json"
        procs = []
        for pid in range(2):
            procs.append(_spawn(
                {"XLA_FLAGS": "--xla_force_host_platform_device_count=4",
                 "COORDINATOR_ADDRESS": f"localhost:{port}",
                 "NUM_PROCESSES": "2", "PROCESS_ID": str(pid),
                 **extra_env},
                dist_out, f"/tmp/mp_dist{pid}_{tag}.log"))
        rcs = [_wait(p, lf) for p, lf in procs]
        ref = json.load(open(ref_out)) if rc_ref == 0 else None
        dist = json.load(open(dist_out)) if all(r == 0 for r in rcs) else None
        parity = []
        ok = bool(ref and dist
                  and dist["process_count"] == 2
                  and dist["device_count"] == 8
                  and dist["local_device_count"] == 4
                  and dist["distributed_initialized"]
                  and len(ref["losses"]) == len(dist["losses"]) == N_STEPS)
        if ok:
            for i, (a, b) in enumerate(zip(ref["losses"], dist["losses"])):
                for k in ("d_loss", "g_loss"):
                    rel = abs(a[k] - b[k]) / max(abs(a[k]), 1e-9)
                    parity.append({"step": i, "metric": k,
                                   "single_proc": a[k], "two_proc": b[k],
                                   "rel_err": rel})
            ok = all(p["rel_err"] <= args.tol for p in parity)
        return {"ref_rc": rc_ref, "dist_rcs": rcs, "single_proc": ref,
                "two_proc": dist, "parity": parity, "ok": ok}

    # DP: batch sharded over all 8 devices.  TP: model axis 2, spanning
    # devices owned by BOTH processes — GSPMD's TP collectives cross the
    # process boundary.  FSDP: ZeRO param/moment shards over data=8, per-use
    # all-gathers and grad reduce-scatters crossing processes.  PP: GPipe
    # stages laid out so every ppermute hop crosses the process boundary
    # (VERDICT r4 #7 — these two had only single-process parity evidence).
    phases = {name: phase(name, {"MP_SMOKE_MODE": name})
              for name in ("dp", "tp", "fsdp", "pp")}
    ok = all(p["ok"] for p in phases.values())
    out = {
        "what": "real 2-process jax.distributed smoke: localhost coordinator, "
                "2 procs x 4 CPU devices, DP / DPxTP / FSDP / cross-process-"
                "PP train steps, loss parity vs single-process 8-device runs",
        **phases, "tol": args.tol,
        "wall_s": round(time.time() - t0, 1),
        "ok": ok,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({
        "ok": ok,
        **{f"{name}_max_rel_err": max((p["rel_err"] for p in ph["parity"]),
                                      default=None)
           for name, ph in phases.items()},
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
