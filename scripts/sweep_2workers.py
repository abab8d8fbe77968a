"""Production-scale concurrent HPO sweep with a mid-sweep kill/resume
(VERDICT r4 #9).

Round 3 demonstrated the 2-worker JSONL merge contract at smoke scale (4
DEV trials, CPU).  This harness runs the real thing: two concurrent
``cli sweep`` worker processes on the TPU chip (the axon runtime multiplexes
clients — verified this round), NON-DEV trial configs, >=6 trials x 2 epochs,
and one worker SIGKILLed mid-sweep then relaunched with ``--resume`` — the
relaunch must skip its recorded trials and finish only the missing ones.

Role in the reference: Ray Tune's trial fan-out + fault tolerance
(ref:src/v2/training.py:275-292).

Usage (chip): python scripts/sweep_2workers.py --out SWEEP_r04.json
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def scratch():
    sys.path.insert(0, REPO)
    from vitgan_tpu.config import scratch_root  # canonical SCRATCH contract

    return scratch_root()


def worker_cmd(offset, num_trials, epochs, seed, resume=False):
    cmd = [sys.executable, "-m", "vitgan_tpu.cli", "sweep",
           "--dataset", "synthetic", "--num-trials", str(num_trials),
           "--epochs", str(epochs), "--seed", str(seed),
           "--trial-offset", str(offset), "--trial-stride", "2",
           # cheap but real evals; collapse-abort keeps dead trials cheap
           "--set", "run.fid_num_samples=512"]
    if resume:
        cmd.append("--resume")
    return cmd


def spawn(offset, args, resume=False, tag=""):
    log = f"/tmp/sweep_r04_w{offset}{tag}.log"
    lf = open(log, "w")
    p = subprocess.Popen(worker_cmd(offset, args.num_trials, args.epochs,
                                    args.seed, resume),
                         cwd=REPO, stdout=lf, stderr=subprocess.STDOUT)
    return p, lf, log


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-trials", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="SWEEP_r04.json")
    ap.add_argument("--kill-after-trials", type=int, default=1,
                    help="SIGKILL worker 0 once this many of its trials are "
                         "recorded, then relaunch it with --resume")
    args = ap.parse_args()

    sweep_dir = os.path.join(scratch(), "sweeps")
    jsonl = os.path.join(sweep_dir, "sweep_results.jsonl")
    best_path = os.path.join(sweep_dir, "best_config.json")
    for p in (jsonl, best_path):
        if os.path.exists(p):
            os.remove(p)  # fresh sweep: stale records would satisfy --resume

    t0 = time.time()
    p0, lf0, log0 = spawn(0, args)
    p1, lf1, log1 = spawn(1, args)

    # Watch the shared JSONL for worker-0 trials (even indices), then kill it.
    killed_at = None
    deadline = time.time() + 3600
    while time.time() < deadline:
        recs = []
        if os.path.exists(jsonl):
            with open(jsonl) as f:
                for line in f:
                    try:
                        recs.append(json.loads(line))
                    except ValueError:
                        pass
        w0_done = [r for r in recs if int(r["trial"]) % 2 == 0]
        if len(w0_done) >= args.kill_after_trials and p0.poll() is None:
            p0.send_signal(signal.SIGKILL)
            p0.wait()
            killed_at = {"w0_trials_recorded": len(w0_done),
                         "total_recorded": len(recs),
                         "t": round(time.time() - t0, 1)}
            break
        if p0.poll() is not None:  # finished before we could kill it
            killed_at = {"note": "worker 0 finished before the kill point",
                         "w0_trials_recorded": len(w0_done)}
            break
        time.sleep(5)
    lf0.close()

    # Relaunch worker 0 with --resume: it must skip recorded trials.
    p0b, lf0b, log0b = spawn(0, args, resume=True, tag="_resumed")
    rc0 = p0b.wait(timeout=3600)
    rc1 = p1.wait(timeout=3600)
    lf0b.close()
    lf1.close()

    recs = {}
    with open(jsonl) as f:
        for line in f:
            try:
                r = json.loads(line)
                recs[int(r["trial"])] = r
            except ValueError:
                pass
    best = json.load(open(best_path)) if os.path.exists(best_path) else None
    resumed_log = open(log0b).read()
    skipped = resumed_log.count("resume: skipping trial")
    all_present = sorted(recs) == list(range(args.num_trials))
    fids = {t: recs[t].get("fid") for t in sorted(recs)}
    # Same collapse-aware rule as hpo.sweep._finish_sweep (VERDICT r4 weak
    # #2): a collapsed trial can never be the global best unless every
    # trial collapsed.
    viable = [r for r in recs.values() if not r.get("collapsed")]
    global_best = (min(viable or list(recs.values()),
                       key=lambda r: r.get("fid", 1e18))["trial"]
                   if recs else None)
    ok = bool(all_present and rc0 == 0 and rc1 == 0 and best is not None
              and best.get("trial") == global_best and killed_at)
    out = {
        "what": "production 2-worker concurrent sweep on the TPU chip, "
                "non-DEV, with a mid-sweep SIGKILL of worker 0 and --resume "
                "relaunch (Ray-role parity, ref:src/v2/training.py:275-292)",
        "num_trials": args.num_trials, "epochs_per_trial": args.epochs,
        "seed": args.seed, "killed_at": killed_at,
        "resumed_worker_skipped_recorded_trials": skipped,
        "trials_recorded": sorted(recs), "fids": fids,
        "best_config": best, "global_best_trial": global_best,
        "worker_rcs": {"w0_resumed": rc0, "w1": rc1},
        "wall_s": round(time.time() - t0, 1),
        "logs": [log0, log0b, log1],
        "ok": ok,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"ok": ok, "trials": sorted(recs),
                      "best_trial": global_best, "skipped": skipped}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
