"""Axon-tunnel wedge guard: run a command, kill-and-retry if its process
TREE stops making CPU progress.

The failure mode (4 occurrences in the round-5 night queue): a JAX client
connecting to the tunneled TPU shortly after a previous client exits can
hang inside backend init / the first compile RPC — near-zero CPU, no
output, forever.  The only observed recovery is killing the wedged client
by PID; the next client (sometimes after a delay) connects fine.  Plain
`timeout` burns the full budget per wedge; this guard detects the wedge in
minutes by watching aggregate utime+stime over the whole process tree
(harness scripts idle while their grandchild trains, so the TREE total is
the right signal: training/compile burns >=10% CPU continuously, a wedge
~0) and retries with a settle delay.

Usage: python scripts/wedge_guard.py [--attempts N] [--stall-s S] -- cmd...
Exit code: the command's, or 124 if every attempt wedged.
"""

import argparse
import os
import signal
import subprocess
import sys
import time

TICK = int(os.sysconf("SC_CLK_TCK"))


def tree_cpu_seconds(root_pid: int) -> float:
    """Sum utime+stime (seconds) over root_pid and all its descendants."""
    children = {}
    stats = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid = int(parts[1])
            cpu = (int(parts[11]) + int(parts[12])) / TICK
        except (OSError, IndexError, ValueError):
            continue
        children.setdefault(ppid, []).append(int(pid))
        stats[int(pid)] = cpu
    total, stack = 0.0, [root_pid]
    while stack:
        p = stack.pop()
        total += stats.get(p, 0.0)
        stack.extend(children.get(p, []))
    return total


def kill_tree(root_pid: int, sig: int) -> None:
    """Signal root_pid's whole tree, leaves first (PIDs enumerated from
    /proc PPIDs — no name patterns anywhere)."""
    children = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                ppid = int(f.read().rsplit(")", 1)[1].split()[1])
        except (OSError, IndexError, ValueError):
            continue
        children.setdefault(ppid, []).append(int(pid))
    order, stack = [], [root_pid]
    while stack:
        p = stack.pop()
        order.append(p)
        stack.extend(children.get(p, []))
    for p in reversed(order):
        try:
            os.kill(p, sig)
        except ProcessLookupError:
            pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("--stall-s", type=float, default=180.0,
                    help="kill if tree CPU advances < --min-cpu-s over this window")
    ap.add_argument("--min-cpu-s", type=float, default=3.0)
    ap.add_argument("--settle-s", type=float, default=60.0,
                    help="delay before a retry (lets the tunnel settle)")
    ap.add_argument("--poll-s", type=float, default=20.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        print("wedge_guard: no command", file=sys.stderr)
        return 2

    for attempt in range(args.attempts):
        proc = subprocess.Popen(cmd)
        window_start = time.time()
        cpu_at_window = tree_cpu_seconds(proc.pid)
        wedged = False
        while True:
            try:
                rc = proc.wait(timeout=args.poll_s)
                return rc
            except subprocess.TimeoutExpired:
                pass
            now = time.time()
            if now - window_start >= args.stall_s:
                cpu = tree_cpu_seconds(proc.pid)
                delta = cpu - cpu_at_window
                if delta < 0:
                    # A child exited and took its accumulated CPU out of the
                    # tree sum — that is activity, not a wedge (the negative
                    # delta false-killed the round-5 families harness right
                    # as it moved from one family to the next).
                    window_start, cpu_at_window = now, cpu
                    continue
                if delta < args.min_cpu_s:
                    print(f"wedge_guard: tree CPU advanced "
                          f"{cpu - cpu_at_window:.1f}s in {args.stall_s:.0f}s "
                          f"— wedged; killing (attempt {attempt + 1}/"
                          f"{args.attempts})", file=sys.stderr, flush=True)
                    wedged = True
                    kill_tree(proc.pid, signal.SIGKILL)
                    proc.wait()
                    break
                window_start, cpu_at_window = now, cpu
        if not wedged:
            break
        time.sleep(args.settle_s)
    print("wedge_guard: every attempt wedged", file=sys.stderr)
    return 124


if __name__ == "__main__":
    sys.exit(main())
