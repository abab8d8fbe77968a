"""Re-measure ONE family row of BENCH_SUITE.json in place.

The full suite (scripts/bench_suite.py) takes ~20 min over the tunnel because
of the hires compiles; after a targeted optimization lands (e.g. the deit64
saved-backward megablock) only its row is stale.  Usage:

    python scripts/refresh_suite_row.py deit64

Re-runs bench_family for that one config with the same harness/timing and
rewrites its entry, leaving every other row untouched.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_suite import bench_family  # noqa: E402  (same dir at runtime)

from vitgan_tpu import config as C  # noqa: E402

CASES = {
    "v2": lambda: ("v2", C.ExperimentConfig(
        family="v2", data=C.DataConfig(dataset="synthetic")),
        {"scan_steps": 64, "iters": 8}),
    "deit64": lambda: ("deit64", C.deit64_config(),
                       {"scan_steps": 8, "iters": 3}),
    "hires128": lambda: ("hires128", C.highres_config(128),
                         {"scan_steps": 2, "iters": 2, "single_iters": 3}),
    "hires256": lambda: ("hires256", C.highres_config(256),
                         {"scan_steps": 2, "iters": 2, "single_iters": 3}),
}


def main():
    which = sys.argv[1]
    name, cfg, kw = CASES[which]()
    rec = bench_family(name, cfg, **kw)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SUITE.json")
    with open(path) as f:
        suite = json.load(f)
    suite["results"] = [rec if r["family"] == name else r
                        for r in suite["results"]]
    with open(path, "w") as f:
        json.dump(suite, f, indent=2)


if __name__ == "__main__":
    main()
