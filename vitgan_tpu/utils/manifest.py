"""Run-dir environment manifest: what produced this run, for forensics.

The reference records nothing about its environment; debugging a months-old
checkpoint means guessing the torch/CUDA versions.  Here every run dir gets
an ``env.json`` next to ``config.json``: library versions, backend + device
kind, mesh-relevant process topology, and the framework's git revision when
available.  Read it before comparing numbers across runs — a backend or
version skew explains more "regressions" than code does.
"""

from __future__ import annotations

import json
import os
import platform
import subprocess
import sys
from typing import Any, Dict


def collect_env() -> Dict[str, Any]:
    import jax

    info: Dict[str, Any] = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
    try:
        info["device_kind"] = jax.devices()[0].device_kind
    except Exception:  # no device answering (doctor covers diagnosis)
        info["device_kind"] = None
    try:
        import flax

        info["flax_version"] = flax.__version__
    except Exception:
        pass
    try:
        import optax

        info["optax_version"] = optax.__version__
    except Exception:
        pass
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        # Only trust the hash when the repo's TOPLEVEL is the framework
        # checkout itself: a pip-installed package inside someone else's git
        # repo would otherwise record THEIR unrelated HEAD as code_revision.
        top = subprocess.run(
            ["git", "-C", repo, "rev-parse", "--show-toplevel"],
            capture_output=True, text=True, timeout=5, check=True,
        ).stdout.strip()
        if os.path.realpath(top) != os.path.realpath(repo):
            raise ValueError("enclosing git repo is not the framework checkout")
        info["code_revision"] = subprocess.run(
            ["git", "-C", repo, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5, check=True,
        ).stdout.strip()
    except Exception:  # not a git checkout (installed package) — fine
        info["code_revision"] = None
    return info


def write_env_manifest(path: str) -> Dict[str, Any]:
    """Write ``collect_env()`` to ``path`` (best-effort) and return it."""
    info = collect_env()
    try:
        with open(path, "w") as f:
            json.dump(info, f, indent=2, sort_keys=True)
    except OSError:
        pass  # a read-only run dir must not kill training over a manifest
    return info
