"""Entry-point wrappers run end to end in DEV mode (subprocess, CPU), including
the zero-egress CIFAR fallback."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script_args, tmp_path, extra_env=None):
    env = dict(os.environ)
    env.update({
        "DEV": "1", "SCRATCH": str(tmp_path), "JAX_PLATFORMS": "cpu",
        # single virtual device: fastest compile for the smoke subprocesses
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    env.update(extra_env or {})
    return subprocess.run([sys.executable, *script_args], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=1200)


@pytest.mark.parametrize("script,extra", [
    ("main_v2.py", ["--epochs", "1", "--set", "run.steps_per_epoch=2",
                    "--set", "run.fid_num_samples=16", "--run-name", "wv2"]),
    ("idc.py", ["--epochs", "1", "--set", "run.steps_per_epoch=2",
                "--set", "run.fid_num_samples=16", "--run-name", "widc"]),
])
@pytest.mark.slow
def test_wrapper_runs_with_cifar_fallback(tmp_path, script, extra):
    """Wrappers request cifar10; with no data on disk they must fall back to
    synthetic and complete a smoke run."""
    r = _run([script, *extra], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "falling back to the synthetic dataset" in r.stderr
    run_dirs = os.listdir(os.path.join(str(tmp_path), "output"))
    assert any(d in ("wv2", "widc") for d in run_dirs)


@pytest.mark.slow
def test_generate_wrapper(tmp_path):
    r = _run(["main_v2.py", "--epochs", "1", "--dataset", "synthetic",
              "--set", "run.steps_per_epoch=2", "--set", "run.fid_num_samples=16",
              "--run-name", "genrun"], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    run_dir = os.path.join(str(tmp_path), "output", "genrun")
    r2 = _run(["test_generation.py", "--family", "v2", "--run-dir", run_dir,
               "--num-images", "4"], tmp_path)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert os.path.exists(os.path.join(run_dir, "test", "generated_images.png"))
