"""Test bootstrap: force an 8-device virtual CPU platform BEFORE jax imports.

This makes DP/mesh logic testable without TPUs (SURVEY §4 implication), per the
standard ``xla_force_host_platform_device_count`` trick.
"""

import os
import sys

# RUN_TPU_TESTS=1 selects the on-chip lane (tests/test_tpu_onchip.py, run it
# alone): the real accelerator stays registered and nothing is CPU-forced.
ON_CHIP = os.environ.get("RUN_TPU_TESTS", "") == "1"

if not ON_CHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env presets JAX_PLATFORMS=axon (TPU)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Keep artifact writes inside the workspace during tests.
os.environ.setdefault("SCRATCH", "/tmp/vitgan_tpu_test_scratch")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not ON_CHIP:
    # The image's .axon_site customization force-registers the TPU platform and
    # overrides JAX_PLATFORMS; the config update below wins after import.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: repeat suite runs skip XLA compilation.
os.makedirs("/tmp/vitgan_tpu_test_scratch/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/vitgan_tpu_test_scratch/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from vitgan_tpu.parallel import make_mesh
    from vitgan_tpu.config import MeshConfig

    return make_mesh(MeshConfig())


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True)
def _isolate_kernel_policy():
    """Global kernel policy must not leak between tests: DEV-mode configs set
    runtime.use_pallas='never' and any CLI/trainer test applies that to the
    process-wide _POLICY via apply_from_runtime, silently disabling kernel
    routing for every later test in the session (caught as an
    order-dependent test_megablock_auto_gate failure)."""
    from vitgan_tpu.ops import policy

    saved = dict(policy._POLICY)
    saved_sp = dict(policy._SP)
    yield
    policy._POLICY.clear()
    policy._POLICY.update(saved)
    policy._SP.clear()
    policy._SP.update(saved_sp)
