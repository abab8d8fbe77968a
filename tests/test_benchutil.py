"""utils.benchutil: preset resolution and the shared scanned-path harness."""

import pytest

from vitgan_tpu import config as C
from vitgan_tpu.utils import benchutil as B


def test_build_preset_cfg_families():
    for fam in ("v1", "v2", "dcgan", "cnn", "mlp"):
        cfg = B.build_preset_cfg(fam)
        assert cfg.family == fam and cfg.data.dataset == "synthetic"


def test_build_preset_cfg_scaling_presets():
    assert B.build_preset_cfg("deit64").v2.image_size == 64
    assert B.build_preset_cfg("hires128").v2.image_size == 128
    assert B.build_preset_cfg("hires256").v2.image_size == 256
    with pytest.raises(KeyError):
        B.build_preset_cfg("nope")


@pytest.mark.slow
def test_measure_scanned_train_smoke():
    cfg = C.smoke_config("mlp")
    ips = B.measure_scanned_train(cfg, scan_steps=2, iters=1, dataset_images=32)
    assert ips > 0


@pytest.mark.slow
def test_warmup_compile_keeps_output_dir_clean(tmp_path, monkeypatch):
    """Regression: warmup built its Trainer under $SCRATCH/output, so every
    warmup left a junk timestamped run dir that latest_run() would resolve."""
    monkeypatch.setenv("SCRATCH", str(tmp_path))
    secs = B.warmup_compile(C.smoke_config("mlp"))
    assert secs >= 0
    assert not (tmp_path / "output").exists()
    assert any((tmp_path / "warmup").iterdir())


@pytest.mark.slow
def test_xla_step_gflops_smoke():
    import jax

    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state

    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    g = B.xla_step_gflops(cfg, gan, state)
    assert g is None or g > 0
