"""JAX InceptionV3 FID extractor: architecture, conversion, and torch parity.

Parity target: the torchmetrics/pytorch-fid InceptionV3
(ref:src/v2/utils.py:155-175).  Real weights cannot be downloaded here
(zero-egress), so the cross-framework check runs the clean-room torch
functional mirror (scripts/port_inception.py) against the JAX forward with
random weights in torchvision's exact state_dict schema — the identical code
path verifies real weights when they exist (port_inception.py main).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu.models import inception as I


def test_conv_specs_complete_and_consistent():
    specs = I.conv_specs()
    names = [s[0] for s in specs]
    assert len(names) == len(set(names)) == 94
    # concat widths must chain: each Mixed block's input channels == the
    # declared c_in of its branch1x1/first conv.
    blocks = {"Mixed_5b": 192, "Mixed_5c": 256, "Mixed_5d": 288, "Mixed_6a": 288,
              "Mixed_6b": 768, "Mixed_6c": 768, "Mixed_6d": 768, "Mixed_6e": 768,
              "Mixed_7a": 768, "Mixed_7b": 1280, "Mixed_7c": 2048}
    for name, c_in, c_out, kh, kw in specs:
        block = name.split(".")[0]
        if block in blocks and name.endswith(("branch1x1", "_1")) and ".branch" in name:
            assert c_in == blocks[block], name


def test_convert_rejects_wrong_shapes():
    sd = I.random_torch_state_dict(0)
    sd["Conv2d_1a_3x3.conv.weight"] = sd["Conv2d_1a_3x3.conv.weight"][:, :2]
    with pytest.raises(ValueError):
        I.convert_torch_state_dict(sd)


def test_params_npz_roundtrip(tmp_path):
    params = I.convert_torch_state_dict(I.random_torch_state_dict(1))
    path = str(tmp_path / "w.npz")
    I.save_params(path, params)
    loaded = I.load_params(path)
    assert set(loaded) == set(params)
    for name in params:
        np.testing.assert_array_equal(params[name]["w"], loaded[name]["w"])
        np.testing.assert_array_equal(params[name]["b"], loaded[name]["b"])


def test_feature_shape_and_determinism():
    params = I.convert_torch_state_dict(I.random_torch_state_dict(0))
    imgs = np.random.default_rng(0).integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    f = jax.jit(lambda p, x: I.inception_features(p, x, resize_to=75))
    a = np.asarray(f(params, jnp.asarray(imgs)))
    b = np.asarray(f(params, jnp.asarray(imgs)))
    assert a.shape == (2, I.FEATURE_DIM)
    assert a.dtype == np.float32
    np.testing.assert_array_equal(a, b)


def test_torch_parity_random_weights():
    """Cross-framework parity at resize 75 (covers every layer type AND the
    17x17 strided-conv XLA-bug site) — same check port_inception.py runs at
    299 with real weights."""
    torch = pytest.importorskip("torch")  # noqa: F841
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.port_inception import torch_inception_features

    sd = I.random_torch_state_dict(0)
    params = I.convert_torch_state_dict(sd)
    imgs = np.random.default_rng(3).integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    ref = torch_inception_features(sd, imgs, resize_to=75)
    ours = np.asarray(jax.jit(
        lambda p, x: I.inception_features(p, x, resize_to=75)
    )(params, jnp.asarray(imgs)))
    err = float(np.abs(ref - ours).max())
    scale = float(np.abs(ref).max())
    assert err <= 1e-3 * max(scale, 1.0), f"parity err {err} (scale {scale})"


@pytest.mark.slow
def test_extractor_plugs_into_fid(tmp_path, monkeypatch):
    from vitgan_tpu.train import fid as FID

    params = I.convert_torch_state_dict(I.random_torch_state_dict(2))
    path = str(tmp_path / "fid_inception.npz")
    I.save_params(path, params)
    monkeypatch.setenv("INCEPTION_WEIGHTS", path)
    assert FID.inception_weights_path() == path
    ex = FID.make_feature_extractor("inception_jax")
    assert ex.feature_dim == I.FEATURE_DIM
    rng = np.random.default_rng(0)
    real = rng.integers(0, 256, (3, 8, 32, 32, 3), dtype=np.uint8)

    def sample_batch(key, n):
        return jax.random.uniform(key, (n, 32, 32, 3), minval=-1, maxval=1)

    score = FID.compute_fid(sample_batch, iter(real), ex,
                            jax.random.PRNGKey(0), num_samples=24, batch_size=8)
    assert np.isfinite(score) and score >= 0.0


def test_weightless_auto_falls_back(monkeypatch):
    from vitgan_tpu.train import fid as FID

    monkeypatch.delenv("INCEPTION_WEIGHTS", raising=False)
    monkeypatch.setenv("SCRATCH", "/tmp/definitely_no_weights_here")
    ex = FID.make_feature_extractor("auto")
    assert hasattr(ex, "jax_feature_fn")  # random_conv proxy
    assert ex.feature_dim == 512
