"""MNIST IDX decoding and float32 compute-path coverage."""

import gzip
import struct

import jax
import numpy as np

from vitgan_tpu import config as C
from vitgan_tpu.data.datasets import load_mnist
import pytest


def _write_idx(tmp_path, n=10, gzipped=True):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (n, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, (n,), dtype=np.uint8)
    opener = gzip.open if gzipped else open
    suffix = ".gz" if gzipped else ""
    with opener(str(tmp_path / f"train-images-idx3-ubyte{suffix}"), "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, 28, 28))
        f.write(images.tobytes())
    with opener(str(tmp_path / f"train-labels-idx1-ubyte{suffix}"), "wb") as f:
        f.write(struct.pack(">II", 2049, n))
        f.write(labels.tobytes())
    return images, labels


def test_load_mnist_gz(tmp_path):
    images, labels = _write_idx(tmp_path, gzipped=True)
    x, y = load_mnist(str(tmp_path), train=True)
    assert x.shape == (10, 32, 32, 3)  # padded to 32, replicated channels
    np.testing.assert_array_equal(y, labels)
    np.testing.assert_array_equal(x[:, 2:30, 2:30, 0], images)
    np.testing.assert_array_equal(x[:, 2:30, 2:30, 0], x[:, 2:30, 2:30, 2])
    assert (x[:, :2] == 0).all()


def test_load_mnist_plain(tmp_path):
    _write_idx(tmp_path, gzipped=False)
    x, y = load_mnist(str(tmp_path), train=True)
    assert x.shape == (10, 32, 32, 3)


@pytest.mark.slow
def test_float32_compute_path(rng):
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state, make_train_step

    cfg = C.replace(C.smoke_config("mlp"), **{"runtime.compute_dtype": "float32"})
    gan = build_gan(cfg)
    state = create_train_state(rng, gan, cfg)
    step = make_train_step(gan, cfg, donate=False)
    real = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)) * 2 - 1
    _, m = step(state, real)
    assert np.isfinite(float(m["d_loss"]))
