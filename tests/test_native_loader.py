"""Native C++ loader: build, parity with the NumPy path, flips, threading."""

import numpy as np
import pytest

from vitgan_tpu.data.pipeline import normalize_to_unit

native = pytest.importorskip("vitgan_tpu.data.native")


@pytest.fixture(scope="module")
def batcher():
    try:
        return native.NativeBatcher(num_threads=2)
    except Exception as e:  # toolchain unavailable
        pytest.skip(f"native build unavailable: {e}")


def test_gather_normalize_matches_numpy(batcher):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(50, 8, 6, 3), dtype=np.uint8)
    idx = rng.permutation(50)[:16]
    got = batcher.gather_normalize(images, idx)
    want = normalize_to_unit(images[idx])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_gather_normalize_flip(batcher):
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, size=(10, 4, 5, 3), dtype=np.uint8)
    idx = np.arange(10)
    flip = np.zeros(10, np.uint8)
    flip[::2] = 1
    got = batcher.gather_normalize(images, idx, flip)
    want = normalize_to_unit(images.copy())
    want[::2] = want[::2, :, ::-1, :]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gather_normalize_rejects_out_of_range_indices(batcher):
    """The C side can't bounds-check (it never sees N); the binding must raise
    like NumPy fancy indexing instead of reading out-of-bounds memory."""
    images = np.zeros((4, 2, 2, 1), np.uint8)
    with pytest.raises(IndexError):
        batcher.gather_normalize(images, np.array([0, 4]))
    with pytest.raises(IndexError):
        batcher.gather_normalize(images, np.array([-1, 1]))


def test_single_thread_path(batcher):
    images = np.arange(2 * 2 * 2 * 1, dtype=np.uint8).reshape(2, 2, 2, 1)
    b1 = native.NativeBatcher(num_threads=1)
    got = b1.gather_normalize(images, np.array([1, 0]))
    want = normalize_to_unit(images[[1, 0]])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pipeline_uses_native(batcher):
    from vitgan_tpu.data.pipeline import HostDataPipeline

    rng = np.random.default_rng(2)
    images = rng.integers(0, 256, size=(64, 8, 8, 3), dtype=np.uint8)
    labels = np.zeros(64, np.int32)
    p = HostDataPipeline(images, labels, batch_size=32, shuffle=False)
    assert p._native is not None
    x, _ = next(iter(p.epoch()))
    np.testing.assert_allclose(np.asarray(x), normalize_to_unit(images[:32]), rtol=1e-6)
