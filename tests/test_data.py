"""Data pipeline tests: synthetic source, normalization, shuffling, sharded prefetch."""

import numpy as np
import pytest

from vitgan_tpu.config import DataConfig
from vitgan_tpu.data import make_pipeline, synthetic_dataset
from vitgan_tpu.data.pipeline import HostDataPipeline, denormalize, normalize_to_unit


def test_synthetic_deterministic():
    x1, y1 = synthetic_dataset(64, 32, 3, seed=7)
    x2, y2 = synthetic_dataset(64, 32, 3, seed=7)
    assert x1.shape == (64, 32, 32, 3) and x1.dtype == np.uint8
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    x3, _ = synthetic_dataset(64, 32, 3, seed=8)
    assert not np.array_equal(x1, x3)


def test_normalize_roundtrip():
    u8 = np.arange(0, 256, dtype=np.uint8).reshape(1, 16, 16, 1)
    x = normalize_to_unit(u8)
    assert x.min() >= -1.0 and x.max() <= 1.0
    np.testing.assert_array_equal(denormalize(x), u8)


def test_pipeline_epoch_drop_last(mesh8):
    imgs, labels = synthetic_dataset(100, 32, 3)
    p = HostDataPipeline(imgs, labels, batch_size=16, mesh=mesh8, seed=0)
    batches = list(p.epoch())
    assert len(batches) == len(p) == 6  # 100 // 16, drop_last
    x, y = batches[0]
    assert x.shape == (16, 32, 32, 3) and x.dtype == np.float32
    assert y.shape == (16,)
    # batch axis sharded over the 8-device data axis
    assert x.addressable_shards[0].data.shape[0] == 2


def test_pipeline_producer_failure_is_loud():
    """A producer-thread exception must fail the epoch, not truncate it."""
    imgs, labels = synthetic_dataset(64, 32, 3)
    p = HostDataPipeline(imgs, labels, batch_size=16, seed=0)

    boom = RuntimeError("decode failed")

    def bad_make_batch(idx):
        raise boom

    p._make_batch = bad_make_batch
    with pytest.raises(RuntimeError, match="producer failed") as exc:
        list(p.epoch())
    assert exc.value.__cause__ is boom


def test_pipeline_multihost_len_matches_epoch():
    """Multi-host always drops the partial batch; __len__ must agree."""
    imgs, labels = synthetic_dataset(100, 32, 3)
    p = HostDataPipeline(imgs, labels, batch_size=16, drop_last=False,
                         process_index=0, process_count=2, seed=0)
    batches = list(p.epoch())
    assert len(batches) == len(p) == 6  # partial 4-image batch dropped
    assert all(x.shape[0] == 8 for x, _ in batches)  # local slice = 16/2


def test_pipeline_shuffles_between_epochs():
    imgs, labels = synthetic_dataset(64, 8, 3)
    p = HostDataPipeline(imgs, labels, batch_size=64, mesh=None, seed=0)
    (x1, y1) = next(iter(p.epoch()))
    (x2, y2) = next(iter(p.epoch()))
    assert not np.array_equal(np.asarray(y1), np.asarray(y2))
    # same underlying multiset of labels
    np.testing.assert_array_equal(np.sort(np.asarray(y1)), np.sort(np.asarray(y2)))


def test_pipeline_flip_augment():
    imgs, labels = synthetic_dataset(32, 8, 3, seed=1)
    p = HostDataPipeline(imgs, labels, batch_size=32, shuffle=False, augment_flip=True, seed=3)
    x, _ = next(iter(p.epoch()))
    base = normalize_to_unit(imgs)
    x = np.asarray(x)
    flipped = matched = 0
    for i in range(32):
        if np.array_equal(x[i], base[i]):
            matched += 1
        elif np.array_equal(x[i], base[i, :, ::-1, :]):
            flipped += 1
    assert matched + flipped == 32 and flipped > 0 and matched > 0


def test_make_pipeline_factory(mesh8):
    cfg = DataConfig(dataset="synthetic")
    p = make_pipeline(cfg, batch_size=8, mesh=mesh8, synthetic_samples=64)
    assert p.num_samples == 64
    x, y = next(iter(p.epoch()))
    assert x.shape == (8, 32, 32, 3)


def test_cifar10_missing_raises(tmp_path):
    from vitgan_tpu.data.datasets import load_cifar10

    with pytest.raises(FileNotFoundError):
        load_cifar10(str(tmp_path))


def test_cifar10_decode_from_fake_batches(tmp_path):
    """Write pickle batches in the on-disk CIFAR format and decode them."""
    import pickle

    rng = np.random.default_rng(0)
    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    for i in range(1, 6):
        data = rng.integers(0, 256, size=(20, 3072), dtype=np.uint8)
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": list(range(20))}, f)
    from vitgan_tpu.data.datasets import load_cifar10

    x, y = load_cifar10(str(tmp_path))
    assert x.shape == (100, 32, 32, 3) and y.shape == (100,)
