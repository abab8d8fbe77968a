"""Host-side dataset sources.

The reference pulls CIFAR-10 via torchvision into ``$SCRATCH/data/<name>``
(ref:src/v1/utils.py:115-132, ref:src/v2/utils.py:99-121).  This rebuild decodes
the raw on-disk formats directly (no torch in the data path) and adds a
deterministic synthetic source so every pipeline/test/bench path runs in a
zero-egress environment.

All sources return ``(images_u8, labels)``: images as (N, H, W, C) uint8 in
channel-last layout (TPU-friendly NHWC), labels int32.
"""

from __future__ import annotations

import os
import pickle
import tarfile
from typing import Optional, Tuple

import numpy as np

from vitgan_tpu.utils.run_dirs import data_dir as default_data_dir


def load_cifar10(root: str, train: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Decode the standard ``cifar-10-batches-py`` pickle batches.

    Accepts either an extracted directory or the ``cifar-10-python.tar.gz``
    archive sitting in ``root``.
    """
    batch_dir = _find_cifar_dir(root)
    names = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    images, labels = [], []
    for name in names:
        with open(os.path.join(batch_dir, name), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        images.append(np.asarray(d[b"data"], np.uint8))
        labels.append(np.asarray(d[b"labels"], np.int64))
    x = np.concatenate(images).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    y = np.concatenate(labels).astype(np.int32)
    return np.ascontiguousarray(x), y


def _find_cifar_dir(root: str) -> str:
    for cand in (root, os.path.join(root, "cifar-10-batches-py")):
        if os.path.isfile(os.path.join(cand, "data_batch_1")):
            return cand
    tar = os.path.join(root, "cifar-10-python.tar.gz")
    if os.path.isfile(tar):
        with tarfile.open(tar) as tf:
            tf.extractall(root)
        return os.path.join(root, "cifar-10-batches-py")
    raise FileNotFoundError(
        f"CIFAR-10 not found under {root}; place cifar-10-batches-py/ or "
        "cifar-10-python.tar.gz there (no network egress available)."
    )


def load_mnist(root: str, train: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Decode raw IDX MNIST files (images replicated to 3 channels, 32x32 padded)."""
    import gzip
    import struct

    prefix = "train" if train else "t10k"

    def _open(path):
        return gzip.open(path, "rb") if path.endswith(".gz") else open(path, "rb")

    def _find(kind):
        for suffix in ("", ".gz"):
            p = os.path.join(root, f"{prefix}-{kind}-idx{3 if kind=='images' else 1}-ubyte{suffix}")
            if os.path.isfile(p):
                return p
        raise FileNotFoundError(f"MNIST {prefix}-{kind} not found under {root}")

    with _open(_find("images")) as f:
        _, n, h, w = struct.unpack(">IIII", f.read(16))
        x = np.frombuffer(f.read(), np.uint8).reshape(n, h, w)
    with _open(_find("labels")) as f:
        f.read(8)
        y = np.frombuffer(f.read(), np.uint8).astype(np.int32)
    # Pad 28->32 and replicate channels so the GAN models see a uniform shape.
    x = np.pad(x, ((0, 0), (2, 2), (2, 2)))
    x = np.repeat(x[..., None], 3, axis=-1)
    return np.ascontiguousarray(x), y


def synthetic_dataset(
    num_samples: int = 2048,
    image_size: int = 32,
    channels: int = 3,
    num_classes: int = 10,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic structured images: per-class mixtures of 2-D Gabor-like waves.

    Not noise — each class has a characteristic orientation/frequency so FID and
    discriminator accuracy remain meaningful in zero-egress environments.
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32) / image_size
    labels = rng.integers(0, num_classes, size=num_samples).astype(np.int32)
    imgs = np.empty((num_samples, image_size, image_size, channels), np.float32)
    class_theta = np.linspace(0.0, np.pi, num_classes, endpoint=False)
    for i in range(num_samples):
        theta = class_theta[labels[i]] + rng.normal(0, 0.08)
        freq = 3.0 + labels[i] * 0.7 + rng.normal(0, 0.2)
        phase = rng.uniform(0, 2 * np.pi)
        cx, cy = rng.uniform(0.25, 0.75, 2)
        wave = np.sin(2 * np.pi * freq * (xx * np.cos(theta) + yy * np.sin(theta)) + phase)
        envelope = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / 0.08))
        base = 0.5 + 0.5 * wave * envelope
        tint = rng.uniform(0.4, 1.0, channels)
        imgs[i] = base[..., None] * tint
    return (imgs * 255).clip(0, 255).astype(np.uint8), labels


def load_dataset(
    name: str,
    root: Optional[str] = None,
    train: bool = True,
    image_size: int = 32,
    channels: int = 3,
    synthetic_samples: int = 2048,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dataset factory (role of ref:src/v1/utils.py:115-124's get_dataset)."""
    name = name.lower()
    if name == "synthetic":
        return synthetic_dataset(synthetic_samples, image_size, channels, seed=seed)
    root = root or default_data_dir(name)
    if name == "cifar10":
        x, y = load_cifar10(root, train)
    elif name == "mnist":
        x, y = load_mnist(root, train)
    else:
        raise ValueError(f"unknown dataset {name!r}")
    if x.shape[1] != image_size or x.shape[2] != image_size:
        # Resize(shorter side) -> CenterCrop, the reference's transform chain
        # (ref:src/v1/utils.py:124-131) — enables 64px/128px/256px configs on
        # real datasets, not just synthetic.
        from vitgan_tpu.data.transforms import reference_transforms

        x = reference_transforms(x, image_size)
    return x, y
