"""Host data pipeline: decode/augment on host, prefetch device-resident batches.

Replaces the torch DataLoader (ref:src/v1/utils.py:107-112, ref:src/v2/utils.py:99-121)
with a TPU-idiomatic design:

- the whole (small) dataset lives in host RAM as uint8; per-batch work is
  normalize-to-[-1,1] + optional flip augment, vectorized NumPy (or the native
  C++ loader when built — see vitgan_tpu/data/native.py);
- shuffle is a per-epoch permutation from a seeded Generator (deterministic
  resume), drop_last semantics as in the reference;
- batches are ``jax.device_put`` with the batch axis sharded over the mesh's
  data axis, one batch ahead of compute (double-buffered prefetch thread).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

from vitgan_tpu.config import DataConfig
from vitgan_tpu.data.datasets import load_dataset
from vitgan_tpu.parallel.mesh import batch_sharding


def normalize_to_unit(batch_u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1,1] (Normalize(±0.5) parity, ref:src/v1/utils.py:128-131)."""
    return batch_u8.astype(np.float32) * (2.0 / 255.0) - 1.0


def denormalize(batch: np.ndarray) -> np.ndarray:
    """[-1,1] -> uint8 (ref:src/v1/utils.py:76-82 denormalize intent)."""
    return np.clip(np.rint((np.asarray(batch, np.float32) + 1.0) * 127.5), 0, 255).astype(np.uint8)


class HostDataPipeline:
    """Epoch-based batch iterator with device prefetch."""

    def __init__(
        self,
        images_u8: np.ndarray,
        labels: np.ndarray,
        batch_size: int,
        mesh=None,
        shuffle: bool = True,
        drop_last: bool = True,
        augment_flip: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        if images_u8.ndim != 4:
            raise ValueError("expect (N,H,W,C) uint8 images")
        self.images = images_u8
        self.labels = labels
        self.batch_size = batch_size
        self.mesh = mesh
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.augment_flip = augment_flip
        self.prefetch = max(1, prefetch)
        # Multi-host: every process computes the SAME epoch permutation (seeded
        # host-count-agnostically) and takes its contiguous slice of each global
        # batch, so the global batch is disjoint across hosts (SURVEY §5.8).
        self.process_index = process_index if process_index is not None else jax.process_index()
        self.process_count = process_count if process_count is not None else jax.process_count()
        if self.process_count > 1 and batch_size % self.process_count != 0:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"process count {self.process_count}")
        self._rng = np.random.default_rng(seed)
        self._native = None
        try:  # optional C++ fast path
            from vitgan_tpu.data.native import NativeBatcher

            self._native = NativeBatcher()
        except Exception:
            self._native = None

    def __len__(self) -> int:
        n = len(self.images) // self.batch_size
        if (self.process_count == 1 and not self.drop_last
                and len(self.images) % self.batch_size):
            n += 1  # multi-host always drops the partial batch (see epoch())
        return n

    @property
    def num_samples(self) -> int:
        return len(self.images)

    def _epoch_order(self) -> np.ndarray:
        idx = np.arange(len(self.images))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def _make_batch(self, idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        if self._native is not None:
            flip_bits = (
                self._rng.integers(0, 2, size=len(idx)).astype(np.uint8)
                if self.augment_flip
                else None
            )
            x = self._native.gather_normalize(self.images, idx.astype(np.int64), flip_bits)
        else:
            x = normalize_to_unit(self.images[idx])
            if self.augment_flip:
                flip = self._rng.integers(0, 2, size=len(idx)).astype(bool)
                x[flip] = x[flip, :, ::-1, :]
        return x, self.labels[idx]

    def _device_put(self, batch):
        if self.mesh is None:
            return jax.tree.map(jax.device_put, batch)
        # make_array_from_process_local_data assembles the GLOBAL sharded array
        # from each process's local slice — the correct multi-host incantation
        # (plain device_put of a local slice would mis-shard across hosts).
        # With one process it is exactly device_put-with-sharding, so the
        # multi-host code path is the one every single-host run exercises too.
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                batch_sharding(self.mesh, ndim=a.ndim), np.asarray(a)),
            batch,
        )

    def epoch(self) -> Iterator[Tuple[jax.Array, jax.Array]]:
        """One pass over the data with background host->device prefetch."""
        order = self._epoch_order()
        n_full = len(self.images) // self.batch_size
        slices = [order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(n_full)]
        if not self.drop_last and len(self.images) % self.batch_size:
            slices.append(order[n_full * self.batch_size :])
        if self.process_count > 1:
            # Multi-host slicing requires every host to contribute an equal
            # local slice of a FULL global batch, so the trailing partial
            # batch is always dropped here (regardless of drop_last, whose
            # single-host meaning can't be honored across hosts) — and
            # __len__ counts the same full batches, so step counts agree.
            local = self.batch_size // self.process_count
            lo = self.process_index * local
            slices = [sl[lo : lo + local] for sl in slices if len(sl) == self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        failure: list = []

        def producer():
            try:
                for sl in slices:
                    if stop.is_set():
                        return
                    q.put(self._device_put(self._make_batch(sl)))
            except BaseException as e:  # surfaced in the consumer, not stderr
                failure.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
            if failure:
                # A dead producer must fail the epoch loudly — the silent
                # alternative is training on a truncated epoch.
                raise RuntimeError("data pipeline producer failed") from failure[0]
        finally:
            stop.set()
            # Drain so the producer never blocks forever on put().
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    t.join(timeout=0.1)
            t.join()


def make_pipeline(
    cfg: DataConfig,
    batch_size: int,
    image_size: int = 32,
    channels: int = 3,
    mesh=None,
    train: bool = True,
    seed: int = 0,
    synthetic_samples: int = 2048,
) -> HostDataPipeline:
    """Pipeline factory (role of ref:src/v1/utils.py:107 get_dataloader)."""
    images, labels = load_dataset(
        cfg.dataset,
        root=cfg.data_dir,
        train=train,
        image_size=image_size,
        channels=channels,
        synthetic_samples=synthetic_samples,
        seed=seed,
    )
    return HostDataPipeline(
        images,
        labels,
        batch_size=batch_size,
        mesh=mesh,
        shuffle=cfg.shuffle,
        drop_last=cfg.drop_last,
        augment_flip=cfg.augment_flip,
        seed=seed,
        prefetch=cfg.prefetch,
    )
