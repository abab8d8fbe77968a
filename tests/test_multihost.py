"""Multi-host data-loading semantics, simulated in one process.

Real multi-process runs aren't possible on this box; these tests pin down the
contract instead: per-process slices of each global batch are disjoint,
contiguous, equal-sized, and concatenate (in process order) to exactly the
single-process batch.  The device-put path itself
(jax.make_array_from_process_local_data) is the same call single-host runs
exercise through every pipeline test.
"""

import numpy as np
import pytest

from vitgan_tpu.data.pipeline import HostDataPipeline
from vitgan_tpu.parallel.mesh import local_batch_size, make_mesh
from vitgan_tpu.config import MeshConfig


def _images(n=64):
    rng = np.random.default_rng(0)
    return (rng.integers(0, 256, (n, 8, 8, 3), dtype=np.uint8),
            rng.integers(0, 10, n).astype(np.int32))


def _pipeline(pi, pc, batch=16, **kw):
    x, y = _images()
    return HostDataPipeline(x, y, batch_size=batch, mesh=None, shuffle=True,
                            augment_flip=False, seed=7, process_index=pi,
                            process_count=pc, **kw)


def test_process_slices_partition_the_global_batch():
    whole = [np.asarray(b) for b, _ in _pipeline(0, 1).epoch()]
    parts = []
    for pi in range(2):
        parts.append([np.asarray(b) for b, _ in _pipeline(pi, 2).epoch()])
    assert len(parts[0]) == len(parts[1]) == len(whole)
    for w, a, b in zip(whole, parts[0], parts[1]):
        assert a.shape[0] == b.shape[0] == w.shape[0] // 2
        np.testing.assert_array_equal(np.concatenate([a, b], 0), w)


def test_process_labels_partition_too():
    whole = [np.asarray(l) for _, l in _pipeline(0, 1).epoch()]
    a = [np.asarray(l) for _, l in _pipeline(0, 2).epoch()]
    b = [np.asarray(l) for _, l in _pipeline(1, 2).epoch()]
    for w, x, y in zip(whole, a, b):
        np.testing.assert_array_equal(np.concatenate([x, y]), w)


def test_pipeline_rejects_indivisible_global_batch():
    x, y = _images()
    with pytest.raises(ValueError):
        HostDataPipeline(x, y, batch_size=15, process_index=0, process_count=2)


def test_local_batch_size_checks_both_divisibilities(mesh8):
    # mesh8 is 8 data x 1 model (conftest)
    assert local_batch_size(32, mesh8, process_count=4) == 8
    with pytest.raises(ValueError):  # not divisible by data axis
        local_batch_size(12, mesh8, process_count=4)
    with pytest.raises(ValueError):  # divisible by axis, not by processes
        local_batch_size(8, mesh8, process_count=3)


def test_sharded_batch_matches_host_batch(mesh8):
    """The make_array_from_process_local_data path reassembles exactly."""
    x, y = _images()
    pipe = HostDataPipeline(x, y, batch_size=16, mesh=mesh8, shuffle=True, seed=3)
    pipe_host = HostDataPipeline(x, y, batch_size=16, mesh=None, shuffle=True, seed=3)
    for (xb, yb), (xh, yh) in zip(pipe.epoch(), pipe_host.epoch()):
        assert len(xb.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(xb), np.asarray(xh))
        np.testing.assert_array_equal(np.asarray(yb), np.asarray(yh))
