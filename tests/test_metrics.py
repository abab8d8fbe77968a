"""KID + precision/recall metrics (vitgan_tpu/train/metrics.py).

Math is validated against direct double-loop computations on tiny fixed
inputs plus analytic/behavioral properties (no torchmetrics in this image).
"""

import json
import os

import numpy as np
import pytest

from vitgan_tpu.train.metrics import (
    collect_features,
    evaluate_generative_metrics,
    kernel_distance,
    mmd2_unbiased,
    polynomial_kernel,
    precision_recall,
)


def _mmd2_direct(x, y, gamma, coef=1.0, degree=3):
    """O(n^2) loop reference for the unbiased polynomial-kernel MMD^2."""
    def k(a, b):
        return (gamma * float(a @ b) + coef) ** degree

    m, n = len(x), len(y)
    s_xx = sum(k(x[i], x[j]) for i in range(m) for j in range(m) if i != j)
    s_yy = sum(k(y[i], y[j]) for i in range(n) for j in range(n) if i != j)
    s_xy = sum(k(x[i], y[j]) for i in range(m) for j in range(n))
    return s_xx / (m * (m - 1)) + s_yy / (n * (n - 1)) - 2 * s_xy / (m * n)


def test_mmd2_matches_direct_loops():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 4))
    y = rng.normal(size=(5, 4))
    gamma = 1.0 / 4
    got = mmd2_unbiased(polynomial_kernel(x, x), polynomial_kernel(y, y),
                        polynomial_kernel(x, y))
    want = _mmd2_direct(x, y, gamma)
    assert got == pytest.approx(want, rel=1e-12)


def test_kid_same_distribution_near_zero_and_shifted_positive():
    rng = np.random.default_rng(1)
    real = rng.normal(size=(600, 16))
    same = rng.normal(size=(600, 16))
    shifted = rng.normal(size=(600, 16)) + 2.0
    kid_same, _ = kernel_distance(real, same, subset_size=300, n_subsets=20, seed=0)
    kid_shift, _ = kernel_distance(real, shifted, subset_size=300, n_subsets=20, seed=0)
    # Unbiased estimator: ~0 (can be slightly negative) for matched dists.
    assert abs(kid_same) < 0.05
    assert kid_shift > 10 * max(abs(kid_same), 1e-6)


def test_kid_subset_size_clamped_and_deterministic():
    rng = np.random.default_rng(2)
    real = rng.normal(size=(40, 8))
    fake = rng.normal(size=(30, 8))
    m1 = kernel_distance(real, fake, subset_size=1000, n_subsets=5, seed=3)
    m2 = kernel_distance(real, fake, subset_size=1000, n_subsets=5, seed=3)
    assert m1 == m2  # clamped to 30, same seed -> identical draws


def test_kid_shape_mismatch_raises():
    with pytest.raises(ValueError):
        kernel_distance(np.zeros((10, 4)), np.zeros((10, 5)))


def test_precision_recall_identical_sets_is_one_one():
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(50, 8))
    p, r = precision_recall(feats, feats.copy(), k=3)
    assert p == 1.0 and r == 1.0


def test_precision_recall_disjoint_sets_is_zero_zero():
    rng = np.random.default_rng(4)
    real = rng.normal(size=(50, 8))
    fake = rng.normal(size=(50, 8)) + 100.0
    p, r = precision_recall(real, fake, k=3)
    assert p == 0.0 and r == 0.0


def test_precision_recall_mode_collapse_asymmetry():
    """Fake covering only a corner of the real distribution: precision stays
    high (fakes are realistic), recall drops (reals not covered)."""
    rng = np.random.default_rng(5)
    real = rng.uniform(-1, 1, size=(400, 2))
    fake = rng.uniform(0.8, 1.0, size=(400, 2))  # tiny corner of the square
    p, r = precision_recall(real, fake, k=3)
    assert p > 0.9
    assert r < 0.35
    assert p - r > 0.5


def test_precision_recall_chunked_matches_unchunked():
    rng = np.random.default_rng(6)
    real = rng.normal(size=(70, 5))
    fake = rng.normal(size=(55, 5)) * 1.5
    assert precision_recall(real, fake, chunk=16) == precision_recall(
        real, fake, chunk=4096)


def test_collect_features_respects_budget_and_dtype():
    calls = []

    def extractor(u8):
        assert u8.dtype == np.uint8
        calls.append(len(u8))
        return u8.reshape(len(u8), -1)[:, :4].astype(np.float32)

    batches = iter([np.zeros((8, 2, 2, 3), np.uint8),
                    np.full((8, 2, 2, 3), 0.5, np.float32),  # [-1,1] floats OK
                    np.zeros((8, 2, 2, 3), np.uint8)])
    feats = collect_features(extractor, batches, num_samples=12)
    assert feats.shape == (12, 4)
    assert calls == [8, 4]  # second batch truncated, third never pulled


def test_evaluate_generative_metrics_keys_and_identity():
    rng = np.random.default_rng(7)
    feats = rng.normal(size=(64, 8))
    out = evaluate_generative_metrics(feats, feats.copy(), kid_subset_size=32,
                                      kid_subsets=4, pr_k=2)
    assert out["fid"] == pytest.approx(0.0, abs=1e-9)
    # Identical SETS are not "same distribution" for subset-KID: subsets drawn
    # independently from each copy share exact samples, whose self-pairs sit in
    # the cross term only -> the unbiased estimator biases NEGATIVE.  The
    # matched-distribution ~0 property is covered by the dedicated KID test.
    assert np.isfinite(out["kid_mean"]) and out["kid_mean"] <= 0.0
    assert out["precision"] == 1.0 and out["recall"] == 1.0
    assert out["num_real"] == out["num_fake"] == 64


@pytest.fixture()
def dev_env(tmp_path, monkeypatch):
    monkeypatch.setenv("DEV", "1")
    monkeypatch.setenv("SCRATCH", str(tmp_path))
    return tmp_path


@pytest.mark.slow
def test_cli_eval_end_to_end(dev_env, capsys):
    from vitgan_tpu import cli

    rc = cli.main([
        "train", "--family", "mlp", "--dataset", "synthetic", "--epochs", "1",
        "--run-name", "evalrun", "--set", "run.fid_every_epochs=0",
    ])
    assert rc == 0
    run_dir = os.path.join(str(dev_env), "output", "evalrun")
    rc = cli.main(["eval", "--run-dir", run_dir, "--num-samples", "64",
                   "--extractor", "random_conv", "--kid-subset-size", "32",
                   "--kid-subsets", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for key in ("fid", "kid_mean", "kid_std", "precision", "recall"):
        assert np.isfinite(out[key])
    assert 0.0 <= out["precision"] <= 1.0 and 0.0 <= out["recall"] <= 1.0
    # Persisted alongside the run for later inspection.
    with open(os.path.join(run_dir, "metrics.json")) as f:
        assert json.load(f)["num_fake"] == 64


def test_inception_score_bounds():
    from vitgan_tpu.train.metrics import inception_score

    n, c = 100, 10
    # Uniform p(y|x): no confidence -> IS = 1.
    uniform = np.zeros((n, c))
    mean, _ = inception_score(uniform, splits=2)
    assert mean == pytest.approx(1.0, abs=1e-9)
    # Confident AND diverse (one-hot cycling all classes) -> IS = #classes.
    diverse = np.full((n, c), -50.0)
    diverse[np.arange(n), np.arange(n) % c] = 50.0
    mean, _ = inception_score(diverse, splits=2)
    assert mean == pytest.approx(c, rel=1e-6)
    # Confident but collapsed to one class -> IS = 1.
    collapsed = np.full((n, c), -50.0)
    collapsed[:, 3] = 50.0
    mean, _ = inception_score(collapsed, splits=2)
    assert mean == pytest.approx(1.0, abs=1e-6)
    with pytest.raises(ValueError):
        inception_score(np.zeros(5))


def test_inception_fc_conversion_and_apply():
    from vitgan_tpu.models import inception as I

    sd = I.random_torch_state_dict(seed=1)
    assert "fc.weight" in sd
    params = I.convert_torch_state_dict(sd)
    assert params["fc"]["w"].shape == (2048, 1000)
    feats = np.random.default_rng(0).normal(size=(4, 2048)).astype(np.float32)
    got = np.asarray(I.apply_fc(params, feats))
    want = feats @ sd["fc.weight"].T + sd["fc.bias"]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # Round-trips through the npz container.
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "w.npz")
        I.save_params(path, params)
        loaded = I.load_params(path)
    np.testing.assert_array_equal(loaded["fc"]["w"], params["fc"]["w"])
    # pytorch-fid checkpoints carry no head: clear error, not silent garbage.
    params.pop("fc")
    with pytest.raises(KeyError):
        I.apply_fc(params, feats)
