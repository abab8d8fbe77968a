"""FID-at-equal-steps comparison: PyTorch-CPU reference vs this framework on TPU.

BASELINE.md's quality target is FID parity at equal step count.  This script
trains both implementations of the v2 config on the SAME synthetic dataset for
the SAME number of steps with the same losses (BCE alternating G/D), then
scores both with the SAME feature extractor (the deterministic random-conv
FID) against the same real sample.  Writes FID_COMPARISON.json at the repo root.

Run: python scripts/fid_budget_comparison.py [steps]
(torch side is slow on 1 CPU core: ~1.6 s/step.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 500
BATCH = 64
N_FID = 2048


def dataset():
    from vitgan_tpu.data.datasets import synthetic_dataset

    imgs, _ = synthetic_dataset(8192, 32, 3, seed=0)
    return imgs


def fid_of(fake_u8: np.ndarray, real_u8: np.ndarray) -> float:
    from vitgan_tpu.train import fid as F

    ex = F.make_random_conv_extractor(3, seed=42)
    rs, fs = F.FeatureStats(512), F.FeatureStats(512)
    for i in range(0, len(real_u8), 256):
        rs.update(ex(real_u8[i : i + 256]))
    for i in range(0, len(fake_u8), 256):
        fs.update(ex(fake_u8[i : i + 256]))
    mu_r, cov_r = rs.moments()
    mu_f, cov_f = fs.moments()
    return F.frechet_distance(mu_r, cov_r, mu_f, cov_f)


def train_jax(imgs_u8: np.ndarray, real_sample: np.ndarray, eval_every: int = 100):
    """Returns (final fakes, pure train seconds, FID curve).

    The curve records (step, cumulative train seconds, FID) at every
    ``eval_every`` steps — FID evals pause the train clock, so
    ``train_seconds`` is honest device time (synced via host readback of a
    result-dependent scalar, see probe_sync.py for why block_until_ready
    alone is not enough on this platform)."""
    import jax

    from vitgan_tpu import config as C
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.ops.policy import enable_persistent_compilation_cache
    from vitgan_tpu.train import create_train_state, make_sample_fn
    from vitgan_tpu.train.fid import to_uint8
    from vitgan_tpu.train.step import make_device_data_train_fn

    enable_persistent_compilation_cache()
    cfg = C.ExperimentConfig(family="v2", data=C.DataConfig(dataset="synthetic"))
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    k = 50
    eval_every = max(k, (eval_every // k) * k)  # align evals to scan calls
    fn = make_device_data_train_fn(gan, cfg, k, donate=False)
    ds = jax.device_put(imgs_u8)
    sample = make_sample_fn(gan, cfg)
    rng = np.random.default_rng(0)

    def fakes_now():
        out = []
        for i in range(N_FID // BATCH):
            z = gan.sample_latent(jax.random.PRNGKey(10_000 + i), BATCH)
            out.append(np.asarray(sample(state.g_vars, z)))
        return to_uint8(np.concatenate(out))

    curve = []
    jax_time = 0.0
    done = 0
    while done < STEPS:
        t0 = time.time()
        idx = rng.integers(0, len(imgs_u8), (k, BATCH)).astype(np.int32)
        state, ms = fn(state, ds, idx)
        float(np.asarray(ms["d_loss"][-1]))  # sync: host readback, not just block
        jax_time += time.time() - t0
        done += k
        if done % eval_every == 0 or done >= STEPS:
            f = fid_of(fakes_now(), real_sample)
            curve.append({"step": done, "train_seconds": round(jax_time, 2),
                          "fid": round(float(f), 3)})
            print(f"  jax step {done}: {jax_time:.1f}s, FID {f:.2f}", flush=True)
    return fakes_now(), jax_time, curve


def train_torch(imgs_u8: np.ndarray):
    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from measure_torch_baseline import Discriminator, Generator, LAT

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    g, d = Generator(), Discriminator()
    opt_g = torch.optim.AdamW(g.parameters(), lr=5e-4, weight_decay=1e-3)
    opt_d = torch.optim.AdamW(d.parameters(), lr=5e-4, weight_decay=1e-3)
    bce = torch.nn.BCEWithLogitsLoss()
    data = torch.from_numpy(imgs_u8).float().permute(0, 3, 1, 2) / 127.5 - 1.0
    rng = np.random.default_rng(0)
    t0 = time.time()
    for _ in range(STEPS):
        real = data[rng.integers(0, len(data), BATCH)]
        z = torch.randn(BATCH, LAT)
        fake = g(z)
        opt_d.zero_grad()
        (bce(d(real), torch.ones(BATCH)) + bce(d(fake.detach()), torch.zeros(BATCH))).backward()
        opt_d.step()
        opt_g.zero_grad()
        bce(d(fake), torch.ones(BATCH)).backward()
        opt_g.step()
    torch_time = time.time() - t0
    with torch.no_grad():
        fakes = []
        for i in range(N_FID // BATCH):
            torch.manual_seed(10_000 + i)
            fakes.append(g(torch.randn(BATCH, LAT)).permute(0, 2, 3, 1).numpy())
    fake = np.clip(np.rint((np.concatenate(fakes) + 1) * 127.5), 0, 255).astype(np.uint8)
    return fake, torch_time


def main():
    imgs = dataset()
    real_sample = imgs[:N_FID]
    jax_fake, jax_time, curve = train_jax(imgs, real_sample)
    fid_jax = fid_of(jax_fake, real_sample)
    print(f"jax/TPU: {STEPS} steps in {jax_time:.1f}s, FID {fid_jax:.2f}", flush=True)
    torch_fake, torch_time = train_torch(imgs)
    fid_torch = fid_of(torch_fake, real_sample)
    print(f"torch/CPU: {STEPS} steps in {torch_time:.1f}s, FID {fid_torch:.2f}", flush=True)
    # Time-to-quality: first point on the TPU curve at or below the torch
    # final FID — the deployment-relevant ratio (same model, same data,
    # same scorer; wall-clock to reach the baseline's quality).
    reach = next((p for p in curve if p["fid"] <= fid_torch), None)
    out = {
        "steps": STEPS, "batch": BATCH, "fid_samples": N_FID,
        "extractor": "random_conv(seed=42, 512-d)",
        "jax_tpu": {"fid": fid_jax, "train_seconds": jax_time, "fid_curve": curve},
        "torch_cpu": {"fid": fid_torch, "train_seconds": torch_time},
        "time_to_torch_quality": (
            None if reach is None else {
                **reach,
                "speedup_vs_torch": round(torch_time / max(reach["train_seconds"], 1e-9), 1),
            }
        ),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "FID_COMPARISON.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
