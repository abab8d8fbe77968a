"""Measure the PyTorch reference's CPU throughput to establish the benchmark denominator.

BASELINE.md: the reference publishes no numbers, so we measure a faithful
PyTorch implementation of its v2 configuration (batch 64, embed 128, 6 blocks,
4 heads, mlp_ratio 2, patch 4 at 32x32 — ref:src/v2/utils.py:25-41) doing the
same combined alternating G+D BCE step our framework runs, on CPU.  Writes
BASELINE_MEASURED.json at the repo root; bench.py reads it for vs_baseline.

This file is an independent PyTorch implementation (the reference's own live
trainer is shape-invalid, SURVEY §2.4.9, and its generator is dimensionally
broken, §2.4.8 — we benchmark the intended architecture, same as our JAX side).
"""

import json
import os
import time

import torch
import torch.nn as nn

torch.manual_seed(0)

B, IMG, PATCH, EMB, DEPTH, HEADS, RATIO, LAT = 64, 32, 4, 128, 6, 4, 2, 128
N = (IMG // PATCH) ** 2


class Block(nn.Module):
    def __init__(self):
        super().__init__()
        self.ln1 = nn.LayerNorm(EMB)
        self.attn = nn.MultiheadAttention(EMB, HEADS, batch_first=True)
        self.ln2 = nn.LayerNorm(EMB)
        self.mlp = nn.Sequential(nn.Linear(EMB, EMB * RATIO), nn.GELU(),
                                 nn.Linear(EMB * RATIO, EMB))

    def forward(self, x):
        h = self.ln1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        return x + self.mlp(self.ln2(x))


class Generator(nn.Module):
    def __init__(self):
        super().__init__()
        self.mapping = nn.Linear(LAT, N * EMB)
        self.pos = nn.Parameter(torch.zeros(1, N, EMB))
        self.blocks = nn.Sequential(*[Block() for _ in range(DEPTH)])
        self.ln = nn.LayerNorm(EMB)
        self.to_pix = nn.Linear(EMB, PATCH * PATCH * 3)

    def forward(self, z):
        x = self.mapping(z).view(-1, N, EMB) + self.pos
        x = self.ln(self.blocks(x))
        pix = torch.tanh(self.to_pix(x))
        s = IMG // PATCH
        pix = pix.view(-1, s, s, PATCH, PATCH, 3).permute(0, 5, 1, 3, 2, 4)
        return pix.reshape(-1, 3, IMG, IMG)


class Discriminator(nn.Module):
    def __init__(self):
        super().__init__()
        self.embed = nn.Conv2d(3, EMB, PATCH, PATCH)
        self.cls = nn.Parameter(torch.zeros(1, 1, EMB))
        self.pos = nn.Parameter(torch.zeros(1, N, EMB))
        self.blocks = nn.Sequential(*[Block() for _ in range(DEPTH)])
        self.ln = nn.LayerNorm(EMB)
        self.head = nn.Sequential(nn.Linear(EMB, EMB), nn.Tanh(), nn.Linear(EMB, 1))

    def forward(self, x):
        x = self.embed(x).flatten(2).transpose(1, 2) + self.pos
        x = torch.cat([self.cls.expand(x.shape[0], -1, -1), x], 1)
        x = self.ln(self.blocks(x))
        return self.head(x[:, 0]).squeeze(-1)


def main():
    torch.set_num_threads(os.cpu_count() or 8)
    g, d = Generator(), Discriminator()
    opt_g = torch.optim.AdamW(g.parameters(), lr=5e-4, weight_decay=1e-3)
    opt_d = torch.optim.AdamW(d.parameters(), lr=5e-4, weight_decay=1e-3)
    bce = nn.BCEWithLogitsLoss()
    real = torch.rand(B, 3, IMG, IMG) * 2 - 1

    def step():
        z = torch.randn(B, LAT)
        fake = g(z)
        opt_d.zero_grad()
        d_loss = bce(d(real), torch.ones(B)) + bce(d(fake.detach()), torch.zeros(B))
        d_loss.backward()
        opt_d.step()
        opt_g.zero_grad()
        g_loss = bce(d(fake), torch.ones(B))
        g_loss.backward()
        opt_g.step()

    for _ in range(3):  # warmup
        step()
    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    dt = time.perf_counter() - t0
    ips = B * n_steps / dt
    out = {
        "torch_cpu_images_per_sec": ips,
        "config": "v2: batch 64, embed 128, depth 6, heads 4, patch 4, 32x32",
        "threads": torch.get_num_threads(),
        "steps_timed": n_steps,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
