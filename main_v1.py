#!/usr/bin/env python
"""Entry-point parity with the reference's main-v1.py: train the paper-style v1
ViTGAN (SLN generator + ISR L2-attention discriminator) on CIFAR-10
(ref:main-v1.py:20-44 — seed, device pick, CIFAR loader, fit(1000 epochs),
crash-safe save on exit; the crash-safe epilogue lives in Trainer.fit)."""

import sys

from vitgan_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main(["train", "--family", "v1", "--dataset", "cifar10",
                           "--epochs", "1000", *sys.argv[1:]]))
