#!/usr/bin/env python
"""Entry-point parity with the reference's idc.py toy MLP GAN
(ref:idc.py:93-192: BCE loop, TensorBoard scalars, per-epoch grids, best-FID
save — here with a real FID instead of the reference's random placeholder,
ref:idc.py:165-168)."""

import sys

from vitgan_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main(["train", "--family", "mlp", "--dataset", "cifar10",
                           *sys.argv[1:]]))
