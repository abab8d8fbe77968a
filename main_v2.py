#!/usr/bin/env python
"""Entry-point parity with the reference's main-v2.py: train the v2 ViT-GAN
(ref:main-v2.py:1-6 calling train_model(); 500 epochs per Config defaults).
Pass ``--sweep`` for the train_with_ray() role (Ray-free sweep)."""

import sys

from vitgan_tpu.cli import main

if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--sweep" in argv:
        argv.remove("--sweep")
        raise SystemExit(main(["sweep", "--family", "v2", *argv]))
    raise SystemExit(main(["train", "--family", "v2", "--dataset", "cifar10", *argv]))
