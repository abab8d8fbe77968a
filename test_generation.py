#!/usr/bin/env python
"""Entry-point parity with the reference's test-generation.py: load the latest
run's checkpoint and write generated_images.png + noise under <run>/test/
(ref:test-generation.py:1-4, ref:src/v2/generation.py:10-60)."""

import sys

from vitgan_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main(["generate", *sys.argv[1:]]))
