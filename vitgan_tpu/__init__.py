"""vitgan_tpu — a TPU-native JAX framework for training Vision-Transformer GANs.

A ground-up rebuild of the capabilities of the ``krzkro4122/vit-gan`` reference
(PyTorch, single-device) as an idiomatic jax/XLA/Pallas framework:

- ``vitgan_tpu.config``    — dataclass config tree (v1 ViTGAN, v2 ViT-GAN, DCGAN, MLP-GAN)
- ``vitgan_tpu.models``    — pure-pytree model zoo (init/apply pairs, no framework magic)
- ``vitgan_tpu.ops``       — Pallas TPU kernels + pure-jax fallbacks for the hot loops
- ``vitgan_tpu.parallel``  — mesh construction, sharding rules, multi-host bootstrap
- ``vitgan_tpu.data``      — host-side image pipeline feeding device-resident batches
- ``vitgan_tpu.train``     — losses, jitted alternating G/D train step, trainer, FID
- ``vitgan_tpu.utils``     — run-dir layout, logging, image grids, checkpointing
- ``vitgan_tpu.hpo``       — Ray-free hyperparameter sweep runner

Reference parity notes cite ``/root/reference`` as ``ref:<file>:<line>``.
"""

__version__ = "0.1.0"

from vitgan_tpu import config  # noqa: F401
