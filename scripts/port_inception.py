"""Port torchvision/pytorch-fid InceptionV3 weights to the JAX FID extractor.

Usage:
    python scripts/port_inception.py <weights.pth> <out.npz>   # port + verify
    python scripts/port_inception.py --selftest                # random weights

The verification path is a clean-room *functional torch mirror* of the same
FID-InceptionV3 architecture (below), driven directly by the raw state_dict
(conv + eval-mode BatchNorm, i.e. BEFORE our BN folding).  Agreement between
that mirror and the JAX forward therefore checks the architecture, the
preprocessing, AND the fold in one shot.  With real torchvision weights on
disk this is the SURVEY §7.5 "verify against pytorch-fid on fixed inputs"
gate (ref:src/v2/utils.py:155-175 is the parity target); in this zero-egress
environment --selftest runs the identical check on random weights.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vitgan_tpu.models import inception as I


# ---------------------------------------------------------------------------
# Functional torch mirror (raw state_dict, un-folded BN)
# ---------------------------------------------------------------------------


def torch_inception_features(sd, imgs_u8: np.ndarray,
                             resize_to: int = I.INPUT_SIZE) -> np.ndarray:
    """uint8 NHWC -> (N, 2048), torch CPU, matching torchmetrics numerics."""
    import torch
    import torch.nn.functional as F

    t = lambda k: torch.as_tensor(np.asarray(sd[k]), dtype=torch.float32)  # noqa: E731

    def bc(name, x, stride=1, padding=0):
        x = F.conv2d(x, t(f"{name}.conv.weight"), stride=stride, padding=padding)
        x = F.batch_norm(x, t(f"{name}.bn.running_mean"), t(f"{name}.bn.running_var"),
                         t(f"{name}.bn.weight"), t(f"{name}.bn.bias"),
                         training=False, eps=I.BN_EPS)
        return F.relu(x)

    def avgp(x):  # FIDInception avg pool
        return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)

    def block_a(name, x):
        b1 = bc(f"{name}.branch1x1", x)
        b5 = bc(f"{name}.branch5x5_2", bc(f"{name}.branch5x5_1", x), padding=2)
        b3 = bc(f"{name}.branch3x3dbl_1", x)
        b3 = bc(f"{name}.branch3x3dbl_2", b3, padding=1)
        b3 = bc(f"{name}.branch3x3dbl_3", b3, padding=1)
        bp = bc(f"{name}.branch_pool", avgp(x))
        return torch.cat([b1, b5, b3, bp], 1)

    def block_b(name, x):
        b3 = bc(f"{name}.branch3x3", x, stride=2)
        bd = bc(f"{name}.branch3x3dbl_1", x)
        bd = bc(f"{name}.branch3x3dbl_2", bd, padding=1)
        bd = bc(f"{name}.branch3x3dbl_3", bd, stride=2)
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)

    def block_c(name, x):
        b1 = bc(f"{name}.branch1x1", x)
        b7 = bc(f"{name}.branch7x7_1", x)
        b7 = bc(f"{name}.branch7x7_2", b7, padding=(0, 3))
        b7 = bc(f"{name}.branch7x7_3", b7, padding=(3, 0))
        bd = bc(f"{name}.branch7x7dbl_1", x)
        bd = bc(f"{name}.branch7x7dbl_2", bd, padding=(3, 0))
        bd = bc(f"{name}.branch7x7dbl_3", bd, padding=(0, 3))
        bd = bc(f"{name}.branch7x7dbl_4", bd, padding=(3, 0))
        bd = bc(f"{name}.branch7x7dbl_5", bd, padding=(0, 3))
        bp = bc(f"{name}.branch_pool", avgp(x))
        return torch.cat([b1, b7, bd, bp], 1)

    def block_d(name, x):
        b3 = bc(f"{name}.branch3x3_2", bc(f"{name}.branch3x3_1", x), stride=2)
        b7 = bc(f"{name}.branch7x7x3_1", x)
        b7 = bc(f"{name}.branch7x7x3_2", b7, padding=(0, 3))
        b7 = bc(f"{name}.branch7x7x3_3", b7, padding=(3, 0))
        b7 = bc(f"{name}.branch7x7x3_4", b7, stride=2)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    def block_e(name, x, pool_branch):
        b1 = bc(f"{name}.branch1x1", x)
        b3 = bc(f"{name}.branch3x3_1", x)
        b3 = torch.cat([bc(f"{name}.branch3x3_2a", b3, padding=(0, 1)),
                        bc(f"{name}.branch3x3_2b", b3, padding=(1, 0))], 1)
        bd = bc(f"{name}.branch3x3dbl_1", x)
        bd = bc(f"{name}.branch3x3dbl_2", bd, padding=1)
        bd = torch.cat([bc(f"{name}.branch3x3dbl_3a", bd, padding=(0, 1)),
                        bc(f"{name}.branch3x3dbl_3b", bd, padding=(1, 0))], 1)
        pooled = (F.max_pool2d(x, 3, stride=1, padding=1) if pool_branch == "max"
                  else avgp(x))
        return torch.cat([b1, b3, bd, bc(f"{name}.branch_pool", pooled)], 1)

    with torch.no_grad():
        x = torch.as_tensor(np.asarray(imgs_u8)).permute(0, 3, 1, 2).float() / 255.0
        x = F.interpolate(x, size=(resize_to, resize_to), mode="bilinear",
                          align_corners=False)
        x = x * 2.0 - 1.0
        x = bc("Conv2d_1a_3x3", x, stride=2)
        x = bc("Conv2d_2a_3x3", x)
        x = bc("Conv2d_2b_3x3", x, padding=1)
        x = F.max_pool2d(x, 3, 2)
        x = bc("Conv2d_3b_1x1", x)
        x = bc("Conv2d_4a_3x3", x)
        x = F.max_pool2d(x, 3, 2)
        x = block_a("Mixed_5b", x)
        x = block_a("Mixed_5c", x)
        x = block_a("Mixed_5d", x)
        x = block_b("Mixed_6a", x)
        x = block_c("Mixed_6b", x)
        x = block_c("Mixed_6c", x)
        x = block_c("Mixed_6d", x)
        x = block_c("Mixed_6e", x)
        x = block_d("Mixed_7a", x)
        x = block_e("Mixed_7b", x, "avg")
        x = block_e("Mixed_7c", x, "max")
        return x.mean(dim=(2, 3)).numpy()


def verify(sd, n_images: int = 2, seed: int = 0, tol: float = 1e-3) -> float:
    """Max |torch mirror - JAX| over random uint8 images; raises above tol."""
    import jax.numpy as jnp

    import jax

    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, (n_images, 32, 32, 3), dtype=np.uint8)
    ref = torch_inception_features(sd, imgs)
    params = I.convert_torch_state_dict(sd)
    ours = np.asarray(jax.jit(I.inception_features)(params, jnp.asarray(imgs)))
    err = float(np.abs(ref - ours).max())
    rel = err / max(1e-12, float(np.abs(ref).max()))
    if rel > tol:
        raise AssertionError(f"parity FAILED: max abs err {err:.3e} (rel {rel:.3e})")
    print(f"parity ok: max abs err {err:.3e} (rel {rel:.3e}) over {n_images} images")
    return err


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--selftest":
        verify(I.random_torch_state_dict(0))
        return
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    src, dst = sys.argv[1], sys.argv[2]
    import torch

    sd = torch.load(src, map_location="cpu", weights_only=True)
    sd = sd.get("state_dict", sd)
    verify(sd)
    I.save_params(dst, I.convert_torch_state_dict(sd))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
