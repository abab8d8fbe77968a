"""Image grid construction and PNG saving.

Covers the reference's sample/noise/input grid dumps
(ref:src/v2/training.py:47-65,166-172), the TensorBoard image grids
(ref:src/v1/gan.py:149-163) and the post-training ``fake.png``
(ref:src/v1/utils.py:94-104).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np

from vitgan_tpu.data.pipeline import denormalize


def make_grid(images: np.ndarray, nrow: Optional[int] = None, pad: int = 2,
              pad_value: int = 0) -> np.ndarray:
    """(N, H, W, C) float [-1,1] or uint8 -> one (GH, GW, C) uint8 grid."""
    imgs = np.asarray(images)
    if imgs.dtype != np.uint8:
        imgs = denormalize(imgs)
    n, h, w, c = imgs.shape
    nrow = nrow or int(math.ceil(math.sqrt(n)))
    ncol = int(math.ceil(n / nrow))
    grid = np.full((ncol * (h + pad) + pad, nrow * (w + pad) + pad, c), pad_value, np.uint8)
    for i in range(n):
        r, col = divmod(i, nrow)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y : y + h, x : x + w] = imgs[i]
    return grid


def save_png(path: str, image_hwc: np.ndarray) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = np.asarray(image_hwc)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    try:
        from PIL import Image

        Image.fromarray(arr).save(path)
    except Exception:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, arr)


def to_png_bytes(image_hwc: np.ndarray) -> bytes:
    """Encode one (H, W, C) uint8 image as PNG bytes (serving path)."""
    import io

    arr = np.asarray(image_hwc)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def save_image_grid(path: str, images: np.ndarray, nrow: Optional[int] = None) -> None:
    save_png(path, make_grid(images, nrow=nrow))


def display_images(images: np.ndarray, nrow: Optional[int] = None, title: str = "") -> None:
    """Interactive grid viewer (ref:src/v1/utils.py:31-73 display_images/display_images_v2
    role).  Headless-safe: falls back to saving nothing if no display backend."""
    try:
        import matplotlib.pyplot as plt
    except Exception:
        return
    grid = make_grid(images, nrow=nrow)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(grid)
    ax.set_axis_off()
    if title:
        ax.set_title(title)
    plt.show()


def save_training_gif(images_dir: str, out_path: str, duration_ms: int = 200) -> bool:
    """Animate the per-epoch sample grids into a GIF (the reference notebook's
    training-progress animation, ref:cnn/cnn-gan.ipynb cell 12 tail).

    Returns False when PIL is unavailable or no frames exist.
    """
    import glob

    try:
        from PIL import Image
    except Exception:
        return False
    frames = sorted(glob.glob(os.path.join(images_dir, "epoch_*.png")))
    if not frames:
        return False
    imgs = [Image.open(f) for f in frames]
    imgs[0].save(out_path, save_all=True, append_images=imgs[1:],
                 duration=duration_ms, loop=0)
    return True
