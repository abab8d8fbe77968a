"""Host-side image transforms: Resize (shorter side) -> CenterCrop.

Parity target: the reference's transform chain
``Resize(image_size) -> CenterCrop(image_size) -> ToTensor -> Normalize``
(ref:src/v1/utils.py:124-131).  torchvision's ``Resize(int)`` scales the
SHORTER side to ``size`` preserving aspect ratio, with PIL's antialiased
triangle (bilinear) filter; ``CenterCrop`` takes the centered window,
zero-padding if the image is smaller than the crop.

The resize here reimplements PIL's separable triangle filter exactly
(support scales with the downscale factor, weights normalized per output
pixel) in vectorized NumPy — verified against Pillow in
tests/test_transforms.py — with a threaded C++ fast path
(native/loader.cpp resize_bilinear_u8) used automatically when built.
These run ONCE at dataset load (the whole dataset is host-resident uint8);
per-batch work stays gather+normalize+flip.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _triangle_matrix(in_size: int, out_size: int) -> np.ndarray:
    """PIL-style antialiased linear-filter weights as a dense (out, in) matrix.

    For each output pixel: center = (i + 0.5) * scale; the triangle kernel's
    support is widened by the scale when downscaling (antialias) and weights
    over the in-bounds taps are normalized to sum to 1 — identical math to
    Pillow's precompute_coeffs for Resampling.BILINEAR.
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = filterscale  # bilinear kernel support = 1.0, scaled
    w = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        xs = np.arange(lo, hi, dtype=np.float64)
        ws = 1.0 - np.abs((xs + 0.5 - center) / filterscale)
        ws = np.clip(ws, 0.0, None)
        s = ws.sum()
        if s > 0:
            w[i, lo:hi] = ws / s
        else:  # degenerate window: nearest
            w[i, min(int(center), in_size - 1)] = 1.0
    return w


def resize_bilinear(images_u8: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(N,H,W,C) uint8 -> (N,out_h,out_w,C) uint8, PIL-BILINEAR semantics."""
    n, h, w, c = images_u8.shape
    if (h, w) == (out_h, out_w):
        return images_u8
    try:
        from vitgan_tpu.data.native import native_resize_bilinear

        return native_resize_bilinear(images_u8, out_h, out_w)
    except Exception:
        pass
    wh = _triangle_matrix(h, out_h)
    ww = _triangle_matrix(w, out_w)
    x = images_u8.astype(np.float64).reshape(n, h, w * c)
    x = np.matmul(wh, x)                       # (N, out_h, w*c)
    x = x.reshape(n * out_h, w, c)
    x = np.matmul(ww, x)                       # (n*out_h, out_w, c)
    x = x.reshape(n, out_h, out_w, c)
    return np.clip(np.rint(x), 0, 255).astype(np.uint8)


def resize_shorter_side(images_u8: np.ndarray, size: int) -> np.ndarray:
    """torchvision Resize(int): shorter side -> size, aspect preserved.

    The long side TRUNCATES like torchvision's _compute_resized_output_size
    (``int(size * long / short)``), not rounds — at 7x11 -> size 3 torch
    produces width 4, rounding would give 5."""
    _, h, w, _ = images_u8.shape
    if h <= w:
        out_h, out_w = size, max(1, int(size * w / h))
    else:
        out_h, out_w = max(1, int(size * h / w)), size
    return resize_bilinear(images_u8, out_h, out_w)


def center_crop(images_u8: np.ndarray, size: int) -> np.ndarray:
    """torchvision CenterCrop(int), zero-padding when the image is smaller."""
    n, h, w, c = images_u8.shape
    if h < size or w < size:
        ph, pw = max(size - h, 0), max(size - w, 0)
        images_u8 = np.pad(images_u8, (
            (0, 0),
            (ph // 2, ph - ph // 2),
            (pw // 2, pw - pw // 2),
            (0, 0),
        ))
        n, h, w, c = images_u8.shape
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return np.ascontiguousarray(images_u8[:, top:top + size, left:left + size, :])


def reference_transforms(images_u8: np.ndarray, image_size: int) -> np.ndarray:
    """Resize(shorter side) -> CenterCrop, the reference's pre-normalize chain."""
    _, h, w, _ = images_u8.shape
    if h == w == image_size:
        return images_u8
    return center_crop(resize_shorter_side(images_u8, image_size), image_size)
