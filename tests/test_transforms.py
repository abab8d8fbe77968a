"""Resize/CenterCrop parity with the reference transform chain.

The reference resizes with torchvision Resize (PIL BILINEAR, antialiased,
shorter-side semantics) then CenterCrops (ref:src/v1/utils.py:124-131).
Pillow is in the image, so parity is asserted directly against PIL.
"""

import numpy as np
import pytest

from vitgan_tpu.data import transforms as T


def _pil_resize(img_u8: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.fromarray(img_u8).resize((out_w, out_h),
                                                     Image.BILINEAR))


@pytest.mark.parametrize("in_hw,out_hw", [
    ((32, 32), (64, 64)),    # upscale (BASELINE deit64 path)
    ((32, 32), (128, 128)),  # upscale (highres path)
    ((64, 48), (32, 24)),    # downscale, non-square (antialias engaged)
    ((37, 53), (17, 29)),    # odd sizes
])
def test_resize_matches_pil(in_hw, out_hw):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (3, *in_hw, 3), dtype=np.uint8)
    ours = T.resize_bilinear(imgs, *out_hw)
    for i in range(len(imgs)):
        ref = _pil_resize(imgs[i], out_hw[1], out_hw[0])
        err = np.abs(ours[i].astype(int) - ref.astype(int))
        # PIL quantizes filter coefficients to 8.8 fixed point and clips the
        # horizontal pass to uint8; exact math differs by at most 1-2 LSB.
        assert err.max() <= 2, f"max err {err.max()}"
        assert err.mean() < 0.5


def test_numpy_and_native_agree():
    try:
        from vitgan_tpu.data.native import native_resize_bilinear
    except Exception:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    # numpy path, forced (bypass the native fast path inside resize_bilinear)
    wh = T._triangle_matrix(32, 48)
    ww = T._triangle_matrix(32, 40)
    x = imgs.astype(np.float64).reshape(4, 32, 32 * 3)
    x = np.matmul(wh, x).reshape(4 * 48, 32, 3)
    x = np.matmul(ww, x).reshape(4, 48, 40, 3)
    ref = np.clip(np.rint(x), 0, 255).astype(np.uint8)
    nat = native_resize_bilinear(imgs, 48, 40)
    assert np.abs(ref.astype(int) - nat.astype(int)).max() <= 1


def test_shorter_side_semantics():
    imgs = np.zeros((1, 32, 64, 3), np.uint8)
    out = T.resize_shorter_side(imgs, 16)
    assert out.shape == (1, 16, 32, 3)
    out = T.resize_shorter_side(np.zeros((1, 64, 32, 3), np.uint8), 16)
    assert out.shape == (1, 32, 16, 3)


def test_shorter_side_truncates_long_side_like_torchvision():
    """torchvision's _compute_resized_output_size truncates the scaled long
    side (int(size*long/short)): 7x11 at size 3 -> (3, 4), NOT round -> 5."""
    out = T.resize_shorter_side(np.zeros((1, 7, 11, 3), np.uint8), 3)
    assert out.shape == (1, 3, 4, 3)
    out = T.resize_shorter_side(np.zeros((1, 11, 7, 3), np.uint8), 3)
    assert out.shape == (1, 4, 3, 3)


def test_center_crop_matches_torchvision_formula():
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (2, 37, 41, 3), dtype=np.uint8)
    out = T.center_crop(imgs, 32)
    top, left = int(round((37 - 32) / 2.0)), int(round((41 - 32) / 2.0))
    np.testing.assert_array_equal(out, imgs[:, top:top + 32, left:left + 32, :])


def test_center_crop_pads_small_images():
    imgs = np.full((1, 16, 16, 3), 200, np.uint8)
    out = T.center_crop(imgs, 32)
    assert out.shape == (1, 32, 32, 3)
    assert (out[0, :8, :, :] == 0).all() and (out[0, 8:24, 8:24] == 200).all()


def test_reference_transforms_noop_at_native_size():
    imgs = np.random.default_rng(3).integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    assert T.reference_transforms(imgs, 32) is imgs


def test_load_dataset_resizes_real_data(tmp_path):
    """64px config on a real-format dataset (VERDICT Missing #2)."""
    import pickle

    from vitgan_tpu.data.datasets import load_dataset

    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.default_rng(0)
    for name, n in [("data_batch_%d" % i, 20) for i in range(1, 6)] + [("test_batch", 20)]:
        with open(d / name, "wb") as f:
            pickle.dump({b"data": rng.integers(0, 256, (n, 3072), dtype=np.uint8),
                         b"labels": list(rng.integers(0, 10, n))}, f)
    x, y = load_dataset("cifar10", root=str(tmp_path), image_size=64)
    assert x.shape == (100, 64, 64, 3) and x.dtype == np.uint8
    x32, _ = load_dataset("cifar10", root=str(tmp_path), image_size=32)
    assert x32.shape == (100, 32, 32, 3)
