"""Image-utility parity tests (reference encode/clip.py:15-39, utils.py:36-50)."""
import numpy as np
import pytest
from PIL import Image

from flexdiffuse_tpu.utils.image import (CLIP_MEAN, CLIP_STD, clip_preprocess,
                                         image_grid, preprocess, to_pil)


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(
        rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8), 'RGB')


def test_preprocess_square():
    out = preprocess(_img(300, 300))
    assert out.shape == (1, 512, 512, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_preprocess_landscape_snaps_to_64():
    # w > h: h scales by w/512 then floors to /64 (reference formula).
    out = preprocess(_img(1000, 700))
    expect_h = (int(700 / (1000 / 512)) // 64) * 64
    assert out.shape == (1, expect_h, 512, 3)
    assert expect_h == 320


def test_preprocess_portrait_snaps_to_64():
    out = preprocess(_img(700, 1000))
    expect_w = (int(700 / (1000 / 512)) // 64) * 64
    assert out.shape == (1, 512, expect_w, 3)


def test_clip_preprocess_shape_and_normalization():
    out = clip_preprocess(_img(640, 480))
    assert out.shape == (1, 224, 224, 3)
    # Reference quirk: normalization applied to [-1,1] data → range is
    # roughly [(-1-mean)/std, (1-mean)/std], far wider than standard CLIP.
    lo = ((-1.0 - CLIP_MEAN) / CLIP_STD).min()
    hi = ((1.0 - CLIP_MEAN) / CLIP_STD).max()
    assert out.min() >= lo - 0.5 and out.max() <= hi + 0.5
    assert out.min() < -2.0  # would be ≥ -2 under standard [0,1] normalize


def test_to_pil_roundtrip():
    arr = np.linspace(0, 1, 2 * 8 * 8 * 3, dtype=np.float32).reshape(
        2, 8, 8, 3)
    imgs = to_pil(arr)
    assert len(imgs) == 2 and imgs[0].size == (8, 8)


@pytest.mark.parametrize('n,cols,rows', [(1, 1, 1), (4, 2, 2), (5, 3, 2),
                                         (8, 3, 3), (9, 3, 3), (16, 4, 4)])
def test_image_grid_geometry(n, cols, rows):
    # rows = ceil(n/cols): conscious fix over the reference's floor, which
    # silently clipped images pasted beyond the canvas (utils.py:43).
    imgs = [_img(16, 16, i) for i in range(n)]
    grid = image_grid(imgs)
    assert grid.size == (cols * 16, rows * 16)
    assert cols * rows >= n  # every image has a cell
