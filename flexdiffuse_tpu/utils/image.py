"""Image I/O utilities: SD preprocessing, CLIP preprocessing, grids.

Host-side (PIL/numpy) counterparts of the reference's ``preprocess``
(encode/clip.py:15-39), torchvision CLIP transform (encode/clip.py:76-84) and
``image_grid`` (utils.py:36-50). Arrays are NHWC float32 — the TPU-native
layout used throughout the framework.
"""
from __future__ import annotations

import math
from typing import List, Sequence

import numpy as np
from PIL import Image

CLIP_IMAGE_SIZE = 224
MAX_SINGLE_DIM = 512

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess(image: Image.Image) -> np.ndarray:
    """Resize so the long side is 512 (short side snapped down to /64),
    scale to [-1, 1] — reference encode/clip.py:15-39, NHWC instead of NCHW.
    """
    w, h = image.size
    if h > w:
        w = (int(w / (h / MAX_SINGLE_DIM)) // 64) * 64
        h = MAX_SINGLE_DIM
    elif w > h:
        h = (int(h / (w / MAX_SINGLE_DIM)) // 64) * 64
        w = MAX_SINGLE_DIM
    else:
        h = w = MAX_SINGLE_DIM
    image = image.resize((w, h), resample=Image.LANCZOS).convert('RGB')
    arr = np.asarray(image, np.float32) / 255.0
    return 2.0 * arr[None] - 1.0


def clip_preprocess(image: Image.Image) -> np.ndarray:
    """SD-preprocess → center-crop square → 224² bicubic → CLIP-normalize.

    Reference quirk preserved (encode/clip.py:76-84): normalization is
    applied to the **[-1, 1]** SD-preprocessed tensor, not the usual [0, 1]
    image — the CLIP means/stds are subtracted from already-rescaled data.
    Returns ``[1, 224, 224, 3]``.
    """
    arr = preprocess(image)[0]  # [H, W, 3] in [-1, 1]
    h, w, _ = arr.shape
    crop = min(h, w)
    top = (h - crop) // 2
    left = (w - crop) // 2
    arr = arr[top:top + crop, left:left + crop]
    # Bicubic antialiased downscale on the float data (per-channel PIL 'F'
    # resize ≈ torchvision resize(BICUBIC, antialias=True) within tolerance).
    chans = [
        np.asarray(
            Image.fromarray(arr[:, :, c], mode='F').resize(
                (CLIP_IMAGE_SIZE, CLIP_IMAGE_SIZE), resample=Image.BICUBIC),
            np.float32) for c in range(3)
    ]
    out = np.stack(chans, axis=-1)
    out = (out - CLIP_MEAN) / CLIP_STD
    return out[None]


def to_pil(images: np.ndarray) -> List[Image.Image]:
    """``[B, H, W, 3]`` floats in [0, 1] (or device-quantized uint8) → PIL."""
    images = np.asarray(images)
    if images.dtype == np.uint8:
        return [Image.fromarray(img) for img in images]
    images = np.clip(images, 0.0, 1.0)
    return [
        Image.fromarray((img * 255.0 + 0.5).astype(np.uint8))
        for img in images
    ]


def image_grid(imgs: Sequence[Image.Image]) -> Image.Image:
    """sqrt-based grid paste of a batch (reference utils.py:36-50).

    Conscious fix vs the reference: rows is ceil(num/cols), not floor — the
    reference's floor silently clips images pasted beyond the canvas (e.g.
    5 images → 3×1 grid losing two)."""
    num = len(imgs)
    cols = math.ceil(num**0.5)
    rows = math.ceil(num / cols)
    w, h = imgs[0].size
    grid = Image.new('RGB', size=(cols * w, rows * h))
    for i, img in enumerate(imgs):
        grid.paste(img, box=((i % cols) * w, (i // cols) * h))
    return grid
