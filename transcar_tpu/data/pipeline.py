"""Host-side multi-view image pipeline (C11 of SURVEY.md §2).

Numpy re-implementations of the reference pipeline ops
(datasets/pipelines/transform_3d.py) plus the upstream mmdet3d loaders the
configs use (config :157-184):

  * load_multiview_images     — LoadMultiViewImageFromFiles(to_float32)
  * photometric_distortion    — PhotoMetricDistortionMultiViewImage (:96-192)
  * normalize_images          — NormalizeMultiviewImage / mmcv.imnormalize
  * pad_to_divisor            — PadMultiViewImage(size_divisor=32) (:8-56)

Images flow as float32 BGR HWC (the caffe convention of the primary config:
mean (103.53, 116.28, 123.675), std 1, to_rgb=False) and are stacked to
[N_cams, H, W, 3] at the end.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def load_multiview_images(paths: Sequence[str]) -> List[np.ndarray]:
    """Read images as float32 BGR HWC (mmcv.imread default is BGR)."""
    from PIL import Image

    imgs = []
    for p in paths:
        rgb = np.asarray(Image.open(p).convert("RGB"), dtype=np.float32)
        imgs.append(rgb[..., ::-1].copy())           # → BGR
    return imgs


def normalize_images(imgs: List[np.ndarray], mean, std,
                     to_rgb: bool = False) -> List[np.ndarray]:
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    out = []
    for img in imgs:
        x = img.astype(np.float32)
        if to_rgb:
            x = x[..., ::-1]
        out.append((x - mean) / std)
    return out


def pad_to_divisor(imgs: List[np.ndarray], divisor: int = 32,
                   pad_val: float = 0.0) -> List[np.ndarray]:
    out = []
    for img in imgs:
        h, w = img.shape[:2]
        ph = (h + divisor - 1) // divisor * divisor
        pw = (w + divisor - 1) // divisor * divisor
        if (ph, pw) != (h, w):
            img = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)),
                         constant_values=pad_val)
        out.append(img)
    return out


# ---------------------------------------------------------------------------
# photometric distortion (train only)
# ---------------------------------------------------------------------------

def _bgr2hsv(img: np.ndarray) -> np.ndarray:
    """float32 BGR [0,255] → HSV with H in degrees (mmcv/cv2 semantics)."""
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-12), 0.0)
    dz = np.maximum(delta, 1e-12)
    h = np.where(
        maxc == r, 60.0 * (g - b) / dz,
        np.where(maxc == g, 120.0 + 60.0 * (b - r) / dz,
                 240.0 + 60.0 * (r - g) / dz))
    h = np.where(delta == 0, 0.0, h)
    h = np.where(h < 0, h + 360.0, h)
    return np.stack([h, s, v], axis=-1)


def _hsv2bgr(img: np.ndarray) -> np.ndarray:
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    h60 = (h / 60.0) % 6.0
    i = np.floor(h60)
    f = h60 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(np.int32)
    r = np.choose(i % 6, [v, q, p, p, t, v])
    g = np.choose(i % 6, [t, v, v, q, p, p])
    b = np.choose(i % 6, [p, p, t, v, v, q])
    return np.stack([b, g, r], axis=-1)


def photometric_distortion(
    imgs: List[np.ndarray],
    rng: np.random.Generator,
    brightness_delta: float = 32.0,
    contrast_range=(0.5, 1.5),
    saturation_range=(0.5, 1.5),
    hue_delta: float = 18.0,
) -> List[np.ndarray]:
    """Per-image independent distortion (transform_3d.py:125-181)."""
    out = []
    for img in imgs:
        img = img.astype(np.float32).copy()
        if rng.integers(2):
            img += rng.uniform(-brightness_delta, brightness_delta)
        mode = rng.integers(2)
        if mode == 1 and rng.integers(2):
            img *= rng.uniform(*contrast_range)
        img = _bgr2hsv(img)
        if rng.integers(2):
            img[..., 1] *= rng.uniform(*saturation_range)
        if rng.integers(2):
            img[..., 0] += rng.uniform(-hue_delta, hue_delta)
            img[..., 0][img[..., 0] > 360] -= 360
            img[..., 0][img[..., 0] < 0] += 360
        img = _hsv2bgr(img)
        if mode == 0 and rng.integers(2):
            img *= rng.uniform(*contrast_range)
        if rng.integers(2):
            img = img[..., rng.permutation(3)]
        out.append(img)
    return out


def stack_views(imgs: List[np.ndarray]) -> np.ndarray:
    return np.stack(imgs, axis=0).astype(np.float32)
