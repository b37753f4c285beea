"""ROI-safe augmentations (host-side numpy).

Redesigns the reference's albumentations pipelines
(/root/reference/src/human_edge_detection/augmentations.py:16-274): the key
invariant is preserved — **no geometric transforms except horizontal flip**
(which updates boxes/masks consistently), because anything else would break
ROI alignment between the image and the normalised boxes. Photometric
transforms (brightness/contrast/saturation/hue, gamma, blur, noise,
compression-ish degradation) operate on the image only.

Each transform is a pure function (sample, rng) -> sample operating on:
    image (H, W, 3) float32 [0, 1]
    boxes (K, 4) normalised [x1, y1, x2, y2]
    masks (K, mh, mw) or full-size masks — flipped consistently.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np


def hflip(sample: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Horizontal flip of image + normalised boxes + per-ROI masks."""
    out = dict(sample)
    out["image"] = sample["image"][:, ::-1, :].copy()
    boxes = sample["boxes"].copy()
    x1 = boxes[:, 0].copy()
    boxes[:, 0] = 1.0 - sample["boxes"][:, 2]
    boxes[:, 2] = 1.0 - x1
    out["boxes"] = boxes
    if "masks" in sample:
        out["masks"] = sample["masks"][:, :, ::-1].copy()
    if "full_mask" in sample:
        out["full_mask"] = sample["full_mask"][:, ::-1].copy()
    return out


def _blend(a: np.ndarray, b: np.ndarray, t: float) -> np.ndarray:
    return np.clip(a * (1.0 - t) + b * t, 0.0, 1.0)


def brightness_contrast(img: np.ndarray, rng: np.random.Generator,
                        brightness: float = 0.2, contrast: float = 0.2) -> np.ndarray:
    img = np.clip(img + rng.uniform(-brightness, brightness), 0.0, 1.0)
    c = 1.0 + rng.uniform(-contrast, contrast)
    return np.clip((img - img.mean()) * c + img.mean(), 0.0, 1.0)


def saturation_hue(img: np.ndarray, rng: np.random.Generator,
                   saturation: float = 0.2, hue: float = 0.05) -> np.ndarray:
    gray = img.mean(axis=-1, keepdims=True)
    img = _blend(gray, img, 1.0 + rng.uniform(-saturation, saturation))
    # cheap hue-ish: rotate channels slightly
    shift = rng.uniform(-hue, hue)
    mix = np.clip(img + shift * (np.roll(img, 1, axis=-1) - img), 0.0, 1.0)
    return mix


def gamma(img: np.ndarray, rng: np.random.Generator, limit: float = 0.2) -> np.ndarray:
    g = 1.0 + rng.uniform(-limit, limit)
    return np.clip(img, 1e-6, 1.0) ** g


def gaussian_noise(img: np.ndarray, rng: np.random.Generator, sigma: float = 0.02) -> np.ndarray:
    return np.clip(img + rng.normal(0.0, sigma, img.shape).astype(img.dtype), 0.0, 1.0)


def gaussian_blur(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    k = np.asarray([1.0, 2.0, 1.0], img.dtype)
    k /= k.sum()
    out = img
    for axis in (0, 1):
        pad = [(0, 0)] * 3
        pad[axis] = (1, 1)
        p = np.pad(out, pad, mode="edge")
        sl = [slice(None)] * 3
        acc = np.zeros_like(out)
        for i, w in enumerate(k):
            sl[axis] = slice(i, i + out.shape[axis])
            acc += w * p[tuple(sl)]
        out = acc
    return out


@dataclass
class AugmentConfig:
    hflip_prob: float = 0.5
    color_prob: float = 0.5
    gamma_prob: float = 0.3
    blur_prob: float = 0.1
    noise_prob: float = 0.1
    heavy: bool = False


def augment_sample(sample: Dict[str, np.ndarray], rng: np.random.Generator,
                   cfg: Optional[AugmentConfig] = None) -> Dict[str, np.ndarray]:
    cfg = cfg or AugmentConfig()
    if rng.random() < cfg.hflip_prob:
        sample = hflip(sample)
    img = sample["image"]
    if rng.random() < cfg.color_prob:
        img = brightness_contrast(img, rng)
        img = saturation_hue(img, rng)
    if rng.random() < cfg.gamma_prob:
        img = gamma(img, rng)
    if cfg.heavy and rng.random() < cfg.blur_prob:
        img = gaussian_blur(img, rng)
    if cfg.heavy and rng.random() < cfg.noise_prob:
        img = gaussian_noise(img, rng)
    out = dict(sample)
    out["image"] = img.astype(np.float32)
    return out
