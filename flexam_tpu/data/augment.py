"""Video color-jitter augmentation.

Behavioral reference: `FlexAM/data/dataset_dasv2_enhanced.py:388-456`
(`video_color_jitter` + the four adjust_* helpers): one set of factors is
drawn per VIDEO and applied to every frame. Vectorized over frames here
(the reference loops per frame); per-frame outputs are identical because
the factors are shared.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    """[..., H, W, C] uint8 -> uint8 (`:388-390`)."""
    return np.clip(img * factor, 0, 255).astype(np.uint8)


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    """Per-frame channel mean anchor (`:392-395`); axis=(−3,−2) matches the
    reference's per-frame axis=(0,1) when vectorized over leading dims."""
    mean = img.mean(axis=(-3, -2), keepdims=True).astype(np.float32)
    return np.clip((img.astype(np.float32) - mean) * factor + mean,
                   0, 255).astype(np.uint8)


def adjust_saturation(img: np.ndarray, factor: float) -> np.ndarray:
    """Grayscale anchor (`:397-402`)."""
    gray = np.mean(img, axis=-1, keepdims=True).astype(np.float32)
    return np.clip((img.astype(np.float32) - gray) * factor + gray,
                   0, 255).astype(np.uint8)


def adjust_hue(img: np.ndarray, factor: float) -> np.ndarray:
    """HSV hue rotation by factor*180 over the 0..179 H range
    (`:404-411`); cv2 handles one frame at a time."""
    import cv2
    out = np.empty_like(img)
    flat = img.reshape((-1,) + img.shape[-3:])
    oflat = out.reshape(flat.shape)
    for i, frame in enumerate(flat):
        hsv = cv2.cvtColor(frame, cv2.COLOR_RGB2HSV)
        hsv[..., 0] = (hsv[..., 0] + factor * 180) % 180
        oflat[i] = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    return out


def video_color_jitter(video: np.ndarray,
                       brightness: float = 0.2, contrast: float = 0.2,
                       saturation: float = 0.2, hue: float = 0.1,
                       rng: Optional[np.random.RandomState] = None
                       ) -> np.ndarray:
    """[F, H, W, C] uint8 -> jittered uint8; one factor set per video
    (`video_color_jitter`, `:413-456`)."""
    assert video.ndim == 4 and video.dtype == np.uint8
    r = rng or np.random
    bf = r.uniform(1 - brightness, 1 + brightness)
    cf = r.uniform(1 - contrast, 1 + contrast)
    sf = r.uniform(1 - saturation, 1 + saturation)
    hf = r.uniform(-hue, hue)
    out = adjust_brightness(video, bf)
    out = adjust_contrast(out, cf)
    out = adjust_saturation(out, sf)
    out = adjust_hue(out, hf)
    return out
