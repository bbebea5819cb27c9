"""Mask synthesis for foreground/background editing.

Behavioral reference: `demo.py:33-131`
(`generate_mask_fg_tracking_for_validation`: gaussian blur -> re-threshold
-> convex hull -> ellipse dilation, frame 0 forced empty;
`generate_mask_bg_tracking_for_validation`: inverted threshold)."""

from __future__ import annotations

import numpy as np


def generate_mask_fg_tracking(mask_video: np.ndarray, blur_radius: int = 15,
                              dilation_pixels: int = 200) -> np.ndarray:
    """mask_video: [F, C, H, W] in [0, 1]. Returns [F, 1, H, W] uint8 {0,1};
    frame 0 always zero (`demo.py:33-90`)."""
    import cv2
    from scipy.ndimage import gaussian_filter

    f, c, h, w = mask_video.shape
    out = np.zeros((f, 1, h, w), np.uint8)
    gray = mask_video.mean(axis=1) if c > 1 else mask_video[:, 0]
    for i in range(1, f):
        m = (gray[i] > 0.5).astype(np.uint8) * 255
        if blur_radius > 0:
            blurred = gaussian_filter(m.astype(np.float32) / 255.0,
                                      sigma=blur_radius / 6.0)
            m = (blurred > 0.5).astype(np.uint8) * 255
        contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        convex = np.zeros_like(m)
        for contour in contours:
            if len(contour) >= 3:
                hull = cv2.convexHull(contour)
                cv2.fillPoly(convex, [hull], 255)
        if dilation_pixels > 0:
            kernel = cv2.getStructuringElement(
                cv2.MORPH_ELLIPSE,
                (dilation_pixels * 2 + 1, dilation_pixels * 2 + 1))
            convex = cv2.dilate(convex, kernel, iterations=1)
        out[i, 0] = (convex > 127).astype(np.uint8)
    return out


def generate_mask_bg_tracking(mask_video: np.ndarray) -> np.ndarray:
    """mask_video: [F, C, H, W]. Returns [F, 1, H, W] float {0,1} with
    frame 0 zero; dark pixels (< 0.5) become 1 (`demo.py:92-131`)."""
    f, c, h, w = mask_video.shape
    out = np.zeros((f, 1, h, w), np.float32)
    gray = (mask_video.mean(axis=1, keepdims=True) if c > 1
            else mask_video[:, :1])
    norm = gray / 255.0 if gray.max() > 1.0 else gray
    out[1:] = (norm[1:] < 0.5).astype(np.float32)
    return out
