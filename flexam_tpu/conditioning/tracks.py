"""Track normalization, coloring, cosine positional encoding.

Behavioral reference: `pipelines.py:1501-1761` (color generation inside
`fun_visualize_tracking_with_depth`, `apply_cosine_positional_encoding`,
`_generate_colors_from_points`)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def normalize_tracks(tracks: np.ndarray, height: int, width: int,
                     rng: Optional[np.random.RandomState] = None
                     ) -> np.ndarray:
    """(u, v, z) -> normalized [0, 1]^3: u/W, v/H, percentile-normalized
    inverse depth (`pipelines.py:1592-1633`)."""
    t = np.asarray(tracks, np.float64)
    out = np.zeros_like(t)
    out[..., 0] = np.clip(t[..., 0] / width, 0, 1)
    out[..., 1] = np.clip(t[..., 1] / height, 0, 1)
    z = t[..., 2]
    if np.all(z == 0):
        r = rng or np.random
        out[..., 2] = r.rand(*z.shape)
    else:
        inv_z = 1.0 / (z + 1e-10)
        p2, p98 = np.percentile(inv_z, [2, 98])
        out[..., 2] = np.clip((inv_z - p2) / (p98 - p2 + 1e-10), 0, 1)
    return out.astype(np.float32)


def cosine_positional_encoding(tracks: np.ndarray, height: int, width: int,
                               L: int = 4) -> List[np.ndarray]:
    """cos(2^i * pi * normalized_uvz) for i in 0..L-1
    (`apply_cosine_positional_encoding`, `pipelines.py:1575-1641`)."""
    normalized = normalize_tracks(tracks, height, width)
    return [np.cos((2.0 ** i) * np.pi * normalized).astype(np.float32)
            for i in range(L)]


def tracking_colors(tracks: np.ndarray, height: int, width: int,
                    rng: Optional[np.random.RandomState] = None
                    ) -> np.ndarray:
    """Per-point uint8 colors from FRAME-0 (u, v, 1/z): R = u/W, G = v/H,
    B = percentile-normalized inverse depth (`pipelines.py:1521-1540`)."""
    first = np.asarray(tracks[0], np.float64)
    n = first.shape[0]
    colors = np.zeros((n, 3), np.uint8)
    colors[:, 0] = (np.clip(first[:, 0] / width, 0, 1) * 255).astype(np.uint8)
    colors[:, 1] = (np.clip(first[:, 1] / height, 0, 1) * 255).astype(np.uint8)
    z = first[:, 2]
    if np.all(z == 0):
        r = rng or np.random
        colors[:, 2] = r.randint(0, 256, n).astype(np.uint8)
    else:
        inv_z = 1.0 / (z + 1e-10)
        p2, p98 = np.percentile(inv_z, [2, 98])
        colors[:, 2] = (np.clip((inv_z - p2) / (p98 - p2 + 1e-10), 0, 1)
                        * 255).astype(np.uint8)
    return colors


def cos_level_colors(encoded_frame0: np.ndarray) -> np.ndarray:
    """Colors for one cosine level from its frame-0 encoding in [-1, 1]
    (`_generate_colors_from_points`, `pipelines.py:1677-1693`)."""
    e = np.asarray(encoded_frame0, np.float64)
    return (np.clip((e + 1) / 2, 0, 1) * 255).astype(np.uint8)


def spectral_depth_colors(depths: np.ndarray) -> np.ndarray:
    """Per-frame Spectral-colormap colors from percentile-normalized depth
    (`_visualize_depth_tracking`, `pipelines.py:1782-1795`)."""
    import matplotlib
    colormap = matplotlib.colormaps["Spectral"]
    p2, p98 = np.percentile(depths, [2, 98])
    if p98 > p2:
        norm = (np.clip(depths, p2, p98) - p2) / (p98 - p2)
    else:
        norm = np.zeros_like(depths)
    return (colormap(norm, bytes=False)[:, :3] * 255).astype(np.uint8)
