"""Device-side track rasterization (TPU scatter rasterizer).

Behavioral reference: `pipelines.py:1501-1850` — same splat semantics as
`flexam_tpu.conditioning.rasterize` (the host/C++ parity oracle), executed
on the accelerator so that only the tracks [T, N, 3] (a few MB) cross the
host<->device tunnel instead of ~1.8 GB of rasterized full-resolution
control videos (SURVEY.md §7 step 8; round-1 prepare was 123 s of 296 s
e2e because of that transfer).

Algorithm (exact painter's-algorithm equivalence):
  1. points are ranked by depth: far -> near paint order means the
     nearest point has the highest rank (`sort_points_by_depth`,
     `pipelines.py:1215-1232`);
  2. each frame scatters rank+1 of every valid point into its CENTER
     pixel with a scatter-max (duplicate centers: nearest wins);
  3. the square splat (side+1 x side+1, PIL `draw.rectangle` includes
     both corners) is a max-pool dilation of the rank image: a pixel is
     covered by exactly the points whose center lies within Chebyshev
     distance side/2, and the maximum rank among them wins — identical
     to last-write-wins overdraw in depth order;
  4. winner rank -> point index -> color gather.

Scatter size is N points per frame (not N x splat-area): the dilation
moves the 25x expansion into a `reduce_window`, which is TPU-fast, while
the scatter stays small.

Depth ties: the host path uses numpy's unstable quicksort, so tie order
is arbitrary there too; with distinct depths the two paths are
bit-identical (parity-tested in tests/test_conditioning.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.conditioning.tracks import (cos_level_colors,
                                            cosine_positional_encoding,
                                            spectral_depth_colors,
                                            tracking_colors)


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def rank_point_image(pix: jnp.ndarray,        # [T, N, 2] float (x, y)
                     depth: jnp.ndarray,      # [T, N] float
                     valid: jnp.ndarray,      # [T, N] bool
                     height: int, width: int, window: int,
                     y_strict: bool) -> jnp.ndarray:
    """Winner POINT INDEX per pixel ([T, H, W] int32, -1 = background).

    `valid` carries visibility + any mask filtering; bounds/finite checks
    are applied here (int cast truncates toward zero like numpy
    `.astype(int)`; tracking video uses y > 0 strictly, `pipelines.py:1212`).
    """
    t, n, _ = pix.shape
    ipix = pix.astype(jnp.int32)
    x, y = ipix[..., 0], ipix[..., 1]
    finite = jnp.isfinite(pix).all(axis=-1)
    ylo = 1 if y_strict else 0
    inb = (x >= 0) & (x < width) & (y >= ylo) & (y < height)
    ok = valid & finite & inb
    flat = jnp.where(ok, y * width + x, height * width)

    # far -> near paint order; invalid points sort last (never scattered)
    key = jnp.where(ok, depth, -jnp.inf)
    order = jnp.argsort(-key, axis=1)          # [T, N] point idx, far first
    rank = jnp.argsort(order, axis=1)          # inverse permutation

    def per_frame(flat_t, rank_t):
        img = jnp.zeros((height * width + 1,), jnp.int32)
        img = img.at[flat_t].max(rank_t + 1, mode="drop")
        return img[:-1].reshape(height, width)

    rimg = jax.vmap(per_frame)(flat, rank)
    if window > 1:
        rimg = jax.lax.reduce_window(
            rimg, jnp.int32(0), jax.lax.max,
            (1, window, window), (1, 1, 1), "SAME")
    # winner rank -> original point index
    pimg = jnp.take_along_axis(
        order, jnp.maximum(rimg - 1, 0).reshape(t, -1), axis=1
    ).reshape(t, height, width)
    return jnp.where(rimg > 0, pimg, -1)


@partial(jax.jit, static_argnums=(2, 3, 4))
def colorize(pimg: jnp.ndarray,               # [T, H, W] int32, -1 = bg
             colors: jnp.ndarray,             # [N, 3] or [T, N, 3] uint8
             per_frame: bool, normalize: bool = False,
             dtype=jnp.float32) -> jnp.ndarray:
    """Point-index image -> [1, 3, T, H, W] float video in [0, 1] (or in
    [-1, 1] VAE-input form when normalize=True — fused here so the full-res
    f32 intermediate never materializes in HBM)."""
    t, h, w = pimg.shape
    safe = jnp.maximum(pimg, 0)
    if per_frame:
        out = jnp.take_along_axis(
            colors, safe.reshape(t, -1, 1), axis=1).reshape(t, h, w, 3)
    else:
        out = jnp.take(colors, safe, axis=0)
    out = jnp.where(pimg[..., None] >= 0, out, 0)
    video = out.astype(jnp.float32) / 255.0
    if normalize:
        video = video * 2.0 - 1.0
    return video.astype(dtype).transpose(3, 0, 1, 2)[None]


def _depth_frame_colors(tracks: np.ndarray, vis: np.ndarray) -> np.ndarray:
    """Per-frame Spectral colormap colors [T, N, 3] uint8 — the host path
    computes them from the VISIBLE depth set per frame
    (`_visualize_depth_tracking`, `pipelines.py:1782-1795`)."""
    t, n, _ = tracks.shape
    out = np.zeros((t, n, 3), np.uint8)
    for i in range(t):
        m = vis[i]
        if not m.any():
            continue
        out[i, m] = spectral_depth_colors(tracks[i, m, 2])
    return out


class DeviceRasterizer:
    """Rasterizes all 6 control streams on device from tracks.

    Only tracks/visibility/colors (a few MB) are shipped; the full-res
    videos exist solely in HBM, ready for the VAE encoder.
    """

    def __init__(self, tracks: np.ndarray, visibility: Optional[np.ndarray],
                 height: int, width: int, point_wise: int = 4,
                 cos_level: int = 4,
                 raster_mask: Optional[np.ndarray] = None,  # [T,H,W] {0,1}
                 generate_type: str = "full_edit",
                 rng: Optional[np.random.RandomState] = None):
        tracks = np.asarray(tracks, np.float32)
        t, n, _ = tracks.shape
        vis = (np.ones((t, n), bool) if visibility is None
               else np.asarray(visibility).reshape(t, n).astype(bool))
        self.height, self.width = height, width
        self.t = t
        self.track_window = 2 * (point_wise // 2) + 1
        self.cos_window = 5          # fixed 5x5 (`pipelines.py:1697-1700`)

        # host: tiny color tables (colors depend only on tracks)
        self._track_colors = tracking_colors(tracks, height, width, rng=rng)
        encoded = cosine_positional_encoding(tracks, height, width,
                                             L=cos_level)
        self._cos_colors = np.stack(
            [cos_level_colors(e[0]) for e in encoded])          # [L, N, 3]
        self._depth_colors = _depth_frame_colors(tracks, vis)   # [T, N, 3]

        # device: positions + validity (mask-center filter,
        # `_should_draw_point` `pipelines.py:1842-1850`)
        self._pix = jnp.asarray(tracks[..., :2])
        self._depth = jnp.asarray(tracks[..., 2])
        valid = jnp.asarray(vis)
        if raster_mask is not None and generate_type in (
                "foreground_edit", "background_edit"):
            m = jnp.asarray(np.asarray(raster_mask, np.float32) > 0.5)
            ix = jnp.clip(self._pix[..., 0].astype(jnp.int32), 0, width - 1)
            iy = jnp.clip(self._pix[..., 1].astype(jnp.int32), 0, height - 1)
            keep = jax.vmap(lambda mt, yt, xt: mt[yt, xt])(m, iy, ix)
            valid = valid & keep
        self._valid = valid
        self._pimg_cache: Dict[Tuple[int, bool], jnp.ndarray] = {}

    # frames per rank_point_image launch: the scatter/pool transients are
    # ~3 x chunk x H x W x 4 bytes — chunked so they stay ~180 MB next to
    # the resident 5B weights on a 16 GB chip
    frame_chunk = 32

    def _pimg(self, window: int, y_strict: bool) -> jnp.ndarray:
        key = (window, y_strict)
        if key not in self._pimg_cache:
            c = self.frame_chunk
            outs = [rank_point_image(
                self._pix[a:a + c], self._depth[a:a + c],
                self._valid[a:a + c],
                self.height, self.width, window, y_strict)
                for a in range(0, self.t, c)]
            self._pimg_cache[key] = (outs[0] if len(outs) == 1
                                     else jnp.concatenate(outs, axis=0))
        return self._pimg_cache[key]

    def tracking_video(self, normalize=False, dtype=jnp.float32) -> jnp.ndarray:
        """`fun_visualize_tracking_with_depth` — [1, 3, T, H, W] in [0,1]."""
        return colorize(self._pimg(self.track_window, True),
                        jnp.asarray(self._track_colors), False,
                        normalize, dtype)

    def cos_videos(self, normalize=False, dtype=jnp.float32
                   ) -> List[jnp.ndarray]:
        """`_visualize_cosine_encoded_tracking` x L levels."""
        pimg = self._pimg(self.cos_window, False)
        return [colorize(pimg, jnp.asarray(c), False, normalize, dtype)
                for c in self._cos_colors]

    def cos_video(self, level: int, normalize=False,
                  dtype=jnp.float32) -> jnp.ndarray:
        """One cosine level (streams one full-res video at a time)."""
        return colorize(self._pimg(self.cos_window, False),
                        jnp.asarray(self._cos_colors[level]), False,
                        normalize, dtype)

    @property
    def num_cos_levels(self) -> int:
        return len(self._cos_colors)

    def depth_video(self, normalize=False, dtype=jnp.float32) -> jnp.ndarray:
        """`_visualize_depth_tracking` — per-frame Spectral colors."""
        return colorize(self._pimg(self.track_window, False),
                        jnp.asarray(self._depth_colors), True,
                        normalize, dtype)

    # -- frame producers (for flexam_tpu.models.vae_stream
    #    vae_encode_stream_fn: rasterize group-by-group so the full-res
    #    video never materializes in HBM) --

    def tracking_frame_fn(self, dtype=jnp.float32):
        pimg = self._pimg(self.track_window, True)
        colors = jnp.asarray(self._track_colors)
        return lambda a, n: colorize(pimg[a:a + n], colors, False, True,
                                     dtype)

    def cos_frame_fn(self, level: int, dtype=jnp.float32):
        pimg = self._pimg(self.cos_window, False)
        colors = jnp.asarray(self._cos_colors[level])
        return lambda a, n: colorize(pimg[a:a + n], colors, False, True,
                                     dtype)

    def depth_frame_fn(self, dtype=jnp.float32):
        pimg = self._pimg(self.track_window, False)
        colors = jnp.asarray(self._depth_colors)
        return lambda a, n: colorize(pimg[a:a + n], colors[a:a + n], True,
                                     True, dtype)

    def drop(self, window: int, y_strict: bool):
        """Free one cached rank image ([T,H,W] int32 ≈ 170 MB at flagship
        scale — material next to resident 5B weights on a 16 GB chip)."""
        self._pimg_cache.pop((window, y_strict), None)

    def free(self):
        self._pimg_cache.clear()
