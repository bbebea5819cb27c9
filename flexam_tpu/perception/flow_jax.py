"""Dense optical flow + track chaining ON DEVICE (pyramidal Lucas-Kanade).

Round-2 measurement: the flow-baseline tracking front-end spent 49.3 s of
host CPU (one core) on cv2 Farneback + numpy chaining at flagship scale
(BASELINE.md video-input row), while the chip sat idle. This module moves
the whole front-end into one jit:

  * coarse-to-fine dense LK flow: image pyramids by 2x average pooling;
    per level, iterative refinement — warp the next frame by the current
    flow (bilinear gather), box-filtered structure tensor (separable
    sums), closed-form 2x2 solve per pixel. All convs/gathers, so XLA
    maps it onto the MXU/VPU; every frame PAIR is batched.
  * track chaining as a `lax.scan` over frames: advance the query grid by
    bilinear-sampled forward flow, kill tracks on forward<->backward
    inconsistency (the same consistency rule as the host baseline in
    `tracking.track_video_flow`) and out-of-bounds.

Only tracks [T, N, 3] + visibility cross back to the host — the video
ships once. The host Farneback path remains as `tracking.track_video_flow`
(the parity baseline); `dispatch_tracking` prefers this one on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """[.., H, W] -> [.., H//2, W//2] 2x2 mean (pyramid downsample)."""
    h2, w2 = x.shape[-2] // 2, x.shape[-1] // 2
    x = x[..., : h2 * 2, : w2 * 2]
    return x.reshape(*x.shape[:-2], h2, 2, w2, 2).mean(axis=(-3, -1))


def _box_filter(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Separable (2r+1)^2 box SUM over the last two axes (edge-padded)."""
    k = 2 * r + 1
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(r, r), (0, 0)], "edge")
    x = jnp.cumsum(xp, axis=-2)
    x = x[..., k - 1:, :] - jnp.concatenate(
        [jnp.zeros_like(x[..., :1, :]), x[..., : -k, :]], axis=-2)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, 0), (r, r)], "edge")
    x2 = jnp.cumsum(xp, axis=-1)
    return x2[..., k - 1:] - jnp.concatenate(
        [jnp.zeros_like(x2[..., :1]), x2[..., : -k]], axis=-1)


def _grad(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference image gradients (edge-replicated)."""
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)], "edge")
    gx = (xp[..., 1:-1, 2:] - xp[..., 1:-1, :-2]) * 0.5
    gy = (xp[..., 2:, 1:-1] - xp[..., :-2, 1:-1]) * 0.5
    return gx, gy


def _bilinear(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """img [*batch, H, W]; y/x [*batch, *sample] -> [*batch, *sample]
    (border clamp). Works for dense per-pixel warps ([B, H, W] coords)
    and sparse point sampling ([B, N] coords) alike."""
    h, w = img.shape[-2], img.shape[-1]
    batch = img.shape[:-2]
    nb = len(batch)
    # exact border handling: the corner cell owns fx in [0, 1] so a
    # sample AT w-1 returns img[w-1] exactly (a w-1.001 clamp would mix
    # in 0.1% of the neighbor — visible in align_corners resize parity)
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    fx = x - x0
    fy = y - y0
    flat = img.reshape(batch + (h * w,))

    def g(yy, xx):
        idx = yy * w + xx
        sample = idx.shape[nb:]
        out = jnp.take_along_axis(flat, idx.reshape(batch + (-1,)),
                                  axis=-1)
        return out.reshape(batch + sample)

    a = g(y0, x0)
    b = g(y0, x0 + 1)
    c = g(y0 + 1, x0)
    d = g(y0 + 1, x0 + 1)
    return (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
            + c * (1 - fx) * fy + d * fx * fy)


def _lk_level(prev: jnp.ndarray, nxt: jnp.ndarray, flow: jnp.ndarray,
              radius: int, iters: int, eps: float = 1e-4) -> jnp.ndarray:
    """One pyramid level of iterative LK. prev/nxt [B, H, W];
    flow [B, H, W, 2] (x, y) in pixels at this level's scale."""
    b, h, w = prev.shape
    gx, gy = _grad(prev)
    gxx = _box_filter(gx * gx, radius)
    gxy = _box_filter(gx * gy, radius)
    gyy = _box_filter(gy * gy, radius)
    det = gxx * gyy - gxy * gxy
    ok = det > eps
    inv_det = jnp.where(ok, 1.0 / jnp.maximum(det, eps), 0.0)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")

    def body(_, flow):
        warped = _bilinear(nxt, ys[None] + flow[..., 1], xs[None] + flow[..., 0])
        it = warped - prev
        bx = _box_filter(gx * it, radius)
        by = _box_filter(gy * it, radius)
        du = -(gyy * bx - gxy * by) * inv_det
        dv = -(-gxy * bx + gxx * by) * inv_det
        # clamp per-iteration update: LK linearization is only locally valid
        du = jnp.clip(du, -radius, radius)
        dv = jnp.clip(dv, -radius, radius)
        return flow + jnp.stack([du, dv], axis=-1)

    return jax.lax.fori_loop(0, iters, body, flow)


def _clamp_levels(levels: int, h: int, w: int, radius: int) -> int:
    """Pyramid depth such that the coarsest level stays meaningfully
    larger than the LK window — a 6-pixel level under a radius-7 box
    filter produces garbage coarse flow that poisons every finer level
    (measured: visibility collapses on small clips)."""
    min_dim = 2 * radius + 2
    lv = 1
    hh, ww = h, w
    while lv < levels and hh // 2 >= min_dim and ww // 2 >= min_dim:
        hh //= 2
        ww //= 2
        lv += 1
    return lv


@functools.partial(jax.jit, static_argnames=("levels", "radius", "iters"))
def dense_flow(prev: jnp.ndarray, nxt: jnp.ndarray, levels: int = 3,
               radius: int = 7, iters: int = 4) -> jnp.ndarray:
    """Batched dense flow: prev/nxt [B, H, W] grayscale 0..1 ->
    flow [B, H, W, 2] (x, y) such that nxt(p + flow(p)) ~= prev(p)."""
    levels = _clamp_levels(levels, prev.shape[-2], prev.shape[-1], radius)
    pyr_p = [prev]
    pyr_n = [nxt]
    for _ in range(levels - 1):
        pyr_p.append(_avg_pool2(pyr_p[-1]))
        pyr_n.append(_avg_pool2(pyr_n[-1]))
    flow = jnp.zeros(pyr_p[-1].shape + (2,), jnp.float32)
    for lvl in range(levels - 1, -1, -1):
        p, n = pyr_p[lvl], pyr_n[lvl]
        if lvl != levels - 1:
            flow = 2.0 * jax.image.resize(
                flow, (flow.shape[0], p.shape[1], p.shape[2], 2), "bilinear")
        flow = _lk_level(p, n, flow, radius, iters)
    return flow


@functools.partial(jax.jit, static_argnames=("density", "fb_thresh",
                                             "levels", "radius", "iters"))
def _track_device(gray: jnp.ndarray, depth: jnp.ndarray, density: int,
                  fb_thresh: float, levels: int, radius: int, iters: int):
    """gray [T, H, W] 0..1; depth [T, H, W] -> (tracks [T, N, 3],
    vis [T, N]) — the whole chaining loop on device."""
    t, h, w = gray.shape
    fwd = dense_flow(gray[:-1], gray[1:], levels, radius, iters)
    bwd = dense_flow(gray[1:], gray[:-1], levels, radius, iters)

    ys = jnp.arange(density // 2, h, density, dtype=jnp.float32)
    xs = jnp.arange(density // 2, w, density, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pts = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)    # [N, 2]
    n = pts.shape[0]

    def step(carry, inputs):
        cur, alive = carry
        f, bwd_i, dep_i = inputs
        inb = ((cur[:, 0] >= 0) & (cur[:, 0] < w)
               & (cur[:, 1] >= 0) & (cur[:, 1] < h))
        alive = alive & inb
        d = _bilinear(dep_i[None], cur[None, :, 1], cur[None, :, 0])[0]
        out_t = jnp.concatenate([cur, d[:, None]], axis=1)
        stepv = jnp.stack([
            _bilinear(f[None, ..., 0], cur[None, :, 1], cur[None, :, 0])[0],
            _bilinear(f[None, ..., 1], cur[None, :, 1], cur[None, :, 0])[0],
        ], axis=1)
        nxt_pos = cur + stepv
        back = jnp.stack([
            _bilinear(bwd_i[None, ..., 0], nxt_pos[None, :, 1],
                      nxt_pos[None, :, 0])[0],
            _bilinear(bwd_i[None, ..., 1], nxt_pos[None, :, 1],
                      nxt_pos[None, :, 0])[0],
        ], axis=1)
        err = jnp.linalg.norm(stepv + back, axis=1)
        alive_next = alive & (err < fb_thresh)
        return (nxt_pos, alive_next), (out_t, alive)

    init = (pts, jnp.ones((n,), bool))
    (last_pos, last_alive), (tracks, vis) = jax.lax.scan(
        step, init, (fwd, bwd, depth[:-1]))
    # final frame
    inb = ((last_pos[:, 0] >= 0) & (last_pos[:, 0] < w)
           & (last_pos[:, 1] >= 0) & (last_pos[:, 1] < h))
    last_alive = last_alive & inb
    d_last = _bilinear(depth[-1][None], last_pos[None, :, 1],
                       last_pos[None, :, 0])[0]
    tracks = jnp.concatenate(
        [tracks, jnp.concatenate([last_pos, d_last[:, None]], 1)[None]], 0)
    vis = jnp.concatenate([vis, last_alive[None]], 0)
    return tracks, vis


def track_video_flow_device(
    video: np.ndarray,                # [1,3,T,H,W] or [T,H,W,3] in [0,1]
    density: int = 10,
    depth_backend: Optional[str] = None,
    fb_thresh: float = 1.5,
    levels: int = 4,
    radius: int = 7,
    iters: int = 4,
    downscale: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Device-side drop-in for `tracking.track_video_flow`: same contract
    (tracks [T, N, 3] (u, v, depth), vis [T, N] bool), the video crosses
    the link once as fp16, only the sparse tracks come back.

    `downscale` runs the flow pyramid at 1/ds resolution (auto: 2 at
    >=384p, 1 below). Tracks sample a `density`-pixel grid, so half-res
    flow costs ~4x less while the chained positions stay within the
    bilinear-resample error of the full-res flow (track grids identical,
    positions offset <=1 px from the grid-phase shift); the pyramid
    already computed the coarser levels anyway — ds=2 just drops the
    finest one. Auto-disabled when `density`/geometry is not divisible
    by ds (the grid would change size)."""
    from flexam_tpu.perception.depth import estimate_depth
    from flexam_tpu.perception.tracking import _to_thwc

    v = _to_thwc(video)
    t, h, w, _ = v.shape
    if downscale is None:
        downscale = 2 if min(h, w) >= 384 else 1
    ds = int(downscale)
    if ds < 1 or (ds & (ds - 1)) or density % ds or h % ds or w % ds:
        ds = 1
    lum = np.asarray([0.299, 0.587, 0.114], np.float32)
    depth = estimate_depth(v, backend=depth_backend)       # [T, H, W]
    gray = jnp.asarray((v @ lum).astype(np.float16)).astype(jnp.float32)
    depth_j = jnp.asarray(np.asarray(depth, np.float16)).astype(jnp.float32)
    for _ in range(int(np.log2(ds)) if ds > 1 else 0):
        gray = _avg_pool2(gray)
        depth_j = _avg_pool2(depth_j)
    tracks, vis = _track_device(
        gray, depth_j, int(density) // ds, float(fb_thresh) / ds,
        int(levels), int(radius), int(iters))
    if ds > 1:
        tracks = tracks * jnp.asarray([ds, ds, 1.0], jnp.float32)
    return (np.asarray(tracks, np.float32), np.asarray(vis))
