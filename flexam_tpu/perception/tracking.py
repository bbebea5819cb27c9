"""Baseline dense 3D tracker (optical-flow chaining).

The reference's tracks come from DELTA DenseTrack3D + UniDepth
(`pipelines.py:1362-1499`) — external CUDA checkpoints whose submodules
are EMPTY in the snapshot (SURVEY.md §2.6). This module makes video-input
generation runnable out of the box with a classical baseline:

  * a stride-`density` grid of query points on frame 0 (the same
    subsampling DELTA's dense output gets, `pipelines.py:1461-1494`);
  * per-frame dense optical flow (cv2 Farneback) chained to advance each
    point, bilinear-sampled at the current position;
  * visibility from forward<->backward flow consistency + bounds;
  * per-frame depth from the pluggable depth registry
    (flexam_tpu.perception.depth), sampled at the track positions.

Quality is below a learned tracker — use `register_annotator_backend` /
`--tracks_npz` to plug DELTA when its weights are available; this is the
no-external-models fallback, selected with `--tracking_method flow`.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def find_delta_checkpoint() -> Optional[str]:
    """Locate densetrack3d.pth like the reference does
    (`pipelines.py:1383`, `annotator/nodes.py:325-343`): the
    FLEXAM_DELTA_CKPT env var, then the reference's default checkpoint
    layout under ./checkpoints."""
    cand = os.environ.get("FLEXAM_DELTA_CKPT")
    if cand and os.path.exists(cand):
        return cand
    for base in ("checkpoints/Wan2.2-Fun-5B-FLEXAM", "checkpoints",
                 "checkpoints/DELTA"):
        p = os.path.join(base, "densetrack3d.pth")
        if os.path.exists(p):
            return p
    return None


def dispatch_tracking(video, method: str = "auto", density: int = 10,
                      ckpt: Optional[str] = None,
                      depth_backend: Optional[str] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Shared tracker dispatch (demo CLI + serve): 'delta' uses the
    learned tracker when a checkpoint exists and FALLS BACK to the flow
    baseline otherwise (random-weight DELTA produces noise tracks —
    never serve those silently); 'auto' picks delta iff a checkpoint is
    found; 'flow' forces the baseline."""
    method = (method or "auto").lower()
    ckpt = ckpt or find_delta_checkpoint()
    if method in ("delta", "auto") and ckpt:
        # File existence is not evidence of trained weights: the mapper is
        # shape-signature best-effort, so gate on its coverage report and
        # fall back to the flow baseline rather than serving a
        # mostly-random model silently (ADVICE r2). FLEXAM_FORCE_DELTA=1
        # opts into a low-coverage load anyway.
        from flexam_tpu.perception.densetrack3d import load_densetrack3d
        model = load_densetrack3d(ckpt)
        if model.load_ok or os.environ.get("FLEXAM_FORCE_DELTA") == "1":
            return track_video_delta(video, density=density, model=model,
                                     depth_backend=depth_backend)
        print(f"WARNING: {ckpt} mapped below coverage threshold — "
              "falling back to the optical-flow tracker (set "
              "FLEXAM_FORCE_DELTA=1 to use the partial load anyway)")
    elif method == "delta":
        print("NOTE: no densetrack3d.pth found — using the optical-flow "
              "baseline tracker instead of random weights")
    # flow backend: the device pyramidal-LK tracker (perception/flow_jax)
    # runs the whole front-end in one jit on TPU (host Farneback spent
    # 49.3 s of single-core CPU at flagship scale); FLEXAM_FLOW=host
    # forces the cv2 baseline, =device forces the jax one
    choice = os.environ.get("FLEXAM_FLOW", "auto")
    if choice != "host":
        import jax
        on_tpu = jax.default_backend() not in ("cpu",)
        if choice == "device" or on_tpu:
            from flexam_tpu.perception.flow_jax import \
                track_video_flow_device
            return track_video_flow_device(video, density=density,
                                           depth_backend=depth_backend)
    return track_video_flow(video, density=density,
                            depth_backend=depth_backend)


def track_video_delta(
    video: np.ndarray,                 # [1,3,T,H,W] or [T,H,W,3] in [0,1]
    density: int = 10,
    ckpt: Optional[str] = None,
    depth_backend: Optional[str] = None,
    model=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Learned dense tracking — the `generate_tracking_DELTA` flow
    (`pipelines.py:1362-1499`): depth estimation -> DenseTrack3D ->
    stride-`density` subsample of the dense grid. Returns
    (tracks [T, N, 3] with (u, v, depth), visibility [T, N] bool).

    The density subsample runs ON DEVICE (predictor `downsample=`) so only
    the sparse tracks cross the axon tunnel, not the 196k-point dense grid.
    """
    from flexam_tpu.perception.densetrack3d import (
        DensePredictor3D, DenseTrack3D, load_densetrack3d)
    from flexam_tpu.perception.depth import estimate_depth

    v = _to_thwc(video)
    t, h, w, _ = v.shape
    if model is None:
        ckpt = ckpt or find_delta_checkpoint()
        if ckpt:
            model = load_densetrack3d(ckpt)
        else:
            print("WARNING: no densetrack3d.pth found — random-weight "
                  "DenseTrack3D (set FLEXAM_DELTA_CKPT; quality needs "
                  "trained weights)")
            model = DenseTrack3D()
    depth = estimate_depth(v, backend=depth_backend)       # [T, H, W]
    out = DensePredictor3D(model)(
        v.transpose(0, 3, 1, 2)[None],                     # [1,T,3,H,W]
        depth[None, :, None],                              # [1,T,1,H,W]
        grid_query_frame=0, downsample=density)
    uv = np.asarray(out["trajs_uv"][0], np.float32)        # [T, N, 2]
    dep = np.asarray(out["trajs_depth"][0, ..., 0], np.float32)
    vis = np.asarray(out["vis"][0]) > 0.5
    tracks = np.concatenate([uv, dep[..., None]], axis=-1)
    return tracks.astype(np.float32), vis


def _to_thwc(video: np.ndarray) -> np.ndarray:
    v = np.asarray(video, np.float32)
    if v.ndim == 5:
        v = v[0].transpose(1, 2, 3, 0)
    return v


def _sample_bilinear(img: np.ndarray, xy: np.ndarray) -> np.ndarray:
    """img [H, W(, C)], xy [N, 2] float -> [N(, C)] with border clamp."""
    h, w = img.shape[:2]
    x = np.clip(xy[:, 0], 0, w - 1.001)
    y = np.clip(xy[:, 1], 0, h - 1.001)
    x0 = x.astype(np.int32)
    y0 = y.astype(np.int32)
    fx = (x - x0)[:, None] if img.ndim == 3 else (x - x0)
    fy = (y - y0)[:, None] if img.ndim == 3 else (y - y0)
    a = img[y0, x0]
    b = img[y0, x0 + 1]
    c = img[y0 + 1, x0]
    d = img[y0 + 1, x0 + 1]
    return (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
            + c * (1 - fx) * fy + d * fx * fy)


def track_video_flow(
    video: np.ndarray,                 # [1,3,T,H,W] or [T,H,W,3] in [0,1]
    density: int = 10,
    depth_backend: Optional[str] = None,
    fb_thresh: float = 1.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (tracks [T, N, 3] with (u, v, depth), visibility [T, N])
    in the DELTA output format consumed by the rasterizers."""
    import cv2

    from flexam_tpu.perception.depth import estimate_depth

    v = _to_thwc(video)
    t, h, w, _ = v.shape
    gray = [(f @ np.array([0.299, 0.587, 0.114], np.float32) * 255
             ).astype(np.uint8) for f in v]

    ys = np.arange(density // 2, h, density, dtype=np.float32)
    xs = np.arange(density // 2, w, density, dtype=np.float32)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    pts = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)   # [N,2]
    n = len(pts)

    depth = estimate_depth(v, backend=depth_backend)           # [T,H,W]

    tracks = np.zeros((t, n, 3), np.float32)
    vis = np.zeros((t, n), bool)
    cur = pts.copy()
    alive = np.ones(n, bool)
    flow_kw = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3,
                   poly_n=5, poly_sigma=1.2, flags=0)

    for i in range(t):
        inb = ((cur[:, 0] >= 0) & (cur[:, 0] < w)
               & (cur[:, 1] >= 0) & (cur[:, 1] < h))
        alive &= inb
        tracks[i, :, :2] = cur
        tracks[i, :, 2] = _sample_bilinear(depth[i], cur)
        vis[i] = alive
        if i == t - 1:
            break
        fwd = cv2.calcOpticalFlowFarneback(gray[i], gray[i + 1], None,
                                           **flow_kw)
        bwd = cv2.calcOpticalFlowFarneback(gray[i + 1], gray[i], None,
                                           **flow_kw)
        step = _sample_bilinear(fwd, cur)                      # [N,2]
        nxt = cur + step
        # forward-backward consistency: a point that lands somewhere the
        # backward flow does not return from is occluded/lost
        back = _sample_bilinear(bwd, nxt)
        err = np.linalg.norm(step + back, axis=1)
        alive &= err < fb_thresh
        cur = nxt
    return tracks, vis
