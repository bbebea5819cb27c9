"""Device-side dense flow + track chaining (perception/flow_jax.py) —
VERDICT r2 item 3a: the tracking front-end moves on device.

Quality gates use synthetic scenes with known ground truth (the same
methodology as the host baseline's consistency rule); the host
Farneback path in `tracking.track_video_flow` stays the parity
reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexam_tpu.perception.flow_jax import (dense_flow,
                                            track_video_flow_device)


def _pattern(h, w, seed=0):
    """Smooth random pattern (LK needs texture + differentiability)."""
    rng = np.random.RandomState(seed)
    base = rng.rand(h // 4 + 2, w // 4 + 2).astype(np.float32)
    img = jax.image.resize(jnp.asarray(base), (h + 8, w + 8), "bicubic")
    return np.asarray(img)


def test_dense_flow_recovers_translation():
    h, w, shift = 64, 80, 3
    big = _pattern(h, w)
    prev = big[4:4 + h, 4:4 + w]
    nxt = big[4:4 + h, 4 - 0:4 + w]          # identity sanity
    flow0 = dense_flow(jnp.asarray(prev)[None], jnp.asarray(nxt)[None])
    assert float(jnp.abs(flow0).max()) < 0.5

    nxt = big[4:4 + h, 4 - shift:4 + w - shift]   # scene moved +x by shift
    flow = np.asarray(dense_flow(jnp.asarray(prev)[None],
                                 jnp.asarray(nxt)[None]))[0]
    # interior flow ~ (+shift, 0): nxt(p + flow) == prev(p)
    inner = flow[16:-16, 16:-16]
    assert abs(inner[..., 0].mean() - shift) < 0.35, inner[..., 0].mean()
    assert abs(inner[..., 1].mean()) < 0.35


def test_track_device_contract_and_straight_motion():
    """A uniformly translating scene: tracks advance by the shift per
    frame; output contract matches track_video_flow exactly."""
    h, w, t, shift = 48, 64, 5, 2
    big = _pattern(h + 4 * t, w + 4 * t, seed=1)
    frames = np.stack([big[4:4 + h, 4 + shift * i:4 + w + shift * i]
                       for i in range(t)])
    video = np.repeat(frames[..., None], 3, axis=-1)   # [T, H, W, 3]
    tracks, vis = track_video_flow_device(video, density=8)
    assert tracks.shape[0] == t and tracks.shape[2] == 3
    assert vis.shape == tracks.shape[:2]
    assert vis.dtype == bool
    # surviving interior tracks move by ~ -shift per frame in x
    # (scene content moves left in the crop window when the window
    # slides right)
    alive = vis.all(axis=0)
    inner = alive & (tracks[0, :, 0] > 12) & (tracks[0, :, 0] < w - 12) \
        & (tracks[0, :, 1] > 12) & (tracks[0, :, 1] < h - 12)
    assert inner.sum() >= 4
    dx = tracks[-1, inner, 0] - tracks[0, inner, 0]
    assert abs(np.median(dx) + shift * (t - 1)) < 1.5, np.median(dx)
    dy = tracks[-1, inner, 1] - tracks[0, inner, 1]
    assert abs(np.median(dy)) < 1.0


def test_track_device_matches_host_on_static_scene():
    """Zero motion: both trackers must keep every point at its query
    position with full visibility."""
    from flexam_tpu.perception.tracking import track_video_flow
    h, w, t = 40, 56, 4
    frame = _pattern(h, w, seed=2)[: h, : w]
    video = np.repeat(np.stack([frame] * t)[..., None], 3, axis=-1)
    td, vd = track_video_flow_device(video, density=8)
    th_, vh = track_video_flow(video, density=8)
    assert td.shape == th_.shape
    np.testing.assert_allclose(td[..., :2], th_[..., :2], atol=0.5)
    assert vd.all() and vh.all()


def test_downscale_matches_full_res_tracks():
    """downscale=2 (the flagship default: flow at half resolution) keeps
    the same track-grid shape and chained positions within ~2 px of the
    full-res run on a uniformly translating scene."""
    h, w, t, shift = 64, 80, 5, 2
    big = _pattern(h + 4 * t, w + 4 * t, seed=5)
    frames = np.stack([big[4:4 + h, 4 + shift * i:4 + w + shift * i]
                       for i in range(t)])
    video = np.repeat(frames[..., None], 3, axis=-1)
    t1, v1 = track_video_flow_device(video, density=8, downscale=1)
    t2, v2 = track_video_flow_device(video, density=8, downscale=2)
    assert t1.shape == t2.shape
    both = v1.all(axis=0) & v2.all(axis=0)
    inner = both & (t1[0, :, 0] > 12) & (t1[0, :, 0] < w - 12) \
        & (t1[0, :, 1] > 12) & (t1[0, :, 1] < h - 12)
    assert inner.sum() >= 4
    # start positions differ by the grid-phase shift (<= ds px); the
    # MOTION they recover must agree closely
    d1 = t1[-1, inner, :2] - t1[0, inner, :2]
    d2 = t2[-1, inner, :2] - t2[0, inner, :2]
    assert np.median(np.abs(d1 - d2)) < 1.0, (np.median(d1, 0),
                                              np.median(d2, 0))


def test_occlusion_kills_tracks():
    """Forward<->backward inconsistency (an occluder appearing) marks
    affected tracks invisible, like the host baseline's rule."""
    h, w, t = 48, 64, 3
    frame = _pattern(h, w, seed=3)[:h, :w]
    frames = [frame.copy() for _ in range(t)]
    frames[1][:, : w // 2] = 0.0               # half the scene blanks out
    frames[2][:, : w // 2] = 0.0
    video = np.repeat(np.stack(frames)[..., None], 3, axis=-1)
    tracks, vis = track_video_flow_device(video, density=8)
    left = tracks[0, :, 0] < w // 2 - 8
    right = tracks[0, :, 0] > w // 2 + 8
    assert vis[-1, right].mean() > 0.6          # untouched half survives
    assert vis[-1, left].mean() < vis[-1, right].mean()
