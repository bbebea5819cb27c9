"""Quantitative tracking quality on synthetic ground truth.

The optical-flow baseline is the default video-input tracker when no
DELTA checkpoint exists — these tests validate it MEASURABLY: rendered
scenes with known motion, asserting endpoint error in pixels. (The
reference has no tracker tests at all; its quality rests on external
checkpoints.)"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from flexam_tpu.perception.tracking import track_video_flow


def _textured(h, w, seed):
    """Smooth random texture with enough gradient for Farneback."""
    rng = np.random.RandomState(seed)
    base = rng.rand(h // 4, w // 4, 3).astype(np.float32)
    return cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC).clip(0, 1)


def _translating_scene(t=10, h=96, w=128, dx=1.5, dy=-1.0, seed=0):
    """A textured background translating uniformly by (dx, dy)/frame
    (rendered by shifting a larger texture — no wraparound seams)."""
    big = _textured(h + 2 * 16, w + 2 * 16, seed)
    frames = np.zeros((t, h, w, 3), np.float32)
    for i in range(t):
        # warpAffine with M=[[1,0,tx],[0,1,ty]] shifts content by (+tx,+ty)
        m = np.float32([[1, 0, dx * i], [0, 1, dy * i]])
        shifted = cv2.warpAffine(big, m, (big.shape[1], big.shape[0]),
                                 flags=cv2.INTER_LINEAR)
        frames[i] = shifted[16:16 + h, 16:16 + w]
    return frames


def test_flow_tracker_uniform_translation():
    """Every grid point moves by exactly (dx, dy)/frame; the tracker must
    stay within ~1 px/frame of the truth on the interior."""
    dx, dy, t = 1.5, -1.0, 8
    video = _translating_scene(t=t, dx=dx, dy=dy)
    tracks, vis = track_video_flow(video, density=12)
    start = tracks[0, :, :2]
    # interior points that stay in-frame for the whole clip
    end_true = start + np.asarray([dx, dy]) * (t - 1)
    interior = ((start[:, 0] > 16) & (start[:, 0] < 128 - 16 - dx * t)
                & (start[:, 1] > 16 + abs(dy) * t)
                & (start[:, 1] < 96 - 16))
    interior &= vis[t - 1]
    assert interior.sum() > 10
    err = np.linalg.norm(tracks[t - 1, interior, :2] - end_true[interior],
                         axis=1)
    assert np.median(err) < 1.5, f"median endpoint error {np.median(err)}"
    assert np.mean(err) < 3.0


def test_flow_tracker_static_scene_zero_motion():
    video = np.tile(_textured(80, 112, 1)[None], (6, 1, 1, 1))
    tracks, vis = track_video_flow(video, density=10)
    drift = np.linalg.norm(tracks[-1, :, :2] - tracks[0, :, :2], axis=1)
    assert np.median(drift[vis[-1]]) < 0.5
    assert vis[-1].mean() > 0.8          # static scene: almost all visible


def test_flow_tracker_occlusion_detection():
    """Points leaving the frame must be marked invisible."""
    t, h, w = 8, 96, 128
    video = _translating_scene(t=t, h=h, w=w, dx=8.0, dy=0.0, seed=2)
    tracks, vis = track_video_flow(video, density=12)
    # points starting near the right edge exit within the clip
    exiting = tracks[0, :, 0] > w - 8.0 * (t - 2)
    assert exiting.sum() >= 3         # deterministic scene: never vacuous
    assert vis[t - 1, exiting].mean() < 0.6
