"""Camera-pose solver (native VGGT/Pi3 replacement) — exact-recovery
tests on synthetic rigid scenes, round-tripped through the SAME
`conditioning/camera.py` projection conventions the demo path uses."""

import numpy as np
import pytest

from flexam_tpu.conditioning.camera import CameraMotionGenerator
from flexam_tpu.perception.pose_solver import (default_intrinsics,
                                               solve_camera_poses,
                                               unproject_tracks)


def _rotation(axis, deg):
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    th = np.deg2rad(deg)
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _synthetic_scene(t=12, n=300, w=640, h=480, seed=0, outliers=0):
    """Static 3D points + a camera orbit; returns (tracks [T,N,3] with
    (u, v, depth), vis, true extr [T,3,4] w2c, K)."""
    rng = np.random.RandomState(seed)
    K = default_intrinsics(w, h)
    world = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                      rng.uniform(4, 9, n)], axis=1)
    extr = np.zeros((t, 3, 4))
    tracks = np.zeros((t, n, 3), np.float32)
    for i in range(t):
        R = _rotation([0, 1, 0], 2.0 * i) @ _rotation([1, 0, 0], 0.7 * i)
        tv = np.array([0.05 * i, -0.02 * i, 0.1 * np.sin(i / 3.0)])
        extr[i, :, :3] = R
        extr[i, :, 3] = tv
        cam = world @ R.T + tv
        uv = cam[:, :2] / cam[:, 2:3]
        tracks[i, :, 0] = uv[:, 0] * K[0, 0] + K[0, 2]
        tracks[i, :, 1] = uv[:, 1] * K[1, 1] + K[1, 2]
        tracks[i, :, 2] = cam[:, 2]
    vis = np.ones((t, n), bool)
    if outliers:
        # independently-moving subset (an "object"): rigid solve must
        # reject it via trimming
        idx = rng.choice(n, outliers, replace=False)
        drift = rng.uniform(-1, 1, (outliers, 3)) * 0.4
        for i in range(t):
            moved = world[idx] + drift * i
            cam = moved @ extr[i, :, :3].T + extr[i, :, 3]
            tracks[i, idx, 0] = (cam[:, 0] / cam[:, 2]) * K[0, 0] + K[0, 2]
            tracks[i, idx, 1] = (cam[:, 1] / cam[:, 2]) * K[1, 1] + K[1, 2]
            tracks[i, idx, 2] = cam[:, 2]
    return tracks, vis, extr, K


def _pose_err(extr, true):
    rot = np.linalg.norm(extr[:, :, :3] - true[:, :, :3], axis=(1, 2))
    tr = np.linalg.norm(extr[:, :, 3] - true[:, :, 3], axis=1)
    return rot.max(), tr.max()


def test_exact_recovery_clean():
    tracks, vis, true, K = _synthetic_scene()
    extr, k_all = solve_camera_poses(tracks, vis, intrinsics=K)
    rot, tr = _pose_err(extr.astype(np.float64), true)
    assert rot < 1e-4 and tr < 1e-4
    assert k_all.shape == (12, 3, 3)
    np.testing.assert_allclose(k_all[3], K, rtol=1e-6)


def test_recovery_with_moving_object_and_occlusion():
    tracks, vis, true, K = _synthetic_scene(n=400, outliers=80, seed=1)
    rng = np.random.RandomState(2)
    vis &= rng.rand(*vis.shape) > 0.15          # 15% dropout
    extr, _ = solve_camera_poses(tracks, vis, intrinsics=K)
    rot, tr = _pose_err(extr.astype(np.float64), true)
    assert rot < 1e-3 and tr < 1e-3


def test_default_intrinsics_prior():
    K = default_intrinsics(896, 512)
    assert K[0, 2] == 448 and K[1, 2] == 256
    assert K[0, 0] == pytest.approx(0.7 * np.hypot(896, 512))


def test_roundtrip_through_camera_path():
    """Solved poses drive the ACTUAL demo camera path: s2w with the
    solved extr/intr reconstructs a consistent static world (per-frame
    unprojections agree), exactly what `demo.py:250-257` needs."""
    tracks, vis, true, K = _synthetic_scene(seed=3)
    extr, k_all = solve_camera_poses(tracks, vis, intrinsics=K)
    cam = CameraMotionGenerator("", frame_num=12, H=480, W=640)
    world = cam.s2w_vggt(tracks, extr, k_all)
    spread = world.std(axis=0).mean()           # static scene: ~0 motion
    assert spread < 1e-3
    # and matches frame-0 unprojection (the solver's world frame)
    w0 = unproject_tracks(tracks, K)[0]
    np.testing.assert_allclose(world[5], w0, rtol=1e-3, atol=1e-3)


def test_untrackable_frame_holds_previous_pose():
    tracks, vis, true, K = _synthetic_scene(t=6)
    vis[3] = False                               # nothing visible at t=3
    extr, _ = solve_camera_poses(tracks, vis, intrinsics=K)
    np.testing.assert_allclose(extr[3], extr[2])
    rot, tr = _pose_err(extr[[0, 1, 2, 4, 5]].astype(np.float64),
                        true[[0, 1, 2, 4, 5]])
    assert rot < 1e-4 and tr < 1e-4
