"""Perception post-processing: pose-encoding -> extr/intr (VGGT), Pi3
c2w conversion, pose fixtures, depth backends (VERDICT r1 item 7)."""

import numpy as np
import pytest

from flexam_tpu.perception import (estimate_depth, pi3_poses_to_extri_intri,
                                   pose_encoding_to_extri_intri,
                                   poses_npz_to_extri_intri, quat_to_rotmat,
                                   register_depth_backend, rotmat_to_quat)


def _random_rotations(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1          # canonical hemisphere
    return q


def test_quat_roundtrip():
    q = _random_rotations(16)
    R = quat_to_rotmat(q)
    # proper rotations
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    np.testing.assert_allclose(rotmat_to_quat(R), q, atol=1e-5)


def test_pose_encoding_to_extri_intri():
    n, H, W = 5, 480, 640
    rng = np.random.RandomState(1)
    q = _random_rotations(n, 2)
    t = rng.randn(n, 3).astype(np.float32)
    fov_h = np.full(n, np.radians(50), np.float32)
    fov_w = np.full(n, np.radians(60), np.float32)
    enc = np.concatenate([t, q, fov_h[:, None], fov_w[:, None]],
                         axis=1).astype(np.float32)
    extr, intr = pose_encoding_to_extri_intri(enc, (H, W))
    assert extr.shape == (n, 3, 4) and intr.shape == (n, 3, 3)
    np.testing.assert_allclose(extr[:, :, :3], quat_to_rotmat(q), atol=1e-5)
    np.testing.assert_allclose(extr[:, :, 3], t, atol=1e-6)
    np.testing.assert_allclose(intr[:, 1, 1],
                               (H / 2) / np.tan(fov_h / 2), rtol=1e-5)
    np.testing.assert_allclose(intr[:, 0, 0],
                               (W / 2) / np.tan(fov_w / 2), rtol=1e-5)
    assert intr[0, 0, 2] == W / 2 and intr[0, 1, 2] == H / 2


def test_pi3_conversion_matches_reference_math():
    """`pipelines.py:260-321`: w2c = se3_inverse(c2w); 55-deg default
    FoV intrinsics."""
    import math
    rng = np.random.RandomState(3)
    q = _random_rotations(4, 4)
    R = quat_to_rotmat(q)
    c2w = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    c2w[:, :3, :3] = R
    c2w[:, :3, 3] = rng.randn(4, 3)
    extr, intr = pi3_poses_to_extri_intri(c2w, width=672, height=384)
    # w2c @ c2w == I
    for i in range(4):
        m = np.eye(4, dtype=np.float32)
        m[:3] = extr[i]
        np.testing.assert_allclose(m @ c2w[i], np.eye(4), atol=1e-5)
    fx = (672 / 2) / math.tan(math.radians(55) / 2)
    np.testing.assert_allclose(intr[:, 0, 0], fx, rtol=1e-6)


def test_poses_npz_formats(tmp_path):
    rng = np.random.RandomState(5)
    c2w = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    c2w[:, :3, 3] = rng.randn(3, 3)
    p1 = str(tmp_path / "pi3.npz")
    np.savez(p1, camera_poses=c2w)
    e1, i1 = poses_npz_to_extri_intri(p1, 64, 48)
    assert e1.shape == (3, 3, 4) and i1.shape == (3, 3, 3)

    q = _random_rotations(3, 6)
    enc = np.concatenate([rng.randn(3, 3), q,
                          np.full((3, 2), 0.9)], axis=1).astype(np.float32)
    p2 = str(tmp_path / "vggt.npz")
    np.savez(p2, pose_encoding=enc, image_size=np.array([48, 64]))
    e2, i2 = poses_npz_to_extri_intri(p2, 64, 48)
    assert e2.shape == (3, 3, 4)

    p3 = str(tmp_path / "direct.npz")
    np.savez(p3, extrinsics=e2, intrinsics=i2)
    e3, i3 = poses_npz_to_extri_intri(p3, 64, 48)
    np.testing.assert_array_equal(e3, e2)
    np.testing.assert_array_equal(i3, i2)


def test_depth_backends():
    rng = np.random.RandomState(0)
    video = rng.rand(3, 16, 16, 3).astype(np.float32)
    d = estimate_depth(video)                      # luminance placeholder
    assert d.shape == (3, 16, 16) and (d > 0).all()
    register_depth_backend("flat", lambda v, **kw: np.ones(v.shape[:3]))
    try:
        d2 = estimate_depth(video[None].transpose(0, 4, 1, 2, 3),
                            backend="flat")
        assert d2.shape == (3, 16, 16) and (d2 == 1).all()
    finally:
        from flexam_tpu.perception.depth import DEPTH_BACKENDS
        DEPTH_BACKENDS.pop("flat", None)
    with pytest.raises(KeyError):
        estimate_depth(video, backend="nope")


def test_demo_camera_mode_from_poses_fixture(tmp_path):
    """Demo camera control from a raw-video-style run: synthetic tracks +
    a Pi3-format poses fixture, no extr/intr in the tracks npz."""
    from flexam_tpu.demo import main
    from flexam_tpu.utils.media import save_video
    rng = np.random.RandomState(0)
    T, H, W = 9, 32, 32
    video_path = str(tmp_path / "in.mp4")
    save_video(rng.rand(1, 3, T, H, W).astype(np.float32), video_path,
               fps=8)
    n = 30
    tracks = np.stack([rng.uniform(2, W - 2, (T, n)),
                       rng.uniform(2, H - 2, (T, n)),
                       rng.uniform(1, 3, (T, n))], -1).astype(np.float32)
    tr = str(tmp_path / "tracks.npz")
    np.savez(tr, tracks=tracks, visibility=np.ones((T, n), bool))
    c2w = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    c2w[:, 2, 3] = 4.0
    poses = str(tmp_path / "poses.npz")
    np.savez(poses, camera_poses=c2w)
    out = str(tmp_path / "out")
    main(["--prompt", "cam", "--platform", "cpu", "--random_init", "tiny",
          "--sample_size", str(H), str(W), "--video_length", str(T),
          "--num_inference_steps", "1", "--input_path", video_path,
          "--tracks_npz", tr, "--poses_npz", poses,
          "--camera_motion", "trans 0 0 0.2", "--output_dir", out])
    import os
    assert os.path.exists(os.path.join(out, "result.mp4"))


def test_flow_tracker_recovers_translation():
    """A square translating 2 px/frame: chained Farneback flow should
    track it within ~1 px/frame drift."""
    from flexam_tpu.perception import track_video_flow
    T, H, W = 6, 64, 64
    video = np.zeros((T, H, W, 3), np.float32)
    rng = np.random.RandomState(0)
    tex = rng.rand(12, 12, 3).astype(np.float32)
    for t in range(T):
        x = 10 + 2 * t
        video[t, 20:32, x:x + 12] = tex
    tracks, vis = track_video_flow(video, density=4)
    assert tracks.shape[0] == T and vis.shape == tracks.shape[:2]
    # pick points starting inside the square
    inside = ((tracks[0, :, 0] >= 12) & (tracks[0, :, 0] <= 20)
              & (tracks[0, :, 1] >= 22) & (tracks[0, :, 1] <= 30))
    assert inside.sum() >= 2
    moved = tracks[-1, inside, 0] - tracks[0, inside, 0]
    expected = 2.0 * (T - 1)
    assert np.median(moved) > expected * 0.5, np.median(moved)
    assert (tracks[:, :, 2] > 0).all()     # depth channel populated


def test_demo_flow_tracking_mode(tmp_path):
    """Video-input generation with NO external models and NO fixtures:
    --tracking_method flow end to end."""
    from flexam_tpu.demo import main
    from flexam_tpu.utils.media import save_video
    import os
    rng = np.random.RandomState(1)
    T, H, W = 9, 32, 32
    base = rng.rand(1, 3, 1, H, W).astype(np.float32)
    video = np.tile(base, (1, 1, T, 1, 1))
    video_path = str(tmp_path / "in.mp4")
    save_video(video, video_path, fps=8)
    out = str(tmp_path / "out")
    main(["--prompt", "flow", "--platform", "cpu", "--random_init", "tiny",
          "--sample_size", str(H), str(W), "--video_length", str(T),
          "--num_inference_steps", "1", "--input_path", video_path,
          "--tracking_method", "flow", "--density", "8",
          "--output_dir", out])
    assert os.path.exists(os.path.join(out, "result.mp4"))


def test_densetrack_early_exit_skips_converged_windows(monkeypatch):
    """VERDICT r2 item 3b: a window whose last launch moved tracks below
    tolerance skips its remaining iteration launches; disabling the flag
    restores the full schedule."""
    import jax
    import jax.numpy as jnp

    import flexam_tpu.perception.densetrack3d as D

    cfg_kw = dict(stride=4, window_len=4, num_virtual_tracks=4,
                  model_resolution=(32, 48), latent_dim=16, dim=32,
                  num_heads=2, num_blocks=1, corr_levels=2, corr_radius=1,
                  iters=4, iters_per_launch=1, compute="float32")
    model = D.DenseTrack3D(**cfg_kw)
    # zero the delta head: every iteration's update is exactly 0 ->
    # converged after the first launch
    model.params["transformer"]["head_delta"]["weight"] = jnp.zeros_like(
        model.params["transformer"]["head_delta"]["weight"])

    calls = {"n": 0}
    real = D._window_iters_jit

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(D, "_window_iters_jit", counting)
    video = jnp.asarray(np.random.rand(4, 32, 48, 3), jnp.float32)
    depth = jnp.ones((4, 32, 48), jnp.float32)
    D.dense_track(model.params, video, depth, model.cfg, 4)
    assert calls["n"] == 1, calls     # 1 of 4 launches (1 window)

    calls["n"] = 0
    cfg_off = D.DenseTrack3DConfig(**cfg_kw, early_exit=False)
    D.dense_track(model.params, video, depth, cfg_off, 4)
    assert calls["n"] == 4, calls     # full schedule without the flag
