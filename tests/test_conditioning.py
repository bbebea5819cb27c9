"""Parity: conditioning front-end (camera DSL/projections, object motion,
cosine PE, rasterizers) vs the ACTUAL reference `pipelines.py` classes run
on CPU with their PIL/numpy loops."""

import numpy as np
import pytest
import torch

from flexam_tpu.conditioning import (Camera, CameraMotionGenerator,
                                     ObjectMotionGenerator,
                                     cosine_positional_encoding,
                                     rasterize_cos_videos,
                                     rasterize_depth_video,
                                     rasterize_tracking_video)
from tests.reference_oracle import load_reference_pipelines

H, W, T, N = 48, 64, 5, 40


@pytest.fixture(scope="module")
def ref():
    return load_reference_pipelines()


@pytest.fixture(scope="module")
def ref_pipe(ref):
    """A FlexAMPipeline shell exposing the rasterizer methods (skip its
    __init__, which builds model paths)."""
    obj = object.__new__(ref.FlexAMPipeline)
    obj.fps = 16
    obj.output_dir = "/tmp"
    return obj


def _tracks(seed=0):
    rng = np.random.RandomState(seed)
    base = np.stack([rng.uniform(0, W, N), rng.uniform(0, H, N),
                     rng.uniform(0.5, 3.0, N)], axis=1)
    drift = rng.uniform(-3, 3, (T, 1, 3)).cumsum(0)
    tracks = base[None] + drift
    vis = rng.rand(T, N) > 0.2
    return tracks.astype(np.float32), vis


@pytest.mark.parametrize("motion", [
    "trans 0.5 -0.2 1.0",
    "rot y 30",
    "trans 0 0 0.5 0 3; rot x 25 1 4",
    "spiral 2.0",
])
def test_camera_dsl_parity(ref, motion):
    ours = CameraMotionGenerator(motion, frame_num=T, H=H, W=W)
    theirs = ref.CameraMotionGenerator(motion, frame_num=T, H=H, W=W,
                                       device="cpu")
    np.testing.assert_allclose(ours.get_default_motion(),
                               theirs.get_default_motion().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_w2s_moge_parity(ref):
    rng = np.random.RandomState(1)
    pts = rng.uniform(-2, 2, (T, N, 3)).astype(np.float32)
    pts[..., 2] += 5.0
    ours_gen = CameraMotionGenerator("trans 0.2 0.1 0.3", frame_num=T,
                                     H=H, W=W)
    ref_gen = ref.CameraMotionGenerator("trans 0.2 0.1 0.3", frame_num=T,
                                        H=H, W=W, device="cpu")
    poses = ours_gen.get_default_motion()
    ours = ours_gen.w2s_moge(pts, poses)
    theirs = ref_gen.w2s_moge(torch.from_numpy(pts),
                              torch.from_numpy(poses)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_vggt_roundtrip_parity(ref):
    rng = np.random.RandomState(2)
    uvz = np.stack([rng.uniform(0, W, (T, N)), rng.uniform(0, H, (T, N)),
                    rng.uniform(1.0, 4.0, (T, N))], axis=-1).astype(np.float32)
    fx = fy = 50.0
    intr = np.tile(np.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]],
                            np.float32), (T, 1, 1))
    extr = np.tile(np.eye(4, dtype=np.float32)[:3], (T, 1, 1))
    extr[:, 0, 3] = np.linspace(0, 0.5, T)

    gen = CameraMotionGenerator("trans 0 0 1", frame_num=T, H=H, W=W)
    ref_gen = ref.CameraMotionGenerator("trans 0 0 1", frame_num=T, H=H,
                                        W=W, device="cpu")
    poses = gen.get_default_motion()

    world_ours = gen.s2w_vggt(uvz, extr, intr)
    world_ref = ref_gen.s2w_vggt(uvz.copy(), extr.copy(), intr.copy())
    np.testing.assert_allclose(world_ours, world_ref, rtol=1e-4, atol=1e-4)

    out_ours = gen.w2s_vggt(world_ours, extr, intr, poses=poses)
    out_ref = ref_gen.w2s_vggt(world_ref.copy(), extr.copy(), intr.copy(),
                               poses=poses.copy()).numpy()
    np.testing.assert_allclose(out_ours, out_ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("motion,dist", [("up", 30.0), ("rot", 45.0),
                                         ("down_right", 12.0),
                                         ("pitch_up", 20.0)])
def test_object_motion_parity(ref, motion, dist):
    tracks, _ = _tracks(3)
    mask = np.zeros((H, W), np.float32)
    mask[10:35, 20:50] = 1.0
    ours = ObjectMotionGenerator().apply_motion(
        tracks, mask, motion, dist, num_frames=T)
    theirs = ref.ObjectMotionGenerator(device="cpu").apply_motion(
        torch.from_numpy(tracks), torch.from_numpy(mask) > 0.5, motion,
        dist, num_frames=T).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-3)


def test_cosine_pe_parity(ref_pipe):
    tracks, _ = _tracks(4)
    ours = cosine_positional_encoding(tracks, H, W, L=4)
    theirs = ref_pipe.apply_cosine_positional_encoding(
        torch.from_numpy(tracks), H, W, L=4)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b.numpy(), rtol=1e-4, atol=1e-5)


def test_tracking_rasterizer_parity(ref_pipe):
    tracks, vis = _tracks(5)
    ref_frames = ref_pipe.fun_visualize_tracking_with_depth(
        torch.from_numpy(tracks), torch.from_numpy(vis), H, W, point_wise=4)
    ours = rasterize_tracking_video(tracks, vis, H, W, point_wise=4)
    ref_video = np.stack(ref_frames).astype(np.float32) / 255.0
    ref_video = ref_video.transpose(3, 0, 1, 2)[None]
    # identical up to depth-tie draw order; demand exact pixel match on
    # >= 99.9% of pixels and tiny mean error
    diff = np.abs(ours - ref_video)
    assert (diff == 0).mean() > 0.999, (diff == 0).mean()
    assert diff.mean() < 1e-3


def test_cos_rasterizer_parity(ref_pipe):
    tracks, vis = _tracks(6)
    enc = cosine_positional_encoding(tracks, H, W, L=2)
    enc_t = [torch.from_numpy(e) for e in enc]
    theirs = ref_pipe._visualize_cosine_encoded_tracking(
        enc_t, tracks, vis, H, W, save_tracking=False)
    ours = rasterize_cos_videos(enc, tracks, vis, H, W)
    for lvl in range(2):
        diff = np.abs(ours[lvl] - theirs[lvl].numpy())
        assert (diff == 0).mean() > 0.999
        assert diff.mean() < 1e-3


def test_depth_rasterizer_parity(ref_pipe):
    tracks, vis = _tracks(7)
    theirs = ref_pipe._visualize_depth_tracking(
        torch.from_numpy(tracks), vis, H, W, point_wise=4,
        save_tracking=False)
    ours = rasterize_depth_video(tracks, vis, H, W, point_wise=4)
    diff = np.abs(ours - theirs.numpy())
    assert (diff == 0).mean() > 0.999
    assert diff.mean() < 1e-3


def test_mask_filtered_rasterizer(ref_pipe):
    tracks, vis = _tracks(8)
    mask_video = np.zeros((T, H, W), np.float32)
    mask_video[:, :, : W // 2] = 1.0
    ref_frames = ref_pipe.fun_visualize_tracking_with_depth(
        torch.from_numpy(tracks), torch.from_numpy(vis), H, W, point_wise=4,
        mask_video=mask_video, generate_type="foreground_edit")
    ours = rasterize_tracking_video(tracks, vis, H, W, point_wise=4,
                                    mask_video=mask_video,
                                    generate_type="foreground_edit")
    ref_video = np.stack(ref_frames).astype(np.float32) / 255.0
    ref_video = ref_video.transpose(3, 0, 1, 2)[None]
    diff = np.abs(ours - ref_video)
    assert (diff == 0).mean() > 0.999


# ---------------------------------------------------------------------------
# Device scatter rasterizer vs the host/C++ painter (bit-exact for distinct
# depths; the production path that keeps full-res videos off the tunnel)
# ---------------------------------------------------------------------------

def _assert_video_equal(dev, host):
    """Splat-exact: uint8 color planes identical; float repr within 1 ulp
    (XLA lowers /255.0 to a reciprocal multiply)."""
    dev = np.asarray(dev)
    np.testing.assert_array_equal(np.round(dev * 255).astype(np.uint8),
                                  np.round(host * 255).astype(np.uint8))
    np.testing.assert_allclose(dev, host, atol=1e-6)


def _distinct_depth_tracks(seed=3):
    """Depth ties make painter order sort-kind-dependent; use strictly
    distinct depths so host and device paths are bit-identical."""
    rng = np.random.RandomState(seed)
    tracks, vis = _tracks(seed)
    flat = tracks.reshape(-1, 3)
    flat[:, 2] = np.linspace(0.5, 3.0, flat.shape[0])[
        rng.permutation(flat.shape[0])]
    return tracks, vis


def test_device_tracking_rasterizer_parity():
    from flexam_tpu.conditioning.rasterize_device import DeviceRasterizer
    tracks, vis = _distinct_depth_tracks()
    rng = np.random.RandomState(7)
    host = rasterize_tracking_video(tracks, vis, H, W, point_wise=4,
                                    rng=np.random.RandomState(7))
    dev = DeviceRasterizer(tracks, vis, H, W, point_wise=4,
                           rng=np.random.RandomState(7))
    _assert_video_equal(dev.tracking_video(), host)


def test_device_cos_and_depth_rasterizer_parity():
    from flexam_tpu.conditioning.rasterize_device import DeviceRasterizer
    tracks, vis = _distinct_depth_tracks(5)
    enc = cosine_positional_encoding(tracks, H, W)
    host_cos = rasterize_cos_videos(enc, tracks, vis, H, W)
    host_depth = rasterize_depth_video(tracks, vis, H, W, point_wise=4)
    dev = DeviceRasterizer(tracks, vis, H, W, point_wise=4)
    for lvl, v in enumerate(dev.cos_videos()):
        _assert_video_equal(v, host_cos[lvl])
    _assert_video_equal(dev.depth_video(), host_depth)


def test_device_rasterizer_mask_filter_and_pointwise2():
    from flexam_tpu.conditioning.rasterize_device import DeviceRasterizer
    tracks, vis = _distinct_depth_tracks(9)
    mask = np.zeros((T, H, W), np.float32)
    mask[:, : H // 2] = 1.0
    host = rasterize_tracking_video(tracks, vis, H, W, point_wise=2,
                                    mask_video=mask,
                                    generate_type="foreground_edit",
                                    rng=np.random.RandomState(1))
    dev = DeviceRasterizer(tracks, vis, H, W, point_wise=2,
                           raster_mask=mask,
                           generate_type="foreground_edit",
                           rng=np.random.RandomState(1))
    _assert_video_equal(dev.tracking_video(), host)
