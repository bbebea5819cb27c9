"""All five demo generate modes driven through `flexam_tpu.demo.main` at
tiny geometry (VERDICT r1 item 4; reference `demo.py:146-415` +
`run_demo.sh:1-97`): full_edit, foreground_edit, background_edit, camera
control (VGGT-format reprojection), object manipulation, and the MoGe
image path — plus camera+object composition. Both the device-rasterized
default path and the host-rasterize oracle path are exercised."""

import os

import numpy as np
import pytest

from flexam_tpu.demo import main
from flexam_tpu.utils.media import get_video_input, save_video

T, H, W = 9, 32, 32
BASE = ["--prompt", "a test scene", "--platform", "cpu",
        "--random_init", "tiny", "--sample_size", str(H), str(W),
        "--video_length", str(T), "--num_inference_steps", "2",
        "--density", "8", "--seed", "3"]


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    """Input video, mask video, repaint/object-mask images, tracks npz
    (with VGGT-style extrinsics/intrinsics), MoGe npz."""
    d = tmp_path_factory.mktemp("demo_fixtures")
    rng = np.random.RandomState(0)

    video = rng.rand(1, 3, T, H, W).astype(np.float32)
    video_path = str(d / "input.mp4")
    save_video(video, video_path, fps=8)

    mask = np.zeros((1, 3, T, H, W), np.float32)
    mask[:, :, :, H // 4: 3 * H // 4, W // 4: 3 * W // 4] = 1.0
    mask_path = str(d / "mask.mp4")
    save_video(mask, mask_path, fps=8)

    from PIL import Image
    repaint_path = str(d / "repaint.png")
    Image.fromarray(rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
                    ).save(repaint_path)
    omask_path = str(d / "omask.png")
    om = np.zeros((H, W), np.uint8)
    om[H // 4: 3 * H // 4, W // 4: 3 * W // 4] = 255
    Image.fromarray(om).save(omask_path)

    n = 40
    base = np.stack([rng.uniform(2, W - 2, n), rng.uniform(2, H - 2, n),
                     rng.uniform(1.0, 3.0, n)], axis=1)
    drift = rng.uniform(-0.5, 0.5, (T, 1, 3)).cumsum(0)
    tracks = (base[None] + drift).astype(np.float32)
    vis = np.ones((T, n), bool)
    extr = np.tile(np.eye(3, 4, dtype=np.float32), (T, 1, 1))
    extr[:, 2, 3] = 4.0
    intr = np.tile(np.array([[24.0, 0, W / 2], [0, 24.0, H / 2],
                             [0, 0, 1]], np.float32), (T, 1, 1))
    tracks_path = str(d / "tracks.npz")
    np.savez(tracks_path, tracks=tracks, visibility=vis,
             extrinsics=extr, intrinsics=intr)

    pts = np.stack(np.meshgrid(np.linspace(0.1, 0.9, H),
                               np.linspace(0.1, 0.9, W),
                               indexing="ij"), axis=-1)
    moge_points = np.concatenate(
        [pts[..., ::-1], np.full((H, W, 1), 2.0)], axis=-1
    ).astype(np.float32)
    moge_path = str(d / "moge.npz")
    np.savez(moge_path, points=moge_points,
             mask=np.ones((H, W), bool),
             intrinsics=intr[0])

    return dict(video=video_path, mask=mask_path, repaint=repaint_path,
                omask=omask_path, tracks=tracks_path, moge=moge_path)


def _check_result(outdir, expect_artifacts=False):
    result = os.path.join(outdir, "result.mp4")
    assert os.path.exists(result), os.listdir(outdir)
    out, _, _ = get_video_input(result, T, (H, W))
    assert out.shape == (1, 3, T, H, W)
    if expect_artifacts:
        for f in ("tracking_video_delta.mp4", "depth_video_delta.mp4",
                  "delta_cos_i_0.mp4", "delta_cos_i_3.mp4"):
            assert os.path.exists(os.path.join(outdir, f)), f


def test_full_edit_synthetic(fixtures, tmp_path):
    out = str(tmp_path / "full")
    main(BASE + ["--generate_type", "full_edit", "--synthetic_tracks",
                 "--input_path", fixtures["video"], "--output_dir", out])
    _check_result(out)


def test_full_edit_host_rasterize(fixtures, tmp_path):
    """Host-painter oracle path incl. artifact dumps."""
    out = str(tmp_path / "full_host")
    main(BASE + ["--generate_type", "full_edit", "--synthetic_tracks",
                 "--input_path", fixtures["video"], "--output_dir", out,
                 "--host_rasterize"])
    _check_result(out, expect_artifacts=True)


def test_foreground_edit(fixtures, tmp_path):
    out = str(tmp_path / "fg")
    main(BASE + ["--generate_type", "foreground_edit",
                 "--input_path", fixtures["video"],
                 "--mask_path", fixtures["mask"],
                 "--repaint", fixtures["repaint"],
                 "--tracks_npz", fixtures["tracks"],
                 "--output_dir", out])
    _check_result(out)


def test_background_edit(fixtures, tmp_path):
    out = str(tmp_path / "bg")
    main(BASE + ["--generate_type", "background_edit",
                 "--input_path", fixtures["video"],
                 "--mask_path", fixtures["mask"],
                 "--repaint", fixtures["repaint"],
                 "--tracks_npz", fixtures["tracks"],
                 "--output_dir", out])
    _check_result(out)


def test_camera_and_object_composition(fixtures, tmp_path):
    """Camera DSL reprojection (VGGT extr/intr) + object motion on the
    same run, like `run_demo.sh`'s composed invocations."""
    out = str(tmp_path / "cam_obj")
    main(BASE + ["--generate_type", "full_edit",
                 "--input_path", fixtures["video"],
                 "--tracks_npz", fixtures["tracks"],
                 "--camera_motion", "trans 0.1 0 0.2; rot y 10",
                 "--object_motion", "up",
                 "--object_mask", fixtures["omask"],
                 "--output_dir", out])
    _check_result(out)


def test_moge_image_path(fixtures, tmp_path):
    """Image input -> MoGe fixture -> w2s projection -> generation
    (`demo.py` 3.2 call stack)."""
    out = str(tmp_path / "moge")
    main(BASE + ["--input_path", fixtures["repaint"],
                 "--moge_npz", fixtures["moge"],
                 "--camera_motion", "trans 0 0 0.3",
                 "--output_dir", out])
    _check_result(out)


def test_camera_with_solved_poses(fixtures, tmp_path):
    """Camera control WITHOUT a poses/extrinsics fixture: the demo falls
    back to the native pose solver (robust Kabsch over the 3D tracks) —
    the self-contained replacement for the reference's VGGT/Pi3 step
    (`demo.py:310-325`)."""
    import numpy as np
    d = tmp_path / "solved"
    tracks_np = np.load(fixtures["tracks"])
    no_pose_path = str(tmp_path / "tracks_noposes.npz")
    np.savez(no_pose_path, tracks=tracks_np["tracks"],
             visibility=tracks_np["visibility"])
    main(BASE + ["--generate_type", "full_edit",
                 "--input_path", fixtures["video"],
                 "--tracks_npz", no_pose_path,
                 "--camera_motion", "trans 0.05 0 0.1",
                 "--output_dir", str(d)])
    _check_result(str(d))


def test_repaint_native(fixtures, tmp_path):
    """--repaint true runs the NATIVE depth-conditioned single-frame
    generation (the reference calls external FLUX.1-Depth here,
    `pipelines.py:137-173`) and writes the same temp_repainted.png
    artifact."""
    out = str(tmp_path / "rp")
    main(BASE + ["--generate_type", "full_edit",
                 "--input_path", fixtures["video"],
                 "--synthetic_tracks", "--repaint", "true",
                 "--output_dir", out])
    _check_result(out)
    assert os.path.exists(os.path.join(out, "temp_repainted.png"))


def test_full_native_video_path(fixtures, tmp_path):
    """The complete video-input story with ZERO fixtures or checkpoints:
    built-in flow tracker -> depth registry -> solved camera poses ->
    device prepare -> generation. This is the reference's flagship
    DELTA+VGGT path (`demo.py:296-325`, `pipelines.py:1362-1499`) running
    entirely on built-ins."""
    out = str(tmp_path / "native")
    main(BASE + ["--generate_type", "full_edit",
                 "--input_path", fixtures["video"],
                 "--tracking_method", "flow",
                 "--camera_motion", "trans 0.05 0 0.1",
                 "--output_dir", out])
    _check_result(out)
