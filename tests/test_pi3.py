"""Native Pi3 (perception/pi3.py) — VERDICT r2 item 2.

The Pi3 source is absent from the reference snapshot (empty submodule),
so these tests pin the properties that hold for ANY faithful
implementation of the published architecture, checkpoint or not:

  * the exact reference call surface (`pipelines.py:276-290`):
    `Pi3.from_pretrained(...)(imgs[None]) -> {"camera_poses": [B,N,4,4]}`;
  * permutation equivariance — permuting input views permutes output
    poses identically (the architecture's defining property; holds by
    construction, so testable with random weights);
  * valid SE(3) output (orthonormal rotation, unit determinant) and the
    identity bias at init;
  * trainability: a few gradient steps on a synthetic rigid scene reduce
    the pose loss (the DELTA/MoGe test pattern);
  * checkpoint loading goes through the coverage-gated shape mapper.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexam_tpu.perception.pi3 import (Pi3, Pi3Config, load_pi3,
                                       pi3_forward, pi3_init)

_TINY = Pi3Config(patch_size=14, embed_dim=32, enc_depth=2, enc_heads=2,
                  num_register_tokens=0, dec_dim=32, dec_depth=1,
                  dec_heads=2, infer_hw=(28, 42))


@pytest.fixture(scope="module")
def tiny_model():
    m = Pi3(_TINY, seed=0)
    return m


def _imgs(n=3, seed=0):
    return np.asarray(jax.random.uniform(
        jax.random.key(seed), (n, 3, 28, 42)), np.float32)


def test_call_surface_and_shapes(tiny_model):
    imgs = _imgs(3)
    pred = tiny_model(imgs[None])
    assert pred["camera_poses"].shape == (1, 3, 4, 4)
    assert pred["points"].shape == (1, 3, 28, 42, 3)
    assert pred["conf"].shape == (1, 3, 28, 42, 1)
    # batchless call also accepted (adds the batch dim like the reference)
    pred2 = tiny_model(imgs)
    np.testing.assert_allclose(pred2["camera_poses"],
                               pred["camera_poses"], rtol=1e-5, atol=1e-5)


def test_poses_are_se3_and_identity_biased(tiny_model):
    poses = tiny_model(_imgs(2)[None])["camera_poses"][0]
    for p in poses:
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1.0) < 1e-4
        np.testing.assert_array_equal(p[3], [0, 0, 0, 1])
    # zero-init final layer -> exactly identity rotation at init
    np.testing.assert_allclose(poses[0][:3, :3], np.eye(3), atol=1e-5)


def test_permutation_equivariance(tiny_model):
    imgs = _imgs(4, seed=3)
    perm = np.asarray([2, 0, 3, 1])
    direct = tiny_model(imgs[None])["camera_poses"][0]
    permuted = tiny_model(imgs[perm][None])["camera_poses"][0]
    np.testing.assert_allclose(permuted, direct[perm], rtol=2e-4, atol=2e-4)


def test_trainable_on_rigid_scene():
    """A few adamw steps on a two-view synthetic scene with known relative
    pose reduce the pose regression loss."""
    import optax

    cfg = _TINY
    params = pi3_init(jax.random.key(1), cfg)
    imgs = jnp.asarray(_imgs(2, seed=5)[None])
    target = jnp.asarray(np.stack([
        np.eye(4, dtype=np.float32),
        np.array([[0, -1, 0, 0.5], [1, 0, 0, 0], [0, 0, 1, 0.1],
                  [0, 0, 0, 1]], np.float32)])[None])

    def loss_fn(p):
        poses = pi3_forward(p, cfg, imgs)["camera_poses"]
        return jnp.mean((poses - target) ** 2)

    tx = optax.adamw(1e-3)
    opt = tx.init(params)
    step = jax.jit(lambda p, o: _step(p, o, tx, loss_fn))
    losses = []
    for _ in range(8):
        params, opt, lv = step(params, opt)
        losses.append(float(lv))
    assert losses[-1] < losses[0] * 0.9, losses


def _step(p, o, tx, loss_fn):
    lv, g = jax.value_and_grad(loss_fn)(p)
    up, o = tx.update(g, o, p)
    import optax
    return optax.apply_updates(p, up), o, lv


def test_loader_coverage_gating(tmp_path):
    import torch
    ckpt = tmp_path / "pi3.pt"
    torch.save({"junk.weight": torch.zeros(5, 5)}, str(ckpt))
    m = load_pi3(str(ckpt), Pi3(_TINY))
    assert m.load_ok is False     # junk ckpt flagged, not served as trained

    # self-checkpoint (every tensor present under fake names) passes
    flat, _ = jax.tree_util.tree_flatten_with_path(Pi3(_TINY, seed=2).params)
    sd = {f"m.{i}": torch.from_numpy(np.array(v, np.float32))
          for i, (_, v) in enumerate(flat)}
    good = tmp_path / "good.pt"
    torch.save(sd, str(good))
    m2 = load_pi3(str(good), Pi3(_TINY))
    assert m2.load_ok is True


def test_video_poses_helper():
    from flexam_tpu.perception.pi3 import pi3_video_poses
    video = np.asarray(jax.random.uniform(
        jax.random.key(7), (6, 30, 44, 3)), np.float32)
    m = Pi3(_TINY)
    poses = pi3_video_poses(video, model=m, chunk=1)
    assert poses.shape == (6, 4, 4)
    assert np.all(np.isfinite(poses))


def test_process_video_file_camera_surface(tmp_path, monkeypatch):
    """`CameraMotionGenerator.process_video_file` mirrors the reference
    (`pipelines.py:259-321`): video file -> Pi3 -> Camera list with the
    55-degree-FoV intrinsic, and the 'path' DSL accepts video files."""
    from flexam_tpu.conditioning.camera import CameraMotionGenerator
    from flexam_tpu.utils.media import save_video

    video = np.asarray(jax.random.uniform(
        jax.random.key(9), (3, 5, 32, 48)), np.float32)   # [3, T, H, W]
    path = save_video(video, str(tmp_path / "clip.mp4"), fps=8)

    gen = CameraMotionGenerator("path", frame_num=5, H=384, W=672,
                                pose_file=path)
    cams = gen.process_video_file(path, model=Pi3(_TINY))
    assert len(cams) == 5
    fx = (672 / 2) / np.tan(np.radians(55) / 2)
    assert abs(cams[0].fx - fx) < 1e-3
    # w2c round-trips the c2w the model emitted
    assert cams[0].w2c_mat.shape == (4, 4)
    # the DSL 'path' branch accepts the video source end-to-end
    import flexam_tpu.conditioning.camera as cammod
    monkeypatch.setattr(
        cammod.CameraMotionGenerator, "process_video_file",
        lambda self, p, **k: cams)
    poses = gen.get_default_motion()
    assert poses.shape == (5, 4, 4)
