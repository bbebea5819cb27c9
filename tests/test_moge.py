"""MoGe-2 implementation — call-surface contract + EXACT camera-recovery
math. The MoGe submodule is empty in the reference snapshot (no oracle);
the focal/shift solver — the part with a ground truth — is tested for
exact recovery on synthetic pinhole scenes, and the network for the
consumption contract of the demo image path (`demo.py:220-261`)."""

import numpy as np
import pytest

from flexam_tpu.perception.moge import (MoGeConfig, MoGeModel,
                                        recover_focal_shift)

TINY = MoGeConfig(patch_size=14, embed_dim=32, depth=2, num_heads=2,
                  num_register_tokens=2, output_idx=(1, 2),
                  pretrain_img_size=28, head_dim=32, num_upsamples=1,
                  pixels_min=28 * 28, pixels_max=70 * 70)


def _pinhole_points(h=40, w=56, f_norm=1.4, dz=2.5, seed=0):
    """Synthetic TRUE pinhole scene, returned as the net would see it:
    points with the z-shift removed (affine-invariant)."""
    rng = np.random.RandomState(seed)
    s = max(h, w) / 2.0
    us = (np.arange(w) + 0.5 - w / 2.0) / s
    vs = (np.arange(h) + 0.5 - h / 2.0) / s
    gu, gv = np.meshgrid(us, vs, indexing="xy")
    z_true = 1.0 + rng.rand(h, w) * 3.0             # camera-frame depth
    x = gu / f_norm * z_true
    y = gv / f_norm * z_true
    pts = np.stack([x, y, z_true - dz], axis=-1)    # shifted z
    return pts.astype(np.float64), f_norm, dz


def test_focal_shift_exact_recovery():
    pts, f_true, dz_true = _pinhole_points()
    f, dz = recover_focal_shift(pts, None)
    assert f == pytest.approx(f_true, rel=1e-4)
    assert dz == pytest.approx(dz_true, rel=1e-3, abs=1e-3)


def test_focal_shift_recovery_masked_noise():
    pts, f_true, dz_true = _pinhole_points(seed=1)
    rng = np.random.RandomState(2)
    mask = rng.rand(*pts.shape[:2]) > 0.3
    pts2 = pts + rng.randn(*pts.shape) * 1e-4       # mild noise
    pts2[~mask] = np.nan                            # invalid regions
    f, dz = recover_focal_shift(pts2, mask)
    assert f == pytest.approx(f_true, rel=1e-2)
    assert dz == pytest.approx(dz_true, rel=1e-2, abs=1e-2)


def test_infer_call_surface():
    """infer(img [3,H,W] 0..1) -> the dict the demo image path consumes
    (`demo.py:220-261`): points [H,W,3], depth [H,W], mask bool,
    normalized intrinsics with centered principal point."""
    model = MoGeModel(TINY)
    rng = np.random.RandomState(3)
    img = rng.rand(3, 44, 60).astype(np.float32)
    out = model.infer(img)
    assert out["points"].shape == (44, 60, 3)
    assert out["depth"].shape == (44, 60)
    assert out["mask"].shape == (44, 60) and out["mask"].dtype == bool
    assert out["intrinsics"].shape == (3, 3)
    np.testing.assert_allclose(out["intrinsics"][0, 2], 0.5)
    np.testing.assert_allclose(out["intrinsics"][1, 2], 0.5)
    assert out["intrinsics"][0, 0] > 0
    assert np.isfinite(out["points"]).all()
    assert "normal" in out and out["normal"].shape == (44, 60, 3)
    # depth is the z of the shifted+scaled points and must be positive
    # wherever valid
    assert (out["depth"][out["mask"]] > 0).all() or not out["mask"].any()


def test_demo_moge_consumption():
    """The native output slots straight into the demo's moge flow:
    tile points over T, project with w2s_moge under identity poses,
    convert to DELTA-format tracks."""
    from flexam_tpu.conditioning import CameraMotionGenerator
    from flexam_tpu.orchestrator import convert_moge_to_delta_format
    model = MoGeModel(TINY)
    rng = np.random.RandomState(4)
    h, w, t = 42, 56, 5
    out = model.infer(rng.rand(3, h, w).astype(np.float32))
    cam = CameraMotionGenerator("", frame_num=t, H=h, W=w)
    # the demo passes MoGe's normalized intrinsics straight to set_intr
    # (`demo.py:224` in the reference; our w2s_moge is oracle-parity)
    cam.set_intr(out["intrinsics"])
    pred = np.tile(out["points"][None], (t, 1, 1, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (t, 1, 1))
    uvd = cam.w2s_moge(pred.reshape(t, h * w, 3), poses)
    tracks, vis = convert_moge_to_delta_format(
        uvd.reshape(t, h, w, 3), out["mask"], h, w)
    assert tracks.ndim == 3 and tracks.shape[0] == t
    assert np.isfinite(tracks).all()


@pytest.mark.slow
def test_moge_head_learns_color_to_depth():
    """Trainability: gradients flow through the shared DINOv2 encoder and
    the point-map head — a few dozen adam steps teach the net a synthetic
    color->depth mapping (z proportional to the red channel), cutting the
    depth error well below random init. (Like DELTA, MoGe has no oracle —
    the submodule is empty — so learnability is the functional evidence.)"""
    import jax
    import jax.numpy as jnp
    import optax
    from flexam_tpu.perception.moge import (MoGeConfig, _forward_jit,
                                            moge_init)
    cfg = MoGeConfig(patch_size=14, embed_dim=32, depth=2, num_heads=2,
                     num_register_tokens=1, output_idx=(1, 2),
                     pretrain_img_size=28, head_dim=32, num_upsamples=1,
                     predict_normal=False)
    params = moge_init(jax.random.key(0), cfg)
    rng = np.random.RandomState(0)
    h = w = 28
    imgs = rng.rand(8, h, w, 3).astype(np.float32)
    z_true = 1.0 + 2.0 * imgs[..., 0]              # depth follows red

    def loss_fn(p, img, z):
        pts, _, _, _ = _forward_jit(p, img[None] * 2 - 1, (h, w), cfg)
        return jnp.abs(pts[0, ..., 2] - z).mean()

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    def eval_err(p):
        return float(np.mean([float(loss_fn(p, imgs[i], z_true[i]))
                              for i in range(4)]))

    err0 = eval_err(params)
    for step in range(120):
        i = step % len(imgs)
        loss, grads = grad_fn(params, imgs[i], z_true[i])
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
    err1 = eval_err(params)
    assert np.isfinite(err1)
    assert err1 < 0.5 * err0, (err0, err1)
