"""Control-Camera path: process_pose_params oracle vs the ACTUAL
reference implementation, the 4-frame channel fold, and camera-driven
generation through the sampler node / pipeline."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from flexam_tpu.conditioning.camera import (fold_camera_video,
                                            process_pose_params)


def _pose_rows(n=9, seed=0):
    """CameraCtrl-style rows WITHOUT the leading frame id ([fx fy cx cy
    0 0 + 12 w2c]) — the trajectory-JSON convention the sampler's
    camera_conditions input carries."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        angle = 0.05 * i
        c, s = np.cos(angle), np.sin(angle)
        w2c = np.array([[c, 0, s, 0.1 * i],
                        [0, 1, 0, 0.02 * i],
                        [-s, 0, c, 1.0]], np.float64)
        rows.append([0.47 + 0.01 * rng.uniform(), 0.84, 0.5, 0.5, 0, 0,
                     *w2c.reshape(-1)])
    return np.asarray(rows)


def test_process_pose_params_oracle():
    torch = pytest.importorskip("torch")   # noqa: F841
    from tests.reference_oracle import load_reference_dataset_image_video
    ref = load_reference_dataset_image_video()

    rows = _pose_rows()
    cam_params = np.concatenate([np.zeros((len(rows), 1)), rows], 1)
    ours = process_pose_params(cam_params, width=64, height=48)
    theirs = ref.process_pose_params(cam_params, width=64,
                                     height=48).numpy()
    assert ours.shape == theirs.shape == (9, 48, 64, 6)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


def test_fold_camera_video():
    t = 9
    cam = np.arange(1 * 6 * t * 4 * 4, dtype=np.float32).reshape(
        1, 6, t, 4, 4)
    out = fold_camera_video(cam)
    assert out.shape == (1, 24, (t + 3) // 4, 4, 4)
    # group 0 = first frame repeated 4x: channels [c*4 + j] all equal
    # frame 0 of channel c
    for c in range(6):
        for j in range(4):
            np.testing.assert_array_equal(out[0, c * 4 + j, 0],
                                          cam[0, c, 0])
    # group 1 folds frames 1..4 of each channel in order
    for c in range(6):
        for j in range(4):
            np.testing.assert_array_equal(out[0, c * 4 + j, 1],
                                          cam[0, c, 1 + j])


def _camera_pipe():
    """Tiny pipeline whose DiT has the Control-Camera adapter enabled."""
    import dataclasses

    import jax

    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.models.t5 import init_t5_params
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.pipeline import FlexAMGenerationPipeline, FlexAMModels

    cfg = tiny_test_config()
    # adapter input = 6 Plucker channels * 4-frame fold = 24; the
    # downscale must equal the VAE's spatial compression so the adapter
    # token grid lands on the DiT patch grid (the Camera model family
    # pairs downscale 8 with the 8x Wan2.1 VAE; this tiny VAE is 16x)
    dit_cfg = dataclasses.replace(
        cfg.dit, add_control_adapter=True, in_dim_control_adapter=24,
        downscale_factor_control_adapter=16)
    cfg = dataclasses.replace(cfg, dit=dit_cfg)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    models = FlexAMModels(
        cfg=cfg, dit_params=init_dit_params(k1, cfg.dit,
                                            dtype=jnp.float32),
        vae_params=init_vae_params(k2, cfg.vae),
        t5_params=init_t5_params(k3, cfg.t5))
    return FlexAMGenerationPipeline(models)


def test_camera_video_reaches_generation():
    pipe = _camera_pipe()
    video = np.zeros((1, 3, 9, 32, 32), np.float32)
    cam = np.random.default_rng(0).standard_normal(
        (1, 6, 9, 32, 32)).astype(np.float32)
    kw = dict(num_inference_steps=2, guidance_scale=1.0, seed=0)
    a = pipe.generate(video, "x", **kw)
    b = pipe.generate(video, "x", camera_video=cam, **kw)
    assert a.shape == b.shape
    assert np.abs(a.astype(np.float32) - b.astype(np.float32)).max() > 0


def test_sampler_node_camera_conditions():
    """The reference graph's camera_conditions JSON drives generation
    (`wan2_2_fun_flexam/nodes.py:577-583`)."""
    from flexam_tpu.nodes import FlexAMV2VSampler

    pipe = _camera_pipe()
    rows = _pose_rows(9)
    traj = json.dumps([[float(x) for x in r] for r in rows])
    out, = FlexAMV2VSampler().process(
        funmodels=pipe, prompt="x", video_length=9, base_resolution=32,
        original_video=np.zeros((1, 3, 9, 32, 32), np.float32),
        steps=1, cfg=1.0, camera_conditions=traj)
    assert out.ndim == 5 and np.isfinite(np.asarray(out)).all()


def test_camera_refused_without_adapter():
    """A model without the Control-Camera adapter must refuse camera
    conditioning loudly (it would otherwise be silently ignored while
    the video/mask/controls were already zeroed)."""
    import jax

    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.models.t5 import init_t5_params
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.nodes import FlexAMV2VSampler
    from flexam_tpu.pipeline import FlexAMGenerationPipeline, FlexAMModels

    cfg = tiny_test_config()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    pipe = FlexAMGenerationPipeline(FlexAMModels(
        cfg=cfg, dit_params=init_dit_params(k1, cfg.dit,
                                            dtype=jnp.float32),
        vae_params=init_vae_params(k2, cfg.vae),
        t5_params=init_t5_params(k3, cfg.t5)))
    traj = json.dumps([[float(x) for x in r] for r in _pose_rows(9)])
    with pytest.raises(ValueError, match="Control-Camera"):
        FlexAMV2VSampler().process(
            funmodels=pipe, prompt="x", video_length=9,
            base_resolution=32, steps=1, cfg=1.0,
            camera_conditions=traj)
    with pytest.raises(ValueError, match="Control-Camera"):
        pipe.generate(np.zeros((1, 3, 9, 32, 32), np.float32), "x",
                      camera_video=np.zeros((1, 6, 9, 32, 32),
                                            np.float32),
                      num_inference_steps=1, guidance_scale=1.0)


def test_sampler_comfyui_video_layout():
    """original_video/control streams in the ComfyUI IMAGE convention
    ([T,H,W,C]) are accepted and normalized."""
    from flexam_tpu.nodes import FlexAMV2VSampler

    pipe = _camera_pipe()
    video_comfy = np.zeros((9, 32, 32, 3), np.float32)
    mask_comfy = np.ones((9, 32, 32, 1), np.float32)
    out, = FlexAMV2VSampler().process(
        funmodels=pipe, prompt="x", original_video=video_comfy,
        mask_video=mask_comfy, video_length=9, base_resolution=32,
        steps=1, cfg=1.0)
    assert np.asarray(out).shape[2] == 9


def test_linked_riflex_zero_stays_off():
    """riflex_k=0 over the RIFLEXT_ARGS link means DISABLED (the
    reference convention); it must not rewrite the RoPE tables."""
    from flexam_tpu.nodes import FlexAMV2VSampler

    pipe = _camera_pipe()
    base = np.asarray(pipe.rope_tables).copy()
    video = np.zeros((1, 3, 9, 32, 32), np.float32)
    FlexAMV2VSampler().process(
        funmodels=pipe, prompt="x", original_video=video, video_length=9,
        base_resolution=32, steps=1, cfg=1.0, riflex_k=0)
    np.testing.assert_array_equal(np.asarray(pipe.rope_tables), base)


def test_sampler_node_shift_boundary_accepted():
    from flexam_tpu.nodes import FlexAMV2VSampler

    pipe = _camera_pipe()
    video = np.zeros((1, 3, 9, 32, 32), np.float32)
    out, = FlexAMV2VSampler().process(
        funmodels=pipe, prompt="x", original_video=video, video_length=9,
        base_resolution=32, steps=1, cfg=1.0, shift=7, boundary=0.875,
        num_skip_start_steps=3, teacache_offload=True,
        denoise_strength=1.0)
    assert out.ndim == 5
