"""Long-video sliding-window generation: window seeding, overlap blend,
tail snapping."""

import numpy as np

from flexam_tpu.long_video import generate_long_video, window_inputs_from_seed


def test_window_inputs_from_seed():
    seed = np.full((1, 3, 3, 8, 8), 0.7, np.float32)
    video, mask = window_inputs_from_seed(seed, 9, 8, 8)
    assert video.shape == (1, 3, 9, 8, 8)
    np.testing.assert_array_equal(video[:, :, :3], seed)
    np.testing.assert_array_equal(video[:, :, 3:], seed[:, :, -1:].repeat(6, 2))
    assert mask[:, :, :3].sum() == 0 and (mask[:, :, 3:] == 1).all()


def test_generate_long_video_composition():
    calls = []

    def fake_window(start_frames=None, num_frames=None, frame_offset=0, **kw):
        calls.append((None if start_frames is None
                      else start_frames.shape[2], num_frames))
        # frame value = global index, so the blend is checkable
        base = 0.0 if start_frames is None else float(start_frames[0, 0, -1, 0, 0])
        vals = base + np.arange(num_frames, dtype=np.float32)
        if start_frames is not None:
            k = start_frames.shape[2]
            vals[:k] = start_frames[0, 0, :, 0, 0]
        return np.tile(vals[None, None, :, None, None], (1, 3, 1, 4, 4))

    out = generate_long_video(fake_window, total_frames=21,
                              partial_video_length=9,
                              overlap_video_length=3)
    assert out.shape[2] == 21
    # first window fresh, later windows seeded with 3 overlap frames
    assert calls[0] == (None, 9)
    assert all(c == (3, 9) for c in calls[1:-1])
    # monotone non-decreasing frame values across the whole sequence
    seq = out[0, 0, :, 0, 0]
    assert (np.diff(seq) >= -1e-5).all(), seq


def test_final_window_anchors_for_exact_coverage():
    """A geometry whose snapped final window would truncate (the
    reference silently returns fewer frames than asked,
    `cogvideox_fun_ui.py:216-262`) re-anchors the final window at
    total - partial instead: the advertised length is always delivered
    and the loop always terminates (the pre-fix advance of
    window - overlap went backwards here)."""
    calls = []

    def fake_window(start_frames=None, num_frames=None, frame_offset=0,
                    **kw):
        calls.append((frame_offset, num_frames,
                      None if start_frames is None
                      else start_frames.shape[2]))
        return np.zeros((1, 3, num_frames, 4, 4), np.float32)

    out = generate_long_video(fake_window, total_frames=9,
                              partial_video_length=5,
                              overlap_video_length=2)
    # windows 0-4, 3-7, then the final window re-anchored at 4 with an
    # effective 4-frame overlap -> exactly 9 frames out
    assert calls == [(0, 5, None), (3, 5, 2), (4, 5, 4)]
    assert out.shape[2] == 9

    # clean geometry: the reference-exact snapped final window is kept
    calls.clear()
    out = generate_long_video(fake_window, total_frames=97,
                              partial_video_length=25,
                              overlap_video_length=4)
    assert out.shape[2] == 97
    assert calls[-1] == (84, 13, 4)        # snap lands exactly -> verbatim

    # single window, total under partial and not 4k+1: the window
    # rounds UP to 4k+1 and trims, still delivering the advertised total
    calls.clear()
    out = generate_long_video(fake_window, total_frames=11,
                              partial_video_length=21,
                              overlap_video_length=4)
    assert out.shape[2] == 11
    assert calls == [(0, 13, None)]


def test_long_video_with_real_pipeline():
    """Two overlapped windows through the actual tiny pipeline."""
    import jax
    import jax.numpy as jnp

    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.models.t5 import init_t5_params
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.pipeline import FlexAMGenerationPipeline, FlexAMModels

    cfg = tiny_test_config()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    pipe = FlexAMGenerationPipeline(FlexAMModels(
        cfg=cfg, dit_params=init_dit_params(k1, cfg.dit, dtype=jnp.float32),
        vae_params=init_vae_params(k2, cfg.vae),
        t5_params=init_t5_params(k3, cfg.t5)),
        compute_dtype=jnp.float32)

    h = w = 32

    def window(start_frames=None, num_frames=None, frame_offset=0):
        video, mask = window_inputs_from_seed(start_frames, num_frames, h, w)
        return pipe.generate(video, "long video", mask_video=mask,
                             num_inference_steps=2, guidance_scale=6.0,
                             seed=3, density=0.1)

    out = generate_long_video(window, total_frames=13,
                              partial_video_length=9,
                              overlap_video_length=1)
    assert out.shape == (1, 3, 13, h, w)
    assert np.isfinite(out).all()
