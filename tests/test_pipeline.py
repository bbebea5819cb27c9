"""End-to-end tiny-config pipeline tests (BASELINE.json config-1 scale):
prompt encode -> conditioning prep -> scan'd CFG denoise -> decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexam_tpu.config import tiny_test_config
from flexam_tpu.models.dit import init_dit_params
from flexam_tpu.models.t5 import init_t5_params
from flexam_tpu.models.vae import init_vae_params
from flexam_tpu.pipeline import FlexAMGenerationPipeline, FlexAMModels

T, H, W = 9, 32, 32


@pytest.fixture(scope="module")
def pipe():
    cfg = tiny_test_config()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    models = FlexAMModels(
        cfg=cfg,
        dit_params=init_dit_params(k1, cfg.dit, dtype=jnp.float32),
        vae_params=init_vae_params(k2, cfg.vae),
        t5_params=init_t5_params(k3, cfg.t5),
    )
    return FlexAMGenerationPipeline(models, compute_dtype=jnp.float32)


def _inputs(seed=0, first_frame_known=False):
    rng = np.random.RandomState(seed)
    video = rng.rand(1, 3, T, H, W).astype(np.float32)
    mask = np.ones((1, 1, T, H, W), np.float32)
    if first_frame_known:
        mask[:, :, 0] = 0.0
    control = rng.rand(1, 3, T, H, W).astype(np.float32)
    depth = rng.rand(1, 3, T, H, W).astype(np.float32)
    cos = [rng.rand(1, 3, T, H, W).astype(np.float32) for _ in range(4)]
    ref = rng.rand(1, 3, 1, H, W).astype(np.float32)
    return video, mask, control, depth, cos, ref


def test_conditioning_shapes(pipe):
    video, mask, control, depth, cos, ref = _inputs()
    cond = pipe.prepare_conditioning(video, mask, control, depth, cos, ref)
    c, lt, lh, lw = cond["latent_shape"]
    assert (c, lt, lh, lw) == (8, 3, 2, 2)
    assert cond["control_latents"].shape == (1, 8, 3, 2, 2)
    assert cond["mask_latents"].shape == (1, 4, 3, 2, 2)
    assert cond["additional_control"].shape == (1, 40, 3, 2, 2)  # depth+4cos
    assert cond["ref_latents"].shape == (1, 8, 2, 2)
    assert not cond["first_frame_known"]


@pytest.mark.parametrize("scheduler", ["flow_match_euler", "flow_unipc"])
def test_end_to_end_tiny(pipe, scheduler):
    video, mask, control, depth, cos, ref = _inputs()
    ids = np.arange(16, dtype=np.int32)[None] % 100
    attn_mask = np.ones((1, 16), np.int32)
    ctx1 = pipe.encode_prompt_ids(ids, attn_mask)
    context = jnp.concatenate([ctx1, ctx1], axis=0)   # [uncond, cond]

    cond = pipe.prepare_conditioning(video, mask, control, depth, cos, ref)
    latents = pipe.denoise(cond, context, num_inference_steps=4,
                           guidance_scale=6.0, seed=7, density=1 / 10,
                           scheduler_type=scheduler)
    assert latents.shape == (1, 8, 3, 2, 2)
    assert np.isfinite(np.asarray(latents)).all()

    out = pipe._decode(latents)
    assert out.shape == (1, 3, T, H, W)
    assert np.isfinite(np.asarray(out)).all()


def test_first_frame_known_reinjection(pipe):
    """TI2V path: frame-0 mask == 0 -> latent frame 0 is pinned to the
    masked-video latents through every step (`pipeline...FlexAM.py:684-686,
    937-938`)."""
    video, mask, control, depth, cos, ref = _inputs(first_frame_known=True)
    cond = pipe.prepare_conditioning(video, mask, control, depth, cos, ref)
    assert cond["first_frame_known"]

    ids = np.arange(16, dtype=np.int32)[None] % 50
    ctx = pipe.encode_prompt_ids(ids, np.ones((1, 16), np.int32))
    context = jnp.concatenate([ctx, ctx], axis=0)
    latents = pipe.denoise(cond, context, num_inference_steps=3,
                           guidance_scale=6.0, seed=3, density=0.1)
    lat0 = np.asarray(latents)[:, :, 0]
    expected = np.asarray(cond["masked_video_latents"], np.float32)[:, :, 0]
    np.testing.assert_allclose(lat0, expected, rtol=1e-5, atol=1e-5)


def test_cfg_skip_tail(pipe):
    video, mask, control, depth, cos, ref = _inputs()
    cond = pipe.prepare_conditioning(video, mask, control, depth, cos, ref)
    ids = np.arange(16, dtype=np.int32)[None] % 50
    ctx = pipe.encode_prompt_ids(ids, np.ones((1, 16), np.int32))
    context = jnp.concatenate([ctx, ctx], axis=0)
    latents = pipe.denoise(cond, context, num_inference_steps=4,
                           guidance_scale=6.0, seed=3, density=0.1,
                           cfg_skip_ratio=0.5)
    assert np.isfinite(np.asarray(latents)).all()


def test_teacache_denoise(pipe):
    """TeaCache-enabled scan: lax.cond skip path compiles and the first
    steps (warmup) always compute."""
    video, mask, control, depth, cos, ref = _inputs()
    cond = pipe.prepare_conditioning(video, mask, control, depth, cos, ref)
    ids = np.arange(16, dtype=np.int32)[None] % 50
    ctx = pipe.encode_prompt_ids(ids, np.ones((1, 16), np.int32))
    context = jnp.concatenate([ctx, ctx], axis=0)
    latents = pipe.denoise(cond, context, num_inference_steps=6,
                           guidance_scale=6.0, seed=3, density=0.1,
                           teacache_thresh=0.1, teacache_skip_start=2)
    assert np.isfinite(np.asarray(latents)).all()
    # threshold -> inf forces all skips after warmup; result still finite
    latents2 = pipe.denoise(cond, context, num_inference_steps=6,
                            guidance_scale=6.0, seed=3, density=0.1,
                            teacache_thresh=1e9, teacache_skip_start=2)
    assert np.isfinite(np.asarray(latents2)).all()
    assert not np.allclose(np.asarray(latents), np.asarray(latents2))


def test_denoise_checkpoint_resume(pipe):
    """Interrupt after 2 of 4 steps and resume: bit-identical to the
    uninterrupted run (solver state snapshot at chunk boundaries)."""
    video, mask, control, depth, cos, ref = _inputs()
    cond = pipe.prepare_conditioning(video, mask, control, depth, cos, ref)
    ids = np.arange(16, dtype=np.int32)[None] % 50
    ctx = pipe.encode_prompt_ids(ids, np.ones((1, 16), np.int32))
    context = jnp.concatenate([ctx, ctx], axis=0)
    kw = dict(num_inference_steps=4, guidance_scale=6.0, seed=11,
              density=0.1)
    old_spl = pipe.steps_per_launch
    pipe.steps_per_launch = 2
    try:
        full = np.asarray(pipe.denoise(cond, context, **kw))
        snaps = {}
        pipe.denoise(cond, context, **kw,
                     checkpoint_cb=lambda s, snap: snaps.update({s: snap}))
        assert 1 in snaps and 3 in snaps
        resumed = np.asarray(pipe.denoise(cond, context, **kw,
                                          resume=snaps[1]))
    finally:
        pipe.steps_per_launch = old_spl
    np.testing.assert_array_equal(resumed, full)


def test_timestep_moe_boundary(pipe):
    """Dual-expert path: high-noise steps run transformer_2
    (`pipeline...FlexAM.py:903-909`, boundary=0.875)."""
    from flexam_tpu.models.dit import init_dit_params
    video, mask, control, depth, cos, ref = _inputs()
    cond = pipe.prepare_conditioning(video, mask, control, depth, cos, ref)
    ids = np.arange(16, dtype=np.int32)[None] % 50
    ctx = pipe.encode_prompt_ids(ids, np.ones((1, 16), np.int32))
    context = jnp.concatenate([ctx, ctx], axis=0)
    kw = dict(num_inference_steps=4, guidance_scale=6.0, seed=5, density=0.1)

    single = np.asarray(pipe.denoise(cond, context, **kw))
    # identical expert -> identical result through the moe path
    pipe.models.dit2_params = pipe.models.dit_params
    same = np.asarray(pipe.denoise(cond, context, **kw))
    np.testing.assert_array_equal(single, same)
    # different high-noise expert -> different result
    pipe.models.dit2_params = init_dit_params(
        jax.random.PRNGKey(99), pipe.cfg.dit, dtype=jnp.float32)
    diff = np.asarray(pipe.denoise(cond, context, **kw))
    assert not np.allclose(single, diff)
    pipe.models.dit2_params = None


# ---------------------------------------------------------------------------
# Device-side conditioning (prepare_conditioning_from_tracks) vs the host
# rasterize+prepare path. Differences are bounded by the host path's fp16
# transfer quantization (the device path never leaves f32).
# ---------------------------------------------------------------------------

def _track_fixture(n=60, seed=4):
    rng = np.random.RandomState(seed)
    base = np.stack([rng.uniform(0, W, n), rng.uniform(0, H, n),
                     np.zeros(n)], axis=1)
    drift = rng.uniform(-2, 2, (T, 1, 3)).cumsum(0)
    tracks = (base[None] + drift).astype(np.float32)
    flat = tracks.reshape(-1, 3)
    flat[:, 2] = np.linspace(0.5, 3.0, flat.shape[0])[
        rng.permutation(flat.shape[0])]
    vis = rng.rand(T, n) > 0.2
    return tracks, vis


def _cond_close(cond_dev, cond_host, atol):
    assert cond_dev["first_frame_known"] == cond_host["first_frame_known"]
    assert cond_dev["per_token_t"] == cond_host["per_token_t"]
    for k in ("control_latents", "mask_latents", "masked_video_latents",
              "additional_control", "ref_latents", "mask_ti2v"):
        np.testing.assert_allclose(
            np.asarray(cond_dev[k], np.float32),
            np.asarray(cond_host[k], np.float32), atol=atol,
            err_msg=k)


def test_prepare_from_tracks_full_edit_parity(pipe):
    from flexam_tpu.conditioning import (cosine_positional_encoding,
                                         rasterize_cos_videos,
                                         rasterize_depth_video,
                                         rasterize_tracking_video)
    from flexam_tpu.utils.media import get_image_to_video_input
    tracks, vis = _track_fixture()
    rng = np.random.RandomState(11)
    first_u8 = rng.randint(0, 256, (H, W, 3)).astype(np.uint8)
    first = (first_u8.transpose(2, 0, 1)[None, :, None] / 255.0
             ).astype(np.float32)

    tracking = rasterize_tracking_video(tracks, vis, H, W)
    enc = cosine_positional_encoding(tracks, H, W)
    cosv = rasterize_cos_videos(enc, tracks, vis, H, W)
    depthv = rasterize_depth_video(tracks, vis, H, W)
    video, mask = get_image_to_video_input(first_u8, T, (H, W))
    cond_host = pipe.prepare_conditioning(
        video, mask / 255.0, tracking, depthv,
        [cosv[k] for k in sorted(cosv)], first)

    cond_dev = pipe.prepare_conditioning_from_tracks(
        tracks, vis, H, W, first_frame=first)
    assert cond_dev["first_frame_known"]
    _cond_close(cond_dev, cond_host, atol=5e-3)


def test_prepare_from_tracks_fg_edit_parity(pipe):
    from flexam_tpu.conditioning import (cosine_positional_encoding,
                                         rasterize_cos_videos,
                                         rasterize_depth_video,
                                         rasterize_tracking_video)
    tracks, vis = _track_fixture(seed=9)
    rng = np.random.RandomState(3)
    video = (rng.randint(0, 256, (1, 3, T, H, W)) / 255.0).astype(np.float32)
    mask01 = np.zeros((1, 1, T, H, W), np.float32)
    mask01[:, :, :, : H // 2] = 1.0
    raster_mask = np.broadcast_to(mask01[0, 0], (T, H, W)).copy()
    ref = video[:, :, :1]

    tracking = rasterize_tracking_video(
        tracks, vis, H, W, mask_video=raster_mask,
        generate_type="foreground_edit")
    enc = cosine_positional_encoding(tracks, H, W)
    cosv = rasterize_cos_videos(enc, tracks, vis, H, W,
                                mask_video=raster_mask,
                                generate_type="foreground_edit")
    depthv = rasterize_depth_video(tracks, vis, H, W,
                                   mask_video=raster_mask,
                                   generate_type="foreground_edit")
    cond_host = pipe.prepare_conditioning(
        video, mask01, tracking, depthv,
        [cosv[k] for k in sorted(cosv)], ref)

    cond_dev = pipe.prepare_conditioning_from_tracks(
        tracks, vis, H, W, generate_type="foreground_edit",
        raster_mask=raster_mask, video=video, mask_video=mask01,
        ref_image=ref)
    _cond_close(cond_dev, cond_host, atol=5e-3)


def test_generate_with_forced_offload_and_host_cache(pipe):
    """generate_from_cond with offload_dit_for_decode=True: the decode
    runs with the DiT offloaded, weights restore afterwards, and the
    SECOND offload cycle reuses the cached host copy (over the real
    link a repeated 10 GB device_get costs minutes)."""
    video, mask, control, depth, cos, ref = _inputs(seed=11)
    ids = np.arange(16, dtype=np.int32)[None] % 100
    attn_mask = np.ones((1, 16), np.int32)
    ctx1 = pipe.encode_prompt_ids(ids, attn_mask)
    context = jnp.concatenate([ctx1, ctx1], axis=0)
    cond = pipe.prepare_conditioning(video, mask, control, depth, cos, ref)
    before = jax.tree_util.tree_map(np.asarray, pipe.models.dit_params)

    out = pipe.generate_from_cond(cond, context, num_inference_steps=2,
                                  seed=3, density=1 / 10,
                                  offload_dit_for_decode=True)
    assert out.shape == (1, 3, T, H, W)
    assert out.dtype == np.float32 and out.min() >= 0 and out.max() <= 1
    assert pipe.models.dit_params is not None          # restored
    host1 = pipe._dit_host
    assert host1 is not None                           # cached copy kept

    out2 = pipe.generate_from_cond(cond, context, num_inference_steps=2,
                                   seed=3, density=1 / 10,
                                   offload_dit_for_decode=True)
    assert pipe._dit_host is host1                     # cache reused
    np.testing.assert_array_equal(out, out2)           # deterministic
    after = jax.tree_util.tree_map(np.asarray, pipe.models.dit_params)
    jax.tree_util.tree_map(np.testing.assert_array_equal, before, after)

    # swapping weights invalidates the cache
    pipe.set_dit_params(pipe.models.dit_params)
    assert pipe._dit_host is None


def test_release_t5_sequential_memory_mode(pipe):
    """Sequential memory mode (`wan2_2_fun_flexam/nodes.py:322-346`):
    prompt encoding works, release_t5 drops the encoder, and the denoise
    path still runs without it."""
    ctx = pipe.encode_prompt("x", None, do_cfg=False)
    saved = pipe.models.t5_params
    try:
        pipe.release_t5()
        assert pipe.models.t5_params is None
        video, mask, control, depth, cos, ref = _inputs()
        cond = pipe.prepare_conditioning(video, mask, control, depth,
                                         cos, ref)
        lat = pipe.denoise(cond, ctx, num_inference_steps=1,
                           guidance_scale=1.0, seed=0)
        assert np.isfinite(np.asarray(lat)).all()
    finally:
        pipe.models.t5_params = saved   # module-scoped fixture


def test_decode_fetch_yuv420_env(pipe, monkeypatch):
    """FLEXAM_DECODE_FETCH=yuv420 routes the streamed decode through the
    device YUV 4:2:0 fetch + host reassembly; output stays within
    chroma-subsampling distance of the exact u8 path."""
    monkeypatch.setattr(pipe, "VAE_STREAM_THRESHOLD", 1000)
    lat = jax.random.normal(jax.random.PRNGKey(7),
                            (1, pipe.cfg.vae.latent_channels, 3, 2, 2),
                            jnp.float32) * 0.5
    exact = pipe._decode_u8_host(lat)
    monkeypatch.setenv("FLEXAM_DECODE_FETCH", "yuv420")
    got = pipe._decode_u8_host(lat)
    assert got.shape == exact.shape and got.dtype == np.uint8
    # luma parity (limited-range BT.601); chroma is subsampled
    ef, gf = exact.astype(np.float32), got.astype(np.float32)
    y = lambda a: (16.0 + 0.256788 * a[..., 0] + 0.504129 * a[..., 1]
                   + 0.097906 * a[..., 2])
    assert np.abs(y(gf) - y(ef)).mean() < 3.0


def test_save_video_yuv420(tmp_path):
    from flexam_tpu.utils.media import save_video_yuv420
    rng = np.random.RandomState(0)
    luma = rng.randint(16, 235, (1, 5, 32, 64)).astype(np.uint8)
    uv = rng.randint(16, 240, (1, 5, 2, 16, 32)).astype(np.uint8)
    out = save_video_yuv420(luma, uv, str(tmp_path / "v.mp4"), fps=8)
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_hashed_ids_refused_with_checkpoint_t5(pipe, monkeypatch):
    """VERDICT r3 item 5: checkpoint-loaded T5 + missing tokenizer must
    refuse the hashed-id fallback loudly (silent garbage conditioning);
    FLEXAM_ALLOW_HASHED_IDS=1 overrides for debugging."""
    monkeypatch.delenv("FLEXAM_ALLOW_HASHED_IDS", raising=False)
    monkeypatch.setattr(pipe.models, "t5_from_checkpoint", True)
    assert pipe.tokenizer is None
    with pytest.raises(RuntimeError, match="tokenizer"):
        pipe.tokenize(["a prompt"])
    monkeypatch.setenv("FLEXAM_ALLOW_HASHED_IDS", "1")
    ids, mask = pipe.tokenize(["a prompt"])
    assert ids.shape[1] == pipe.cfg.t5.text_length
    # random-init provenance (the default) keeps the smoke path working
    monkeypatch.delenv("FLEXAM_ALLOW_HASHED_IDS", raising=False)
    monkeypatch.setattr(pipe.models, "t5_from_checkpoint", False)
    ids2, _ = pipe.tokenize(["a prompt"])
    assert np.array_equal(ids, ids2)


def test_flux_hashed_ids_refused_with_checkpoint_text(monkeypatch):
    """Same refusal on the FLUX repainter's text towers."""
    from flexam_tpu.repaint_flux import make_tiny_repainter
    monkeypatch.delenv("FLEXAM_ALLOW_HASHED_IDS", raising=False)
    rep = make_tiny_repainter()
    # tiny repainter has no text towers at all: pseudo-features path OK
    txt, pooled = rep.encode_text("hello")
    assert txt.shape[0] == 1 and pooled.shape[0] == 1
    # simulate real-weight provenance with a T5 tower and no tokenizer
    from flexam_tpu.models.t5 import init_t5_params
    import flexam_tpu.repaint_flux as rf
    tiny_t5 = rf.T5Config(vocab=64, dim=8, dim_attn=8, dim_ffn=16,
                          num_heads=2, num_layers=1, num_buckets=8,
                          shared_pos=True, text_length=16)
    rep.t5_params = init_t5_params(jax.random.PRNGKey(0), tiny_t5)
    rep.t5_cfg = tiny_t5
    rep.text_from_checkpoint = True
    with pytest.raises(RuntimeError, match="tokenizer"):
        rep.encode_text("hello")


def test_watchdog_safe_steps_per_launch():
    """Long-sequence denoise auto-shrinks the chunk length so a single
    launch never outgrows the ~60 s executable watchdog the 14-step
    default was tuned against at 11,648 tokens (v5e roofline: per-step
    time grows ~0.5 r^2 + 0.5 r in r = tokens/11,648)."""
    from flexam_tpu.pipeline import FlexAMGenerationPipeline as P
    stub = type("S", (), {"auto_steps_per_launch": True})()
    safe = P._watchdog_safe_spl
    # flagship and smaller geometries: untouched
    assert safe(stub, 14, 11648) == 14
    assert safe(stub, 14, 448) == 14
    # 161f RIFLEx (18,816 tokens): ~2.1x per-step -> 6-step chunks
    assert safe(stub, 14, 18816) == 6
    # 225f (25,984 tokens): ~3.6x per-step -> 3-step chunks
    assert safe(stub, 14, 25984) == 3
    # an explicit SMALLER spl is respected, only capped by the bound
    assert safe(stub, 2, 25984) == 2
    assert safe(stub, 5, 25984) == 3
    # monotone in tokens, never below one step
    prev = 14
    for tok in (11648, 15000, 18816, 25984, 40000, 120000):
        cur = safe(stub, 14, tok)
        assert 1 <= cur <= prev
        prev = cur
    # opt-out trusts the caller
    stub.auto_steps_per_launch = False
    assert safe(stub, 14, 25984) == 14
