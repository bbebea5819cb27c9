"""Native DepthCrafter denoiser: the SVD spatio-temporal UNet driving
video-depth diffusion behind `perception/depthcrafter.py`'s injectable
seam.

The reference's DepthCrafter branch (`pipelines.py:1307-1360`, disabled
at `:1407`) calls an external pipe built on the published architecture:
frames -> VAE-encoded conditioning latents (channel-concat each step)
+ per-frame CLIP image embeddings + (fps, motion bucket, noise aug)
time ids -> EDM v-prediction Euler loop over Karras sigmas -> VAE
decode -> 3-channel output the reference collapses to mono depth. This
module assembles that flow from the native pieces:

  * `models/svd_unet.py` — the UNet;
  * the VAE: `models/flux_vae.py` at the SD geometry (ch 128, mult
    (1,2,4,4), z=4, scale 0.18215, shift 0) — the published encoder
    EXACTLY; when the checkpoint carries the video release's TEMPORAL
    decoder (`decoder.time_conv_out` present), the loader auto-detects
    it and decodes through `models/svd_vae.py` (spatio-temporal
    resblocks + final 3-tap RGB temporal conv, quant_conv honored);
    otherwise the spatial KL decoder runs (`decode_fn` overrides);
  * image embeddings: with FLEXAM_SVD_CLIP (an HF
    CLIPVisionModelWithProjection file, the SVD release's
    image_encoder), frames run through the NATIVE ViT tower
    (`models/clip.py clip_image_embed` — antialiased 224 resize in
    [-1,1], CLIP-normalize, full-depth CLS + post-LN + projection,
    the published `_encode_image` flow). `image_embed_fn` stays
    injectable; without either, a deterministic per-frame embedding
    keeps the conditioning path live.

One jit per denoise step (params as jit arguments), host loop over the
25 steps — the same ~60 s executable-watchdog discipline as the main
pipeline's chunked scan.

Weights: FLEXAM_DEPTHCRAFTER_CKPT (UNet, published naming) +
FLEXAM_SVD_VAE (KL VAE), coverage-gated via io/verify_load.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.io.verify_load import check_mapping
from flexam_tpu.models.flux_vae import (FluxVAEConfig, flux_vae_decode,
                                        flux_vae_encode,
                                        flux_vae_params_from_state_dict,
                                        init_flux_vae_params)
from flexam_tpu.models.svd_unet import (SVDUNetConfig, euler_v_step,
                                        init_svd_unet_params,
                                        karras_sigmas, svd_unet_forward,
                                        svd_unet_params_from_state_dict)

SD_VAE_CONFIG = FluxVAEConfig(ch=128, ch_mult=(1, 2, 4, 4),
                              num_res_blocks=2, z_channels=4,
                              scale_factor=0.18215, shift_factor=0.0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _denoise_step(params, cfg: SVDUNetConfig, sample, cond_latents,
                  ctx, ctx_uncond, ids, sigma, sigma_next, guidance):
    """One CFG v-prediction Euler step. sample: [1, T, h, w, 4]."""
    scaled = sample / jnp.sqrt(sigma ** 2 + 1.0)
    t_cont = 0.25 * jnp.log(sigma)[None]
    x_in = jnp.concatenate([scaled, cond_latents], axis=-1)
    v_c = svd_unet_forward(params, cfg, x_in, t_cont, ctx, ids)
    x_un = jnp.concatenate(
        [scaled, jnp.zeros_like(cond_latents)], axis=-1)
    v_u = svd_unet_forward(params, cfg, x_un, t_cont, ctx_uncond, ids)
    v = v_u + guidance * (v_c - v_u)
    return euler_v_step(sample.astype(jnp.float32), v.astype(jnp.float32),
                        sigma, sigma_next).astype(sample.dtype)


class DepthCrafterDenoiser:
    """`denoiser(frames [T, h, w, 3] in [0,1], guidance_scale,
    num_inference_steps) -> [T, h, w, 3]` for
    `perception.depthcrafter.predict_depthcrafter`."""

    def __init__(self, unet_params: dict, vae_params: dict,
                 cfg: SVDUNetConfig = SVDUNetConfig(),
                 vae_cfg: FluxVAEConfig = SD_VAE_CONFIG,
                 image_embed_fn: Optional[Callable] = None,
                 decode_fn: Optional[Callable] = None,
                 fps: float = 7.0, motion_bucket_id: float = 127.0,
                 noise_aug_strength: float = 0.02,
                 dtype=jnp.float32, seed: int = 42):
        # the published conditioning embeds fps - 1 (default 7 -> 6)
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype), unet_params)
        self.vae_params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype), vae_params)
        self.cfg, self.vae_cfg = cfg, vae_cfg
        self.image_embed_fn = image_embed_fn
        self.decode_fn = decode_fn
        self.added_ids = np.array(
            [[fps - 1.0, motion_bucket_id, noise_aug_strength]],
            np.float32)
        self.noise_aug = noise_aug_strength
        self.dtype = dtype
        self.seed = seed

    def _encode_frames(self, x: jnp.ndarray,
                       chunk: int = 16) -> jnp.ndarray:
        """Frame-chunked VAE encode (the spatial encoder is per-frame
        exact; one whole-window launch at the reference's 110-frame
        1024-res windows would OOM the 16 GB chip and trip the ~60 s
        executable watchdog — same discipline as models/vae_stream)."""
        if "quant_conv" in self.vae_params:
            from flexam_tpu.models.svd_vae import svd_vae_encode
            enc = lambda xx: svd_vae_encode(self.vae_params,      # noqa
                                            self.vae_cfg, xx)
        else:
            enc = lambda xx: flux_vae_encode(self.vae_params,     # noqa
                                             self.vae_cfg, xx)
        outs = [enc(x[i:i + chunk]) for i in range(0, x.shape[0], chunk)]
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    def _embed_frames(self, frames: np.ndarray) -> jnp.ndarray:
        """[T, h, w, 3] -> [1, T, 1, cross_dim] per-frame embeddings."""
        t = frames.shape[0]
        if self.image_embed_fn is not None:
            e = np.asarray(self.image_embed_fn(frames), np.float32)
            return jnp.asarray(e.reshape(1, t, 1, -1), self.dtype)
        # deterministic projection of frame statistics: keeps the
        # conditioning path live without the external CLIP checkpoint
        d = self.cfg.cross_attention_dim
        rng = np.random.default_rng(0)
        proj = rng.standard_normal((48, d)).astype(np.float32) / 7.0
        pooled = frames.reshape(t, -1, 3)
        stats = np.concatenate([
            pooled.mean(1), pooled.std(1),
            np.percentile(pooled, np.linspace(5, 95, 14), axis=1
                          ).transpose(1, 0, 2).reshape(t, -1),
        ], axis=1).astype(np.float32)            # [T, 48]
        return jnp.asarray((stats @ proj).reshape(1, t, 1, d), self.dtype)

    def __call__(self, frames: np.ndarray, guidance_scale: float = 1.2,
                 num_inference_steps: int = 25) -> np.ndarray:
        frames = np.asarray(frames, np.float32)
        t, h, w, _ = frames.shape
        key = jax.random.PRNGKey(self.seed)
        k_lat, k_aug = jax.random.split(key)

        x = jnp.asarray(frames * 2.0 - 1.0, self.dtype)
        # the published pipeline noise-augments the conditioning PIXELS
        # before the encode (strength matches the embedded id)
        if self.noise_aug > 0:
            x = x + self.noise_aug * jax.random.normal(
                k_aug, x.shape, x.dtype)
        cond_z = self._encode_frames(x)
        # the published conditioning concats UNSCALED posterior means
        cond_z = (cond_z / self.vae_cfg.scale_factor)[None]

        ctx = self._embed_frames(frames)
        ctx_un = jnp.zeros_like(ctx)
        ids = jnp.asarray(self.added_ids)

        sigmas = karras_sigmas(num_inference_steps)
        sample = (jax.random.normal(
            k_lat, cond_z.shape, jnp.float32) * float(
                (sigmas[0] ** 2 + 1) ** 0.5)).astype(self.dtype)

        for i in range(num_inference_steps):
            sample = _denoise_step(
                self.params, self.cfg, sample, cond_z, ctx, ctx_un, ids,
                jnp.float32(sigmas[i]), jnp.float32(sigmas[i + 1]),
                jnp.float32(guidance_scale))

        # the diffusion state lives in the SCALED latent space (the
        # published decode does 1/scale inside) — pass it through as-is
        z = sample[0]                               # [T, h/8, w/8, 4]
        if self.decode_fn is not None:
            out = np.asarray(self.decode_fn(z))
        else:
            outs = [np.asarray(flux_vae_decode(
                self.vae_params, self.vae_cfg, z[i:i + 16]
                ).astype(jnp.float32)) for i in range(0, z.shape[0], 16)]
            out = np.concatenate(outs, 0) if len(outs) > 1 else outs[0]
        return np.clip(out * 0.5 + 0.5, 0.0, 1.0)


def make_clip_image_embed_fn(clip_params: dict, clip_cfg,
                             dtype=jnp.bfloat16,
                             chunk: int = 16) -> Callable:
    """`image_embed_fn` over the native CLIP tower: [T, h, w, 3] frames
    in [0,1] -> [T, proj_dim] image_embeds, the published SVD
    `_encode_image` flow (antialiased 224 resize of the [-1,1] frames,
    back to [0,1], CLIP-normalize, CLS + post-LN + projection).
    Frame-chunked launches; params passed as jit arguments."""
    from flexam_tpu.models.clip import clip_image_embed

    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype), clip_params)
    size = clip_cfg.image_size
    mean = jnp.array([0.48145466, 0.4578275, 0.40821073],
                     jnp.float32)[None, :, None, None]
    std = jnp.array([0.26862954, 0.26130258, 0.27577711],
                    jnp.float32)[None, :, None, None]

    @jax.jit
    def run(p, x):                    # x: [b, 3, h, w] in [0,1]
        x = jax.image.resize(x * 2.0 - 1.0, (x.shape[0], 3, size, size),
                             "bicubic")          # antialiased, as published
        x = ((x + 1.0) / 2.0 - mean) / std
        return clip_image_embed(p, clip_cfg, x.astype(dtype))

    def fn(frames: np.ndarray) -> np.ndarray:
        x = jnp.asarray(np.asarray(frames, np.float32).transpose(0, 3, 1, 2))
        outs = [np.asarray(run(params, x[i:i + chunk]), np.float32)
                for i in range(0, x.shape[0], chunk)]
        return np.concatenate(outs, 0) if len(outs) > 1 else outs[0]

    return fn


def _load_svd_clip(path: str, coverage_threshold: float,
                   dtype) -> Callable:
    """FLEXAM_SVD_CLIP -> native image_embed_fn (coverage-gated).
    num_heads/hidden_act come from a config.json next to the weights
    when present (shapes cannot recover them); SVD's ViT-H defaults
    otherwise."""
    import json

    from flexam_tpu.io.checkpoints import _load_one
    from flexam_tpu.models.clip import clip_vision_params_from_hf

    num_heads, act = 16, "gelu"
    cfg_file = os.path.join(os.path.dirname(path) or ".", "config.json")
    if os.path.exists(cfg_file):
        with open(cfg_file) as f:
            hf = json.load(f)
        num_heads = int(hf.get("num_attention_heads", num_heads))
        act = {"quick_gelu": "quick_gelu"}.get(hf.get("hidden_act"), "gelu")
    p, ccfg, rep = clip_vision_params_from_hf(
        _load_one(path), num_heads=num_heads, activation=act)
    check_mapping(rep, f"svd-clip:{os.path.basename(path)}",
                  threshold=coverage_threshold, strict=True)
    return make_clip_image_embed_fn(p, ccfg, dtype=dtype)


def load_depthcrafter_denoiser(
        ckpt: Optional[str] = None, vae: Optional[str] = None,
        cfg: SVDUNetConfig = SVDUNetConfig(),
        vae_cfg: FluxVAEConfig = SD_VAE_CONFIG, dtype=jnp.bfloat16,
        coverage_threshold: float = 0.95, **kw) -> DepthCrafterDenoiser:
    """Coverage-gated load from FLEXAM_DEPTHCRAFTER_CKPT/FLEXAM_SVD_VAE."""
    from flexam_tpu.io.checkpoints import _load_one

    ckpt = ckpt or os.environ.get("FLEXAM_DEPTHCRAFTER_CKPT")
    vae = vae or os.environ.get("FLEXAM_SVD_VAE")
    if not ckpt or not vae:
        raise FileNotFoundError(
            "native DepthCrafter needs FLEXAM_DEPTHCRAFTER_CKPT (UNet) "
            "and FLEXAM_SVD_VAE (KL VAE) checkpoint files")
    unet, rep = svd_unet_params_from_state_dict(_load_one(ckpt), cfg)
    check_mapping(rep, f"depthcrafter:{os.path.basename(ckpt)}",
                  threshold=coverage_threshold, strict=True)
    clip_path = kw.pop("clip", None) or os.environ.get("FLEXAM_SVD_CLIP")
    if clip_path and "image_embed_fn" not in kw:
        kw["image_embed_fn"] = _load_svd_clip(clip_path,
                                              coverage_threshold, dtype)
    vae_sd = _load_one(vae)
    if "decoder.time_conv_out.weight" in vae_sd:
        # the video release's VAE: SD encoder + TEMPORAL decoder
        from flexam_tpu.models.svd_vae import (
            TemporalDecoderConfig, make_temporal_decode_fn,
            svd_vae_params_from_state_dict)
        # the decoder's channel ladder mirrors the encoder's
        dec_cfg = TemporalDecoderConfig(
            z_channels=vae_cfg.z_channels,
            block_out_channels=tuple(vae_cfg.ch * m
                                     for m in vae_cfg.ch_mult),
            layers_per_block=vae_cfg.num_res_blocks,
            scale_factor=vae_cfg.scale_factor)
        vae_p, vrep = svd_vae_params_from_state_dict(vae_sd, vae_cfg,
                                                     dec_cfg)
        check_mapping(vrep, f"svd-vae-temporal:{os.path.basename(vae)}",
                      threshold=coverage_threshold, strict=True)
        kw.setdefault("decode_fn",
                      make_temporal_decode_fn(vae_p, dec_cfg, dtype))
        # encode rides the shared encoder body (+ quant_conv when the
        # checkpoint has one); decode goes through decode_fn above
        enc_tree = {k: vae_p[k] for k in ("encoder", "quant_conv")
                    if k in vae_p}
        return DepthCrafterDenoiser(unet, enc_tree, cfg=cfg,
                                    vae_cfg=vae_cfg, dtype=dtype, **kw)
    vae_p, vrep = flux_vae_params_from_state_dict(vae_sd, vae_cfg)
    check_mapping(vrep, f"svd-vae:{os.path.basename(vae)}",
                  threshold=coverage_threshold, strict=True)
    return DepthCrafterDenoiser(unet, vae_p, cfg=cfg, vae_cfg=vae_cfg,
                                dtype=dtype, **kw)


def make_tiny_denoiser(seed: int = 0, dtype=jnp.float32,
                       **kw) -> DepthCrafterDenoiser:
    """Random-init tiny geometry (tests / smoke runs)."""
    cfg = SVDUNetConfig.tiny()
    vae_cfg = FluxVAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                            z_channels=4, scale_factor=0.18215,
                            shift_factor=0.0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return DepthCrafterDenoiser(
        init_svd_unet_params(k1, cfg),
        init_flux_vae_params(k2, vae_cfg),
        cfg=cfg, vae_cfg=vae_cfg, dtype=dtype, **kw)
