"""Wan2.1 causal video VAE (8x spatial / 4x temporal, 16 latent channels).

Behavioral reference: `FlexAM/models/wan_vae.py` (`AutoencoderKLWan_`
:487-, wrapper `AutoencoderKLWan` :620-). Used by the non-FlexAM "Fun"
configs (SURVEY.md §2.1). Differences from the 3.8 VAE:
  * no 2x pixel patchify (encoder conv1 takes RGB directly; 8x = 3 strided
    downs);
  * decoder upsample convs HALVE channels (`wan_vae.py:81-89`), with the
    matching `in_dim //= 2` at up-block starts (`:408-409`);
  * no AvgDown3D/DupUp3D shortcut paths;
  * dim=96, z=16, hardcoded 16-channel stats (`wan_vae.py:627-637`).

Whole-clip causal-conv equivalents of the reference's streamed compute
are shared with `flexam_tpu.models.vae` (see its docstring for the
derivation).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.models.vae import (attention_block, causal_conv3d,
                                   channel_rms_norm, conv2d, residual_block,
                                   resample, _silu, _cconv_init, _res_init,
                                   _attn_init, _resample_init)


@dataclass(frozen=True)
class VAE21Config:
    latent_channels: int = 16
    dim: int = 96
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)


def encoder3d_21(x: jnp.ndarray, p: dict, cfg: VAE21Config) -> jnp.ndarray:
    """`Encoder3d.forward` (`wan_vae.py:269-371`); x: [B,T,H,W,3]."""
    x = causal_conv3d(x, p["conv1"])
    li = 0
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    for i in range(len(cfg.dim_mult)):
        for _ in range(cfg.num_res_blocks):
            x = residual_block(x, p["downsamples"][li]); li += 1
        if i != len(cfg.dim_mult) - 1:
            mode = ("downsample3d" if cfg.temporal_downsample[i]
                    else "downsample2d")
            x = resample(x, p["downsamples"][li], mode); li += 1
    x = residual_block(x, p["middle"][0])
    x = attention_block(x, p["middle"][1])
    x = residual_block(x, p["middle"][2])
    x = _silu(channel_rms_norm(x, p["head_norm"]))
    return causal_conv3d(x, p["head_conv"])


def decoder3d_21(x: jnp.ndarray, p: dict, cfg: VAE21Config) -> jnp.ndarray:
    """`Decoder3d.forward` (`wan_vae.py:373-485`); channel-halving
    upsamples; x: [B,T,H,W,z]."""
    temporal_up = tuple(reversed(cfg.temporal_downsample))
    x = causal_conv3d(x, p["conv1"])
    x = residual_block(x, p["middle"][0])
    x = attention_block(x, p["middle"][1])
    x = residual_block(x, p["middle"][2])
    li = 0
    for i in range(len(cfg.dim_mult)):
        for _ in range(cfg.num_res_blocks + 1):
            x = residual_block(x, p["upsamples"][li]); li += 1
        if i != len(cfg.dim_mult) - 1:
            mode = "upsample3d" if temporal_up[i] else "upsample2d"
            x = resample(x, p["upsamples"][li], mode); li += 1
    x = _silu(channel_rms_norm(x, p["head_norm"]))
    return causal_conv3d(x, p["head_conv"])


def vae21_encode(params, cfg: VAE21Config, x: jnp.ndarray):
    """[B, 3, T, H, W] in [-1,1] -> (mu, log_var) [B, z, T', H/8, W/8]."""
    x = x.transpose(0, 2, 3, 4, 1)
    out = encoder3d_21(x, params["encoder"], cfg)
    out = causal_conv3d(out, params["conv1"])
    mu, log_var = jnp.split(out, 2, axis=-1)
    mu = (mu - params["latents_mean"].astype(mu.dtype)) \
        * params["latents_inv_std"].astype(mu.dtype)
    return mu.transpose(0, 4, 1, 2, 3), log_var.transpose(0, 4, 1, 2, 3)


def vae21_decode(params, cfg: VAE21Config, z: jnp.ndarray) -> jnp.ndarray:
    z = z.transpose(0, 2, 3, 4, 1)
    z = z / params["latents_inv_std"].astype(z.dtype) \
        + params["latents_mean"].astype(z.dtype)
    x = causal_conv3d(z, params["conv2"])
    x = decoder3d_21(x, params["decoder"], cfg)
    x = jnp.clip(x, -1.0, 1.0)
    return x.transpose(0, 4, 1, 2, 3)


def init_vae21_params(key, cfg: VAE21Config, dtype=jnp.float32) -> dict:
    z = cfg.latent_channels
    keys = iter(jax.random.split(key, 256))
    mult = tuple(cfg.dim_mult)
    enc_dims = [cfg.dim * u for u in (1,) + mult]

    enc = {"conv1": _cconv_init(next(keys), enc_dims[0], 3, (3, 3, 3), dtype),
           "downsamples": []}
    for i, (din, dout) in enumerate(zip(enc_dims[:-1], enc_dims[1:])):
        cur = din
        for _ in range(cfg.num_res_blocks):
            enc["downsamples"].append(_res_init(next(keys), cur, dout, dtype))
            cur = dout
        if i != len(mult) - 1:
            mode = ("downsample3d" if cfg.temporal_downsample[i]
                    else "downsample2d")
            enc["downsamples"].append(
                _resample_init(next(keys), dout, mode, dtype))
    mid = enc_dims[-1]
    enc["middle"] = [_res_init(next(keys), mid, mid, dtype),
                     _attn_init(next(keys), mid, dtype),
                     _res_init(next(keys), mid, mid, dtype)]
    enc["head_norm"] = jnp.ones((mid,), dtype)
    enc["head_conv"] = _cconv_init(next(keys), z * 2, mid, (3, 3, 3), dtype)

    dec_dims = [cfg.dim * u for u in (mult[-1],) + tuple(reversed(mult))]
    temporal_up = tuple(reversed(cfg.temporal_downsample))
    dec = {"conv1": _cconv_init(next(keys), dec_dims[0], z, (3, 3, 3), dtype)}
    dec["middle"] = [_res_init(next(keys), dec_dims[0], dec_dims[0], dtype),
                     _attn_init(next(keys), dec_dims[0], dtype),
                     _res_init(next(keys), dec_dims[0], dec_dims[0], dtype)]
    dec["upsamples"] = []
    for i, (din, dout) in enumerate(zip(dec_dims[:-1], dec_dims[1:])):
        cur = din if i == 0 else din // 2        # (`wan_vae.py:408-409`)
        for _ in range(cfg.num_res_blocks + 1):
            dec["upsamples"].append(_res_init(next(keys), cur, dout, dtype))
            cur = dout
        if i != len(mult) - 1:
            mode = "upsample3d" if temporal_up[i] else "upsample2d"
            p = _resample_init(next(keys), dout, mode, dtype)
            # the spatial conv halves channels (`wan_vae.py:81-89`)
            w = _cconv_init(next(keys), dout // 2, dout, (3, 3), dtype)
            p["resample_conv"] = {
                "weight": w["weight"].reshape(dout // 2, dout, 3, 3),
                "bias": w["bias"]}
            dec["upsamples"].append(p)
    out_d = dec_dims[-1]
    dec["head_norm"] = jnp.ones((out_d,), dtype)
    dec["head_conv"] = _cconv_init(next(keys), 3, out_d, (3, 3, 3), dtype)

    mean, inv_std = wan21_latent_stats(z)
    return {
        "encoder": enc, "decoder": dec,
        "conv1": _cconv_init(next(keys), z * 2, z * 2, (1, 1, 1), dtype),
        "conv2": _cconv_init(next(keys), z, z, (1, 1, 1), dtype),
        "latents_mean": jnp.asarray(mean, jnp.float32),
        "latents_inv_std": jnp.asarray(inv_std, jnp.float32),
    }


def wan21_latent_stats(z_dim: int):
    """16-channel stats (`wan_vae.py:627-637`)."""
    if z_dim != 16:
        return np.zeros((z_dim,), np.float32), np.ones((z_dim,), np.float32)
    mean = np.array([
        -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
        0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
    ], np.float32)
    std = np.array([
        2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
        3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
    ], np.float32)
    return mean, 1.0 / std


def vae21_params_from_state_dict(sd, cfg: VAE21Config) -> dict:
    """`AutoencoderKLWan_` state_dict -> pytree (sequential indices follow
    the flat nn.Sequential layout of `wan_vae.py:294-321,400-427`)."""
    from flexam_tpu.io.checkpoints import (_conv, _gamma, _res_from_sd,
                                           _attn_from_sd, _resample_from_sd)
    mult = tuple(cfg.dim_mult)

    def seq_modules(prefix, n_res, extra_res=0):
        """yield pytree entries in module order."""
        out = []
        idx = 0
        for i in range(len(mult)):
            for _ in range(n_res + extra_res):
                out.append(_res_from_sd(sd, f"{prefix}.{idx}")); idx += 1
            if i != len(mult) - 1:
                out.append(_resample_from_sd(sd, f"{prefix}.{idx}")); idx += 1
        return out

    enc = {
        "conv1": _conv(sd, "encoder.conv1"),
        "downsamples": seq_modules("encoder.downsamples",
                                   cfg.num_res_blocks),
        "middle": [_res_from_sd(sd, "encoder.middle.0"),
                   _attn_from_sd(sd, "encoder.middle.1"),
                   _res_from_sd(sd, "encoder.middle.2")],
        "head_norm": _gamma(sd, "encoder.head.0.gamma"),
        "head_conv": _conv(sd, "encoder.head.2"),
    }
    dec = {
        "conv1": _conv(sd, "decoder.conv1"),
        "middle": [_res_from_sd(sd, "decoder.middle.0"),
                   _attn_from_sd(sd, "decoder.middle.1"),
                   _res_from_sd(sd, "decoder.middle.2")],
        "upsamples": seq_modules("decoder.upsamples",
                                 cfg.num_res_blocks + 1),
        "head_norm": _gamma(sd, "decoder.head.0.gamma"),
        "head_conv": _conv(sd, "decoder.head.2"),
    }
    mean, inv_std = wan21_latent_stats(cfg.latent_channels)
    return {"encoder": enc, "decoder": dec,
            "conv1": _conv(sd, "conv1"), "conv2": _conv(sd, "conv2"),
            "latents_mean": mean, "latents_inv_std": inv_std}
