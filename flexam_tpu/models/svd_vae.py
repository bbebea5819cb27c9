"""SVD video VAE: SD encoder + the TEMPORAL decoder, TPU-native.

The published video-diffusion autoencoder (the one DepthCrafter's
external pipe decodes through) pairs the standard SD KL encoder with a
decoder whose resnets are spatio-temporal pairs (the same alpha-blended
blocks as the UNet, without time embeddings) plus a final 3-tap temporal
conv on the RGB output. `perception/depthcrafter_model.py` uses the
spatial KL decoder by default (documented simplification); this module
closes that gap — pass `decode_fn=make_temporal_decode_fn(...)` or load
via FLEXAM_SVD_VAE with `temporal=True`.

Structure/naming follow the published module tree
(`decoder.up_blocks.N.resnets.M.spatial_res_block...`,
`decoder.time_conv_out`, encoder + `quant_conv` as in the image VAE), so
the loader is the same generic name-split map as the UNet's.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import flexam_tpu.core.attention as _att
from flexam_tpu.core.layers import silu
from flexam_tpu.models.flux_vae import FluxVAEConfig
from flexam_tpu.models import flux_vae as _fv
from flexam_tpu.models.svd_unet import (_conv2d, _conv_t, _flatten, _gn,
                                        _st_resblock, SVDUNetConfig)


def _attn_wb(x, p, groups):
    """Mid-block single-head spatial attention (weight/bias naming)."""
    b, hh, ww, c = x.shape
    h = _gn(x, p["norm"], groups)
    q = _conv2d(h, p["q"]).reshape(b, hh * ww, 1, c)
    k = _conv2d(h, p["k"]).reshape(b, hh * ww, 1, c)
    v = _conv2d(h, p["v"]).reshape(b, hh * ww, 1, c)
    o = _att.xla_attention(q, k, v).reshape(b, hh, ww, c).astype(x.dtype)
    return x + _conv2d(o, p["proj_out"])


@dataclass(frozen=True)
class TemporalDecoderConfig:
    z_channels: int = 4
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2            # decoder uses layers+1 resnets
    norm_groups: int = 32
    scale_factor: float = 0.18215

    @classmethod
    def tiny(cls) -> "TemporalDecoderConfig":
        return cls(block_out_channels=(32, 64), layers_per_block=1)


def _st_res(x, p, groups, b, t):
    """Decoder spatio-temporal resblock (no time embedding)."""
    cfg = SVDUNetConfig(norm_groups=groups)
    return _st_resblock(x, None, p, cfg, b, t)


def temporal_decode(params: dict, cfg: TemporalDecoderConfig,
                    z: jnp.ndarray) -> jnp.ndarray:
    """SCALED latents [T, h, w, z] -> video [T, H, W, 3] in [-1, 1]."""
    t = z.shape[0]
    g = cfg.norm_groups
    x = _conv2d(z / cfg.scale_factor, params["conv_in"])
    mid = params["mid_block"]
    x = _st_res(x, mid["resnets"][0], g, 1, t)
    x = _attn_wb(x, mid["attentions"][0], g)
    x = _st_res(x, mid["resnets"][1], g, 1, t)
    n = len(cfg.block_out_channels)
    for i, blk in enumerate(params["up_blocks"]):
        for rp in blk["resnets"]:
            x = _st_res(x, rp, g, 1, t)
        if i < n - 1:
            tt, hh, ww, c = x.shape
            x = jax.image.resize(x, (tt, hh * 2, ww * 2, c), "nearest")
            x = _conv2d(x, blk["upsamplers"][0]["conv"])
    x = _conv2d(silu(_gn(x, params["conv_norm_out"], g)),
                params["conv_out"])
    # final 3-tap temporal conv on RGB (the video-release signature move)
    return _conv_t(x[None], params["time_conv_out"])[0]


def init_temporal_decoder_params(key, cfg: TemporalDecoderConfig,
                                 dtype=jnp.float32) -> dict:
    kit = iter(jax.random.split(key, 512))

    def conv2(ci, co, k=3):
        fan = ci * k * k
        return {"weight": (jax.random.normal(next(kit), (k, k, ci, co),
                                             jnp.float32) * fan ** -0.5
                           ).astype(dtype),
                "bias": jnp.zeros((co,), dtype)}

    def conv3(ci, co):
        return {"weight": (jax.random.normal(next(kit), (3, 1, 1, ci, co),
                                             jnp.float32)
                           * (3 * ci) ** -0.5).astype(dtype),
                "bias": jnp.zeros((co,), dtype)}

    def norm(c):
        return {"weight": jnp.ones((c,), dtype),
                "bias": jnp.zeros((c,), dtype)}

    def resnet2d(ci, co):
        p = {"norm1": norm(ci), "conv1": conv2(ci, co),
             "norm2": norm(co), "conv2": conv2(co, co)}
        if ci != co:
            p["conv_shortcut"] = conv2(ci, co, k=1)
        return p

    def st_res(ci, co):
        return {"spatial_res_block": resnet2d(ci, co),
                "temporal_res_block": {
                    "norm1": norm(co), "conv1": conv3(co, co),
                    "norm2": norm(co), "conv2": conv3(co, co)},
                "time_mixer": {"mix_factor": jnp.full((1,), 0.5, dtype)}}

    def attn(c):
        return {"norm": norm(c), "q": conv2(c, c, 1), "k": conv2(c, c, 1),
                "v": conv2(c, c, 1), "proj_out": conv2(c, c, 1)}

    chans = cfg.block_out_channels
    top = chans[-1]
    params: dict = {
        "conv_in": conv2(cfg.z_channels, top),
        "mid_block": {"resnets": [st_res(top, top), st_res(top, top)],
                      "attentions": [attn(top)]},
        "up_blocks": [],
        "conv_norm_out": norm(chans[0]),
        "conv_out": conv2(chans[0], cfg.out_channels),
        "time_conv_out": conv3(cfg.out_channels, cfg.out_channels),
    }
    ci = top
    for i in range(len(chans)):
        co = chans[len(chans) - 1 - i]
        blk = {"resnets": []}
        for _ in range(cfg.layers_per_block + 1):
            blk["resnets"].append(st_res(ci, co))
            ci = co
        if i < len(chans) - 1:
            blk["upsamplers"] = [{"conv": conv2(co, co)}]
        params["up_blocks"].append(blk)
    return params


def svd_vae_encode(params: dict, vae_cfg: FluxVAEConfig,
                   x: jnp.ndarray) -> jnp.ndarray:
    """SD encoder + quant_conv (posterior mean), scaled latents."""
    p = params["encoder"]
    h = _fv._conv(x, p["conv_in"])
    n_lv = len(vae_cfg.ch_mult)
    for i in range(n_lv):
        lv = p["down"][i]
        for j in range(vae_cfg.num_res_blocks):
            h = _fv._resnet(h, lv["block"][j])
        if i != n_lv - 1:
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = _fv._conv(h, lv["downsample"], stride=2, pad="VALID")
    h = _fv._resnet(h, p["mid_block_1"])
    h = _fv._attn(h, p["mid_attn_1"])
    h = _fv._resnet(h, p["mid_block_2"])
    h = _fv._conv(silu(_fv._gn(h, p["norm_out"])), p["conv_out"])
    if "quant_conv" in params:
        h = _fv._conv(h, params["quant_conv"])
    mean, _ = jnp.split(h, 2, axis=-1)
    return vae_cfg.scale_factor * mean


def _translate_diffusers_vae(sd: Dict[str, np.ndarray],
                             enc_cfg: FluxVAEConfig) -> Dict[str, np.ndarray]:
    """Translate the video-release VAE's diffusers-style naming to the
    internal hybrid: encoder `down_blocks.N.resnets.M` -> CompVis
    `down.N.block.M`, `mid_block.resnets.{0,1}` -> `mid.block_{1,2}`,
    attention `to_q/to_k/to_v/to_out.0` Linears -> `q/k/v/proj_out`
    1x1-conv weights, `conv_norm_out` -> `norm_out`. Decoder keys with
    `mid_block.attentions.0.to_*` get the same linear->conv treatment;
    everything else passes through."""
    out: Dict[str, np.ndarray] = {}
    n_lv = len(enc_cfg.ch_mult)
    attn_map = {"to_q": "q", "to_k": "k", "to_v": "v",
                "to_out.0": "proj_out", "group_norm": "norm"}
    for k, v in sd.items():
        nk = k
        if k.startswith("encoder."):
            nk = nk.replace(".conv_norm_out.", ".norm_out.")
            for i in range(n_lv):
                nk = nk.replace(f"down_blocks.{i}.resnets.",
                                f"down.{i}.block.")
                nk = nk.replace(f"down_blocks.{i}.downsamplers.0.conv",
                                f"down.{i}.downsample.conv")
            nk = nk.replace("mid_block.resnets.0.", "mid.block_1.")
            nk = nk.replace("mid_block.resnets.1.", "mid.block_2.")
            if "mid_block.attentions.0." in nk:
                for a, b in attn_map.items():
                    nk = nk.replace(f"mid_block.attentions.0.{a}.",
                                    f"mid.attn_1.{b}.")
            # diffusers ResnetBlock2D names the 1x1 skip conv_shortcut;
            # the CompVis encoder map expects nin_shortcut
            nk = nk.replace(".conv_shortcut.", ".nin_shortcut.")
        if k.startswith("decoder.mid_block.attentions.0."):
            for a, b in attn_map.items():
                nk = nk.replace(f"attentions.0.{a}.", f"attentions.0.{b}.")
        # attention projections ship as [C, C] Linears; the internal
        # blocks run them as 1x1 convs
        if (("attn_1" in nk or "attentions.0" in nk)
                and nk.endswith(".weight")
                and not nk.endswith("norm.weight")
                and np.asarray(v).ndim == 2):
            v = np.asarray(v)[:, :, None, None]     # OI -> OIHW
        out[nk] = v
    return out


def svd_vae_params_from_state_dict(sd: Dict[str, np.ndarray],
                                   enc_cfg: FluxVAEConfig,
                                   dec_cfg: TemporalDecoderConfig,
                                   dtype=np.float32
                                   ) -> Tuple[dict, Dict[str, list]]:
    """encoder.* via the image-VAE name map, quant_conv, decoder.* via
    the generic published-naming map. Accepts BOTH the CompVis-style
    naming and the video release's diffusers naming (auto-translated).
    Coverage report for verify_load."""
    if any(k.startswith("encoder.down_blocks.") for k in sd):
        sd = _translate_diffusers_vae(sd, enc_cfg)
    # encoder through the existing exact map (ignore its decoder rows)
    enc_template, enc_rep = _fv.flux_vae_params_from_state_dict(
        {k: v for k, v in sd.items() if k.startswith("encoder.")},
        enc_cfg, dtype)
    enc_loaded = [p for p in enc_rep["loaded"] if p.startswith("encoder")]
    enc_missed = [p for p in enc_rep["missed"] if p.startswith("encoder")]

    dec_template = init_temporal_decoder_params(jax.random.PRNGKey(0),
                                                dec_cfg)
    dec = jax.tree_util.tree_map(
        lambda x: np.zeros(np.asarray(x).shape, dtype), dec_template)
    flat = _flatten(dec)
    loaded, missed, used = list(enc_loaded), list(enc_missed), set()
    for ours, tgt in flat.items():
        key = f"decoder.{ours}"
        if key not in sd:
            missed.append(key)
            continue
        val = np.asarray(sd[key], dtype)
        if val.ndim == 4:
            val = val.transpose(2, 3, 1, 0)
        elif val.ndim == 5:
            val = val.transpose(2, 3, 4, 1, 0)
        if tgt.shape != val.shape:
            missed.append(key)
            continue
        tgt[...] = val
        loaded.append(key)
        used.add(key)
    params = {"encoder": enc_template["encoder"], "decoder": dec}
    if "quant_conv.weight" in sd:
        w = np.asarray(sd["quant_conv.weight"], dtype)
        params["quant_conv"] = {
            "w": w.transpose(2, 3, 1, 0),
            "b": np.asarray(sd["quant_conv.bias"], dtype)}
        loaded.append("quant_conv")
        used.update(("quant_conv.weight", "quant_conv.bias"))
    used.update(k for k in sd if k.startswith("encoder."))
    unused = [k for k in sd if k not in used
              and not k.startswith("decoder.")]
    unused += [k for k in sd if k.startswith("decoder.")
               and k not in used and k[8:] not in flat]
    return params, {"loaded": loaded, "missed": missed, "unused": unused}


def make_temporal_decode_fn(params: dict, dec_cfg: TemporalDecoderConfig,
                            dtype=jnp.float32):
    """`decode_fn` for `DepthCrafterDenoiser`: scaled latents
    [T, h, w, z] -> [T, H, W, 3]."""
    dec = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype),
                                 params["decoder"])

    def fn(z):
        return temporal_decode(dec, dec_cfg, jnp.asarray(z, dtype)
                               ).astype(jnp.float32)
    return fn
